#!/usr/bin/env python
"""Evaluation entry point (reference: /root/reference/evaluate.py:168-207).

Supports full eval (loss + generation + metrics) and --retrieve_only mode."""

import logging
import os
import time

from atlas_tpu.config import AtlasConfig
from atlas_tpu.eval.loop import evaluate, run_retrieval_only
from atlas_tpu.index.io import load_or_initialize_index, save_embeddings_and_index
from atlas_tpu.model_io import create_checkpoint_directories, load_or_initialize_atlas_model
from atlas_tpu.parallel.mesh import init_distributed_mode, make_mesh, set_global_mesh
from atlas_tpu.utils.logging_utils import init_logger
from atlas_tpu.utils.signals import init_signal_handler

logger = logging.getLogger(__name__)


def main():
    cfg = AtlasConfig.from_args()
    init_distributed_mode(cfg)
    init_signal_handler()
    mesh = make_mesh(cfg.dp_size, cfg.mp_size)
    set_global_mesh(mesh)

    checkpoint_path, _ = create_checkpoint_directories(cfg)
    init_logger(cfg.is_main, os.path.join(checkpoint_path, "run.log"))
    if cfg.is_main:
        cfg.dump(os.path.join(checkpoint_path, "opt.log"))

    atlas, _, step = load_or_initialize_atlas_model(cfg, eval_only=True, mesh=mesh)
    # distribute params + eval batches over the mesh (TP over "mp", replicated
    # over "dp"; batches shard over "dp" via atlas.set_mesh)
    from atlas_tpu.parallel.sharding import shard_params

    params = {k: v for k, v in
              {"reader": atlas.reader_params, "retriever": atlas.retriever_params}.items()
              if v is not None}
    params = shard_params(mesh, params)
    atlas.reader_params = params.get("reader", atlas.reader_params)
    atlas.retriever_params = params.get("retriever", atlas.retriever_params)
    atlas.set_mesh(mesh)
    dim = atlas.retriever_cfg.hidden_size if atlas.retriever_cfg is not None else 768
    index, passages = load_or_initialize_index(cfg, mesh, dim=dim)

    logger.info("Start Evaluation")
    if not cfg.use_file_passages and cfg.load_index_path is None:
        indexing_start = time.time()
        atlas.build_index(index, passages, cfg.per_gpu_embedder_batch_size, logger)
        logger.info(f"Indexing time: {time.time() - indexing_start:.1f}s")
        if cfg.save_index_path is not None:
            save_embeddings_and_index(index, cfg)

    for data_path in cfg.eval_data:
        dataset_name = os.path.basename(data_path)
        logger.info(f"Start Evaluation on {data_path}")
        if cfg.retrieve_only:
            run_retrieval_only(atlas, index, cfg, data_path, step)
        else:
            metrics = evaluate(atlas, index, cfg, data_path, step)
            log_message = f"Dataset: {dataset_name}"
            for k, v in metrics.items():
                log_message += f" | {v:.3f} {k}"
            logger.info(log_message)


if __name__ == "__main__":
    main()
