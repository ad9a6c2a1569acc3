#!/usr/bin/env python
"""Training entry point (reference: /root/reference/train.py:179-231).

    python train.py --task qa --reader_model_type google/t5-base-lm-adapt \
        --passages psgs.jsonl --train_data train.jsonl --eval_data dev.jsonl ...

No DDP / ShardedDataParallel wrapping appears here: the jitted train step runs SPMD
over the global ("dp", "mp") mesh and GSPMD inserts every collective.
"""

import logging
import os

from atlas_tpu.config import AtlasConfig
from atlas_tpu.index.io import load_or_initialize_index
from atlas_tpu.model_io import create_checkpoint_directories, load_or_initialize_atlas_model
from atlas_tpu.parallel.mesh import init_distributed_mode, make_mesh, set_global_mesh
from atlas_tpu.train.loop import train
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
    logger.info(f"world size: {cfg.world_size}; mesh: {dict(mesh.shape)}")

    atlas, opt_state_raw, step = load_or_initialize_atlas_model(cfg, mesh=mesh)
    dim = atlas.retriever_cfg.hidden_size if atlas.retriever_cfg is not None else 768
    index, passages = load_or_initialize_index(cfg, mesh, dim=dim)

    logger.info("Start training")
    train(atlas, index, passages, step, cfg, checkpoint_path, opt_state_raw)


if __name__ == "__main__":
    main()
