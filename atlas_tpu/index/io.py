"""Index/passages IO (reference: /root/reference/src/index_io.py).

load_passages keeps the reference's deterministic mod-rank line sharding (:36-44):
line i belongs to process (i % world_size). Title/section merging and the `id`
requirement are preserved.
"""

from __future__ import annotations

import json
import logging
from typing import List, Optional, Sequence

import jax

logger = logging.getLogger(__name__)


def load_passages(filenames: Sequence[str], maxload: int = -1, native: bool = True):
    global_rank = jax.process_index()
    world_size = jax.process_count()
    if native:
        try:
            from atlas_tpu.native import NativePassageStore

            return NativePassageStore(list(filenames), world_size, global_rank, maxload)
        except Exception as e:
            logger.warning("native passage loader unavailable (%s); python fallback", e)
    passages: List[dict] = []
    counter = 0
    for fname in filenames:
        with open(fname, encoding="utf-8") as f:
            for line in f:
                if maxload > -1 and counter >= maxload:
                    break
                if (counter % world_size) == global_rank:
                    if line.strip() != "":
                        item = json.loads(line)
                        assert "id" in item
                        if "title" in item and "section" in item and len(item["section"]) > 0:
                            item["title"] = f"{item['title']}: {item['section']}"
                        passages.append(item)
                    else:
                        logger.warning("empty line in %s", fname)
                counter += 1
    return passages


def load_or_initialize_index(cfg, mesh=None, dim: int = 768):
    """-> (index, passages) (index_io.py:72-93). `dim` must match the retriever's
    embedding width (the reference hardcodes EMBEDDINGS_DIM=768, retrievers.py:13)."""
    from atlas_tpu.index.flat import DistributedIndex

    rt = getattr(cfg, "search_recall_target", 0.99)
    if cfg.index_mode == "flat":
        index = DistributedIndex(mesh=mesh, recall_target=rt,
                                 use_pallas=getattr(cfg, "use_pallas", False))
    elif cfg.index_mode == "faiss":
        from atlas_tpu.index.approx import DistributedApproxIndex

        rf = getattr(cfg, "index_refine_factor", -1)
        if rf < 0:  # auto (config.py): refine-4 for PQ-coded types, off otherwise
            rf = 4 if cfg.faiss_index_type in ("pq", "ivfpq") else 1
        index = DistributedApproxIndex(
            cfg.faiss_index_type, cfg.faiss_code_size, mesh=mesh,
            nprobe=getattr(cfg, "ivf_nprobe", 0),
            refine_factor=rf,
        )
    else:
        raise ValueError(f"unsupported index mode {cfg.index_mode}")

    if cfg.load_index_path is not None:
        logger.info(f"Loading index from: {cfg.load_index_path} (mode {cfg.index_mode})")
        index.load_index(cfg.load_index_path, cfg.save_index_n_shards)
        passages = list(index.doc_store.passages)
    else:
        passages = []
        if not cfg.use_file_passages:
            logger.info(f"Loading passages from: {cfg.passages}")
            passages = load_passages(cfg.passages, cfg.max_passages)
            index.init_embeddings(passages, dim=dim)
    return index, passages


def save_embeddings_and_index(index, cfg) -> None:
    index.save_index(cfg.save_index_path, cfg.save_index_n_shards)
