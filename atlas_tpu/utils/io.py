"""Distributed prediction/dataset writing (reference: /root/reference/src/util.py:238-263):
each process writes a per-rank tmp json; rank 0 merges to a jsonl through the shared
filesystem after a process barrier."""

from __future__ import annotations

import json
import logging
from pathlib import Path

import jax

logger = logging.getLogger(__name__)


def save_distributed_dataset(data, dataset_name: str, cfg) -> None:
    dir_path = Path(cfg.checkpoint_dir) / cfg.name
    write_path = dir_path / "tmp_dir"
    write_path.mkdir(exist_ok=True, parents=True)
    tmp_path = write_path / f"{jax.process_index()}.json"
    with open(tmp_path, "w") as fw:
        json.dump(data, fw)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("save_distributed_dataset")
    if cfg.is_main:
        final_path = dir_path / f"{dataset_name}.jsonl"
        logger.info(f"Writing dataset with scores at {final_path}")
        results_path = sorted(write_path.glob("*.json"))
        alldata = []
        for path in results_path:
            with open(path) as f:
                alldata.extend(json.load(f))
            path.unlink()
        with open(final_path, "w") as fout:
            for ex in alldata:
                json.dump(ex, fout, ensure_ascii=False)
                fout.write("\n")
        write_path.rmdir()
