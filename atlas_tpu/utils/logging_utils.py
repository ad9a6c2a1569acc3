"""Logging helpers (reference: /root/reference/src/util.py:25-52).

Rank-0 logs at INFO, other ranks at WARN; optional per-run file handler; optional
TensorBoard writer (gracefully absent if tensorboard is not installed).
"""

from __future__ import annotations

import logging
import sys
from typing import Optional

logger = logging.getLogger("atlas_tpu")


def init_logger(is_main: bool = True, filename: Optional[str] = None) -> logging.Logger:
    handlers = [logging.StreamHandler(sys.stdout)]
    if filename is not None:
        handlers.append(logging.FileHandler(filename=filename))
    logging.basicConfig(
        datefmt="%m/%d/%Y %H:%M:%S",
        level=logging.INFO if is_main else logging.WARN,
        format="[%(asctime)s] {%(filename)s:%(lineno)d} %(levelname)s - %(message)s",
        handlers=handlers,
        force=True,
    )
    return logger


def init_tb_logger(dirname: str, is_main: bool):
    tb_logger = None
    if is_main:
        try:
            from torch.utils import tensorboard

            tb_logger = tensorboard.SummaryWriter(dirname)
        except Exception:
            logger.warning("Tensorboard is not available.")
    return tb_logger
