"""Learning-rate and index-refresh schedules.

LR schedules reproduce the reference's WarmupLinear / Cosine / Fixed lambda schedulers
(/root/reference/src/util.py:67-108) as optax-compatible `step -> multiplier` callables
(the multiplier scales the base lr, exactly like torch's LambdaLR).

IndexRefreshScheduler reproduces the refresh-schedule mini-language
("startstep-endstep:rate,...": /root/reference/src/util.py:111-158).
"""

from __future__ import annotations

import logging
import math
from typing import Callable, List, Tuple

logger = logging.getLogger(__name__)


def warmup_linear(warmup: int, total: int, ratio: float = 0.1) -> Callable[[int], float]:
    # util.py:67-81: ramp from `ratio` to 1 over warmup, then linear decay to `ratio` at total.
    def f(step):
        if step < warmup:
            return (1 - ratio) * step / float(max(1, warmup)) + ratio
        return max(0.0, 1.0 + (ratio - 1) * (step - warmup) / float(max(1.0, total - warmup)))

    return f


def cosine(warmup: int, total: int, ratio: float = 0.1) -> Callable[[int], float]:
    # util.py:84-93: linear warmup from 0, then quarter-cosine decay to `ratio`.
    def f(step):
        if step < warmup:
            return float(step) / max(1, warmup)
        s = float(step - warmup) / max(1.0, total - warmup)
        return ratio + (1.0 - ratio) * math.cos(0.5 * math.pi * s)

    return f


def fixed(warmup: int, total: int, ratio: float = 0.1) -> Callable[[int], float]:
    # util.py:96-107: linear warmup from 0, then constant.
    def f(step):
        if step < warmup:
            return float(step) / max(1, warmup)
        return 1.0

    return f


_SCHEDULES = {"linear": warmup_linear, "cosine": cosine, "fixed": fixed}


def lr_schedule(name: str, warmup: int, total: int, ratio: float = 0.1) -> Callable[[int], float]:
    """Return a step->multiplier callable; multiply by base lr for the actual rate."""
    if name not in _SCHEDULES:
        raise ValueError(f"unknown scheduler {name!r}, must be one of {sorted(_SCHEDULES)}")
    return _SCHEDULES[name](warmup, total, ratio)


def parse_index_refresh_schedule_string(format_str: str) -> List[Tuple[int, int, int]]:
    """Parse "start-end:rate,start-end:rate" | "N" | "-1" (util.py:131-143)."""
    parsed = []
    if format_str == "-1":
        parsed = [(0, 2**32, 2**32)]
    elif format_str.isdigit():
        parsed = [(0, 2**32, int(format_str))]
    else:
        for piece in format_str.split(","):
            startend, rate = piece.split(":")
            start, end = startend.split("-")
            parsed.append((int(start), int(end), int(rate)))
    return parsed


class IndexRefreshScheduler:
    """Decides at which steps the passage index is re-embedded (util.py:111-158)."""

    def __init__(self, format_str: str, freeze_retriever_steps: int, train_retriever: bool):
        self.format_str = format_str
        self.train_retriever = train_retriever
        self.freeze_retriever_steps = freeze_retriever_steps
        self.steps2rates = parse_index_refresh_schedule_string(format_str)

    def is_time_to_refresh(self, step: int) -> bool:
        if not (self.train_retriever or step == 0):
            # an untrained retriever is static: only embed once at startup
            return False
        if not step == 0 and step < self.freeze_retriever_steps:
            return False
        for st, en, rate in self.steps2rates:
            if st <= step < en:
                steps_since_refresh_schedule_change = step - st
                return (steps_since_refresh_schedule_change % rate) == 0
        logger.warning(
            "cant calculate refresh rate for step %d — step is beyond the configured schedule", step
        )
        return False
