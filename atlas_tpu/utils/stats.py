"""Run statistics: weighted averaging of scalar stats, locally and across hosts.

Reproduces the reference's WeightedAvgStats (/root/reference/src/util.py:278-315) and
`weighted_average` (/root/reference/src/dist_utils.py:167-176), TPU-native: cross-host
reduction uses a tiny jitted psum over the global device set via
`jax.experimental.multihost_utils` when more than one process is present, instead of a
gloo side-channel. Single-process (the common test path) degrades to the local value.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Tuple, Union

import numpy as np

Number = Union[float, int]


def weighted_average(value: float, weight: float) -> Tuple[float, float]:
    """Globally weighted-average a scalar; returns (avg, total_weight)."""
    import jax

    if jax.process_count() == 1:
        return value, weight
    from jax.experimental import multihost_utils

    arr = np.array([value * weight, weight], dtype=np.float64).astype(np.float32)
    summed = multihost_utils.process_allgather(arr).sum(axis=0)
    total_weight = float(summed[1])
    if total_weight == 0:
        return 0.0, 0.0
    return float(summed[0]) / total_weight, total_weight


class WeightedAvgStats:
    """Accumulates (value, weight) pairs per key and reports weighted means."""

    def __init__(self):
        self.raw_stats: Dict[str, float] = defaultdict(float)
        self.total_weights: Dict[str, float] = defaultdict(float)

    def update(self, vals: Dict[str, Tuple[Number, Number]]) -> None:
        for key, (value, weight) in vals.items():
            self.raw_stats[key] += value * weight
            self.total_weights[key] += weight

    @property
    def stats(self) -> Dict[str, float]:
        return {x: self.raw_stats[x] / self.total_weights[x] for x in self.raw_stats.keys()}

    @property
    def tuple_stats(self) -> Dict[str, Tuple[float, float]]:
        return {
            x: (self.raw_stats[x] / self.total_weights[x], self.total_weights[x])
            for x in self.raw_stats.keys()
        }

    def reset(self) -> None:
        self.raw_stats = defaultdict(float)
        self.total_weights = defaultdict(float)

    @property
    def average_stats(self) -> Dict[str, float]:
        """Cross-process weighted average per key (util.py:302-315)."""
        global_dict = {}
        for k in sorted(self.raw_stats.keys()):
            v = self.raw_stats[k] / self.total_weights[k] if self.total_weights[k] else 0.0
            v, _ = weighted_average(v, self.total_weights[k])
            global_dict[k] = v
        return global_dict


def avg_dist_dict(keys, dictionary) -> Dict[str, float]:
    """Distributed mean of per-sample metric lists (util.py:266-275)."""
    avg = {}
    for m in keys:
        v = dictionary[m]
        local = float(np.mean(v)) if len(v) > 0 else 0.0
        avg[m] = weighted_average(local, len(v))[0]
    return avg
