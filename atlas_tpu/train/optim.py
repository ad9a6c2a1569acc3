"""Optimizers and LR schedules.

Reference: set_optim (/root/reference/src/util.py:167-197) builds AdamWFP32Copy
(fp32 master weights, src/AdamWFP32Copy.py:79-169) per tower with separate lr /
schedules, optionally wrapped in fairscale OSS (ZeRO-1). TPU-native: params are
already fp32 masters (forward casts to bf16), so plain optax.adamw + the reference's
schedule multipliers reproduce the whole construction; optimizer-state sharding falls
out of GSPMD sharding annotations instead of an OSS wrapper.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp
import optax

from atlas_tpu.config import AtlasConfig


def make_schedule(cfg: AtlasConfig, base_lr: float) -> Callable[[int], float]:
    """jnp-traceable step->lr multiplier matching utils/schedules.py (util.py:67-108)."""
    total = cfg.scheduler_steps if cfg.scheduler_steps is not None else cfg.total_steps
    warmup, ratio = cfg.warmup_steps, 0.1
    name = cfg.scheduler

    def f(step):
        s = jnp.asarray(step, dtype=jnp.float32)
        if name == "linear":
            warm = (1 - ratio) * s / max(1, warmup) + ratio
            decay = jnp.maximum(0.0, 1.0 + (ratio - 1) * (s - warmup) / max(1.0, total - warmup))
        elif name == "cosine":
            warm = s / max(1, warmup)
            frac = (s - warmup) / max(1.0, total - warmup)
            decay = ratio + (1.0 - ratio) * jnp.cos(0.5 * jnp.pi * frac)
        elif name == "fixed":
            warm = s / max(1, warmup)
            decay = jnp.asarray(1.0)
        else:
            raise ValueError(f"unknown scheduler {name!r}")
        return base_lr * jnp.where(s < warmup, warm, decay)

    return f


def make_optimizer(cfg: AtlasConfig, base_lr: float) -> optax.GradientTransformation:
    """AdamW with the reference's hyperparameters (betas (0.9, beta2), eps, wd)."""
    return optax.adamw(
        learning_rate=make_schedule(cfg, base_lr),
        b1=0.9,
        b2=cfg.beta2,
        eps=cfg.epsilon,
        weight_decay=cfg.weight_decay,
    )


def make_optimizers(cfg: AtlasConfig) -> Tuple[optax.GradientTransformation, optax.GradientTransformation]:
    """(reader_opt, retriever_opt) with their own base lrs (util.py:179-181)."""
    return make_optimizer(cfg, cfg.lr), make_optimizer(cfg, cfg.lr_retriever)
