"""Fused transformer FFN (matmul -> exact GELU -> matmul) in one Pallas call.

The XLA path materializes the (tokens, intermediate) activation in HBM between
the two matmuls — at the refresh embed shape (B=512, L=192, bert-base) that is
a 604MB bf16 write + read per layer, ~1.2GB/layer of pure HBM traffic for a
tensor that is consumed immediately. This kernel tiles the token axis and keeps
the intermediate in VMEM: per grid step it computes
    o[t] = gelu_exact(x[t] @ w1 + b1) @ w2 + b2
with fp32 accumulation and an fp32 GELU (the XLA fallback's bf16 GELU is
strictly noisier). Both weight operands ride VMEM across all grid steps
(constant index_map blocks), so HBM sees only the mandatory x-in / o-out tiles.

Reference role: BertIntermediate/BertOutput (/root/reference/src/
modeling_bert.py:416-443). Forward-only: the refresh/eval embed path
(deterministic=True) routes here via BertConfig.ffn_impl; the training path
keeps the XLA FFN whose backward XLA already fuses well (and which remat
re-materializes anyway).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM = 256  # token rows per grid step: (TM, F) fp32 intermediate = 3MB at F=3072
_WEIGHT_BUDGET = 12 * 1024 * 1024  # both weight operands stay VMEM-resident


def ffn_fits(hidden: int, intermediate: int, dtype_bytes: int = 2) -> bool:
    """True when both weight matrices fit the VMEM residency budget
    (bert-base 768x3072: 9.4MB yes; bert-large 1024x4096: 16MB no)."""
    return 2 * hidden * intermediate * dtype_bytes <= _WEIGHT_BUDGET


def ffn_wins(impl: str, deterministic: bool, hidden: int, intermediate: int) -> bool:
    """Dispatch policy ("auto" | "fused" | "xla"): fused is forward-only (no
    VJP), so auto engages only on deterministic TPU forwards where the weights
    fit — exactly the refresh embed / eval shapes."""
    if impl == "fused":
        if not ffn_fits(hidden, intermediate):
            raise ValueError(
                f"ffn_impl='fused' keeps both weight matrices VMEM-resident; "
                f"{hidden}x{intermediate} needs "
                f"{2 * hidden * intermediate * 2 / 2**20:.1f}MB > "
                f"{_WEIGHT_BUDGET / 2**20:.0f}MB budget — use 'xla'")
        return True
    if impl != "auto":
        return False
    return (deterministic and jax.default_backend() == "tpu"
            and ffn_fits(hidden, intermediate))


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs error 1.5e-7 — below
    bf16 resolution): Mosaic has no erf lowering, and the tanh-GELU would
    break exact-GELU parity with the HF reference."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    h = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    h = 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))  # exact-GELU to 1.5e-7, fp32
    h = h.astype(x_ref.dtype)
    o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = (o + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ffn_fused(
    x: jnp.ndarray,   # (T, H) compute dtype
    w1: jnp.ndarray,  # (H, F)
    b1: jnp.ndarray,  # (F,)
    w2: jnp.ndarray,  # (F, H)
    b2: jnp.ndarray,  # (H,)
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """-> (T, H) gelu_exact(x @ w1 + b1) @ w2 + b2, intermediate VMEM-only."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, H = x.shape
    F = w1.shape[1]
    pad = (-T) % TM
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    Tp = x.shape[0]
    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    out = pl.pallas_call(
        _ffn_kernel,
        grid=(Tp // TM,),
        in_specs=[
            pl.BlockSpec((TM, H), lambda i: (i, 0)),
            pl.BlockSpec((H, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((F, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TM, H), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Tp, H), x.dtype),
        interpret=bool(interpret),
    )(x, w1, b1.reshape(1, F).astype(x.dtype), w2, b2.reshape(1, H).astype(x.dtype))
    return out[:T] if pad else out
