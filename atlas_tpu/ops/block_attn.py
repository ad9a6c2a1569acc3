"""Single-block attention for short deterministic forwards (refresh embed).

At the refresh operating point (bert-base, L=192, B=512) the whole per-(batch,
head) attention fits in VMEM, so there is nothing for an online-softmax flash
pipeline to stream — and flash measured 0.66x XLA there (ops/flash.py notes).
But the XLA path still materializes the (B, H, L, L) score AND prob tensors in
HBM (~450MB each per layer at that shape). This kernel does the whole
softmax(q kᵀ + bias) v for ALL heads of one batch row in VMEM per grid step:
scores never leave the chip, one kernel dispatch per row instead of per
(row, head), fp32 softmax statistics like the fallback.

Forward-only by design (the training path keeps flash/XLA with their vjps);
dispatch via block_attn_wins mirrors flash_wins. Reference role: the
score-materializing BertSelfAttention matmuls (/root/reference/src/
modeling_bert.py:250-352).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e9
L_MAX = 256  # whole-length block: (H, L, L) fp32 scores must fit VMEM


def block_attn_wins(impl: str, lq: int, lk: int, heads: int,
                    deterministic: bool) -> bool:
    """"block" engages the kernel explicitly; "auto" never does. MEASURED AND
    CLOSED (chip A/B, tools/bench_refresh_ffn.py, bert-base B=512 L=192
    fwd-only): 326.7ms vs 286.8 XLA = 0.878x — the per-batch-row grid with an
    in-kernel head loop loses to XLA's batched attention at this shape despite
    avoiding the HBM score round-trip (same verdict as flash fwd-only at
    L<=256, ops/flash.py). Kept as a tested, explicitly-selectable kernel;
    re-gate only with new same-process evidence."""
    if impl == "block":
        if not deterministic:
            # Forward-only kernel: no dropout and no VJP. Fail at dispatch with
            # a policy message instead of a downstream pallas_call grad error.
            raise ValueError(
                "attn_impl='block' is a forward-only kernel (no attention "
                "dropout, no VJP) — use 'flash' or 'xla' on training forwards")
        return lq == lk and lq <= L_MAX and heads * lq * lq * 4 <= 8 * 1024 * 1024
    return False


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    H = q_ref.shape[1]
    bias = bias_ref[0].astype(jnp.float32)  # (1, L) key mask row of this batch
    for h in range(H):  # static unroll: one (L, L) softmax per head, all VMEM
        q = q_ref[0, h]
        s = jax.lax.dot_general(
            q, k_ref[0, h], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (L, L)
        s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, h] = jax.lax.dot_general(
            p.astype(q.dtype), v_ref[0, h],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_attention(
    q: jnp.ndarray,  # (B, H, L, Dh) — pre-scaled like the flash path
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,  # (B, L) 1=attend
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """-> (B, H, L, Dh) softmax(q kᵀ + mask) v, scores VMEM-only."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, L, Dh = q.shape
    pad = (-L) % 8  # sublane alignment for the (L, Dh) blocks
    if pad:
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        mask = (jnp.pad(jnp.ones((B, L), q.dtype), ((0, 0), (0, pad)))
                if kv_mask is None else jnp.pad(kv_mask, ((0, 0), (0, pad))))
    else:
        qp, kp, vp = q, k, v
        mask = jnp.ones((B, L), q.dtype) if kv_mask is None else kv_mask
    Lp = L + pad
    bias = jnp.where(mask > 0, 0.0, NEG_INF).astype(jnp.float32) if (
        kv_mask is not None or pad) else jnp.zeros((B, Lp), jnp.float32)
    # (B, 1, Lp): Mosaic requires each block's last-2 dims be 8/128-divisible
    # OR equal to the array dims — a (1, Lp) block of a (B, Lp) array is neither
    bias = bias.reshape(B, 1, Lp)

    out = pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Lp, Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, Lp, Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, Lp, Dh), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, Lp), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, Lp, Dh), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Lp, Dh), q.dtype),
        interpret=bool(interpret),
    )(qp, kp, vp, bias)
    return out[:, :, :L] if pad else out
