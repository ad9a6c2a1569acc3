"""Attention ops.

`dot_product_attention` is the reference-semantics implementation (softmax in fp32,
additive bias; no 1/sqrt(d) scaling — T5 absorbs it into init, BERT callers pre-scale
the queries). On TPU the encoder/decoder hot paths swap in the Pallas flash-attention
kernel from `atlas_tpu.ops.flash` (see models/t5.py:_use_flash for the dispatch); this
module is the always-correct fallback and the capture path (FiD cross-attention score
capture needs the materialized probabilities: /root/reference/src/fid.py:335-341).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def make_attention_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, Lk) boolean/int mask -> additive (B, 1, 1, Lk) bias of 0 / NEG_INF."""
    return jnp.where(mask[:, None, None, :].astype(bool), 0.0, NEG_INF).astype(dtype)


def make_causal_bias(length: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, 1, L, L) additive causal bias."""
    idx = jnp.arange(length)
    causal = idx[:, None] >= idx[None, :]
    return jnp.where(causal, 0.0, NEG_INF).astype(dtype)[None, None]


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    return_stats: bool = False,
):
    """q (B,H,Lq,Dh) x k,v (B,H,Lk,Dh) -> (B,H,Lq,Dh).

    bias broadcastable to (B,H,Lq,Lk); added to raw scores (T5 position bias + mask).
    With return_stats, also returns head-averaged (scores, probs, vnorm-weighted probs)
    used for retriever distillation (fid.py:335-341).
    """
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)

    stats = None
    if return_stats:
        vnorm = jnp.linalg.norm(v.astype(jnp.float32), axis=-1)  # (B,H,Lk)
        stats = (
            scores.mean(axis=1),  # (B,Lq,Lk)
            probs.mean(axis=1),
            (vnorm[:, :, None, :] * probs).mean(axis=1),
        )

    probs = probs.astype(q.dtype)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)

    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(q.dtype))
    if return_stats:
        return out, stats
    return out
