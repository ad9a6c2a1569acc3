"""Fused exact-MIPS scan + top-k.

The reference's local index scan materializes the full (B, N_shard) fp16 score matrix
then runs topk (/root/reference/src/index.py:117-119). On TPU that wastes HBM
bandwidth: the score matrix (B x 1M fp32 = 256MB at B=64) is written and re-read.
`mips_topk` streams the corpus in row chunks with a lax.scan — each chunk's scores
live only as a fused matmul+top_k intermediate — and merges a running top-k, so HBM
traffic approaches the one mandatory read of the embedding matrix (the roofline).

k and chunk are static; padding rows (beyond n_valid) are masked to -inf.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG = -1.0e30


@functools.partial(jax.jit, static_argnames=("k", "chunk", "recall_target"))
def mips_topk(
    queries: jnp.ndarray,  # (B, D) any float dtype
    embeddings: jnp.ndarray,  # (N, D) storage dtype (bf16 on TPU)
    k: int,
    n_valid: Optional[jnp.ndarray] = None,  # scalar; rows >= n_valid are padding
    chunk: int = 131072,
    recall_target: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (scores (B,k) fp32, indices (B,k) int32), inner-product top-k.

    recall_target=1.0 is exact (lax.top_k). recall_target<1 uses the TPU's
    PartialReduce op (lax.approx_max_k) for the per-chunk selection — ~20-30x faster
    than the sort-based exact top-k on v5e at 1M rows (measured: 24ms -> 5ms total)
    at >=recall_target per chunk. The cross-chunk merge stays exact.
    """
    N, D = embeddings.shape
    B = queries.shape[0]
    k = min(k, N)
    chunk = min(max(chunk, k), N)  # each chunk must yield k candidates
    nchunks = -(-N // chunk)
    pad = nchunks * chunk - N
    if pad:
        embeddings = jnp.pad(embeddings, ((0, pad), (0, 0)))
    if n_valid is None:
        n_valid = jnp.int32(N)
    q = queries.astype(embeddings.dtype)

    emb_chunks = embeddings.reshape(nchunks, chunk, D)
    kk = min(k, chunk)

    def select(s):
        if recall_target >= 1.0:
            return jax.lax.top_k(s, kk)
        return jax.lax.approx_max_k(s, kk, recall_target=recall_target,
                                    aggregate_to_topk=True)

    def body(carry, xs):
        vals, idx = carry  # (B, k) running top-k
        i, e = xs  # chunk index, (chunk, D)
        s = jax.lax.dot_general(
            q, e, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, chunk)
        gids = i * chunk + jnp.arange(chunk, dtype=jnp.int32)
        s = jnp.where(gids[None, :] < n_valid, s, NEG)
        cv, ci = select(s)
        ci = gids[0] + ci.astype(jnp.int32)
        allv = jnp.concatenate([vals, cv], axis=1)
        alli = jnp.concatenate([idx, ci], axis=1)
        nv, np_ = jax.lax.top_k(allv, k)
        ni = jnp.take_along_axis(alli, np_, axis=1)
        return (nv, ni), None

    init = (jnp.full((B, k), NEG, dtype=jnp.float32), jnp.zeros((B, k), dtype=jnp.int32))
    (vals, idx), _ = jax.lax.scan(
        body, init, (jnp.arange(nchunks, dtype=jnp.int32), emb_chunks)
    )
    return vals, idx
