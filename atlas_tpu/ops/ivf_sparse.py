"""Scalar-prefetch Pallas kernel for sparse IVF probing.

Fills the cost model of faiss's IVF posting-list scan (/root/reference/src/index.py:
207-219): with nprobe << nlist, the work done is proportional to the rows in the
probed clusters, not the corpus. The XLA masked-scan path in index/approx.py keeps
exact list semantics but still streams every row; this kernel only DMAs the blocks
of the probed clusters.

Layout contract (built by DistributedApproxIndex._build_ivf_layout): rows are sorted
by coarse cluster and padded so no 128-row block straddles two clusters. The kernel
receives, per query, a flat list of block indices (its probed clusters' blocks,
padded); PrefetchScalarGridSpec makes the list available before the body runs, so
each grid step DMAs exactly one listed (R, D) block from HBM and scores it with one
MXU matvec. HBM traffic = B * nprobe * avg_cluster_rows * D bytes — the sparse cost
model — vs the full shard per batch for the masked scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 128  # rows per block: one output vreg lane-dim; clusters pad to multiples of R


def _kernel(ids_ref, q_ref, x_ref, o_ref):
    # q (1, D), x (1, R, D) -> scores (1, 1, R)
    x = x_ref[0]
    s = jax.lax.dot_general(
        x, q_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (R, 1)
    o_ref[0, 0, :] = s[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def ivf_sparse_scores(
    queries: jnp.ndarray,  # (B, D) — pre-scaled for SQ modes
    x_blocks: jnp.ndarray,  # (NB, R, D) cluster-sorted row blocks
    ids: jnp.ndarray,  # (B, L) int32 block indices into x_blocks (dupes allowed)
    interpret=None,
) -> jnp.ndarray:
    """-> (B, L, R) fp32 inner products q . x for every row of every listed block.

    Validity (padded rows inside blocks, padded entries in the block list) is the
    caller's to mask — the kernel is a pure gather-and-score.
    """
    B, D = queries.shape
    NB, r, _ = x_blocks.shape
    assert r == R, (r, R)
    L = ids.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, L),
        in_specs=[
            pl.BlockSpec((1, D), lambda b, l, ids: (b, 0)),
            pl.BlockSpec((1, R, D), lambda b, l, ids: (ids[b, l], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, R), lambda b, l, ids: (b, l, 0)),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, L, R), jnp.float32),
        interpret=bool(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * R * D,
            bytes_accessed=B * L * R * D * x_blocks.dtype.itemsize,
            transcendentals=0,
        ),
    )(ids.astype(jnp.int32), queries, x_blocks)
