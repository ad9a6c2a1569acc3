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

R = 512  # rows per block; clusters pad to multiples of R. Larger blocks amortize
# the ~0.6us per-grid-step cost at the price of more per-cluster padding
# (measured at 1M x 768, nprobe=16, B=8: R=256 -> 2.80ms, 512 -> 2.48ms,
# 1024 -> 2.45ms, 2048 -> 2.94ms; 512 also wins at nprobe=64).

C = 1  # blocks fetched per grid step: the same x_blocks operand is bound C times
# with index maps ids[b, l*C+c], so Mosaic keeps C block DMAs in flight per step.
# Measured on v5e (1M x 768, B=8, R=512, masked-vs-sparse bench shapes): at the
# nprobe=16 serving point C=2 REGRESSES (4.98 -> 8.28ms; C=4 7.92ms) — the wider
# (1, C*R) output block and duplicate operand bindings cost more than the saved
# grid steps — while at nprobe=64 C=2 wins (13.70 -> 10.95ms), where the longer
# list keeps the deeper pipeline fed. Default 1; blocks_per_step stays a knob
# for high-nprobe configurations.


def _make_kernel(n_blocks: int):
    def kernel(ids_ref, q_ref, *refs):
        # q block (1, 8, D): queries arrive sublane-replicated x8 because TPU
        # blocks need an 8-aligned sublane dim and Mosaic cannot prove a dynamic
        # single-row load aligned; row 0 is a static read. Each x ref is one
        # (1, R, D) listed block -> scores (1, 1, C, R)
        o_ref = refs[-1]
        q = q_ref[0, 0:1, :].astype(jnp.float32)  # (1, D)
        for c in range(n_blocks):
            x = refs[c][0]
            if x.dtype == jnp.uint8:
                # Mosaic has NO unsigned->float cast lowering (raises
                # "Unsupported cast: uint8 -> float32" at compile; interpret
                # mode accepts it, so CPU tests can't catch this) — widen to
                # int32 first. Hit by the ivfsq8/ivfsq sparse paths, whose
                # blocks are raw uint8 SQ codes.
                x = x.astype(jnp.int32)
            x = x.astype(jnp.float32)
            # VPU multiply-reduce, not an MXU dot: the (R, D)x(D, 1) matvec is
            # DMA-bound (196KB block read per ~0.1MFLOP), and Mosaic's mixed-dtype
            # matvec lowering miscompiles (vector.broadcast bf16->f32 verifier
            # error), so cast explicitly
            o_ref[0, 0, c, :] = jnp.sum(x * q, axis=1)  # (R,)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "blocks_per_step"))
def ivf_sparse_scores(
    queries: jnp.ndarray,  # (B, D) — pre-scaled for SQ modes
    x_blocks: jnp.ndarray,  # (NB, R, D) cluster-sorted row blocks
    ids: jnp.ndarray,  # (B, L) int32 block indices into x_blocks (dupes allowed)
    interpret=None,
    blocks_per_step: int = C,
) -> jnp.ndarray:
    """-> (B, L, R) fp32 inner products q . x for every row of every listed block.

    Validity (padded rows inside blocks, padded entries in the block list) is the
    caller's to mask — the kernel is a pure gather-and-score. The list is padded
    internally to a multiple of blocks_per_step with block 0 (scores discarded).
    """
    B, D = queries.shape
    NB, r, _ = x_blocks.shape
    assert r % 128 == 0, r  # lane-dim alignment of the (1,1,C,r) output block
    L = ids.shape[1]
    c = max(1, min(blocks_per_step, L))
    Lp = -(-L // c) * c
    if Lp != L:
        ids = jnp.pad(ids, ((0, 0), (0, Lp - L)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def x_spec(ci):
        return pl.BlockSpec((1, r, D), lambda b, l, ids, ci=ci: (ids[b, l * c + ci], 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Lp // c),
        in_specs=[pl.BlockSpec((1, 8, D), lambda b, l, ids: (b, 0, 0))]
        + [x_spec(ci) for ci in range(c)],
        # (B, Lp//c, c, R) so the block's trailing (c, R) EQUALS the array's
        # trailing dims — TPU blocks must be (8, 128)-aligned or whole-dim
        out_specs=pl.BlockSpec((1, 1, c, r), lambda b, l, ids: (b, l, 0, 0)),
    )
    out = pl.pallas_call(
        _make_kernel(c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Lp // c, c, r), jnp.float32),
        interpret=bool(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Lp * r * D,
            bytes_accessed=B * Lp * r * D * x_blocks.dtype.itemsize,
            transcendentals=0,
        ),
    )(ids.astype(jnp.int32),
      jnp.broadcast_to(queries[:, None, :], (B, 8, D)),
      *([x_blocks] * c))
    return out.reshape(B, Lp, r)[:, :L]
