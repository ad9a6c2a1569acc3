"""Pallas PQ ADC kernel: fused decode-transposed + MXU scoring.

Fills the performance role of faiss-gpu's IVFPQ scan (/root/reference/src/index.py:
302-345). The XLA decode-and-matmul path (index/quantize.py:pq_decode) is gather-bound
on TPU — 517 ms per 1M x 768 rows vs 3.6 ms for the flat scan — because XLA lowers the
codebook gather to scalar loads.

TPU-native formulation built on Mosaic's `tpu.dynamic_gather` (the lowering of
jnp.take_along_axis when indices.shape == operand.shape and the gather dimension fits
one 128-lane vreg):

- Codebooks are pre-transposed to (M*dsub_pad, 256) and split into two 128-wide
  halves (the vreg limit), resident in VMEM.
- Per 128-row code block and subspace m, ONE two-half gather produces the
  reconstruction TRANSPOSED — a (dsub_pad, 128) tile written at 8-aligned rows of a
  (M*dsub_pad, R) scratch. Decode cost is independent of the query batch.
- The block's scores are then a single MXU matmul: q_packed (B, M*dsub_pad) @ recT.

q is "packed" to the padded-subspace layout (zeros in pad rows), so the matmul equals
q . decode(codes) exactly — recall is identical to the decode-and-matmul path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KSUB = 128 * 2  # 8-bit PQ (BITS_PER_CODE=8, index.py:29): two 128-lane table halves
_ROWS = 512  # code rows per grid step


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(M: int, dsub_p: int, rows: int):
    def kernel(q_ref, lo_ref, hi_ref, c_ref, o_ref, rec_ref):
        for m in range(M):
            lo = lo_ref[m * dsub_p : (m + 1) * dsub_p, :]  # (dsub_p, 128)
            hi = hi_ref[m * dsub_p : (m + 1) * dsub_p, :]
            for s in range(rows // 128):
                c = c_ref[m : m + 1, s * 128 : (s + 1) * 128].astype(jnp.int32)
                idx = jnp.broadcast_to(c, (dsub_p, 128))
                in_lo = idx < 128
                idx_f = jnp.where(in_lo, idx, idx - 128)
                g = jnp.where(
                    in_lo,
                    jnp.take_along_axis(lo, idx_f, axis=1),
                    jnp.take_along_axis(hi, idx_f, axis=1),
                )
                rec_ref[m * dsub_p : (m + 1) * dsub_p, s * 128 : (s + 1) * 128] = g
        o_ref[:] = jax.lax.dot_general(
            q_ref[:],
            rec_ref[:].astype(q_ref.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def pq_adc_scores(
    queries: jnp.ndarray,  # (B, d)
    codebooks: jnp.ndarray,  # (M, 256, dsub) fp32
    codes: jnp.ndarray,  # (N, M) uint8
    interpret=None,
) -> jnp.ndarray:
    """-> (B, N) fp32 inner-product scores against the PQ reconstructions."""
    B, d = queries.shape
    M, ksub, dsub = codebooks.shape
    assert ksub == KSUB, f"8-bit PQ expected (ksub=256), got {ksub}"
    N = codes.shape[0]
    dsub_p = _ceil_to(dsub, 8)
    MP = M * dsub_p
    Bp = _ceil_to(B, 8)
    Np = _ceil_to(max(N, _ROWS), _ROWS)

    # codebooks -> transposed, dsub-padded, split into 128-wide halves
    cbt = jnp.transpose(codebooks, (0, 2, 1)).astype(jnp.float32)  # (M, dsub, 256)
    cbt = jnp.pad(cbt, ((0, 0), (0, dsub_p - dsub), (0, 0))).reshape(MP, KSUB)
    lo, hi = cbt[:, :128], cbt[:, 128:]

    # queries -> packed layout matching the padded reconstruction rows
    qs = queries[:, : M * dsub].astype(jnp.float32).reshape(B, M, dsub)
    qs = jnp.pad(qs, ((0, Bp - B), (0, 0), (0, dsub_p - dsub))).reshape(Bp, MP)
    qs = qs.astype(jnp.bfloat16)

    codes_t = jnp.pad(codes, ((0, Np - N), (0, 0))).T  # (M, Np)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _make_kernel(M, dsub_p, _ROWS),
        grid=(Np // _ROWS,),
        in_specs=[
            pl.BlockSpec((Bp, MP), lambda i: (0, 0)),
            pl.BlockSpec((MP, 128), lambda i: (0, 0)),
            pl.BlockSpec((MP, 128), lambda i: (0, 0)),
            pl.BlockSpec((M, _ROWS), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((Bp, _ROWS), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((Bp, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((MP, _ROWS), jnp.float32)],
        interpret=bool(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * MP * Np + 8 * MP * Np,
            bytes_accessed=M * Np + Bp * Np * 4,
            transcendentals=0,
        ),
    )(qs, lo, hi, codes_t)
    return out[:B, :N]


# ------------------------------------------------------- sparse (IVF posting lists)


def _make_sparse_kernel(M: int, dsub_p: int, R: int):
    def kernel(ids_ref, q_ref, lo_ref, hi_ref, c_ref, o_ref, rec_ref):
        # q (1, 8, MP) sublane-replicated (see ops/ivf_sparse.py for why);
        # c (1, M, R) uint8 codes of ONE listed block; same decode-transposed
        # gather as _make_kernel, then a single matvec.
        for m in range(M):
            lo = lo_ref[m * dsub_p : (m + 1) * dsub_p, :]
            hi = hi_ref[m * dsub_p : (m + 1) * dsub_p, :]
            for s in range(R // 128):
                c = c_ref[0, m : m + 1, s * 128 : (s + 1) * 128].astype(jnp.int32)
                idx = jnp.broadcast_to(c, (dsub_p, 128))
                in_lo = idx < 128
                idx_f = jnp.where(in_lo, idx, idx - 128)
                g = jnp.where(
                    in_lo,
                    jnp.take_along_axis(lo, idx_f, axis=1),
                    jnp.take_along_axis(hi, idx_f, axis=1),
                )
                rec_ref[m * dsub_p : (m + 1) * dsub_p, s * 128 : (s + 1) * 128] = g
        o_ref[0, 0, :, :] = jax.lax.dot_general(
            q_ref[0, 0:1, :],
            rec_ref[:].astype(q_ref.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def pq_adc_sparse_scores(
    queries: jnp.ndarray,  # (B, d)
    codebooks: jnp.ndarray,  # (M, 256, dsub) fp32
    code_blocks: jnp.ndarray,  # (NB, M, R) uint8 — cluster-sorted, block-TRANSPOSED
    ids: jnp.ndarray,  # (B, L) int32 block list per query (ops/ivf_sparse contract)
    interpret=None,
) -> jnp.ndarray:
    """-> (B, L, R) fp32 ADC scores for every row of every listed PQ block.

    The sparse-IVF analogue of pq_adc_scores: scalar-prefetched block indices pick
    which 16KB code blocks stream through VMEM (cost ∝ probed rows — at 24-48x
    compression the DMA is trivial and the step cost is gather+matvec bound).
    """
    B, d = queries.shape
    M, ksub, dsub = codebooks.shape
    assert ksub == KSUB, f"8-bit PQ expected (ksub=256), got {ksub}"
    NB, m2, R = code_blocks.shape
    assert m2 == M and R % 128 == 0, (m2, M, R)
    L = ids.shape[1]
    dsub_p = _ceil_to(dsub, 8)
    MP = M * dsub_p

    cbt = jnp.transpose(codebooks, (0, 2, 1)).astype(jnp.float32)  # (M, dsub, 256)
    cbt = jnp.pad(cbt, ((0, 0), (0, dsub_p - dsub), (0, 0))).reshape(MP, KSUB)
    lo, hi = cbt[:, :128], cbt[:, 128:]

    qs = queries[:, : M * dsub].astype(jnp.float32).reshape(B, M, dsub)
    qs = jnp.pad(qs, ((0, 0), (0, 0), (0, dsub_p - dsub))).reshape(B, MP)
    qs = jnp.broadcast_to(qs.astype(jnp.bfloat16)[:, None, :], (B, 8, MP))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    from jax.experimental.pallas import tpu as pltpu_

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, L),
        in_specs=[
            pl.BlockSpec((1, 8, MP), lambda b, l, ids: (b, 0, 0)),
            pl.BlockSpec((MP, 128), lambda b, l, ids: (0, 0)),
            pl.BlockSpec((MP, 128), lambda b, l, ids: (0, 0)),
            pl.BlockSpec((1, M, R), lambda b, l, ids: (ids[b, l], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, R), lambda b, l, ids: (b, l, 0, 0)),
        scratch_shapes=[pltpu.VMEM((MP, R), jnp.float32)],
    )
    out = pl.pallas_call(
        _make_sparse_kernel(M, dsub_p, R),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, L, 1, R), jnp.float32),
        interpret=bool(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * MP * R + 8 * B * L * MP * R // dsub_p,
            bytes_accessed=B * L * M * R + B * L * R * 4,
            transcendentals=0,
        ),
    )(ids.astype(jnp.int32), qs, lo, hi, code_blocks)
    return out.reshape(B, L, R)
