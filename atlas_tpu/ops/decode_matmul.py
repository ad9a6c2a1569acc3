"""Streaming small-M matmul kernels for the incremental decode step.

At decode time (B of ~8-32 tokens) every matmul is memory-bound: the weight read
dwarfs the activation. Measured on v5e (t5-base FiD decode, B=8): XLA streams the
49MB lm_head at only ~100GB/s effective and the per-layer FFN/projection weights
at ~180GB/s — far under the ~520GB/s a plain Pallas DMA pipeline reaches on this
chip (ops/pallas_mips.py's measured wall). These kernels recover that bandwidth by
blocking the weight's output dimension over a sequential grid, so Mosaic's
automatic block pipeline double-buffers HBM weight DMA against tiny MXU matmuls.

Three entry points, all keeping the activation resident in VMEM:
- stream_matmul:          y = x @ W (or x @ W.T) for a standalone weight (lm_head).
- stream_matmul_stacked:  y = x @ W[l] for scan-over-layers stacked weights; the
  layer index arrives by scalar prefetch so the FULL (nL, K, N) stack is passed
  unsliced (a sliced operand feeding a pallas_call would materialize an HBM->HBM
  copy of the layer's weights every step — XLA can fuse a dynamic-slice into its
  own matmuls but not into an opaque kernel).
- stream_ffn_stacked:     the whole T5 FFN (wi -> act [-> gate] -> wo) fused in one
  kernel, blocked over d_ff with an fp32 VMEM accumulator — one kernel call and
  zero intermediate HBM traffic where XLA dispatches 2-3 matmuls.

Reference role: the per-token decode cost HF's generate() pays inside
/root/reference/src/atlas.py:592-636; the step breakdown this attacks is in
CLAUDE.md (lm_head 0.49ms, FFN+projections ~1.1ms of a 4.16ms token).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return bool(interpret)


def _ffn_block(f: int, target: int = 512) -> int:
    """Largest divisor of d_ff that is a multiple of 128 and <= 2*target (the fused
    FFN accumulates across blocks, so a partial last block would fold padding
    garbage into the sum — unlike the masked-write plain matmuls)."""
    best = f  # single-step fallback for tiny test dims
    for cand in range(128, min(f, 2 * target) + 1, 128):
        if f % cand == 0:
            best = cand
    return best


# ------------------------------------------------------------------ plain matmul


def _matmul_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


def _matmul_t_kernel(x_ref, w_ref, o_ref):
    # w block is (BLK_N, K) rows of the (N, K) weight; contract K with K
    o_ref[:] = jax.lax.dot_general(
        x_ref[:],
        w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("transpose_w", "block_n", "out_dtype", "interpret")
)
def stream_matmul(
    x: jnp.ndarray,  # (M, K), M small
    w: jnp.ndarray,  # (K, N), or (N, K) with transpose_w
    transpose_w: bool = False,
    block_n: int = 1024,
    out_dtype=None,
    interpret=None,
) -> jnp.ndarray:
    """-> (M, N) = x @ w (resp. x @ w.T), fp32 MXU accumulation, weight streamed
    through a double-buffered block pipeline. Partial last blocks are safe: the
    write-back is masked, garbage only lands in discarded columns."""
    M, K = x.shape
    N = w.shape[0] if transpose_w else w.shape[1]
    out_dtype = out_dtype or x.dtype
    grid = (pl.cdiv(N, block_n),)
    if transpose_w:
        w_spec = pl.BlockSpec((block_n, K), lambda j: (j, 0))
        kernel = _matmul_t_kernel
    else:
        w_spec = pl.BlockSpec((K, block_n), lambda j: (0, j))
        kernel = _matmul_kernel
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((M, K), lambda j: (0, 0)), w_spec],
        out_specs=pl.BlockSpec((M, block_n), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        interpret=_interpret_default(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=K * N * w.dtype.itemsize + M * K * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, w)


# ---------------------------------------------------------------- stacked matmul


def _matmul_stacked_kernel(lidx_ref, x_ref, w_ref, o_ref):
    del lidx_ref  # consumed by the index_map
    o_ref[:] = jnp.dot(
        x_ref[:], w_ref[0], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "out_dtype", "interpret"))
def stream_matmul_stacked(
    x: jnp.ndarray,  # (M, K)
    w: jnp.ndarray,  # (nL, K, N) — the FULL layer stack, unsliced
    layer_idx: jnp.ndarray,  # () or (1,) int32
    block_n: int = 1024,
    out_dtype=None,
    interpret=None,
) -> jnp.ndarray:
    """-> (M, N) = x @ w[layer_idx]. The layer index is scalar-prefetched so block
    DMA reads row `layer_idx` of the stack straight from HBM."""
    M, K = x.shape
    N = w.shape[2]
    out_dtype = out_dtype or x.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(N, block_n),),
        in_specs=[
            pl.BlockSpec((M, K), lambda j, lidx: (0, 0)),
            pl.BlockSpec((1, K, block_n), lambda j, lidx: (lidx[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda j, lidx: (0, j)),
    )
    return pl.pallas_call(
        _matmul_stacked_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        interpret=_interpret_default(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=K * N * w.dtype.itemsize + M * K * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), x, w)


# -------------------------------------------------------------------- fused FFN


def _ffn_relu_kernel(lidx_ref, x_ref, wi_ref, wo_ref, o_ref, acc_ref):
    del lidx_ref
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    h = jnp.dot(x_ref[:], wi_ref[0], preferred_element_type=jnp.float32)
    h = jnp.maximum(h, 0.0).astype(x_ref.dtype)  # cast matches _ffn_apply's
    acc_ref[:] += jnp.dot(h, wo_ref[0], preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _ffn_gated_kernel(lidx_ref, x_ref, wi0_ref, wi1_ref, wo_ref, o_ref, acc_ref):
    del lidx_ref
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    h0 = jnp.dot(x_ref[:], wi0_ref[0], preferred_element_type=jnp.float32)
    h1 = jnp.dot(x_ref[:], wi1_ref[0], preferred_element_type=jnp.float32)
    h = (jax.nn.gelu(h0, approximate=True) * h1).astype(x_ref.dtype)
    acc_ref[:] += jnp.dot(h, wo_ref[0], preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("gated", "out_dtype", "interpret"))
def stream_ffn_stacked(
    x: jnp.ndarray,  # (M, D)
    wi: jnp.ndarray,  # (nL, D, F) — wi_0 when gated
    wo: jnp.ndarray,  # (nL, F, D)
    layer_idx: jnp.ndarray,
    wi1: jnp.ndarray = None,  # (nL, D, F) when gated
    gated: bool = False,
    out_dtype=None,
    interpret=None,
) -> jnp.ndarray:
    """-> (M, D) = act(x @ wi[l]) [* (x @ wi1[l])] @ wo[l], blocked over d_ff with
    an fp32 VMEM accumulator. The hidden activations never touch HBM; both weight
    streams ride the same block pipeline. Blocks must divide d_ff exactly (the
    accumulation would otherwise fold padding garbage), hence _ffn_block."""
    M, D = x.shape
    nL, _, F = wi.shape
    out_dtype = out_dtype or x.dtype
    blk = _ffn_block(F)
    in_specs = [
        pl.BlockSpec((M, D), lambda j, lidx: (0, 0)),
        pl.BlockSpec((1, D, blk), lambda j, lidx: (lidx[0], 0, j)),
    ]
    operands = [x, wi]
    if gated:
        in_specs.append(pl.BlockSpec((1, D, blk), lambda j, lidx: (lidx[0], 0, j)))
        operands.append(wi1)
        kernel = _ffn_gated_kernel
        n_wi = 2
    else:
        kernel = _ffn_relu_kernel
        n_wi = 1
    in_specs.append(pl.BlockSpec((1, blk, D), lambda j, lidx: (lidx[0], j, 0)))
    operands.append(wo)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(F // blk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((M, D), lambda j, lidx: (0, 0)),
        scratch_shapes=[pltpu.VMEM((M, D), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, D), out_dtype),
        interpret=_interpret_default(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * F * D * (1 + n_wi),
            bytes_accessed=(1 + n_wi) * D * F * wi.dtype.itemsize,
            transcendentals=M * F if gated else 0,
        ),
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), *operands)
