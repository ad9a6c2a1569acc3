"""Pallas fused MIPS scan kernel.

The XLA path (ops/mips.py) computes scores = Q @ Eᵀ then reduces with the TPU
PartialReduce op; XLA materializes the (B, N) fp32 score matrix in HBM between the
two (256MB at B=64, N=1M — extra traffic on top of the mandatory 1.5GB corpus read).
This kernel fuses both and hides the corpus reads: the embedding matrix stays in HBM;
each grid step double-buffers (SUB_TILE, D) chunks into VMEM with async DMA, runs the
(B, SUB_TILE) matmul on the MXU while the next chunk streams in, and reduces each
128-lane window to its (max, argmax) on the VPU. Only (B, N/128) winners reach HBM
(2MB at 1M rows). One candidate per 128-row window is the same selection rule
PartialReduce uses, so recall matches the recall_target≈0.99 operating point.

mips_topk_pallas = kernel + tiny lax.top_k over the (B, N/128) winners.

Measured (v5e, 1M x 768 bf16, k=100, B=64): 3.82ms at the 6-deep pipeline below —
exact parity with the XLA matmul+PartialReduce path (3.82ms), both ~0.9ms over the
pure-DMA stream wall (2.96ms = 519 GB/s measured, well under the 819 GB/s spec).
A measured sweep: 2-deep/2048-row = 4.22ms, 3-deep/2048 = 3.85ms, 6-deep/1024 =
3.82ms, argmax costs ~0.24ms, bigger sub-tiles overflow VMEM. Since neither
implementation hides the last µs/step of wait+reduce, ops/mips.py (simpler, fused
by XLA) remains the production default and this kernel documents the explicit
pipeline.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUB_TILE = 1024  # rows DMA'd/matmul'd at a time
N_SUB = 16  # sub-tiles per grid step -> 16384 rows -> a (B, 128) aligned output block
SLOTS = 6  # DMA pipeline depth (VMEM: SLOTS x SUB_TILE x D bf16 buffers = 9MB at D=768)
MAJOR = SUB_TILE * N_SUB
NEG = -1.0e30


def _mips_kernel(q_ref, e_hbm, vals_ref, idx_ref, buf, sems):
    i = pl.program_id(0)
    B = q_ref.shape[0]
    q = q_ref[:]

    def dma(slot, sub):
        rows = (i * N_SUB + sub) * SUB_TILE
        return pltpu.make_async_copy(
            e_hbm.at[pl.ds(rows, SUB_TILE), :], buf.at[slot], sems.at[slot]
        )

    for s0 in range(min(SLOTS - 1, N_SUB)):  # fill the pipeline
        dma(s0 % SLOTS, s0).start()
    v_parts, l_parts = [], []
    for sub in range(N_SUB):  # static unroll: all offsets compile-time constants
        slot = sub % SLOTS
        nxt = sub + SLOTS - 1
        if nxt < N_SUB:
            dma(nxt % SLOTS, nxt).start()
        dma(slot, sub).wait()
        e = buf[slot]
        if e.dtype == jnp.uint8:
            # uint8 SQ codes: DMA'd at 1 byte/element (half the HBM traffic of
            # bf16), re-biased to int8 IN REGISTER (xor 0x80 = subtract 128 in
            # two's complement) for the mixed-dtype MXU dot. The +128 offset is
            # a per-query constant, restored on the selected winners in the
            # wrapper (order-invariant within a query). Measured at 1M x 768
            # B=64 on v5e: 4.85ms (a VPU u8->i32->bf16 widen: 4.94ms) vs 3.82ms
            # for the bf16 corpus — the sub-word operand's lowering costs more
            # than the byte-stream DMA saves, so the XLA sq8 scan stays the
            # production default (index/approx.py sq8_impl).
            e = (e ^ 0x80).view(jnp.int8)
        elif e.dtype != q.dtype:
            e = e.astype(q.dtype)
        s = jax.lax.dot_general(
            q, e,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, SUB_TILE)
        win = s.reshape(B, SUB_TILE // LANES, LANES)
        v_parts.append(jnp.max(win, axis=-1))
        base = (i * N_SUB + sub) * SUB_TILE
        offs = jax.lax.broadcasted_iota(jnp.int32, (B, SUB_TILE // LANES), 1) * LANES
        l_parts.append(base + offs + jnp.argmax(win, axis=-1).astype(jnp.int32))

    vals_ref[:] = jnp.concatenate(v_parts, axis=1)  # (B, 128) single aligned store
    idx_ref[:] = jnp.concatenate(l_parts, axis=1)


B_MAX = 128  # per-kernel query batch: the (B, n_win) f32+i32 winner outputs are
# staged through scoped VMEM (16MB limit on v5e — B=256 at 1M rows compiles to a
# 23.7MB stack allocation and fails); larger batches split and concatenate.


def _split_batch(fn, queries, k):
    parts = [fn(queries[s : s + B_MAX]) for s in range(0, queries.shape[0], B_MAX)]
    return (jnp.concatenate([p[0] for p in parts], axis=0),
            jnp.concatenate([p[1] for p in parts], axis=0))


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def mips_topk_pallas(
    queries: jnp.ndarray,  # (B, D)
    embeddings: jnp.ndarray,  # (N, D) bf16
    k: int,
    n_valid: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (scores (B,k) fp32, indices (B,k) int32)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if queries.shape[0] > B_MAX:
        return _split_batch(
            lambda q: mips_topk_pallas(q, embeddings, k, n_valid, interpret),
            queries, k)
    N, D = embeddings.shape
    B = queries.shape[0]
    pad = (-N) % MAJOR
    if n_valid is None:
        n_valid = jnp.int32(N)
    if pad:
        embeddings = jnp.pad(embeddings, ((0, pad), (0, 0)))
        N = N + pad
    n_major = N // MAJOR
    n_win = N // LANES
    # integer corpora (sq8 codes) keep the query in the caller's compute dtype;
    # the kernel casts each streamed block to match instead
    q = queries if jnp.issubdtype(embeddings.dtype, jnp.integer) else queries.astype(embeddings.dtype)

    vals, idx = pl.pallas_call(
        _mips_kernel,
        grid=(n_major,),
        in_specs=[
            pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # corpus stays in HBM; manual DMA
        ],
        out_specs=[
            pl.BlockSpec((B, MAJOR // LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, MAJOR // LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_win), jnp.float32),
            jax.ShapeDtypeStruct((B, n_win), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SLOTS, SUB_TILE, D), embeddings.dtype),
            pltpu.SemaphoreType.DMA((SLOTS,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(q, embeddings)

    vals = jnp.where(idx < n_valid, vals, NEG)
    k = min(k, n_win)
    top_vals, pos = jax.lax.top_k(vals, k)
    top_idx = jnp.take_along_axis(idx, pos, axis=1)
    if jnp.issubdtype(embeddings.dtype, jnp.integer):
        # restore the uint8 re-bias: q . c_u8 = q . (c_u8 - 128) + 128 * sum(q)
        top_vals = top_vals + 128.0 * jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)
    return top_vals, top_idx


# ------------------------------------------------------- sq8 transposed blocks
#
# The row-major uint8 path above measures 4.85ms at 1M x 768 B=64 — every fresh
# (SUB_TILE, D) byte block pays a VPU relayout to become the transposed MXU
# operand. Pre-transposing the corpus ONCE into (NB, D, SUB_TILE) blocks hands
# the MXU its (K, N) operand directly: measured 2.52ms = 1.23x the XLA sq8 scan
# (3.1ms) and 1.5x the bf16 flat scan, at half the bf16 HBM footprint.
# (The same transposed layout on a bf16 corpus measured only 3.55ms vs 3.82ms
# row-major — the 16-bit operand isn't relayout-bound, so the flat index keeps
# its refresh-writable row-major layout and this trick stays sq8-only.)
#
# Round-3 floor analysis (every claim one-process chip-measured, tools/
# bench_sq8_ablate.py + bench_sq8_sweep.py + bench_sq8_packed.py): the kernel
# sits ON its DMA wall — DMA-only = 1.97ms, full kernel = 2.00ms (matmul and
# selection fully hidden) — and the trailing lax.top_k over the (B, 8192)
# winners added 0.51ms (now 0.3ms via the bf16 two-stage in _winner_topk). The
# wall itself is rate-limited at ~390-450 GB/s (session-dependent) and did NOT
# move under: bigger sub-tiles / deeper slots (flat 2.42-2.77ms across the
# geometry grid), cross-step pipelining (no per-step drain left), int32
# word-packed blocks + in-kernel bitcast (2.52-2.74, neutral — int8-tile DMA
# writes are not the limiter), 2/4/8-way concurrent slice copies (neutral on
# the full kernel), or Mosaic's own BlockSpec pipeliner (autodma 1.92ms =
# same wall). ~2.45ms (26k QPS at B=64, recall@100 0.994) is the practical
# v5e floor for this 768MB stream + exact-ish top-k; further QPS comes from
# batch amortization (B=128 shares one stream), not from this kernel.


def sq8_blocks(codes: jnp.ndarray, sub_tile: int = SUB_TILE) -> jnp.ndarray:
    """(rows, D) uint8 -> (NB, D, sub_tile) transposed PRE-BIASED int8 blocks
    (xor 0x80 = subtract 128 moves the u8->s8 re-bias from the kernel's per-scan
    VPU pass to this one-time build), rows padded to a multiple of MAJOR. Padded
    rows are masked exactly inside the kernel via the n_valid scalar."""
    rows, D = codes.shape
    pad = (-rows) % MAJOR
    if pad:
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
    nb = codes.shape[0] // sub_tile
    codes = (codes ^ 0x80).view(jnp.int8)
    return codes.reshape(nb, sub_tile, D).transpose(0, 2, 1)


def sq8_blocks_packed(codes: jnp.ndarray, sub_tile: int = 4096) -> jnp.ndarray:
    """(rows, D) uint8 -> (NB, D//4, sub_tile) int32 WORD-PACKED transposed
    pre-biased blocks: word [b, i, s] holds contraction rows 4i..4i+3 of block b
    in little-endian byte order, so the kernel's pltpu.bitcast(., int8) yields
    exactly the (D, sub_tile) MXU operand (out[4i+j] = byte j of word[i] — the
    bitcast_p contract). Why: a chip sweep (tools/bench_sq8_sweep.py) showed the
    int8-destination DMA stream rate-limited at ~404 GB/s vs 519 GB/s for
    word-sized elements — int8 VMEM tiles are (32, 128) and byte-granularity
    DMA writes pay the sublane-interleave, so the stream moves int32 words at
    native (8, 128) tiling and the byte unpack happens in-register."""
    rows, D = codes.shape
    assert D % 4 == 0, D
    pad = (-rows) % MAJOR
    if pad:
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
    nb = codes.shape[0] // sub_tile
    blk = (codes ^ 0x80).reshape(nb, sub_tile, D).transpose(0, 2, 1)  # (nb, D, S) u8
    w = blk.reshape(nb, D // 4, 4, sub_tile).astype(jnp.uint32)
    packed = (w[:, :, 0] | (w[:, :, 1] << 8) | (w[:, :, 2] << 16)
              | (w[:, :, 3] << 24))
    return jax.lax.bitcast_convert_type(packed, jnp.int32)


VMEM_BUDGET = 14 * 1024 * 1024  # leave ~2MB of the 16MB scoped-vmem for q/regs


def _auto_slots(n_sub: int, sub_tile: int, d: int, b: int, n_win: int) -> int:
    """Deepest divisor-of-n_sub pipeline UP TO 4 whose corpus buffers fit VMEM
    next to the staged (B, n_win) f32+i32 winner outputs (Mosaic holds them
    whole — the measured B=256 23.7MB overflow in the B_MAX note). The chip
    sweep (tools/bench_sq8_sweep.py) measured depth 8 strictly WORSE than 4
    (1024-row tiles: 3.65ms vs 2.45ms — deeper queues stall the issue path),
    so 4 is a measured cap, not a budget artifact."""
    free = VMEM_BUDGET - 8 * b * n_win
    best = 1
    for s in range(2, min(n_sub, 4) + 1):
        if n_sub % s == 0 and s * sub_tile * d <= free:
            best = s
    return best


def _make_sq8_kernel(sub_tile: int, n_sub: int, slots: int, packed: bool = False,
                     dma_split: int = 1):
    """Strided-window selection: winner w of grid step i is the best row in
    {rows of block i with row % LANES == w}. vs the contiguous-window variant
    (reshape + cross-lane max/argmax, measured 2.52ms at 1M x 768 B=64) every
    reduction here is a lane-aligned vreg slice + elementwise cmp/select — no
    lane shuffles, no argmax op — and padded rows are masked exactly in the
    accumulate (the strided partition would otherwise let a padded row evict a
    valid candidate). Same winners-per-rows rate => same recall operating point.

    The DMA pipeline runs ACROSS grid steps: a chip ablation (tools/
    bench_sq8_ablate.py) showed the kernel sitting exactly on a 1.97ms DMA wall
    = ~1.1us of serialized per-DMA overhead on top of the ~0.94ms HBM line rate
    (768MB @ 819GB/s), with matmul+select fully hidden. Fewer/bigger DMAs and
    no per-grid-step pipeline drain are therefore the whole game: scratch
    buffers persist across grid steps, so step i's tail issues the copies step
    i+1 consumes, and only step 0 pays a pipeline fill. n_sub % slots == 0
    keeps every slot index compile-time static under the global block counter.

    Geometry (sub_tile, n_sub, slots) is a chip-sweepable knob: sub_tile * n_sub
    must equal MAJOR (=LANES^2) so each grid step emits one (B, LANES) winner
    block; VMEM cost is slots * sub_tile * D bytes + the staged (B, N/LANES)
    winner outputs."""
    assert sub_tile * n_sub == MAJOR, (sub_tile, n_sub)
    assert n_sub % slots == 0, (n_sub, slots)

    def kernel(nv_ref, q_ref, e_hbm, vals_ref, idx_ref, buf, sems):
        i = pl.program_id(0)
        nb_total = pl.num_programs(0) * n_sub
        B = q_ref.shape[0]
        q = q_ref[:]
        n_valid = nv_ref[0]
        rows_per_slice = buf.shape[1] // dma_split

        class _SplitCopy:
            """One block copy issued as dma_split concurrent D-slices. A 4-way
            split ran 11% faster in the DMA-ONLY ablation (tools/
            bench_sq8_ablate.py dma vs dma4) but measured NEUTRAL on the full
            kernel (2.485/2.635/2.489/2.587ms at splits 1/2/4/8, one process) —
            the compute already hides the difference. Kept as a sweep knob;
            default 1."""

            def __init__(self, slot, g):
                self.copies = [pltpu.make_async_copy(
                    e_hbm.at[g, pl.ds(j * rows_per_slice, rows_per_slice), :],
                    buf.at[slot, pl.ds(j * rows_per_slice, rows_per_slice), :],
                    sems.at[slot, j]) for j in range(dma_split)]

            def start(self):
                for c in self.copies:
                    c.start()

            def wait(self):
                for c in self.copies:
                    c.wait()

        def dma(slot, g):  # g: global block index (traced)
            if dma_split > 1:
                return _SplitCopy(slot, g)
            return pltpu.make_async_copy(e_hbm.at[g], buf.at[slot],
                                         sems.at[slot, 0])

        @pl.when(i == 0)
        def _fill():  # only grid step 0 pays the pipeline fill
            for s0 in range(min(slots - 1, n_sub)):
                dma(s0, s0).start()

        lane = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 1)
        acc_v = jnp.full((B, LANES), NEG, jnp.float32)
        acc_i = jnp.zeros((B, LANES), jnp.int32)
        for sub in range(n_sub):
            slot = sub % slots
            g = i * n_sub + sub
            nxt_g = g + slots - 1  # lands in the NEXT grid step near the tail

            @pl.when(nxt_g < nb_total)
            def _start():
                dma((sub + slots - 1) % slots, nxt_g).start()

            dma(slot, g).wait()
            # blocks are pre-biased int8 (sq8_blocks), already the (K, N)
            # operand; word-packed blocks (sq8_blocks_packed) unpack in-register
            e = buf[slot]
            if packed:
                e = pltpu.bitcast(e, jnp.int8)
            s = jax.lax.dot_general(
                q, e,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (B, sub_tile)
            rowbase = g * sub_tile + lane  # (B, LANES)
            for c in range(sub_tile // LANES):
                cand = s[:, c * LANES : (c + 1) * LANES]  # vreg col c: free slice
                row = rowbase + c * LANES
                better = (cand > acc_v) & (row < n_valid)
                acc_v = jnp.where(better, cand, acc_v)
                acc_i = jnp.where(better, row, acc_i)

        vals_ref[:] = acc_v
        idx_ref[:] = acc_i

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "interpret", "slots",
                                              "dma_split", "exact_topk"))
def mips_topk_pallas_sq8(
    queries: jnp.ndarray,  # (B, D) compute dtype (pre-scaled by the SQ caller)
    blocks: jnp.ndarray,  # (NB, D, sub_tile) pre-biased int8 from sq8_blocks
    k: int,
    n_valid: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
    slots: int = 0,
    dma_split: int = 1,
    exact_topk: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (scores (B,k) fp32 vs the uint8 values, row indices (B,k) int32).

    slots=0 picks the deepest pipeline that divides n_sub and fits the VMEM
    budget alongside the staged winner outputs (n_sub % slots == 0 is a kernel
    invariant: it keeps slot indices static under cross-step pipelining)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if queries.shape[0] > B_MAX:
        return _split_batch(
            lambda q: mips_topk_pallas_sq8(q, blocks, k, n_valid, interpret,
                                           slots, dma_split, exact_topk),
            queries, k)
    packed = blocks.dtype == jnp.int32
    NB, D, sub_tile = blocks.shape
    if packed:
        D = D * 4  # (NB, D//4, sub_tile) int32 words, 4 contraction rows each
    n_sub = MAJOR // sub_tile
    assert MAJOR % sub_tile == 0 and NB % n_sub == 0, (blocks.shape,)
    B = queries.shape[0]
    N = NB * sub_tile
    if n_valid is None:
        n_valid = jnp.int32(N)
    n_win = N // LANES
    q = queries
    nv = jnp.asarray(n_valid, jnp.int32).reshape(1)
    if slots <= 0:
        slots = _auto_slots(n_sub, sub_tile, D, B, n_win)

    if blocks.shape[1] % dma_split:  # D-slices must tile the buffer evenly
        dma_split = 1
    vals, idx = pl.pallas_call(
        _make_sq8_kernel(sub_tile, n_sub, slots, packed=packed,
                         dma_split=dma_split),
        grid=(NB // n_sub,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n_valid scalar
            pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((B, MAJOR // LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, MAJOR // LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_win), jnp.float32),
            jax.ShapeDtypeStruct((B, n_win), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((slots, D // 4, sub_tile), jnp.int32) if packed
            else pltpu.VMEM((slots, D, sub_tile), jnp.int8),
            pltpu.SemaphoreType.DMA((slots, dma_split)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=bool(interpret),
    )(nv, q, blocks)

    k = min(k, n_win)
    top_vals, pos = _winner_topk(vals, k, exact=exact_topk)
    top_idx = jnp.take_along_axis(idx, pos, axis=1)
    # restore the re-bias: q . c_u8 = q . (c_u8 - 128) + 128 * sum(q)
    top_vals = top_vals + 128.0 * jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)
    return top_vals, top_idx


def _winner_topk(vals: jnp.ndarray, k: int,
                 exact: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact-at-this-operating-point top-k over the (B, n_win) winner scores.

    lax.top_k's fp32 partial sort costs ~0.5ms of the 2.5ms B=64/1M search
    (tools/bench_sq8_ablate.py); a bf16 coarse top-m (half the sort bytes) then
    an fp32 refine among the m survivors measured 0.2ms faster at identical
    recall@100. Only boundary candidates whose bf16 roundings tie across >m-k
    better-indexed rows can differ from exact — beyond the precision the
    window-selection stage already trades away. Callers that need the exact
    fp32 partial sort pass exact=True (exact_topk on mips_topk_pallas_sq8)."""
    n = vals.shape[1]
    m = max(128, 2 * k)
    if exact or k > 112 or m >= n:  # opt-out / slack too thin / nothing to winnow
        return jax.lax.top_k(vals, k)
    _, coarse = jax.lax.top_k(vals.astype(jnp.bfloat16), m)
    vf = jnp.take_along_axis(vals, coarse, axis=1)
    top_vals, p2 = jax.lax.top_k(vf, k)
    return top_vals, jnp.take_along_axis(coarse, p2, axis=1)
