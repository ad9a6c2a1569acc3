#!/usr/bin/env python
"""One-process sq8 kernel ablation on chip: where do the 2.6ms go?

Variants share the production geometry (sub_tile=1024, n_sub=16, slots=6) and
the pre-transposed (NB, D, sub_tile) int8 block layout from sq8_blocks:

  prod    - the production mips_topk_pallas_sq8 (kernel + lax.top_k)
  kernel  - production kernel, no trailing top_k (isolates the top_k cost)
  nosel   - DMA + matmul, selection replaced by a 1-op accumulate per window
  nomm    - DMA + selection on a broadcast pseudo-score (no matmul)
  dma     - DMA only, one (1,128) touch per sub-tile to keep the copies live
  s8q     - full kernel with int8 queries (s8 x s8 MXU, int32 select)

  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/bench_sq8_ablate.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atlas_tpu.ops.pallas_mips import (
    LANES, MAJOR, NEG, SLOTS, SUB_TILE, mips_topk_pallas_sq8, sq8_blocks)

N, D, B, K = 1_000_000, 768, 64, 100
ITERS = 30
N_SUB = MAJOR // SUB_TILE
MODES = sys.argv[1].split(",") if len(sys.argv) > 1 else [
    "prod", "kernel", "nosel", "nomm", "dma", "s8q"]


def make_kernel(mode):
    nsplit = {"dma2": 2, "dma4": 4}.get(mode, 1)

    def kernel(nv_ref, q_ref, e_hbm, vals_ref, idx_ref, buf, sems):
        i = pl.program_id(0)
        q = q_ref[:]
        n_valid = nv_ref[0]

        class _Split:  # one block copy as nsplit concurrent D-slices
            def __init__(self, slot, sub):
                h = D // nsplit
                self.copies = [pltpu.make_async_copy(
                    e_hbm.at[i * N_SUB + sub, pl.ds(j * h, h), :],
                    buf.at[slot, pl.ds(j * h, h), :],
                    sems.at[slot, j]) for j in range(nsplit)]

            def start(self):
                for c in self.copies:
                    c.start()

            def wait(self):
                for c in self.copies:
                    c.wait()

        def dma(slot, sub):
            if nsplit > 1:
                return _Split(slot, sub)
            return pltpu.make_async_copy(
                e_hbm.at[i * N_SUB + sub], buf.at[slot], sems.at[slot, 0])

        for s0 in range(min(SLOTS - 1, N_SUB)):
            dma(s0 % SLOTS, s0).start()
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 1)
        if mode == "s8q":
            acc_v = jnp.full((B, LANES), jnp.iinfo(jnp.int32).min, jnp.int32)
        else:
            acc_v = jnp.full((B, LANES), NEG, jnp.float32)
        acc_i = jnp.zeros((B, LANES), jnp.int32)
        touch = jnp.zeros((1, LANES), jnp.float32)
        for sub in range(N_SUB):
            slot = sub % SLOTS
            nxt = sub + SLOTS - 1
            if nxt < N_SUB:
                dma(nxt % SLOTS, nxt).start()
            dma(slot, sub).wait()
            if mode.startswith("dma"):
                touch = touch + buf[slot][0:1, 0:LANES].astype(jnp.float32)
                continue
            if mode == "nomm":
                s = jnp.broadcast_to(
                    buf[slot][0:1, :].astype(jnp.float32), (B, SUB_TILE))
            else:
                s = jax.lax.dot_general(
                    q, buf[slot],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=(
                        jnp.int32 if mode == "s8q" else jnp.float32),
                )
            if mode == "nosel":
                part = s[:, 0:LANES]
                for c in range(1, SUB_TILE // LANES):
                    part = part + s[:, c * LANES:(c + 1) * LANES]
                acc_v = acc_v + part
                continue
            rowbase = (i * N_SUB + sub) * SUB_TILE + lane
            for c in range(SUB_TILE // LANES):
                cand = s[:, c * LANES:(c + 1) * LANES]
                row = rowbase + c * LANES
                better = (cand > acc_v) & (row < n_valid)
                acc_v = jnp.where(better, cand, acc_v)
                acc_i = jnp.where(better, row, acc_i)

        if mode.startswith("dma"):
            vals_ref[:] = jnp.broadcast_to(touch, (B, LANES))
        elif mode == "s8q":
            vals_ref[:] = acc_v.astype(jnp.float32)
        else:
            vals_ref[:] = acc_v
        idx_ref[:] = acc_i

    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "topk"))
def run_variant(q, blocks, mode, topk=False):
    NB = blocks.shape[0]
    n_win = NB * SUB_TILE // LANES
    nv = jnp.asarray(N, jnp.int32).reshape(1)
    vals, idx = pl.pallas_call(
        make_kernel(mode),
        grid=(NB // N_SUB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
            pltpu.VMEM((SLOTS, D, SUB_TILE), jnp.int8),
            pltpu.SemaphoreType.DMA((SLOTS, 4)),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(nv, q, blocks)
    if topk:
        return jax.lax.top_k(vals, K)
    return vals.sum(), idx[:, :1]


def make_auto_kernel(mode):
    """Corpus streamed by Mosaic's own BlockSpec pipeliner (no manual DMA):
    grid over (D, BLK) blocks, one winner (B, LANES) block per step."""
    BLK = 8192  # rows per grid step: (768, 8192) int8 = 6.3MB double-buffered

    def kernel(nv_ref, q_ref, e_ref, vals_ref, idx_ref):
        i = pl.program_id(0)
        q = q_ref[:]
        n_valid = nv_ref[0]
        if mode == "autodma":
            vals_ref[:] = jnp.broadcast_to(
                e_ref[0:1, 0:LANES].astype(jnp.float32), (B, LANES))
            idx_ref[:] = jnp.zeros((B, LANES), jnp.int32)
            return
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 1)
        s = jax.lax.dot_general(
            q, e_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (B, BLK)
        rowbase = i * BLK + lane
        acc_v = jnp.full((B, LANES), jnp.finfo(jnp.float32).min, jnp.float32)
        acc_i = jnp.zeros((B, LANES), jnp.int32)
        for c in range(BLK // LANES):
            cand = s[:, c * LANES:(c + 1) * LANES]
            row = rowbase + c * LANES
            better = (cand > acc_v) & (row < n_valid)
            acc_v = jnp.where(better, cand, acc_v)
            acc_i = jnp.where(better, row, acc_i)
        vals_ref[:] = acc_v
        idx_ref[:] = acc_i

    return kernel


@functools.partial(jax.jit, static_argnames=("mode",))
def run_auto(q, blocks2d, mode):
    # blocks2d: (D, N) int8 pre-biased, lane-major corpus
    D_, Ntot = blocks2d.shape
    BLK = 8192
    n_steps = Ntot // BLK
    nv = jnp.asarray(N, jnp.int32).reshape(1)
    vals, idx = pl.pallas_call(
        make_auto_kernel(mode),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((B, D_), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D_, BLK), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((B, LANES), lambda i: (0, i)),
            pl.BlockSpec((B, LANES), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_steps * LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, n_steps * LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(nv, q, blocks2d)
    return vals.sum(), idx[:, :1]


def timed(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    np.asarray(jax.tree.leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    codes = jax.random.randint(jax.random.PRNGKey(5), (N, D), 0, 256, jnp.uint8)
    blocks = jax.jit(sq8_blocks)(codes)
    del codes
    q = jax.random.normal(jax.random.PRNGKey(6), (B, D), dtype=jnp.bfloat16)
    # int8 queries: per-query symmetric scale (order within a query is scale-invariant)
    scale = (jnp.max(jnp.abs(q.astype(jnp.float32)), axis=1, keepdims=True) / 127.0)
    q8 = jnp.clip(jnp.round(q.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)

    blocks2d = None
    for mode in MODES:
        if mode == "prod":
            f = jax.jit(lambda q, c: mips_topk_pallas_sq8(q, c, K, interpret=False))
            ms = timed(f, q, blocks)
        elif mode == "s8q":
            ms = timed(lambda a, b: run_variant(a, b, "s8q"), q8, blocks)
        elif mode in ("auto", "autodma"):
            if blocks2d is None:
                nb = blocks.shape[0]
                blocks2d = jnp.swapaxes(blocks, 0, 1).reshape(D, nb * SUB_TILE)
            ms = timed(lambda a, b, m=mode: run_auto(a, b, m), q, blocks2d)
        else:
            ms = timed(lambda a, b: run_variant(a, b, mode), q, blocks)
        print(f"{mode:7s} {ms:7.3f} ms  ({B / ms * 1e3:9.0f} QPS)", flush=True)


if __name__ == "__main__":
    main()
