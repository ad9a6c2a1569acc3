#!/usr/bin/env python
"""One-process chip A/B: word-packed int32 sq8 blocks vs int8 blocks, plus a
bf16 two-stage exact-ish top-k. 1M x 768, B=64, k=100.

  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/bench_sq8_packed.py
"""

import gc
import time

import jax
import jax.numpy as jnp
import numpy as np

from atlas_tpu.ops.mips import mips_topk
from atlas_tpu.ops.pallas_mips import (
    mips_topk_pallas_sq8, sq8_blocks, sq8_blocks_packed)

N, D, B, K = 1_000_000, 768, 64, 100
ITERS = 30


def timed(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    np.asarray(jax.tree.leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / ITERS * 1e3, outs[-1]


def recall(ids, exact_ids):
    a, e = np.asarray(ids), np.asarray(exact_ids)
    return sum(len(set(a[i]) & set(e[i])) for i in range(e.shape[0])) / e.size


def main():
    codes = jax.random.randint(jax.random.PRNGKey(5), (N, D), 0, 256, jnp.uint8)
    q = jax.random.normal(jax.random.PRNGKey(6), (B, D), dtype=jnp.bfloat16)
    exact = jax.jit(lambda q, c: mips_topk(q, c.astype(jnp.bfloat16), K,
                                           chunk=1_048_576, recall_target=1.0))
    exact_ids = np.asarray(exact(q, codes)[1])

    # control: int8 blocks at the prior best geometry, same process
    blocks = jax.jit(lambda c: sq8_blocks(c, 4096))(codes)
    f = jax.jit(lambda q, c: mips_topk_pallas_sq8(q, c, K, interpret=False, slots=2))
    ms, out = timed(f, q, blocks)
    print(f"int8   4096/2   {ms:7.3f} ms ({B / ms * 1e3:8.0f} QPS) "
          f"recall={recall(out[1], exact_ids):.4f}", flush=True)
    blocks = None
    gc.collect()

    for sub_tile, slots in [(4096, 2), (4096, 4), (2048, 4), (2048, 8), (8192, 2)]:
        try:
            blocks = jax.jit(lambda c: sq8_blocks_packed(c, sub_tile))(codes)
            f = jax.jit(lambda q, c: mips_topk_pallas_sq8(
                q, c, K, interpret=False, slots=slots))
            ms, out = timed(f, q, blocks)
            rec = recall(out[1], exact_ids)
            print(f"packed {sub_tile:5d}/{slots}  {ms:7.3f} ms "
                  f"({B / ms * 1e3:8.0f} QPS) recall={rec:.4f}", flush=True)
        except Exception as e:
            print(f"packed {sub_tile:5d}/{slots}  FAILED: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            blocks = None
        gc.collect()

    # bf16 two-stage top-k on the best packed geometry (kernel unchanged):
    # coarse bf16 top-128 then exact fp32 top-k among them
    blocks = jax.jit(lambda c: sq8_blocks_packed(c, 4096))(codes)
    raw = mips_topk_pallas_sq8.__wrapped__
    orig = jax.lax.top_k

    def two_stage(vals, k):
        v16, pos = orig(vals.astype(jnp.bfloat16), 128)
        vf = jnp.take_along_axis(vals, pos, 1)
        v, p2 = orig(vf, k)
        return v, p2_gather(pos, p2)

    def p2_gather(pos, p2):
        return jnp.take_along_axis(pos, p2, 1)

    jax.lax.top_k = two_stage
    try:
        f = jax.jit(lambda q, c: raw(q, c, K, n_valid=None, interpret=False, slots=2))
        ms, out = timed(f, q, blocks)
        print(f"packed 4096/2 + bf16 2-stage topk {ms:7.3f} ms "
              f"({B / ms * 1e3:8.0f} QPS) recall={recall(out[1], exact_ids):.4f}",
              flush=True)
    finally:
        jax.lax.top_k = orig


if __name__ == "__main__":
    main()
