#!/usr/bin/env python
"""One-process chip sweep of the cross-step-pipelined sq8 kernel.

Sweeps (sub_tile, slots) geometry at the B=64, 1M x 768, k=100 serving point,
then A/Bs the trailing winner top-k (exact lax.top_k vs lax.approx_max_k) at
the best geometry, with recall@100 against an exact scan of the same quantized
corpus printed beside every number.

  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/bench_sq8_sweep.py
"""

import gc
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from atlas_tpu.ops.mips import mips_topk
from atlas_tpu.ops.pallas_mips import mips_topk_pallas_sq8, sq8_blocks

N, D, B, K = 1_000_000, 768, 64, 100
ITERS = 30
GEOMS = [(1024, 8), (1024, 4), (2048, 4), (2048, 8), (4096, 2), (4096, 4)]


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

    results = []
    for sub_tile, slots in GEOMS:
        try:
            blocks = jax.jit(lambda c: sq8_blocks(c, sub_tile))(codes)
            f = jax.jit(lambda q, c: mips_topk_pallas_sq8(
                q, c, K, interpret=False, slots=slots))
            ms, out = timed(f, q, blocks)
            rec = recall(out[1], exact_ids)
            print(f"sub_tile={sub_tile:5d} slots={slots}  {ms:7.3f} ms "
                  f"({B / ms * 1e3:8.0f} QPS)  recall@100={rec:.4f}", flush=True)
            results.append((ms, sub_tile, slots))
        except Exception as e:
            print(f"sub_tile={sub_tile:5d} slots={slots}  FAILED: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
        finally:
            blocks = None
            gc.collect()

    if not results:
        sys.exit(1)
    _, sub_tile, slots = min(results)
    print(f"\nbest geometry: sub_tile={sub_tile} slots={slots}; top-k A/B:",
          flush=True)
    blocks = jax.jit(lambda c: sq8_blocks(c, sub_tile))(codes)

    # A/B the trailing reduce by tracing the UNJITTED wrapper with a patched
    # top_k (patching around the module-level jit would hit its trace cache)
    raw = mips_topk_pallas_sq8.__wrapped__
    orig_topk = jax.lax.top_k
    for mode, rt in [("exact", None), ("approx99", 0.99), ("approx95", 0.95)]:
        if rt is not None:
            jax.lax.top_k = lambda vals, k, _rt=rt: jax.lax.approx_max_k(
                vals, k, recall_target=_rt)
        f = jax.jit(lambda q, c, _rt=rt: raw(
            q, c, K, n_valid=None, interpret=False, slots=slots))
        try:
            ms, out = timed(f, q, blocks)
            rec = recall(out[1], exact_ids)
            print(f"topk={mode:9s} {ms:7.3f} ms ({B / ms * 1e3:8.0f} QPS) "
                  f"recall@100={rec:.4f}", flush=True)
        finally:
            jax.lax.top_k = orig_topk


if __name__ == "__main__":
    main()
