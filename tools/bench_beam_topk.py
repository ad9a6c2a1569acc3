#!/usr/bin/env python
"""One-process chip A/B: beam-4 decode with the two-stage per-beam top-2K vs
the old flat (B, K*V) top-2K (VERDICT r02 item 10). t5-base FiD, B=8, N=20,
L=256, gen 32, int8 cache — the serving point of the r02 beam measurements.

  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/bench_beam_topk.py
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

import atlas_tpu.eval.generate as gen
from atlas_tpu.models.t5 import init_t5, t5_config_for

B, N, L, GEN, K = 8, 20, 256, 32, 4
ITERS = 10


def run(flat_topk, params, cfg, ids, mask, always_permute=False):
    gen._FLAT_TOPK = flat_topk
    gen._ALWAYS_PERMUTE = always_permute
    gen.beam_generate._clear_cache()
    f = jax.jit(lambda p, i, m: gen.beam_generate(
        p, cfg, i, m, max_length=GEN, num_beams=K, length_penalty=1.0))
    toks = np.asarray(f(params, ids, mask))
    t0 = time.perf_counter()
    outs = [f(params, ids, mask) for _ in range(ITERS)]
    np.asarray(outs[-1])
    return (time.perf_counter() - t0) / ITERS * 1e3, toks


def main():
    cfg = t5_config_for("t5-base", dtype=jnp.bfloat16)
    cfg = dataclasses.replace(cfg, dropout_rate=0.0, decode_cache_dtype="int8")
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_t5(jax.random.PRNGKey(0), cfg))
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, N, L), 0, 32000)
    mask = jnp.ones((B, N, L), jnp.int32)

    ms_flat, tok_flat = run(True, params, cfg, ids, mask)
    ms_split, tok_split = run(False, params, cfg, ids, mask)
    ms_perm, tok_perm = run(False, params, cfg, ids, mask, always_permute=True)
    match = bool((tok_flat == tok_split).all()) and bool((tok_perm == tok_split).all())
    print(f"beam-{K} t5-base int8: flat topk {ms_flat:.1f} ms/gen vs two-stage "
          f"{ms_split:.1f} ({ms_flat / ms_split:.3f}x); always-permute "
          f"{ms_perm:.1f} vs identity-skip {ms_split:.1f} "
          f"({ms_perm / ms_split:.3f}x), tokens_match={match}", flush=True)


if __name__ == "__main__":
    main()
