#!/usr/bin/env python
"""One-process A/B: greedy decode fused kernel vs XLA scan step, FiD at
B=8, N=20, L=256, gen 32. Argv: model [n_context] [modes,csv] where a mode is
a cache dtype with an optional ":w8" suffix for int8 fused weights:

  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/bench_greedy_fused.py t5-large
  ... tools/bench_greedy_fused.py google/t5-xl-lm-adapt 20 int8,int8:w8
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from atlas_tpu.eval.generate import greedy_generate
from atlas_tpu.models.t5 import init_t5, t5_config_for

B, N, L, GEN = 8, 20, 256, 32
ITERS = 10
MODEL = sys.argv[1] if len(sys.argv) > 1 else "t5-base"
if len(sys.argv) > 2:
    N = int(sys.argv[2])
CACHE_DTYPES = sys.argv[3].split(",") if len(sys.argv) > 3 else ["int8", "bf16"]


def run(mode, fused):
    cache_dtype, _, wsuf = mode.partition(":")
    cfg = t5_config_for(MODEL, dtype=jnp.bfloat16)
    cfg = dataclasses.replace(cfg, dropout_rate=0.0, decode_cache_dtype=cache_dtype,
                              decode_weights="int8" if wsuf == "w8" else "bf16",
                              decode_fused="auto" if fused else "off")
    # init+cast under one jit: XLA frees each fp32 leaf after its cast, so a
    # 3B model peaks ~6GB instead of ~17GB (fp32 tree + bf16 copy both live)
    params = jax.jit(lambda k: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_t5(k, cfg)
    ))(jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, N, L), 0, 32000)
    mask = jnp.ones((B, N, L), jnp.int32)
    f = jax.jit(lambda p, i, m: greedy_generate(p, cfg, i, m, max_length=GEN))
    toks = np.asarray(f(params, ids, mask))
    t0 = time.perf_counter()
    outs = [f(params, ids, mask) for _ in range(ITERS)]
    np.asarray(outs[-1])
    return (time.perf_counter() - t0) / ITERS * 1e3, toks


def main():
    for mode in CACHE_DTYPES:
        ms_off, tok_off = run(mode, fused=False)
        ms_on, tok_on = run(mode, fused=True)
        match = bool((tok_off == tok_on).all())
        print(f"{MODEL} N={N} greedy {mode}: fused {ms_on:.1f} ms/gen vs "
              f"xla {ms_off:.1f} ({ms_off / ms_on:.2f}x), tokens_match={match}",
              flush=True)


if __name__ == "__main__":
    main()
