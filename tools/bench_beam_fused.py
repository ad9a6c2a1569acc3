#!/usr/bin/env python
"""One-process A/B: beam-4 decode with the fused whole-step kernel vs the XLA
scan step, t5-base FiD at the serving point (B=8, N=20, L=256, gen 32).

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python -u tools/bench_beam_fused.py

Tunnel rules (CLAUDE.md): force completion with np.asarray, queue many calls and
read back once, compare variants only inside this single process.
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from atlas_tpu.eval.generate import beam_generate
from atlas_tpu.models.t5 import init_t5, t5_config_for

B, N, L, GEN, K = 8, 20, 256, 32, 4
ITERS = 8


def run(cache_dtype, fused):
    cfg = t5_config_for("t5-base", dtype=jnp.bfloat16)
    # "on" (not "auto"): the auto gate keeps fused decode greedy-only after this
    # tool measured the fused beam a loss; "on" forces the fused beam path so the
    # A/B stays reproducible. NOTE: on TPU the gate also refuses "on"+beam in
    # compiled mode (token divergence) — re-relax _fused_decode_ok to re-measure.
    cfg = dataclasses.replace(cfg, dropout_rate=0.0, decode_cache_dtype=cache_dtype,
                              decode_fused="on" if fused else "off")
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_t5(jax.random.PRNGKey(0), cfg))
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, N, L), 0, 32000)
    mask = jnp.ones((B, N, L), jnp.int32)

    f = jax.jit(lambda p, i, m: beam_generate(p, cfg, i, m, max_length=GEN,
                                              num_beams=K, length_penalty=1.0))
    out = f(params, ids, mask)
    toks = np.asarray(out)
    t0 = time.perf_counter()
    outs = [f(params, ids, mask) for _ in range(ITERS)]
    np.asarray(outs[-1])
    dt = (time.perf_counter() - t0) / ITERS
    return dt * 1e3, toks


def main():
    for cache_dtype in ("int8", "bf16"):
        ms_off, tok_off = run(cache_dtype, fused=False)
        ms_on, tok_on = run(cache_dtype, fused=True)
        match = bool((tok_off == tok_on).all())
        print(f"beam{K} {cache_dtype}: fused {ms_on:.1f} ms/gen vs xla {ms_off:.1f} "
              f"ms/gen ({ms_off / ms_on:.2f}x), tokens_match={match}", flush=True)


if __name__ == "__main__":
    main()
