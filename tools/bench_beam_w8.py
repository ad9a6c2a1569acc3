#!/usr/bin/env python
"""One-process A/B: beam-4 decode on the XLA scan step with int8 decode
weights vs bf16 weights (beam never fuses on TPU — models/t5.py
_fused_decode_ok — so decode_weights=int8 is the beam path's bandwidth lever).
FiD at B=8, N=20, L=256, gen 32. Argv: model [n_context] [cache_dtype]:

  PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python -u tools/bench_beam_w8.py t5-large 20 int8
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from atlas_tpu.eval.generate import beam_generate
from atlas_tpu.models.t5 import init_t5, t5_config_for

B, L, GEN, K = 8, 256, 32, 4
ITERS = 8
MODEL = sys.argv[1] if len(sys.argv) > 1 else "t5-base"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 20
CACHE = sys.argv[3] if len(sys.argv) > 3 else "int8"


def run(weights):
    cfg = t5_config_for(MODEL, dtype=jnp.bfloat16)
    cfg = dataclasses.replace(cfg, dropout_rate=0.0, decode_cache_dtype=CACHE,
                              decode_weights=weights, decode_fused="off")
    params = jax.jit(lambda k: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_t5(k, cfg)
    ))(jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, N, L), 0, 32000)
    mask = jnp.ones((B, N, L), jnp.int32)
    f = jax.jit(lambda p, i, m: beam_generate(p, cfg, i, m, max_length=GEN,
                                              num_beams=K, length_penalty=1.0))
    toks = np.asarray(f(params, ids, mask))
    t0 = time.perf_counter()
    outs = [f(params, ids, mask) for _ in range(ITERS)]
    np.asarray(outs[-1])
    return (time.perf_counter() - t0) / ITERS * 1e3, toks


def main():
    ms_bf, tok_bf = run("bf16")
    ms_w8, tok_w8 = run("int8")
    match = bool((tok_bf == tok_w8).all())  # informative only: w8 shifts logits
    print(f"{MODEL} N={N} beam{K} cache={CACHE}: w8 {ms_w8:.1f} ms/gen vs bf16 "
          f"{ms_bf:.1f} ({ms_bf / ms_w8:.2f}x), tokens_match={match}", flush=True)


if __name__ == "__main__":
    main()
