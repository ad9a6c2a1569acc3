"""T5-xxl single-encoder-block chip microbench (VERDICT r04 item 9 stretch).

The AOT planner's xxl memory accounting is compiler-verified
(parallel/aot.py); its step-TIME estimates assume xxl-shaped matmuls reach a
given MFU on v5e. One xxl encoder block at REAL dims (d_model 4096, gated
d_ff 10240, 64 heads) fits a single 16 GiB chip — this measures its fwd+bwd
wall clock and achieved MFU, anchoring the planner's compute claims the same
way memory_analysis anchors its memory claims.

Shape: 16 segments x L=512 tokens (8192 tokens total, the FiD encoder's
per-chip order of magnitude at xxl: B=1 x N=40 x L=384 = 15360 tokens
sharded 2-4 ways).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_xxl_block.py
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from atlas_tpu.models.t5 import init_t5, t5_config_for, t5_encode
    from atlas_tpu.utils.flops import mfu

    B, L = 16, 512
    cfg = t5_config_for("google/t5-v1_1-xxl", dtype=jnp.bfloat16)
    cfg = dataclasses.replace(cfg, num_layers=1, num_decoder_layers=1,
                              dropout_rate=0.0, vocab_size=512)
    params = jax.jit(lambda k: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_t5(k, cfg)))(jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, 512)
    mask = jnp.ones((B, L), jnp.int32)

    def loss(p):
        h = t5_encode(p, cfg, ids, mask, deterministic=True)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    f = jax.jit(jax.value_and_grad(loss))
    v, g = f(params)
    np.asarray(v)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        v, g = f(params)
    np.asarray(v)
    dt = (time.perf_counter() - t0) / iters

    # analytic model flops for ONE encoder block, fwd+bwd = 3x fwd
    d, ff, T = cfg.d_model, cfg.d_ff, B * L
    proj = 4 * 2 * T * d * d              # q,k,v,o projections
    attn = 2 * B * (2 * L * L * d)        # scores + AV (per segment)
    ffn = 3 * 2 * T * d * ff              # gated: wi_0, wi_1, wo
    fwd = proj + attn + ffn
    flops = 3 * fwd
    m = mfu(flops, dt)
    print(json.dumps({
        "case": "xxl_encoder_block_fwd_bwd", "tokens": T,
        "ms": round(dt * 1e3, 2), "mfu": round(m, 4),
        "tflops_executed_est": round(flops / 1e12, 2),
        "note": "planner compute anchor: xxl-shaped block MFU on one v5e chip",
    }), flush=True)


if __name__ == "__main__":
    main()
