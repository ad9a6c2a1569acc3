#!/usr/bin/env python
"""One-process chip A/B of the refresh embed step: fused FFN kernel vs XLA FFN.

bert-base, B=512, L=192 (the refresh operating point), deterministic forward +
mean pooling — the exact shape of bench.py's refresh metric.

  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/bench_refresh_ffn.py
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from atlas_tpu.models.bert import bert_config_for, bert_encode, init_bert

L, B = 192, 512
ITERS = 10


def run(ffn_impl, attn_impl, params, ids, mask):
    cfg = dataclasses.replace(
        bert_config_for("bert-base-uncased"), ffn_impl=ffn_impl,
        attn_impl=attn_impl)

    def embed(params, ids, mask):
        return bert_encode(params, cfg, ids, mask).mean(axis=1)

    f = jax.jit(embed)
    out = f(params, ids, mask)
    np.asarray(out)
    t0 = time.perf_counter()
    outs = [f(params, ids, mask) for _ in range(ITERS)]
    np.asarray(outs[-1])
    return (time.perf_counter() - t0) / ITERS * 1e3, np.asarray(out)


def main():
    cfg = bert_config_for("bert-base-uncased")
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_bert(jax.random.PRNGKey(0), cfg))
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, cfg.vocab_size)
    mask = jnp.ones((B, L), jnp.int32)

    ms_xla, emb_xla = run("xla", "xla", params, ids, mask)
    print(f"xla/xla     {ms_xla:7.2f} ms/batch "
          f"({B / ms_xla * 1e3:7.0f} passages/s)", flush=True)
    for ffn, attn in [("fused", "xla"), ("xla", "block"), ("fused", "block")]:
        ms, emb = run(ffn, attn, params, ids, mask)
        err = float(np.max(np.abs(emb.astype(np.float32)
                                  - emb_xla.astype(np.float32))))
        print(f"{ffn}/{attn:5s} {ms:7.2f} ms/batch "
              f"({B / ms * 1e3:7.0f} passages/s)  ({ms_xla / ms:.3f}x)  "
              f"max|d_emb|={err:.4f}", flush=True)


if __name__ == "__main__":
    main()
