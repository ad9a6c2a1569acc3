#!/usr/bin/env python
"""One-process A/B: contriever-base (BERT) training fwd+bwd with flash vs XLA
attention at the joint-train passage shape (B=32 passages, L=384, dropout 0.1).
Also checks the deterministic refresh point (L=192, fwd-only) stays XLA-favored.
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from atlas_tpu.models.bert import bert_config_for, bert_encode, init_bert


def step_ms(impl, B, L, train, iters=10):
    cfg = bert_config_for("bert-base-uncased", dtype=jnp.bfloat16, remat=train)
    cfg = dataclasses.replace(cfg, attn_impl=impl)
    params = init_bert(jax.random.PRNGKey(0), cfg)  # fp32 masters
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, cfg.vocab_size)
    mask = jnp.ones((B, L), jnp.int32)
    rng = jax.random.PRNGKey(2)

    if train:
        def loss(p, rng):
            pc = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
            h = bert_encode(pc, cfg, ids, mask, deterministic=False, rng=rng)
            return jnp.sum(h.mean(axis=1) ** 2)

        def step(p, rng):
            # return value + a grad reduction so XLA cannot DCE the backward
            v, g = jax.value_and_grad(loss)(p, rng)
            return v + sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

        f = jax.jit(step)
    else:
        pc = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        f = jax.jit(lambda p, rng: bert_encode(p, cfg, ids, mask).mean())
        params = pc

    np.asarray(f(params, rng))
    t0 = time.perf_counter()
    outs = [f(params, rng) for _ in range(iters)]
    np.asarray(outs[-1])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    for B, L, train in [(32, 384, True), (512, 192, False)]:
        ms_x = step_ms("xla", B, L, train)
        ms_f = step_ms("flash", B, L, train)
        tag = "train_fwd+bwd" if train else "fwd_only"
        print(f"bert {tag} B={B} L={L}: flash {ms_f:.1f} ms vs xla {ms_x:.1f} "
              f"({ms_x / ms_f:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
