#!/usr/bin/env python
"""One-process chip measurement of the train-overlapped refresh (VERDICT r02 #5).

--refresh_overlap N interleaves refresh embed slabs with train steps instead of
stalling training for a full corpus pass (train/loop.py:155-183). On one chip
the device work serializes, so the questions this answers are:

  1. slab cost: ms per 512-passage embed slab inside the alternating cadence
     (vs the same slab back-to-back) — does jit alternation (two big programs
     sharing HBM/ICI state) stay additive, or does cache/program switching
     add a tax?
  2. amortized overhead: % added to the production joint train step when one
     slab rides along with every step.
  3. the implied refresh wall: slabs to re-embed a 1M-row shard / steps needed,
     vs the blocking refresh the reference does (atlas.py:61-88, train.py:65-73).

  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/bench_refresh_overlap.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 8
SLAB = 512
L_EMB = 192


def build_train_step():
    """The production joint train step at the NQ shape (bench.py's
    _joint_step_ms construction, returning the live step function)."""
    import dataclasses

    from atlas_tpu.config import AtlasConfig
    from atlas_tpu.core.atlas import Atlas
    from atlas_tpu.index.flat import DistributedIndex
    from atlas_tpu.models.bert import bert_config_for
    from atlas_tpu.models.contriever import init_retriever
    from atlas_tpu.models.t5 import init_t5, t5_config_for
    from atlas_tpu.parallel.mesh import make_mesh, set_global_mesh
    from atlas_tpu.tokenization import ByteTokenizer
    from atlas_tpu.train.optim import make_optimizers
    from atlas_tpu.train.step import create_train_state, make_train_step

    B, N, L = 1, 40, 384
    cfg = AtlasConfig(text_maxlength=L, target_maxlength=64, n_context=N,
                      retriever_n_context=N, precision="bf16", train_retriever=True,
                      total_steps=100, warmup_steps=10, lr=1e-4, lr_retriever=1e-5)
    rcfg = t5_config_for("t5-base", dtype=jnp.bfloat16, remat=True)
    bcfg = bert_config_for("bert-base-uncased", dtype=jnp.bfloat16, remat=True)
    atlas = Atlas(cfg, rcfg, init_t5(jax.random.PRNGKey(0), rcfg),
                  bcfg, init_retriever(jax.random.PRNGKey(1), bcfg),
                  ByteTokenizer("t5"), ByteTokenizer("bert"))
    mesh = make_mesh(1, 1)
    set_global_mesh(mesh)
    passages = [{"id": str(i), "title": f"t{i}",
                 "text": " ".join(f"word{i}_{j}" for j in range(48))}
                for i in range(64)]
    index = DistributedIndex(mesh=mesh, dtype=jnp.bfloat16)
    index.init_embeddings(passages, dim=bcfg.hidden_size)
    atlas.build_index(index, passages, embedder_batch_size=64)
    batch, _ = atlas.make_batch(
        index, query=["question: what is item 3? answer: <extra_id_0>"] * B,
        target=["<extra_id_0> answer three"] * B, training=True)

    reader_opt, retr_opt = make_optimizers(cfg)
    params = {"reader": atlas.reader_params, "retriever": atlas.retriever_params}
    state = create_train_state(params, reader_opt, retr_opt)
    step_fn = make_train_step(atlas, cfg, reader_opt, retr_opt)
    return state, step_fn, batch


def build_embed_slab():
    from atlas_tpu.models.bert import bert_config_for, bert_encode, init_bert

    cfg = bert_config_for("bert-base-uncased", dtype=jnp.bfloat16)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_bert(jax.random.PRNGKey(7), cfg))
    ids = jax.random.randint(jax.random.PRNGKey(8), (SLAB, L_EMB), 0, 30000)
    mask = jnp.ones((SLAB, L_EMB), jnp.int32)
    f = jax.jit(lambda p, i, m: bert_encode(p, cfg, i, m).mean(axis=1)
                .astype(jnp.bfloat16))
    return params, f, ids, mask


def bench(fn):
    t0 = time.perf_counter()
    outs = [fn() for _ in range(ITERS)]
    np.asarray(jax.tree.leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    state, step_fn, batch = build_train_step()
    eparams, embed, eids, emask = build_embed_slab()
    rng = jax.random.PRNGKey(9)

    state, m = step_fn(state, batch, rng, True)  # compile
    np.asarray(m["loss/train_loss"])
    np.asarray(embed(eparams, eids, emask))

    box = {"state": state}

    def one_step():
        box["state"], m = step_fn(box["state"], batch, rng, True)
        return m["loss/train_loss"]

    ms_train = bench(one_step)
    ms_slab = bench(lambda: embed(eparams, eids, emask))

    def alternating():
        loss = one_step()
        e = embed(eparams, eids, emask)
        return loss, e

    ms_alt = bench(alternating)
    tax = ms_alt - ms_train - ms_slab
    print(f"train step          {ms_train:8.1f} ms")
    print(f"embed slab ({SLAB})   {ms_slab:8.1f} ms  "
          f"({SLAB / ms_slab * 1e3:6.0f} passages/s)")
    print(f"alternating         {ms_alt:8.1f} ms  (switch tax {tax:+.1f} ms, "
          f"{tax / ms_alt * 100:+.1f}%)")
    print(f"overlap overhead    {ms_slab / ms_train * 100:6.1f}% per step at 1 "
          f"slab/step; 1M-row shard = {1_000_000 // SLAB} slabs")


if __name__ == "__main__":
    main()
