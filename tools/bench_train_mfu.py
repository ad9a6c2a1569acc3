"""Production train-step MFU breakdown (VERDICT r04 weak 5 / item 5).

The joint train step measures 0.23-0.26 MFU at the NQ shape and nothing said
where the rest of v5e peak goes. This tool prices each component by in-process
A/B deltas of the REAL jitted step (the technique proven on the decode-step
breakdown): retriever tower share, optimizer share, remat recompute cost,
flash-vs-xla attention, and per-chip batch scaling (B=1 pipeline bubbles).

All A/Bs run in ONE process (tunnel throughput drifts ~20% between sessions).
Each line: {"case": ..., "ms": ..., "mfu": ...}.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_train_mfu.py
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _force(x):
    np.asarray(x)


def _step_ms(B=1, N=40, L=384, attn_impl="auto", remat=True,
             train_retriever=True, optimizer=True, iters=10):
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

    cfg = AtlasConfig(text_maxlength=L, target_maxlength=64, n_context=N,
                      retriever_n_context=N, precision="bf16",
                      train_retriever=train_retriever,
                      total_steps=100, warmup_steps=10, lr=1e-4, lr_retriever=1e-5)
    rcfg = dataclasses.replace(
        t5_config_for("t5-base", dtype=jnp.bfloat16, remat=remat),
        attn_impl=attn_impl)
    bcfg = bert_config_for("bert-base-uncased", dtype=jnp.bfloat16, remat=remat,
                           attn_impl=attn_impl)
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
    rng = jax.random.PRNGKey(2)

    if optimizer:
        step_fn = make_train_step(atlas, cfg, reader_opt, retr_opt)

        def run(state):
            return step_fn(state, batch, rng, train_retriever)
    else:
        # grads only — the optimizer/update share is the delta vs the full step
        grad_fn = jax.jit(jax.value_and_grad(
            lambda p: atlas.loss_fn(p, batch, rng, train_retriever=train_retriever,
                                    training=True)[0]))

        def run(state):
            v, g = grad_fn(state.params)
            return state, {"loss/train_loss": v, "_g": g}

    state, m = run(state)
    _force(m["loss/train_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = run(state)
    _force(m["loss/train_loss"])
    dt = (time.perf_counter() - t0) / iters

    from atlas_tpu.models.bert import bert_config_for as _b
    from atlas_tpu.models.t5 import t5_config_for as _t
    from atlas_tpu.utils.flops import joint_train_flops, mfu

    flops = joint_train_flops(_t("t5-base"), _b("bert-base-uncased"),
                              B=B, N=N, L=L, T=64, retr_len=L)
    if not train_retriever:
        from atlas_tpu.utils.flops import fid_train_flops

        flops = fid_train_flops(_t("t5-base"), B=B, N=N, L=L, T=64)
    return dt * 1e3, round(mfu(flops, dt), 4)


def main():
    cases = [
        ("full_b1", dict()),
        ("no_optimizer_b1", dict(optimizer=False)),
        ("reader_only_b1", dict(train_retriever=False)),
        ("no_remat_b1", dict(remat=False)),
        ("attn_xla_b1", dict(attn_impl="xla")),
        ("full_b2", dict(B=2)),
        ("full_b4", dict(B=4)),
        ("no_remat_b2", dict(B=2, remat=False)),
    ]
    results = {}
    for name, kw in cases:
        try:
            ms, m = _step_ms(**kw)
            results[name] = ms
            print(json.dumps({"case": name, "ms": round(ms, 1), "mfu": m}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"case": name, "error": repr(e)[:200]}), flush=True)
        jax.clear_caches()

    if "full_b1" in results:
        f = results["full_b1"]
        summary = {"optimizer_share_ms": round(f - results.get("no_optimizer_b1", f), 1),
                   "retriever_share_ms": round(f - results.get("reader_only_b1", f), 1),
                   "remat_recompute_ms": round(f - results.get("no_remat_b1", f), 1),
                   "flash_win_ms": round(results.get("attn_xla_b1", f) - f, 1),
                   "b2_tokens_speedup": round(2 * f / results["full_b2"], 2) if "full_b2" in results else None,
                   "b4_tokens_speedup": round(4 * f / results["full_b4"], 2) if "full_b4" in results else None}
        print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
