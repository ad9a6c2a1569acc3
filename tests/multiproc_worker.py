"""Worker process for the 2-process multi-host integration test.

Launched twice by tests/test_multiproc.py (process_id 0 and 1), each with 4 virtual
CPU devices, joined through jax.distributed. Drives every `jax.process_count() > 1`
branch that single-process tests cannot reach (reference protocols these replace:
/root/reference/src/dist_utils.py:47-122, src/index.py:123-157):

1. index build with UNEQUAL per-process passage counts (7 vs 5) via the
   host_local_array_to_global_array slab path,
2. search_knn with RAGGED per-process query batches (3 vs 0 — the empty rank must
   still enter every collective),
3. DocStore._exchange (results owned by the other process),
4. save_index/load_index resharding roundtrip,
5. refresh: Atlas.build_index re-embedding through the retriever (refresh.py's
   multi-host slab assembly), then a search through the refreshed index.

Prints "WORKER<pid> OK" and exits 0 on success; any assert kills the test.
"""

import json
import os
import sys


def main():
    pid, port, tmp = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    # match tests/conftest.py: step 10's loss is compared against a value the
    # parent pytest process computes, so matmul precision must agree
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2 and len(jax.devices()) == 8

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from atlas_tpu.index.flat import DistributedIndex
    from atlas_tpu.parallel.mesh import make_mesh, set_global_mesh

    mesh = make_mesh(8, 1)
    set_global_mesh(mesh)

    # ---- 1. unequal per-process corpus
    counts = [7, 5]
    n_local, dim = counts[pid], 16
    rng = np.random.RandomState(42 + pid)
    local_embs = rng.randn(n_local, dim).astype(np.float32)
    passages = [
        {"id": f"{pid}-{i}", "title": f"t{pid}{i}", "text": f"proc{pid} passage {i}"}
        for i in range(n_local)
    ]
    index = DistributedIndex(mesh=mesh, dtype=jnp.float32, recall_target=1.0)
    index.init_embeddings(passages, dim=dim)
    rpp = index.n_pad // 2
    padded = np.zeros((rpp, dim), np.float32)
    padded[:n_local] = local_embs
    index.set_embeddings(index._from_process_local(padded, index.n_pad).astype(jnp.float32))

    # numpy oracle over the assembled global matrix
    slabs = multihost_utils.process_allgather(padded)  # (2, rpp, dim)
    gids_valid = np.concatenate([np.arange(counts[p]) + p * rpp for p in range(2)])
    emb_valid = np.concatenate([slabs[p, : counts[p]] for p in range(2)])
    pid_of = {int(p * rpp + i): f"{p}-{i}" for p in range(2) for i in range(counts[p])}

    # ---- 2./3. ragged search_knn + cross-host doc resolution
    topk = 4
    queries = local_embs[:3] if pid == 0 else np.zeros((0, dim), np.float32)
    docs, scores = index.search_knn(queries, topk)
    assert len(docs) == len(queries), (len(docs), len(queries))
    if pid == 0:
        exact = np.argsort(-(queries @ emb_valid.T), axis=1)[:, :topk]
        for qi in range(len(queries)):
            want_ids = [pid_of[int(gids_valid[j])] for j in exact[qi]]
            got_ids = [d["id"] for d in docs[qi]]
            assert got_ids == want_ids, (qi, got_ids, want_ids)
        # rows 0..2 are proc0's own embeddings: top-1 must be themselves
        assert [docs[i][0]["id"] for i in range(3)] == ["0-0", "0-1", "0-2"]
        # cross-host ownership actually exercised: some result is proc1's
        assert any(d["id"].startswith("1-") for row in docs for d in row), docs

    # ---- 4. save/load resharding roundtrip (4 shards over 2 workers)
    index.save_index(tmp, total_saved_shards=4)
    index2 = DistributedIndex(mesh=mesh, dtype=jnp.float32, recall_target=1.0)
    index2.load_index(tmp, total_saved_shards=4)
    assert index2.n_total == sum(counts)
    q2 = local_embs[:2] if pid == 0 else local_embs[:1]
    d1, s1 = index.search_knn(q2, 3)
    d2, s2 = index2.search_knn(q2, 3)
    assert [[d["id"] for d in row] for row in d1] == [[d["id"] for d in row] for row in d2]
    # save_index stores fp16 (flat.py save path), so reloaded scores carry
    # fp16 rounding: |err| <= eps_fp16 * |score| ~ 5e-4 * 15
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=2e-3, atol=1e-3)

    # ---- 5. refresh through the retriever (multi-host slab assembly)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from helpers import tiny_atlas

    atlas = tiny_atlas()
    index3 = DistributedIndex(mesh=mesh, dtype=jnp.float32, recall_target=1.0)
    index3.init_embeddings(passages, dim=atlas.retriever_cfg.hidden_size)
    atlas.build_index(index3, passages, embedder_batch_size=4)
    dq = ["proc0 passage 1"] if pid == 0 else ["proc1 passage 0", "proc1 passage 2"]
    tok = atlas.retriever_tokenize(dq)
    qemb = np.asarray(atlas.embed_queries_device(tok["input_ids"], tok["attention_mask"]))
    docs3, _ = index3.search_knn(qemb, 2)
    assert len(docs3) == len(dq) and all(len(r) == 2 for r in docs3)

    # ---- 6. orbax checkpoint with every process participating (the >host-RAM
    # path: sharded tensorstore writes + the cross-process commit barrier)
    import dataclasses

    from atlas_tpu.config import AtlasConfig
    from atlas_tpu.model_io import save_atlas_model

    cfg = AtlasConfig(checkpoint_dir=tmp, name="mp_orbax",
                      checkpoint_format="orbax", save_optimizer=False)
    cfg.is_main = pid == 0
    from jax.sharding import PartitionSpec as PS

    def to_global(tree):
        return jax.tree.map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, PS()), tree)

    atlas.reader_params = to_global(atlas.reader_params)
    atlas.retriever_params = to_global(atlas.retriever_params)
    ckdir = os.path.join(tmp, "mp_orbax")
    save_atlas_model(atlas, None, step=1, cfg=cfg, dir_path=ckdir, name="step-1")

    import orbax.checkpoint as ocp

    ck6 = ocp.PyTreeCheckpointer()
    sp6 = os.path.abspath(os.path.join(ckdir, "checkpoint", "step-1", "state.orbax"))
    meta6 = dict(ck6.metadata(sp6).item_metadata.items())
    raw = ck6.restore(  # host-numpy restore args: no "sharding not provided" warning
        sp6, item={k: 0 for k in meta6}, transforms={},
        restore_args={k: ocp.RestoreArgs(restore_type=np.ndarray) for k in meta6})
    want = np.asarray(jax.device_get(atlas.reader_params["shared"]))
    got = np.asarray(raw["model.reader.shared"])
    np.testing.assert_array_equal(got, want)

    # ---- 7. bucket_lengths cross-host sync: processes with different local
    # longest-lengths must pad to the SAME global bucket (the jitted step's
    # global batch shape is shared — core/atlas.py encode_passages_batch)
    cfg7 = AtlasConfig(text_maxlength=128, target_maxlength=16, n_context=2,
                       retriever_n_context=2, precision="fp32",
                       bucket_lengths=True)
    atlas.cfg = cfg7
    short = [[{"title": "a", "text": "hi"}, {"title": "b", "text": "yo"}]]
    longer = [[{"title": "c", "text": "x" * 50}, {"title": "d", "text": "y" * 45}]]
    tok7, _ = atlas.tokenize_passages(["q"], short if pid == 0 else longer,
                                      sync_buckets=True)  # the train-path mode
    L7 = tok7["input_ids"].shape[-1]
    gathered = multihost_utils.process_allgather(np.int32(L7))
    assert int(gathered.min()) == int(gathered.max()), gathered  # same bucket
    assert L7 in atlas.LENGTH_BUCKETS and L7 < 128, L7  # bucketed, not cap
    # the eval-path mode is collective-free: a LOCAL tokenize on one rank only
    # must not hang (this is what ragged multi-host eval does on real batches)
    if pid == 0:
        tl, _ = atlas.tokenize_passages(["q"], short)
        assert tl["input_ids"].shape[-1] == 32, tl["input_ids"].shape

    # ---- 8. approx index across 2 processes (faiss role src/index.py:163-381):
    # train quantizers on SHARDED embeddings, encode sharded codes, sparse AND
    # masked ivf search agreeing, sq8, save/load roundtrip with per-rank quant
    # files surviving the cross-process barrier.
    from atlas_tpu.index.approx import DistributedApproxIndex

    nc_local = 24
    rngc = np.random.RandomState(7 + pid)
    centers = np.zeros((8, dim), np.float32)
    centers[np.arange(8), np.arange(8)] = 4.0  # well-separated -> approx == exact
    assign8 = (np.arange(nc_local) + pid) % 8
    emb8 = (centers[assign8] + 0.05 * rngc.randn(nc_local, dim)).astype(np.float32)
    psg8 = [{"id": f"c{pid}-{i}", "title": "t", "text": f"p{pid}{i}"} for i in range(nc_local)]
    q8 = emb8[:2] if pid == 0 else emb8[:1]

    def true_cluster(doc_id):  # "c{p}-{i}" -> (i + p) % 8
        p, i = doc_id[1:].split("-")
        return (int(i) + int(p)) % 8

    for itype, kwargs in (("ivfpq", dict(code_size=4)), ("sq8", {})):
        aidx = DistributedApproxIndex(index_type=itype, mesh=mesh, dtype=jnp.float32, **kwargs)
        aidx.init_embeddings(psg8, dim=dim)
        rpp8 = aidx.n_pad // 2
        pad8 = np.zeros((rpp8, dim), np.float32)
        pad8[:nc_local] = emb8
        aidx.set_embeddings(aidx._from_process_local(pad8, aidx.n_pad).astype(jnp.float32))
        if itype == "ivfpq":
            aidx.nprobe_value = 1  # nprobe*4 <= nlist -> sparse posting-list path
        aidx.train_index()
        assert aidx.is_index_trained()
        d8, s8 = aidx.search_knn(q8, 3)
        assert len(d8) == len(q8) and all(len(r) == 3 for r in d8), (itype, d8)
        # well-separated clusters (score ~16 same-cluster vs ~0 cross): every
        # returned doc must share the query's true cluster, a margin robust to
        # PQ/sq8 quantization noise (exact self-match is NOT — same-cluster
        # rows quantize to near-identical codes)
        for qi, row in enumerate(d8):
            want_cl = true_cluster(f"c{pid}-{qi}")
            got_cl = [true_cluster(d["id"]) for d in row]
            assert got_cl == [want_cl] * 3, (itype, qi, got_cl, want_cl)
        if itype == "ivfpq":
            assert aidx._sparse_engaged(), "sparse path did not engage"
            aidx.ivf_impl = "masked"  # same nprobe through the masked full scan
            d8m, _ = aidx.search_knn(q8, 3)
            for qi, row in enumerate(d8m):
                want_cl = true_cluster(f"c{pid}-{qi}")
                assert [true_cluster(d["id"]) for d in row] == [want_cl] * 3, (qi, row)
            aidx.ivf_impl = "auto"
        tdir = os.path.join(tmp, f"approx_{itype}")
        aidx.save_index(tdir, total_saved_shards=4)
        aidx2 = DistributedApproxIndex(index_type=itype, mesh=mesh, dtype=jnp.float32, **kwargs)
        if itype == "ivfpq":
            aidx2.nprobe_value = 1
        aidx2.load_index(tdir, total_saved_shards=4)
        d8b, _ = aidx2.search_knn(q8, 3)
        assert [[d["id"] for d in r] for r in d8] == [[d["id"] for d in r] for r in d8b], itype

    # ---- 9. FSDP(+ZeRO) checkpoint across 2 processes: orbax-sharded SAVE then
    # sharded RESTORE placing every leaf straight onto its mesh placement (no
    # host materialization — reference resume role model_io.py:170-197 at 11B
    # scale), optimizer moments included, resume bit-identical.
    from atlas_tpu.model_io import (
        flat_to_tree, init_atlas_model, load_or_initialize_atlas_model, save_atlas_model,
    )
    from atlas_tpu.parallel.sharding import (
        atlas_param_specs, fsdp_param_specs, place_like, shard_params, to_shardings,
    )
    from atlas_tpu.train.optim import make_optimizers
    from atlas_tpu.train.step import create_train_state, make_train_step

    cfg9 = AtlasConfig(
        text_maxlength=32, target_maxlength=16, n_context=2, retriever_n_context=2,
        precision="fp32", train_retriever=True, total_steps=50, warmup_steps=1,
        lr=1e-3, lr_retriever=1e-3, tiny_model=True, shard_optim=True,
        checkpoint_format="orbax", save_optimizer=True,
        checkpoint_dir=tmp, name="fsdp9",
    )
    cfg9.is_main = pid == 0
    atlas9, _ = init_atlas_model(cfg9)
    atlas9.set_mesh(mesh)
    params9 = {"reader": atlas9.reader_params, "retriever": atlas9.retriever_params}
    specs9 = fsdp_param_specs(params9, atlas_param_specs(params9), 8)
    sharded9 = shard_params(mesh, params9, specs9)
    r_opt, t_opt = make_optimizers(cfg9)
    state9 = create_train_state(sharded9, r_opt, t_opt)
    step_fn9 = make_train_step(atlas9, cfg9, r_opt, t_opt)
    queries9 = [f"question: q{pid}{i}? answer: <extra_id_0>" for i in range(4)]
    targets9 = [f"<extra_id_0> a{pid}{i}" for i in range(4)]
    atlas9.reader_params, atlas9.retriever_params = sharded9["reader"], sharded9["retriever"]
    batch9, _ = atlas9.make_batch(index3, query=queries9, target=targets9, training=True)
    rng9 = jax.random.PRNGKey(0)
    for _ in range(2):
        state9, _ = step_fn9(state9, batch9, rng9, True)
    atlas9.reader_params = state9.params["reader"]
    atlas9.retriever_params = state9.params["retriever"]
    save_atlas_model(atlas9, state9.opt_state, step=2, cfg=cfg9,
                     dir_path=os.path.join(tmp, "fsdp9"), name="step-2")

    atlas9b, opt_raw9, step9 = load_or_initialize_atlas_model(cfg9, mesh=mesh)
    assert step9 == 2 and opt_raw9 is not None
    params9b = {"reader": atlas9b.reader_params, "retriever": atlas9b.retriever_params}
    shardings9 = to_shardings(mesh, specs9)
    n_dp = 0
    for (path9, leaf), (_, want_sh) in zip(
        jax.tree_util.tree_flatten_with_path(params9b)[0],
        jax.tree_util.tree_flatten_with_path(shardings9)[0],
    ):
        assert isinstance(leaf, jax.Array) and leaf.sharding == want_sh, (
            path9, getattr(leaf, "sharding", type(leaf)), want_sh)
        n_dp += "dp" in str(want_sh.spec)
    assert n_dp > 0  # fsdp widening engaged on the big leaves
    state9b = create_train_state(params9b, r_opt, t_opt)
    restored9 = jax.tree.map(place_like, flat_to_tree(opt_raw9, state9b.opt_state),
                             state9b.opt_state)
    state9b = state9b._replace(opt_state=restored9, step=jnp.int32(2))
    atlas9b.set_mesh(mesh)
    step_fn9b = make_train_step(atlas9b, cfg9, r_opt, t_opt)
    state9, _ = step_fn9(state9, batch9, rng9, True)
    state9b, _ = step_fn9b(state9b, batch9, rng9, True)
    fp = jax.jit(lambda t: [(jnp.sum(x), jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(t)])
    for (a1, a2), (b1, b2) in zip(fp(state9.params), fp(state9b.params)):
        assert float(a1) == float(b1) and float(a2) == float(b2), "resume diverged"

    # ---- 10. PRODUCTION train() over dp=4 x mp=2 across both processes — the
    # last untested cell of the parallelism matrix (SURVEY §2 TP row): TP-sharded
    # towers + ZeRO + retrieval-in-the-loop through the real training loop, loss
    # parity vs the single-process same-global run (the parent computes it and
    # checks mp10_result.json), and generation under mp>1 across processes
    # (core/atlas.py _union_rows: per-process jit calls with local inputs are
    # undefined SPMD once params span hosts).
    from atlas_tpu.eval.loop import evaluate
    from atlas_tpu.train.loop import train as train_loop

    mesh10 = make_mesh(4, 2)
    set_global_mesh(mesh10)
    cfg10 = AtlasConfig(
        task="qa", text_maxlength=32, target_maxlength=16, n_context=2,
        retriever_n_context=2, precision="fp32", dropout=0.0, tiny_model=True,
        train_retriever=True, shard_optim=True,
        total_steps=3, warmup_steps=1, lr=1e-3, lr_retriever=1e-3,
        scheduler="fixed", per_gpu_batch_size=1, log_freq=100, eval_freq=1000,
        save_freq=1000, shuffle=False, refresh_index="-1",
        checkpoint_dir=tmp, name="mp10", generation_max_length=8, seed=3)
    cfg10.is_main = pid == 0
    cfg10.is_distributed, cfg10.global_rank, cfg10.world_size = True, pid, 2
    atlas10, _ = init_atlas_model(cfg10)  # same seed -> same init on both ranks
    atlas10.set_mesh(mesh10)
    # init_embeddings takes the process-LOCAL passage slab (step 1 above relies
    # on exactly that with unequal counts) — each rank contributes a DISJOINT
    # half so the global corpus is the same 16 rows the single-process parity
    # run builds. Round 4 passed all 16 on both ranks, doubling the corpus:
    # every retrieval returned duplicate copies ([11, 11] instead of [12, 14])
    # and the trained params drifted 0.42% from the single-process run — the
    # r04 parity failure was this test-setup mismatch, not an SPMD divergence.
    passages10_all = [{"id": str(i), "title": f"t{i}", "text": f"passage about item {i}"}
                      for i in range(16)]
    passages10 = passages10_all[pid * 8:(pid + 1) * 8]
    index10 = DistributedIndex(mesh=mesh10, dtype=jnp.float32)
    index10.init_embeddings(passages10, dim=atlas10.retriever_cfg.hidden_size)
    atlas10.build_index(index10, passages10, embedder_batch_size=8)
    data10 = os.path.join(tmp, f"mp10_{pid}.jsonl")  # same content per rank; the
    # task iterator deals lines 1-BASED (tasks/base.py:44-45): rank 0 draws
    # file lines 2,4 (items 1,3), rank 1 lines 1,3 (items 0,2)
    with open(data10, "w") as f:
        for i in range(4):
            f.write(json.dumps({"question": f"what is item {i}?",
                                "answers": [f"thing {i}"]}) + "\n")
    cfg10.train_data = [data10]
    atlas10, state10, step10 = train_loop(atlas10, index10, passages10, 0, cfg10,
                                          os.path.join(tmp, "mp10"))
    assert step10 == 3
    assert any("mp" in str(getattr(l.sharding, "spec", ""))
               for l in jax.tree.leaves(state10.params["reader"])), "TP not engaged"

    # loss probe on the canonical global batch: rank p contributes probe rows
    # [p, p+2], so the assembled global row order is [0, 2, 1, 3] — the parent
    # runs the single-process config on exactly that order
    probe_q = [f"probe question {i}? answer: <extra_id_0>" for i in range(4)]
    probe_t = [f"<extra_id_0> thing {i}" for i in range(4)]
    q_loc = [probe_q[pid], probe_q[pid + 2]]
    t_loc = [probe_t[pid], probe_t[pid + 2]]
    batch10, _ = atlas10.make_batch(index10, query=q_loc, target=t_loc, training=False)
    loss10, _ = atlas10.loss_fn(state10.params, batch10, None,
                                train_retriever=True, training=False)
    loss10 = float(loss10)

    # generation with multi-host TP-sharded params: both ranks enter the union
    # protocol with DIFFERENT local queries and get their own rows back
    rt10, _ = atlas10.tokenize_passages(
        q_loc, [[passages10[0], passages10[1]] for _ in q_loc])
    gen10 = atlas10.generate(rt10, q_loc)
    assert gen10.shape == (2, cfg10.generation_max_length), gen10.shape
    assert (gen10[:, 0] == atlas10.reader_cfg.decoder_start_token_id).all()

    # the production eval loop end-to-end under mp>1 (retrieve -> generate ->
    # cross-host metric reduction); ranks see different examples, same metric out
    em10 = evaluate(atlas10, index10, cfg10, data10, step10)["exact_match"]

    if pid == 0:
        with open(os.path.join(tmp, "mp10_result.json"), "w") as f:
            json.dump({"loss": loss10, "exact_match": float(em10),
                       "gen_rank0": np.asarray(gen10).tolist()}, f)

    print(f"WORKER{pid} OK", flush=True)


if __name__ == "__main__":
    main()
