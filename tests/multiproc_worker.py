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

    raw = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(os.path.join(ckdir, "checkpoint", "step-1", "state.orbax")))
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

    print(f"WORKER{pid} OK", flush=True)


if __name__ == "__main__":
    main()
