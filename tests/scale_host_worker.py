"""Multi-million-row host-side rehearsal worker (tests/test_scale_host.py).

Defends the 33M/400M-passage host-side claims (reference README.md:19,102,
re-sharding src/index.py:61-111) at a size this box can actually run: a 2M-row
synthetic corpus through the REAL components — native lazy jsonl loader,
DocStore global-id lookup, sharded index row accounting + save/load
resharding, and the refresh embedder's slab math — with an RSS ceiling that a
materialize-everything implementation (2M python dicts ~0.8 GB + eager copies)
would blow. Runs in its own process so the RSS high-water mark is its own.
"""

import json
import os
import resource
import sys

N = 2_000_000


def rss_gib() -> float:
    # VmHWM = peak resident of the CURRENT address space. ru_maxrss is a
    # per-task watermark that SURVIVES exec: this worker, forked from a pytest
    # process that has grown to ~6 GiB after 200 tests, inherits the parent's
    # peak and reads 6.01 GiB before doing any work — the r05 full-suite-only
    # failure of this drill (isolated runs, with a small parent, read 0.4).
    # Verified: a child of a 700 MB parent reports ru_maxrss 831 MB but
    # VmHWM 164 MB.
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmHWM:"):
                return int(line.split()[1]) / 2**20  # kB -> GiB
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def main():
    tmp = sys.argv[1]
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    # ---- 1. synthetic corpus on disk (~140 MB jsonl)
    path = os.path.join(tmp, "corpus.jsonl")
    with open(path, "w") as f:
        chunk = []
        for i in range(N):
            chunk.append('{"id": "%d", "title": "t%d", "text": "passage body %d"}\n'
                         % (i, i, i))
            if len(chunk) == 100_000:
                f.writelines(chunk)
                chunk = []
        f.writelines(chunk)

    # ---- 2. native lazy loader: 2M rows as ONE blob, not 2M dicts
    from atlas_tpu.native import NativePassageStore

    store = NativePassageStore([path])
    assert len(store) == N
    assert store[0]["id"] == "0" and store[N - 1]["text"] == f"passage body {N-1}"
    assert store[123456]["title"] == "t123456"
    rss_loaded = rss_gib()

    # ---- 3. DocStore over the lazy store: scattered global-id lookups
    from atlas_tpu.index.docstore import DocStore

    ds = DocStore(store, row_offset=0, n_total=N)
    gids = np.array([[0, 999_999, 1_999_999], [5, 1_234_567, 42]])
    rows = ds.lookup_batch(gids)
    assert [d["id"] for d in rows[0]] == ["0", "999999", "1999999"]
    assert [d["id"] for d in rows[1]] == ["5", "1234567", "42"]

    # ---- 4. sharded index accounting + save/load resharding at 2M rows
    from atlas_tpu.index.flat import DistributedIndex
    from atlas_tpu.parallel.mesh import make_mesh, set_global_mesh

    mesh = make_mesh(8, 1)
    set_global_mesh(mesh)
    dim = 16
    index = DistributedIndex(mesh=mesh, dtype=jnp.bfloat16)
    index.init_embeddings(store, dim=dim)
    assert index.n_total == N
    # deterministic rows so the reshard roundtrip is checkable by value
    emb = jax.jit(lambda: (jnp.arange(N, dtype=jnp.float32)[:, None]
                           % 97 / 97.0 + jnp.arange(dim)[None, :] / dim
                           ).astype(jnp.bfloat16))()
    index.write_embeddings_rows(0, emb)
    del emb
    q = np.zeros((2, dim), np.float32)
    q[0, 0] = 1.0
    q[1, -1] = 1.0
    docs, _ = index.search_knn(q, 3)
    assert all(len(r) == 3 for r in docs)
    save_dir = os.path.join(tmp, "idx")
    index.save_index(save_dir, total_saved_shards=16)
    index2 = DistributedIndex(mesh=mesh, dtype=jnp.bfloat16)
    index2.load_index(save_dir, total_saved_shards=16)
    assert index2.n_total == N
    d2, _ = index2.search_knn(q, 3)
    assert [[d["id"] for d in r] for r in docs] == [[d["id"] for d in r] for r in d2]

    # ---- 5. refresh slab accounting over the 2M corpus (run 2 real slabs,
    # verify the step math covers every row exactly once per device shard)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from helpers import tiny_atlas

    from atlas_tpu.index.refresh import ShardedCorpusEmbedder

    atlas = tiny_atlas()
    atlas.set_mesh(mesh)
    index3 = DistributedIndex(mesh=mesh, dtype=jnp.bfloat16)
    index3.init_embeddings(store, dim=atlas.retriever_cfg.hidden_size)
    emb3 = ShardedCorpusEmbedder(atlas, index3, store, batch_rows=512)
    import math

    assert emb3.shard_rows * 8 == index3.n_pad >= N
    assert emb3.n_steps == math.ceil(emb3.shard_rows / 512)
    assert emb3.n_steps * 512 >= emb3.shard_rows  # full coverage
    emb3.start_refresh()
    assert emb3.in_progress
    assert emb3.advance(2) is False  # 2 slabs of 512 rows/device embedded
    assert emb3.in_progress

    print(json.dumps({"rss_loaded_gib": round(rss_loaded, 2),
                      "rss_final_gib": round(rss_gib(), 2)}))
    print("SCALE_HOST_OK", flush=True)


if __name__ == "__main__":
    main()
