"""ivfpq/ivfsq8 recall-QPS frontier (VERDICT r04 item 6).

Sweeps nprobe x refine in ONE process on the same built index (tunnel
throughput drifts ~20% between sessions — CLAUDE.md), so the points are
directly comparable. Prints one JSON line per operating point plus a final
frontier summary naming the dominant >=0.95-recall point, which becomes the
published bench default.

Reference cost model: /root/reference/src/index.py:207-219 (IVF probe cost),
302-345 (IVFPQ build); the reference serves bare IndexIVFPQ and never wraps
IndexRefineFlat — the refine column here is beyond-parity capability.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_ivfpq_frontier.py [--index_type ivfpq]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

DIM = 768
TOPK = 100
N = 1_000_000
B = 8
NQ = 256


def _timed(fn, iters=20):
    outs = [fn() for _ in range(iters)]
    np.asarray(jax.tree.leaves(outs[-1])[0])
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    np.asarray(jax.tree.leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / iters


def _recall(a, e):
    a, e = np.asarray(a), np.asarray(e)
    return round(sum(len(set(a[i]) & set(e[i])) for i in range(e.shape[0])) / e.size, 4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index_type", default="ivfpq", choices=["ivfpq", "ivfsq8", "ivfflat"])
    ap.add_argument("--n", type=int, default=N)
    ap.add_argument("--nprobes", default="8,16,32,64")
    ap.add_argument("--refines", default="0,4")
    args = ap.parse_args()

    from atlas_tpu.index.approx import DistributedApproxIndex
    from atlas_tpu.ops.mips import mips_topk
    from atlas_tpu.parallel.mesh import make_mesh, set_global_mesh

    mesh = make_mesh(1, 1)
    set_global_mesh(mesh)
    n = args.n

    # same rank-64-residual clustered corpus as bench_ivfpq_sparse (bench.py)
    @jax.jit
    def gen(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        centers = jax.random.normal(k1, (1000, DIM), jnp.float32) * 2
        asg = jax.random.randint(k2, (n,), 0, 1000)
        W = jax.random.normal(k4, (64, DIM), jnp.float32) / np.sqrt(64)
        z = jax.random.normal(k3, (n, 64), jnp.float32)
        e = centers[asg] + 0.3 * np.sqrt(DIM / 64) * (z @ W)
        return e / jnp.linalg.norm(e, axis=1, keepdims=True)

    embs = gen(jax.random.PRNGKey(7))
    queries = np.asarray(embs[:NQ].astype(jnp.float32))
    exact = jax.jit(lambda q, e: mips_topk(q, e, TOPK, chunk=1_048_576,
                                           recall_target=1.0))
    exact_ids = np.concatenate([np.asarray(exact(jnp.asarray(queries[s:s + 64]), embs)[1])
                                for s in range(0, NQ, 64)])

    kw = {"code_size": 64} if args.index_type == "ivfpq" else {}
    index = DistributedApproxIndex(args.index_type, mesh=mesh, dtype=jnp.bfloat16,
                                   nprobe=16, **kw)
    index.init_embeddings([{"id": str(i)} for i in range(n)], dim=DIM)
    index.write_embeddings_rows(0, embs)
    del embs
    index.train_index()
    index.ivf_impl = "sparse"

    points = []
    for nprobe in [int(x) for x in args.nprobes.split(",")]:
        index.nprobe_value = nprobe  # search caches key on nprobe (CLAUDE.md)
        for rf in [int(x) for x in args.refines.split(",")]:
            index.refine_factor = rf if rf > 1 else 1
            got = np.concatenate([np.asarray(index.device_search(
                jnp.asarray(queries[s:s + B]), TOPK)[1]) for s in range(0, NQ, B)])
            rec = _recall(got, exact_ids)
            q0 = jnp.asarray(queries[:B])
            dt = _timed(lambda: index.device_search(q0, TOPK))
            pt = {"index_type": args.index_type, "nprobe": nprobe, "refine": rf,
                  "qps": round(B / dt, 1), "recall_at_100": rec,
                  "ms_per_batch": round(dt * 1e3, 3)}
            points.append(pt)
            print(json.dumps(pt), flush=True)

    # dominant point: highest QPS among recall >= 0.95
    ok = [p for p in points if p["recall_at_100"] >= 0.95]
    best = max(ok, key=lambda p: p["qps"]) if ok else None
    print(json.dumps({"frontier_summary": points,
                      "dominant_ge95": best}), flush=True)


if __name__ == "__main__":
    main()
