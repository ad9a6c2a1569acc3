"""Flat exact-MIPS distributed index, device-resident and mesh-sharded.

Behavioral reference: DistributedIndex (/root/reference/src/index.py:43-160) — one
embedding shard per worker, exact inner-product scan + top-k, cross-worker merge,
re-shardable save/load. TPU-native redesign:

- Embeddings live as ONE jax array (N_pad, dim) row-sharded over the full ("dp","mp")
  mesh (index.py:51-53 keeps a (dim, N/W) fp16 tensor per rank).
- search is ONE jitted shard_map: local scores q @ E_shardᵀ on the MXU + lax.top_k,
  then an all_gather of (scores, global ids) over ICI and a re-top-k merge
  (replaces the varsize_all_gather / pickle-over-NCCL protocol of index.py:123-157;
  passage payloads are resolved host-side from global ids — see docstore.py).
- On TPU the local scan can use the fused Pallas tile-scan+top-k kernel
  (atlas_tpu/ops/mips.py) instead of materializing the (B, N_shard) score matrix.
"""

from __future__ import annotations

import json
import logging
import math
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from atlas_tpu.index.docstore import DocStore
from atlas_tpu.ops.mips import mips_topk
from atlas_tpu.parallel.mesh import get_mesh

logger = logging.getLogger(__name__)

EMBEDDINGS_DIM = 768
NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sync_processes(tag: str) -> None:
    """Cross-process barrier (reference barriers after index work, atlas.py:83).
    save_index -> load_index without this is a real race: rank 0's meta file and
    other ranks' shard files are not guaranteed visible when save_index returns."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def _host_local_rows(x) -> np.ndarray:
    """(B, D) queries -> this process's rows as host numpy.

    In multi-host training the query embeddings arrive as a GLOBAL jax array
    sharded over "dp" (atlas.embed_queries_device under set_mesh); np.asarray on
    it raises (non-addressable devices). The process-local view search_knn's
    union protocol wants is exactly the locally-addressable row block.
    """
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(x, dtype=np.float32)
    seen, parts = set(), []
    for s in sorted(x.addressable_shards, key=lambda sh: sh.index[0].start or 0):
        assert s.data.shape[1:] == x.shape[1:], (
            "search_knn queries must be sharded on rows only", s.index)
        key = (s.index[0].start or 0, s.index[0].stop)
        if key in seen:  # replicated copies on several local devices
            continue
        seen.add(key)
        parts.append(np.asarray(s.data, dtype=np.float32))
    return np.concatenate(parts, axis=0)


class DistributedIndex:
    """Flat exact MIPS over a mesh-sharded embedding matrix."""

    def __init__(self, mesh: Optional[Mesh] = None, dtype=jnp.bfloat16,
                 recall_target: float = 0.99, use_pallas: bool = False):
        self.mesh = mesh if mesh is not None else get_mesh()
        self.dtype = dtype
        # per-chunk selection recall (1.0 = exact); see ops/mips.py
        self.recall_target = recall_target
        # explicit Pallas kernel instead of the XLA scan (ops/pallas_mips.py)
        self.use_pallas = use_pallas
        self.embeddings: Optional[jax.Array] = None  # (N_pad, dim), sharded
        self.doc_store: Optional[DocStore] = None
        self.n_total = 0
        self.dim = EMBEDDINGS_DIM
        # jitted search executables keyed by (topk, n_pad, dtype): shape-stable
        # across refreshes, so hot-swapping embeddings does NOT retrigger a trace
        self._search_cache = {}

    # ----------------------------------------------------------------- lifecycle

    @property
    def n_devices(self) -> int:
        return self.mesh.devices.size

    @property
    def sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(("dp", "mp"), None))

    def init_embeddings(self, passages: Sequence[dict], dim: int = EMBEDDINGS_DIM) -> None:
        """Allocate the zeroed sharded embedding matrix + doc store (index.py:49-53).

        Global row space: process p owns the contiguous padded block
        [p*rows_per_process, (p+1)*rows_per_process); its local passage j sits at
        global row p*rows_per_process + j. Device shards subdivide each process
        block, so a global id maps back to (process, local row) by div/mod —
        the invariant every consumer (search masking, DocStore resolution,
        refresh slab assembly, save/load) relies on.
        """
        self.dim = dim
        P = jax.process_count()
        local_count = len(passages)
        if P == 1:
            counts = [local_count]
        else:
            from jax.experimental import multihost_utils

            counts = [int(c) for c in
                      multihost_utils.process_allgather(np.array([local_count])).reshape(-1)]
        dev_per_proc = self.n_devices // P
        self.n_total = int(sum(counts))
        self.proc_counts = counts
        rows_per_process = _round_up(max(max(counts), dev_per_proc), dev_per_proc)
        n_pad = rows_per_process * P
        self.embeddings = jax.jit(
            lambda: jnp.zeros((n_pad, dim), dtype=self.dtype),
            out_shardings=self.sharding,
        )()
        self.doc_store = DocStore(passages, row_offset=jax.process_index() * rows_per_process,
                                  n_total=self.n_total)
        self._search_cache.clear()  # proc_counts / n_pad changed


    @property
    def n_pad(self) -> int:
        return 0 if self.embeddings is None else self.embeddings.shape[0]

    def set_embeddings(self, embeddings: jax.Array) -> None:
        """Install a freshly computed (N_pad, dim) sharded matrix (refresh hot-swap)."""
        assert embeddings.shape == (self.n_pad, self.dim), embeddings.shape
        self.embeddings = embeddings  # search executables stay valid (same shapes)

    def write_embeddings_rows(self, start: int, rows: jax.Array) -> None:
        """In-place row-range update (refresh writes, atlas.py:79 semantics).

        Donates the old buffer so XLA updates the shards without a 2x HBM copy.
        """
        upd = jax.jit(
            lambda e, r: jax.lax.dynamic_update_slice(e, r.astype(e.dtype), (start, 0)),
            donate_argnums=0,
            out_shardings=self.sharding,
        )
        self.embeddings = upd(self.embeddings, rows)

    def is_index_trained(self) -> bool:
        return True

    def train_index(self) -> None:  # flat index needs no training
        return None

    # -------------------------------------------------------------------- search

    def _shard_valid_rows(self, dev):
        """Traced count of valid rows on device `dev` (padding sits at each
        process-block tail, so validity is per-process, not global-contiguous)."""
        P = max(jax.process_count(), 1)
        dev_per_proc = self.n_devices // P
        shard_rows = self.n_pad // self.n_devices
        counts = jnp.asarray(getattr(self, "proc_counts", [self.n_total]), dtype=jnp.int32)
        p = dev // dev_per_proc
        d_local = dev % dev_per_proc
        return jnp.clip(counts[p] - d_local * shard_rows, 0, shard_rows)

    def _build_search(self, topk: int):
        mesh, n_pad = self.mesh, self.n_pad
        n_dev = self.n_devices
        shard_rows = n_pad // n_dev
        k_local = min(topk, shard_rows)

        def local_search(queries, emb_shard):
            # queries (B, D) replicated; emb_shard (shard_rows, D)
            dev = jax.lax.axis_index("dp") * jax.lax.axis_size("mp") + jax.lax.axis_index("mp")
            # fused streaming scan+top-k (ops/mips.py) — no (B, shard_rows) score
            # matrix in HBM; padding rows beyond the corpus masked via n_valid
            n_valid_local = self._shard_valid_rows(dev)
            # chunk = whole shard when it fits: the lax.scan chunking costs an
            # extra copy of each chunk (measured 3.6ms -> 9-12ms at 1M x 768 on
            # v5e), so only engage it beyond ~1M rows/device
            if self.use_pallas:
                from atlas_tpu.ops.pallas_mips import mips_topk_pallas

                vals, idx = mips_topk_pallas(queries, emb_shard, k_local,
                                             n_valid=n_valid_local)
            else:
                vals, idx = mips_topk(queries, emb_shard, k_local, n_valid=n_valid_local,
                                      chunk=1_048_576, recall_target=self.recall_target)
            gidx = dev * shard_rows + idx
            # merge over the full mesh: (n_dev, B, k_local)
            vals_all = jax.lax.all_gather(vals, ("dp", "mp"))
            gidx_all = jax.lax.all_gather(gidx, ("dp", "mp"))
            B = queries.shape[0]
            vals_all = vals_all.transpose(1, 0, 2).reshape(B, n_dev * k_local)
            gidx_all = gidx_all.transpose(1, 0, 2).reshape(B, n_dev * k_local)
            mvals, mpos = jax.lax.top_k(vals_all, topk)
            mgids = jnp.take_along_axis(gidx_all, mpos, axis=1)
            return mvals, mgids

        shmapped = jax.shard_map(
            local_search,
            mesh=mesh,
            in_specs=(P(), P(("dp", "mp"), None)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(shmapped)

    def device_search(self, queries: jax.Array, topk: int) -> Tuple[jax.Array, jax.Array]:
        """(B, D) queries -> (scores (B,k) fp32, global ids (B,k) int32), one jit."""
        key = (topk, self.n_pad, str(self.embeddings.dtype), self.use_pallas)
        fn = self._search_cache.get(key)
        if fn is None:
            fn = self._search_cache[key] = self._build_search(topk)
        return fn(queries, self.embeddings)

    def search_knn(self, queries, topk: int) -> Tuple[List[List[dict]], List[List[float]]]:
        """API-parity wrapper (index.py:122-157): resolve docs host-side by global id.

        Multi-host: every process searches the UNION of all processes' queries (the
        reference's varsize_all_gather protocol, index.py:127) so the jitted SPMD
        search sees one identical replicated batch on every host — ragged or padding
        ranks included — then each process keeps its own rows.
        """
        queries = _host_local_rows(queries)
        n_local = queries.shape[0]
        P = jax.process_count()
        if P > 1:
            from jax.experimental import multihost_utils

            sizes = multihost_utils.process_allgather(np.array([n_local])).reshape(-1)
            m = int(sizes.max())
            padded = np.zeros((max(m, 1), queries.shape[1] if queries.ndim == 2 else self.dim),
                              dtype=np.float32)
            padded[:n_local] = queries
            allq = multihost_utils.process_allgather(padded).reshape(-1, padded.shape[1])
        else:
            if n_local == 0:
                return [], []
            allq = queries
        k = min(topk, self.n_total)
        scores, gids = self.device_search(jnp.asarray(allq), k)
        scores_np, gids_np = np.asarray(scores), np.asarray(gids)
        if P > 1:
            start = jax.process_index() * int(max(int(sizes.max()), 1))
            scores_np = scores_np[start : start + n_local]
            gids_np = gids_np[start : start + n_local]
        # always run the lookup: in multi-host it contains a host collective that
        # every process (even one with zero local queries) must enter
        docs = self.doc_store.lookup_batch(gids_np)
        return docs, [list(map(float, row)) for row in scores_np]

    # ------------------------------------------------------------------------ io

    def _emb_path(self, d: str, shard: int) -> str:
        return os.path.join(d, f"embeddings.{shard}.npy")

    def _psg_path(self, d: str, shard: int) -> str:
        return os.path.join(d, f"passages.{shard}.jsonl")

    def _meta_path(self, d: str) -> str:
        return os.path.join(d, "index_meta.json")

    def save_index(self, path: str, total_saved_shards: int, overwrite_saved_passages: bool = False) -> None:
        """Save embeddings+passages in total_saved_shards re-shardable files
        (semantics of index.py:61-87; our format: .npy + .jsonl + meta)."""
        assert self.embeddings is not None
        os.makedirs(path, exist_ok=True)
        ws = jax.process_count()
        rank = jax.process_index()
        assert total_saved_shards % ws == 0, "N workers must divide total_saved_shards"
        shards_per_worker = total_saved_shards // ws
        # local rows of the global matrix (contiguous per process, device order)
        rows_per_proc = self.n_pad // ws
        local = np.asarray(
            jax.device_get(self.embeddings[rank * rows_per_proc : (rank + 1) * rows_per_proc])
            if ws == 1
            else np.concatenate([s.data for s in sorted(self.embeddings.addressable_shards, key=lambda s: s.index[0].start)])
        ).astype(np.float16)
        n_local_valid = min(self.doc_store.n_local, local.shape[0])
        local = local[:n_local_valid]
        per_shard = math.ceil(n_local_valid / shards_per_worker)
        for si, start in enumerate(range(0, n_local_valid, per_shard)):
            end = min(start + per_shard, n_local_valid)
            shard_id = si + rank * shards_per_worker
            np.save(self._emb_path(path, shard_id), local[start:end])
            ppath = self._psg_path(path, shard_id)
            if not os.path.exists(ppath) or overwrite_saved_passages:
                with open(ppath, "w", encoding="utf-8") as f:
                    for p in self.doc_store.passages[start:end]:
                        f.write(json.dumps(p, ensure_ascii=False) + "\n")
        if rank == 0:
            with open(self._meta_path(path), "w") as f:
                json.dump({"n_total": self.n_total, "dim": self.dim, "total_saved_shards": total_saved_shards}, f)
        _sync_processes("atlas_tpu:save_index")

    def load_index(self, path: str, total_saved_shards: int) -> None:
        """Load shard files, re-sharding across the current world (index.py:89-111)."""
        ws = jax.process_count()
        rank = jax.process_index()
        assert total_saved_shards % ws == 0, "N workers must divide total_saved_shards"
        shards_per_worker = total_saved_shards // ws
        embs, passages = [], []
        for shard_id in range(rank * shards_per_worker, (rank + 1) * shards_per_worker):
            embs.append(np.load(self._emb_path(path, shard_id)))
            with open(self._psg_path(path, shard_id), encoding="utf-8") as f:
                passages.extend(json.loads(line) for line in f)
        local = np.concatenate(embs, axis=0)
        with open(self._meta_path(path)) as f:
            meta = json.load(f)
        self.dim = meta["dim"]
        self.n_total = meta["n_total"]
        # same block row-space as init_embeddings: per-process padded blocks
        if ws == 1:
            counts = [local.shape[0]]
        else:
            from jax.experimental import multihost_utils

            counts = [int(c) for c in
                      multihost_utils.process_allgather(np.array([local.shape[0]])).reshape(-1)]
        self.proc_counts = counts
        dev_per_proc = self.n_devices // ws
        rows_per_process = _round_up(max(max(counts), dev_per_proc), dev_per_proc)
        n_pad = rows_per_process * ws
        padded = np.zeros((rows_per_process, self.dim), dtype=np.float16)
        padded[: local.shape[0]] = local
        row_offset = rank * rows_per_process
        self.doc_store = DocStore(passages, row_offset=row_offset, n_total=self.n_total)
        self.embeddings = jax.jit(
            lambda x: x.astype(self.dtype), out_shardings=self.sharding
        )(jnp.asarray(padded) if ws == 1 else self._from_process_local(padded, n_pad))
        self._search_cache.clear()  # proc_counts / n_pad changed

    def _from_process_local(self, local_rows: np.ndarray, n_pad: int) -> jax.Array:
        from jax.experimental import multihost_utils

        return multihost_utils.host_local_array_to_global_array(
            local_rows, self.mesh, P(("dp", "mp"), None)
        )
