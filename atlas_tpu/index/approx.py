"""Approximate (faiss-equivalent) distributed index modes: flat / pq / ivfflat /
ivfpq / ivfsq.

Behavioral reference: DistributedFAISSIndex (/root/reference/src/index.py:163-381),
which delegates to faiss-gpu: PQ with 8-bit codes (code_size subquantizers), IVF with
nlist = nprobe = ⌊√N⌋ (:212,:269), 4-bit scalar quantizer (:334), per-shard training
on the local embeddings (:348-358), fp16 lookup tables. TPU-native redesign:

- Quantizer state (PQ codebooks, coarse centroids, SQ ranges) is small and replicated;
  CODES are row-sharded over the mesh exactly like the flat index's embeddings.
- Search is the same one-jit shard_map protocol as the flat index, with the local scan
  decoding code chunks on the fly (decode-and-matmul ADC: reconstruction is a gather
  + the same MXU matmul as flat — HBM traffic drops by the compression factor, which
  is the point of PQ/SQ at 400M-passage scale).
- IVF keeps exact list semantics two ways: a probe MASK over the full scan (rows of
  unprobed clusters score -inf — same cost as the reference's degenerate
  nprobe = nlist default), and a sparse posting-list path (ops/ivf_sparse.py, a
  scalar-prefetch Pallas kernel over a cluster-sorted block layout) that engages
  when nprobe << nlist so cost scales with the rows actually probed.
- The ".faiss file" role (:228-243) is an npz of quantizer state + codes per process.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from atlas_tpu.index import quantize as Q
from atlas_tpu.index.flat import NEG, DistributedIndex

TRAIN_SAMPLE = 65536


class DistributedApproxIndex(DistributedIndex):
    def __init__(self, index_type: str = "flat", code_size: Optional[int] = None,
                 mesh=None, dtype=jnp.bfloat16, nprobe: int = 0,
                 refine_factor: int = 0):
        super().__init__(mesh=mesh, dtype=dtype)
        assert index_type in ("flat", "pq", "ivfflat", "ivfpq", "ivfsq", "sq8",
                              "ivfsq8"), index_type
        self.index_type = index_type
        self.code_size = code_size  # PQ subquantizers (faiss code_size)
        # faiss QT_4bit (index.py:334); "sq8" is the TPU-native 8-bit mode whose
        # codes feed the MXU directly (see _build_search); "ivfsq8" combines IVF
        # probing with 8-bit RESIDUAL codes (faiss IVFScalarQuantizer QT_8bit
        # role) — near-exact recall at half the bf16 bytes, served sparsely
        self.sq_bits = 4 if index_type == "ivfsq" else 8
        self.adc_impl = "auto"  # "auto" | "pallas" (ops.pq_adc kernel) | "xla"
        self.use_opq = True  # OPQ rotation before PQ (faiss OPQMatrix role)
        self.sq8_impl = "auto"  # "auto" | "pallas" (ops.pallas_mips byte stream) | "xla"
        self.scan_chunk = 131072  # rows per lax.scan step in the masked scan
        # IVF probing: 0 = reference default nprobe = nlist = floor(sqrt(N))
        # (index.py:212), where the masked scan costs the same as faiss's full
        # sweep. A smaller explicit nprobe engages the sparse posting-list path.
        self.nprobe_value = nprobe
        self.ivf_impl = "auto"  # "auto" | "sparse" (ops.ivf_sparse) | "masked"
        # approx search closes over quantizer state, so it is cached per-object and
        # invalidated on (re)train — unlike the flat index's shape-keyed cache
        self._search_fn = None
        self._ivf_layout: Optional[Dict[str, Any]] = None  # cluster-sorted blocks
        self._sparse_fn = None  # cached jitted sparse searches, keyed by topk
        self._sq8_layout: Optional[jax.Array] = None  # (NB, D, SUB) s8 blocks
        self._sq8_fn = None  # cached jitted sq8 pallas searches, keyed by topk
        # Exact re-ranking of the top (k * refine_factor) lossy-code candidates
        # against the resident embeddings (faiss IndexRefineFlat k_factor role).
        # The reference never wraps its IVFPQ in a refine (src/index.py:302-345
        # builds bare IndexIVFPQ), so 0/1 = parity default and >1 is
        # beyond-parity recall recovery: final recall@k becomes P(gold in the
        # code scan's top k*factor), not P(gold in its top k).
        self.refine_factor = refine_factor
        self._refine_cache: Dict[Any, Any] = {}  # keyed by (k, R, n_pad, dtype)
        self.quant: Dict[str, Any] = {}  # replicated quantizer state
        self.codes: Optional[jax.Array] = None  # sharded (N_pad, M) uint8
        self.cluster_of: Optional[jax.Array] = None  # sharded (N_pad,) int32

    # ------------------------------------------------------------------ training

    @property
    def uses_pq(self) -> bool:
        return self.index_type in ("pq", "ivfpq")

    @property
    def uses_sq(self) -> bool:
        return self.index_type in ("ivfsq", "sq8", "ivfsq8")

    @property
    def uses_ivf(self) -> bool:
        return self.index_type.startswith("ivf")

    def is_index_trained(self) -> bool:
        return bool(self.quant) or self.index_type == "flat"

    def _nlist(self) -> int:
        return max(1, math.floor(math.sqrt(self.n_total)))  # index.py:269

    def nprobe(self) -> int:
        if self.nprobe_value > 0:
            return min(self.nprobe_value, self._nlist())
        return max(1, math.floor(math.sqrt(self.n_total)))  # index.py:212

    def _sparse_engaged(self) -> bool:
        """Sparse posting-list probing pays off when nprobe is a small fraction of
        nlist (cost ∝ B·nprobe·cluster vs one full-shard stream for the masked
        scan). ivfflat/ivfsq use ops.ivf_sparse; ivfpq uses the sparse ADC kernel
        (ops.pq_adc.pq_adc_sparse_scores) over block-transposed codes."""
        if not self.uses_ivf:
            return False
        if self.ivf_impl == "sparse":
            return True
        if self.ivf_impl != "auto":
            return False
        return self.nprobe() * 4 <= self._nlist()

    def _train_sample(self) -> jnp.ndarray:
        """Sample valid rows only: padding sits at each process-block TAIL (flat.py
        row space), so stride over each block's valid prefix instead of [0, n_total)."""
        nproc = max(jax.process_count(), 1)
        counts = getattr(self, "proc_counts", [self.n_total])
        rpp = self.n_pad // nproc
        per_proc = max(1, TRAIN_SAMPLE // nproc)
        parts = []
        for p in range(nproc):
            stride = max(1, counts[p] // per_proc)
            parts.append(self.embeddings[p * rpp : p * rpp + counts[p] : stride])
        return jnp.concatenate(parts, axis=0).astype(jnp.float32)

    def train_index(self) -> None:
        """(Re)train quantizers on the current embeddings and encode all rows
        (reference lifecycle: reset + train at every refresh, index.py:348-358)."""
        assert self.embeddings is not None and self.n_total > 0
        key = jax.random.PRNGKey(0)
        sample = self._train_sample()
        quant: Dict[str, Any] = {}
        if self.uses_ivf:
            quant["centroids"] = Q.kmeans(jax.random.fold_in(key, 2), sample, self._nlist())
            if self.uses_pq or self.uses_sq:
                # faiss by_residual (the IndexIVFPQ/IVFScalarQuantizer default,
                # index.py:302-345): the fine quantizer encodes x - coarse
                # centroid, spending its resolution on INTRA-cluster structure.
                # Raw-vector PQ under IVF collapses on clustered corpora — the
                # codebooks reproduce the cluster directions and wash out the
                # within-cluster detail that ranks the probed rows (measured:
                # recall@100 0.22 raw vs 0.95+ residual on 100-cluster data).
                cents = quant["centroids"]
                s = sample @ cents.T - 0.5 * jnp.sum(cents * cents, axis=1)[None]
                sample = sample - cents[jnp.argmax(s, axis=1)]
        if self.uses_pq:
            M = self.code_size or 64
            if self.use_opq:
                # OPQ (Ge et al. 2013): orthogonal rotation aligning PQ
                # subspaces with the (residual) principal directions — recovers
                # most of the quantization loss on low-intrinsic-dim embedding
                # data; one extra (d, d) matmul per encode/search. faiss ships
                # it as OPQMatrix; the reference's bare IndexIVFPQ does not.
                R, cb = Q.opq_train(jax.random.fold_in(key, 1), sample, M)
                quant["opq_rot"], quant["codebooks"] = R, cb
            else:
                quant["codebooks"] = Q.pq_train(jax.random.fold_in(key, 1), sample, M)
        if self.uses_sq:
            scale, vmin = Q.sq_train(sample, self.sq_bits)
            quant["sq_scale"], quant["sq_vmin"] = scale, vmin
        self.quant = quant
        self._encode_all()
        self._search_fn = None
        self._ivf_layout = None
        self._sparse_fn = None
        self._sq8_layout = None
        self._sq8_fn = None

    def _encode_all(self) -> None:
        """Row-parallel encode of the sharded embedding matrix into sharded codes.

        Under IVF the fine quantizers encode RESIDUALS x - centroid[cluster_of]
        (see train_index), so cluster assignment runs first and the subtraction
        happens inside the encode jit (XLA fuses it into the per-subspace scan —
        no extra fp32 corpus transient beyond pq_encode's own cast)."""
        row_sharding = NamedSharding(self.mesh, P(("dp", "mp")))
        code_sharding = NamedSharding(self.mesh, P(("dp", "mp"), None))
        if self.uses_ivf:
            cents = self.quant["centroids"]

            def assign(emb):
                s = emb.astype(jnp.float32) @ cents.T - 0.5 * jnp.sum(cents * cents, axis=1)[None]
                return jnp.argmax(s, axis=1).astype(jnp.int32)

            self.cluster_of = jax.jit(assign, out_shardings=row_sharding)(self.embeddings)

            def fine_input(emb, cl):  # residual in fp32: emb may be bf16
                return emb.astype(jnp.float32) - cents[cl]
        else:
            def fine_input(emb):
                return emb

        if self.uses_pq:
            rot = self.quant.get("opq_rot")

            def enc(emb, *cl):
                fine = fine_input(emb, *cl)
                if rot is not None:  # encode in OPQ-rotated space
                    fine = fine.astype(jnp.float32) @ rot.T
                return Q.pq_encode(self.quant["codebooks"], fine)
        elif self.uses_sq:
            enc = (lambda emb, *cl: Q.sq_encode(
                fine_input(emb, *cl), self.quant["sq_scale"],
                self.quant["sq_vmin"], bits=self.sq_bits))
        else:
            return
        args = (self.embeddings, self.cluster_of) if self.uses_ivf else (self.embeddings,)
        self.codes = jax.jit(enc, out_shardings=code_sharding)(*args)

    # ------------------------------------------------------- sparse IVF layout

    def _build_ivf_layout(self) -> None:
        """Cluster-sorted, block-padded row layout for sparse probing.

        Per device shard: rows sorted by coarse cluster, each cluster padded to a
        multiple of R rows so no block straddles clusters (the contract of
        ops/ivf_sparse.py). Two passes because SPMD shapes must be static: pass 1
        measures the padded block count (max over devices), pass 2 scatters.
        """
        from atlas_tpu.ops.ivf_sparse import R

        nlist = self._nlist()
        mesh = self.mesh
        x_src = self.codes if (self.uses_sq or self.uses_pq) else self.embeddings
        x_dtype = x_src.dtype
        S = self.n_pad // self.n_devices  # rows per shard
        D = x_src.shape[1]
        rowP = P(("dp", "mp"))

        def _cl_counts(cluster_shard):
            dev = jax.lax.axis_index("dp") * jax.lax.axis_size("mp") + jax.lax.axis_index("mp")
            n_valid = self._shard_valid_rows(dev)
            valid = jnp.arange(S) < n_valid
            cl = jnp.where(valid, cluster_shard, nlist)  # padding -> sentinel bucket
            counts = jax.ops.segment_sum(
                jnp.ones((S,), jnp.int32), cl, num_segments=nlist + 1
            )[:nlist]
            return cl, counts

        def measure(cluster_shard):
            _, counts = _cl_counts(cluster_shard)
            nb = -(-counts // R)
            nb_total = jnp.sum(nb)
            # descending per-cluster block counts, maxed elementwise over devices:
            # sum of its first nprobe entries bounds ANY query's probed-block count
            # on ANY device — the static slot budget for the packed block lists
            nb_sorted = -jnp.sort(-nb)
            return (jax.lax.pmax(nb_total, ("dp", "mp")),
                    jax.lax.pmax(nb_sorted, ("dp", "mp")))

        nb_total, nb_sorted = jax.jit(jax.shard_map(
            measure, mesh=mesh, in_specs=(rowP,), out_specs=(P(), P()),
            check_vma=False,
        ))(self.cluster_of)
        NB = max(int(nb_total), 1)
        nb_budget = np.asarray(nb_sorted, dtype=np.int64)

        def build(x_shard, cluster_shard):
            cl, counts = _cl_counts(cluster_shard)
            nb = -(-counts // R)  # (nlist,) blocks per cluster
            bstart = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                      jnp.cumsum(nb)[:-1].astype(jnp.int32)])
            row0 = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                    jnp.cumsum(counts)[:-1].astype(jnp.int32)])
            order = jnp.argsort(cl, stable=True)  # padding rows sort last
            cl_s = cl[order]
            in_range = cl_s < nlist
            rank = jnp.arange(S, dtype=jnp.int32) - jnp.where(in_range, row0[jnp.minimum(cl_s, nlist - 1)], 0)
            pos = jnp.where(in_range, R * bstart[jnp.minimum(cl_s, nlist - 1)] + rank, NB * R)
            x_sorted = jnp.zeros((NB * R, D), x_dtype).at[pos].set(x_shard[order], mode="drop")
            rowvalid = jnp.zeros((NB * R,), jnp.bool_).at[pos].set(True, mode="drop")
            gid = jnp.zeros((NB * R,), jnp.int32).at[pos].set(order.astype(jnp.int32), mode="drop")
            x_blocks = x_sorted.reshape(NB, R, D)
            if self.uses_pq:  # sparse ADC kernel wants code blocks TRANSPOSED (NB, M, R)
                x_blocks = jnp.transpose(x_blocks, (0, 2, 1))
            return x_blocks, rowvalid, gid, bstart, nb.astype(jnp.int32)

        x_b, rv, gid, bstart, nb = jax.jit(jax.shard_map(
            build, mesh=mesh, in_specs=(rowP, rowP),
            out_specs=(rowP, rowP, rowP, rowP, rowP), check_vma=False,
        ))(x_src, self.cluster_of)
        self._ivf_layout = {"R": R, "NB": NB, "nb_budget": nb_budget, "nlist": nlist,
                            "x": x_b, "rowvalid": rv, "gid": gid,
                            "bstart": bstart, "nb": nb}

    def _build_search_sparse(self, topk: int, nprobe_req: int):
        """Sparse-probing search: per query, only the probed clusters' blocks are
        DMA'd and scored (ops/ivf_sparse.py). Same exact list semantics as the
        masked scan — identical results at equal nprobe."""
        from atlas_tpu.ops.ivf_sparse import ivf_sparse_scores

        lay = self._ivf_layout
        R, NB, nlist = lay["R"], lay["NB"], lay["nlist"]
        mesh, n_pad, n_dev = self.mesh, self.n_pad, self.n_devices
        shard_rows = n_pad // n_dev
        nprobe = min(nprobe_req, nlist)
        # static slot budget: no query on any device can probe more blocks than
        # the nprobe largest clusters hold. Packed (cumulative) placement instead
        # of an nprobe x max_blocks rectangle — the kernel is per-grid-step bound,
        # so wasted padding slots cost real time under cluster-size skew
        L = int(min(NB, lay["nb_budget"][:nprobe].sum()))
        L = max(L, 1)
        quant, dtype = self.quant, self.dtype
        uses_sq, uses_pq = self.uses_sq, self.uses_pq
        cents = quant["centroids"]
        k_local = min(topk, shard_rows)
        interp = jax.default_backend() != "tpu"

        def local_search(queries, x_b, rowvalid, gid, bstart, nb):
            dev = jax.lax.axis_index("dp") * jax.lax.axis_size("mp") + jax.lax.axis_index("mp")
            B = queries.shape[0]
            qf = queries.astype(jnp.float32)
            qdotc = qf @ cents.T  # (B, nlist) coarse inner products
            cscores = qdotc - 0.5 * jnp.sum(cents * cents, axis=1)[None]
            _, cs = jax.lax.top_k(cscores, nprobe)  # (B, nprobe)

            # pack each query's probed blocks contiguously: slot s belongs to the
            # probe whose exclusive-cumsum span covers s. One dense (B, nprobe,
            # L) comparison instead of vmap(searchsorted): same-process A/B at
            # B=8, nprobe=16, L=110 measures 0.13ms faster per call (~8% of the
            # device-side search; the serial-scan binary search is the slowest
            # single prologue op). Cost breakdown of the 2.55ms call: ~1ms
            # tunnel dispatch floor, kernel 0.75ms, epilogue 0.23ms, prologue
            # rest (coarse matmul + top_k(nlist) + packing)
            nbs = nb[cs]  # (B, nprobe) blocks per probed cluster
            offs = jnp.cumsum(nbs, axis=1) - nbs  # exclusive (B, nprobe), ascending
            total = offs[:, -1] + nbs[:, -1]  # (B,) true block count
            slots = jnp.arange(L, dtype=jnp.int32)
            pidx = (slots[None, None, :] >= offs[:, :, None]).sum(
                axis=1, dtype=jnp.int32) - 1  # (B, L) probe index per slot
            pidx = jnp.clip(pidx, 0, nprobe - 1)
            sel = jnp.take_along_axis(cs, pidx, axis=1)  # (B, L) cluster per slot
            ids = bstart[sel] + (slots[None, :] - jnp.take_along_axis(offs, pidx, axis=1))
            lvalid = slots[None, :] < total[:, None]
            ids = jnp.where(lvalid, ids, 0)

            const = jnp.zeros((B,), jnp.float32)
            if uses_pq:
                from atlas_tpu.ops.pq_adc import pq_adc_sparse_scores

                rot = quant.get("opq_rot")
                q_pq = qf @ rot.T if rot is not None else qf  # OPQ-rotated space
                s = pq_adc_sparse_scores(q_pq, quant["codebooks"], x_b, ids,
                                         interpret=interp)  # (B, L, R)
            else:
                if uses_sq:
                    q_eff = (qf * quant["sq_scale"]).astype(dtype)
                    const = qf @ (quant["sq_vmin"] + 0.5 * quant["sq_scale"])  # (B,)
                else:
                    q_eff = queries.astype(dtype)
                s = ivf_sparse_scores(q_eff, x_b, ids, interpret=interp)  # (B, L, R)
            if uses_pq or uses_sq:
                # residual codes (train_index): every row of slot l's block
                # belongs to cluster sel[b, l] — restore q . centroid per slot
                s = s + jnp.take_along_axis(qdotc, sel, axis=1)[:, :, None]
            # mask list-padding entries and in-block padding rows
            rmask = jnp.where(rowvalid.reshape(NB, R)[ids], 0.0, NEG)  # (B, L, R)
            s = s + rmask + jnp.where(lvalid[:, :, None], 0.0, NEG)
            s = s.reshape(B, L * R)
            kk = min(k_local, L * R)
            vals, pos = jax.lax.top_k(s, kk)
            srow = jnp.take_along_axis(ids, pos // R, axis=1) * R + pos % R
            lrow = gid[srow]  # (B, kk) local row within the shard
            gids = (dev * shard_rows + lrow).astype(jnp.int32)
            vals = vals + const[:, None]

            vals_all = jax.lax.all_gather(vals, ("dp", "mp"))
            gidx_all = jax.lax.all_gather(gids, ("dp", "mp"))
            vals_all = vals_all.transpose(1, 0, 2).reshape(B, n_dev * kk)
            gidx_all = gidx_all.transpose(1, 0, 2).reshape(B, n_dev * kk)
            # the device-union candidate pool (n_dev * kk) can be SMALLER than
            # the requested k when refine_factor inflates it past the probed-row
            # budget (cand_k = topk * factor vs L*R probed rows at small nprobe)
            # — top_k with k > axis size is a trace-time error (ADVICE r04).
            # Return a padded list instead: NEG scores / gid 0, which the refine
            # stage and recall accounting already mask.
            k_out = min(topk, n_dev * kk)
            mvals, mpos = jax.lax.top_k(vals_all, k_out)
            mgids = jnp.take_along_axis(gidx_all, mpos, axis=1)
            if k_out < topk:
                pad = topk - k_out
                mvals = jnp.concatenate(
                    [mvals, jnp.full((B, pad), NEG, mvals.dtype)], axis=1)
                mgids = jnp.concatenate(
                    [mgids, jnp.zeros((B, pad), mgids.dtype)], axis=1)
            return mvals, mgids

        rowP = P(("dp", "mp"))
        shmapped = jax.shard_map(
            local_search, mesh=mesh,
            in_specs=(P(), rowP, rowP, rowP, rowP, rowP),
            out_specs=(P(), P()), check_vma=False,
        )
        return jax.jit(shmapped)

    # -------------------------------------------------------------------- search

    def _make_chunk_scorer(self):
        """-> f(queries, emb_chunk, codes_chunk) -> (B, chunk) fp32 scores.

        SQ scoring is FOLDED into the matmul instead of reconstructing vectors:
        q . ((c + .5) * scale + vmin) = (q*scale) @ c  +  q . (vmin + .5*scale)
        — the uint8 codes cast to bf16 feed the MXU directly; no (chunk, D)
        fp32 reconstruction ever exists. PQ reconstructs per chunk (gather-bound
        on TPU; kept for its 16-48x memory compression at 400M-passage scale)."""
        quant, dtype = self.quant, self.dtype

        if self.uses_sq:
            def score(queries, e, c):
                qf = queries.astype(jnp.float32)
                qs = (qf * quant["sq_scale"]).astype(dtype)
                const = qf @ (quant["sq_vmin"] + 0.5 * quant["sq_scale"])
                s = jax.lax.dot_general(
                    qs, c.astype(dtype), dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return s + const[:, None]
            return score
        if self.uses_pq:
            impl = self.adc_impl
            if impl == "auto":
                impl = "pallas" if jax.default_backend() == "tpu" else "xla"
            rot = quant.get("opq_rot")

            def _q_pq(queries):
                # ADC runs in OPQ-rotated space: (Rq).(Rr) == q.r, so rotating
                # the query once replaces rotating every reconstruction
                qf = queries.astype(jnp.float32)
                return qf @ rot.T if rot is not None else qf

            if impl == "pallas":
                from atlas_tpu.ops.pq_adc import pq_adc_scores

                interp = jax.default_backend() != "tpu"

                def score(queries, e, c):
                    # fused decode-transposed + MXU kernel: 6.7ms/1M rows on v5e vs
                    # 517ms for the decode-and-matmul below (1.9x the flat scan)
                    return pq_adc_scores(_q_pq(queries), quant["codebooks"], c,
                                         interpret=interp)
                return score

            def score(queries, e, c):
                rec = Q.pq_decode(quant["codebooks"], c).astype(dtype)
                return jax.lax.dot_general(
                    _q_pq(queries).astype(dtype), rec,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return score

        def score(queries, e, c):
            return jax.lax.dot_general(
                queries.astype(dtype), e, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        return score

    def _sq8_engaged(self) -> bool:
        """sq8 through the transposed-block Pallas byte-stream kernel
        (ops/pallas_mips.py): measured 2.52ms vs 3.1ms for the XLA cast-and-
        matmul scan at 1M x 768 B=64 on v5e, at half the bf16 HBM footprint."""
        if self.index_type != "sq8":
            return False
        impl = self.sq8_impl
        if impl == "auto":
            return jax.default_backend() == "tpu"
        return impl == "pallas"

    def _build_sq8_layout(self) -> None:
        """Pre-transpose each shard's (rows, D) uint8 codes into (NB, D, SUB)
        blocks once, so every search hands the MXU its (K, N) operand with no
        per-block relayout (the row-major kernel measured 4.85ms for this exact
        reason). Transient 2x uint8 HBM during the transpose."""
        from atlas_tpu.ops.pallas_mips import sq8_blocks

        rowP = P(("dp", "mp"))
        build = jax.jit(jax.shard_map(
            sq8_blocks, mesh=self.mesh, in_specs=(rowP,), out_specs=rowP,
            check_vma=False,
        ), out_shardings=NamedSharding(self.mesh, rowP))
        self._sq8_layout = build(self.codes)

    def _build_search_sq8(self, topk: int):
        from atlas_tpu.ops.pallas_mips import mips_topk_pallas_sq8

        mesh, n_pad, n_dev = self.mesh, self.n_pad, self.n_devices
        shard_rows = n_pad // n_dev
        k_local = min(topk, shard_rows)
        quant, dtype = self.quant, self.dtype
        interp = jax.default_backend() != "tpu"

        def local_search(queries, blocks):
            dev = jax.lax.axis_index("dp") * jax.lax.axis_size("mp") + jax.lax.axis_index("mp")
            n_valid_dev = self._shard_valid_rows(dev)
            B = queries.shape[0]
            qf = queries.astype(jnp.float32)
            # folded SQ affine (see _make_chunk_scorer): rank by (q*scale).c,
            # restore q.(vmin + .5*scale) after selection
            q_eff = (qf * quant["sq_scale"]).astype(dtype)
            const = qf @ (quant["sq_vmin"] + 0.5 * quant["sq_scale"])  # (B,)
            vals, idx = mips_topk_pallas_sq8(q_eff, blocks, k_local,
                                             n_valid=n_valid_dev, interpret=interp)
            vals = vals + const[:, None]
            gidx = (dev * shard_rows + idx).astype(jnp.int32)
            vals_all = jax.lax.all_gather(vals, ("dp", "mp"))
            gidx_all = jax.lax.all_gather(gidx, ("dp", "mp"))
            kk = vals.shape[1]
            vals_all = vals_all.transpose(1, 0, 2).reshape(B, n_dev * kk)
            gidx_all = gidx_all.transpose(1, 0, 2).reshape(B, n_dev * kk)
            mvals, mpos = jax.lax.top_k(vals_all, topk)
            return mvals, jnp.take_along_axis(gidx_all, mpos, axis=1)

        rowP = P(("dp", "mp"))
        shmapped = jax.shard_map(
            local_search, mesh=mesh, in_specs=(P(), rowP),
            out_specs=(P(), P()), check_vma=False,
        )
        return jax.jit(shmapped)

    def _build_search(self, topk: int, nprobe_req: int = 0):
        if self.index_type == "flat":
            return super()._build_search(topk)
        mesh, n_pad = self.mesh, self.n_pad
        n_dev = self.n_devices
        shard_rows = n_pad // n_dev
        k_local = min(topk, shard_rows)
        chunk = min(self.scan_chunk, shard_rows)
        nchunks = -(-shard_rows // chunk)
        uses_ivf = self.uses_ivf
        residual = uses_ivf and (self.uses_pq or self.uses_sq)
        nprobe = min(nprobe_req or self.nprobe(), self._nlist()) if uses_ivf else 0
        quant = self.quant
        score_chunk = self._make_chunk_scorer()
        recall_target = self.recall_target

        def local_search(queries, emb_shard, codes_shard, cluster_shard):
            dev = jax.lax.axis_index("dp") * jax.lax.axis_size("mp") + jax.lax.axis_index("mp")
            n_valid_dev = self._shard_valid_rows(dev)
            B = queries.shape[0]
            qf = queries.astype(jnp.float32)
            if uses_ivf:
                cents = quant["centroids"]
                # probe by the ASSIGNMENT metric (argmax x.c - |c|^2/2, the
                # L2-equivalent used by Q.kmeans/_encode_all): probing by plain
                # inner product selects different clusters than the rows were
                # binned under, silently costing recall at small nprobe
                qdotc = qf @ cents.T  # (B, nlist) coarse inner products
                cscores = qdotc - 0.5 * jnp.sum(cents * cents, axis=1)[None]
                thresh = jax.lax.top_k(cscores, nprobe)[0][:, -1]  # (B,)
                probe_mask = cscores >= thresh[:, None]  # (B, nlist)

            def body(carry, ci):
                vals, idx = carry
                # XLA dynamic_slice CLAMPS an out-of-bounds start instead of
                # erroring: when chunk does not divide shard_rows, the last
                # chunk's slice silently shifts back by the remainder while the
                # id arithmetic still assumes ci*chunk — every result from that
                # chunk gets a wrong id (caught on hardware: scores paired with
                # rows 48k away). Clamp explicitly and NEG-mask the re-read
                # overlap rows so they cannot duplicate the previous chunk's.
                start = jnp.minimum(ci * chunk, shard_rows - chunk)
                repeat = ci * chunk - start  # >0 only on the clamped last chunk
                e = jax.lax.dynamic_slice_in_dim(emb_shard, start, chunk, axis=0)
                c = (jax.lax.dynamic_slice_in_dim(codes_shard, start, chunk, axis=0)
                     if codes_shard is not None else None)
                s = score_chunk(queries, e, c)  # (B, chunk)
                s = jnp.where(jnp.arange(chunk)[None, :] >= repeat, s, NEG)
                gids = dev * shard_rows + start + jnp.arange(chunk)
                # padding sits at each process-block tail (flat.py row space)
                local_ids = start + jnp.arange(chunk)
                s = jnp.where(local_ids[None, :] < n_valid_dev, s, NEG)
                if uses_ivf:
                    cl = jax.lax.dynamic_slice_in_dim(cluster_shard, start, chunk, axis=0)
                    if residual:
                        # codes hold x - centroid[cl]: restore q . centroid so
                        # the chunk score equals q . reconstruction(x)
                        s = s + jnp.take(qdotc, cl, axis=1)  # (B, chunk)
                    allowed = probe_mask[:, cl]  # (B, chunk)
                    s = jnp.where(allowed, s, NEG)
                kk = min(k_local, chunk)
                if recall_target >= 1.0:
                    cv, cidx = jax.lax.top_k(s, kk)
                else:
                    cv, cidx = jax.lax.approx_max_k(s, kk, recall_target=recall_target,
                                                    aggregate_to_topk=True)
                cgid = (gids[0] + cidx).astype(jnp.int32)
                allv = jnp.concatenate([vals, cv], axis=1)
                alli = jnp.concatenate([idx, cgid], axis=1)
                nv, pos = jax.lax.top_k(allv, k_local)
                return (nv, jnp.take_along_axis(alli, pos, axis=1)), None

            init = (jnp.full((B, k_local), NEG, jnp.float32),
                    jnp.zeros((B, k_local), jnp.int32))
            (vals, gidx), _ = jax.lax.scan(body, init, jnp.arange(nchunks))

            vals_all = jax.lax.all_gather(vals, ("dp", "mp"))
            gidx_all = jax.lax.all_gather(gidx, ("dp", "mp"))
            vals_all = vals_all.transpose(1, 0, 2).reshape(B, n_dev * k_local)
            gidx_all = gidx_all.transpose(1, 0, 2).reshape(B, n_dev * k_local)
            mvals, mpos = jax.lax.top_k(vals_all, topk)
            mgids = jnp.take_along_axis(gidx_all, mpos, axis=1)
            return mvals, mgids

        row2 = P(("dp", "mp"), None)
        row1 = P(("dp", "mp"))
        in_specs = [P(), row2,
                    row2 if self.codes is not None else P(),
                    row1 if self.cluster_of is not None else P()]
        shmapped = jax.shard_map(
            local_search, mesh=mesh, in_specs=tuple(in_specs),
            out_specs=(P(), P()), check_vma=False,
        )
        return jax.jit(shmapped)

    def _build_refine(self, topk: int):
        """One jitted shard_map that exactly re-scores candidate global ids against
        the resident (row-sharded) embeddings. Each shard gathers only the
        candidate rows it owns — R rows, not a corpus stream — scores them in
        fp32 on the MXU, and a psum assembles the full (B, R) exact score matrix
        on every device (each valid gid is owned by exactly one shard, so the sum
        is a placement-oblivious union). Candidates whose code-scan score was the
        NEG sentinel (fewer than R valid rows) stay masked out."""
        mesh, n_pad, n_dev = self.mesh, self.n_pad, self.n_devices
        shard_rows = n_pad // n_dev

        def local_refine(queries, cvals, cgids, emb_shard):
            dev = jax.lax.axis_index("dp") * jax.lax.axis_size("mp") + jax.lax.axis_index("mp")
            lidx = cgids - dev * shard_rows  # (B, R) local row of each candidate
            mine = (lidx >= 0) & (lidx < shard_rows)
            rows = emb_shard[jnp.clip(lidx, 0, shard_rows - 1)]  # (B, R, D) gather
            s = jnp.einsum("bd,brd->br", queries.astype(jnp.float32),
                           rows.astype(jnp.float32))
            s = jnp.where(mine, s, 0.0)
            s = jax.lax.psum(s, ("dp", "mp"))
            s = jnp.where(cvals > NEG / 2, s, NEG)
            mvals, mpos = jax.lax.top_k(s, topk)
            mgids = jnp.take_along_axis(cgids, mpos, axis=1)
            return mvals, mgids

        shmapped = jax.shard_map(
            local_refine, mesh=mesh,
            in_specs=(P(), P(), P(), P(("dp", "mp"), None)),
            out_specs=(P(), P()), check_vma=False,
        )
        return jax.jit(shmapped)

    def device_search(self, queries: jax.Array, topk: int) -> Tuple[jax.Array, jax.Array]:
        if self.index_type == "flat":
            return super().device_search(queries, topk)
        assert self.is_index_trained(), "The index has not been trained."
        if self.refine_factor > 1:
            cand_k = min(topk * self.refine_factor, self.n_pad)
            cvals, cgids = self._code_search(queries, cand_k)
            key = (topk, cand_k, self.n_pad, str(self.embeddings.dtype))
            fn = self._refine_cache.get(key)
            if fn is None:
                fn = self._refine_cache[key] = self._build_refine(topk)
            return fn(queries, cvals, cgids, self.embeddings)
        return self._code_search(queries, topk)

    def _code_search(self, queries: jax.Array, topk: int) -> Tuple[jax.Array, jax.Array]:
        """Top-k over the LOSSY codes (the pre-refine ranking)."""
        if self._sparse_engaged():
            if self._ivf_layout is None:
                self._build_ivf_layout()
            if self._sparse_fn is None:
                # cache keyed by topk; closures capture the CURRENT layout, so the
                # cache dies with it (train_index/load_index null both)
                self._sparse_fn = functools.cache(self._build_search_sparse)
            lay = self._ivf_layout
            return self._sparse_fn(topk, self.nprobe())(
                queries, lay["x"], lay["rowvalid"], lay["gid"], lay["bstart"], lay["nb"]
            )
        # the sq8 Pallas kernel stages (B, n_win) winner buffers in scoped VMEM
        # (16MB wall — CLAUDE.md sq8 notes); an enlarged candidate k from
        # --index_refine_factor (e.g. 400-800) grows that staging past the wall
        # at serving batch sizes, a runtime-only failure (ADVICE r04). Oversized
        # k routes through the XLA cast-and-matmul scan fallback instead.
        if self._sq8_engaged() and topk <= 256:
            if self._sq8_layout is None:
                self._build_sq8_layout()
            if self._sq8_fn is None:
                self._sq8_fn = functools.cache(self._build_search_sq8)
            return self._sq8_fn(topk)(queries, self._sq8_layout)
        if self._search_fn is None:
            self._search_fn = functools.cache(self._build_search)
        # nprobe is mutable object state but baked into the executable — it must
        # be part of the cache key or a changed nprobe reuses a stale program
        return self._search_fn(topk, self.nprobe())(
            queries, self.embeddings, self.codes, self.cluster_of)

    # ------------------------------------------------------------------------ io

    def _quant_path(self, d: str) -> str:
        suffix = f"{self.index_type}_{self.code_size}" if self.code_size else self.index_type
        return os.path.join(d, f"quant_{suffix}_rank_{jax.process_index()}.npz")

    def save_index(self, path: str, total_saved_shards: int, overwrite_saved_passages: bool = False) -> None:
        super().save_index(path, total_saved_shards, overwrite_saved_passages)
        if self.quant:
            state = {k: np.asarray(v) for k, v in self.quant.items()}
            np.savez(self._quant_path(path), **state)
        from atlas_tpu.index.flat import _sync_processes

        _sync_processes("atlas_tpu:save_index_quant")

    def load_index(self, path: str, total_saved_shards: int) -> None:
        super().load_index(path, total_saved_shards)
        qpath = self._quant_path(path)
        if os.path.exists(qpath):
            data = np.load(qpath)
            self.quant = {k: jnp.asarray(data[k]) for k in data.files}
            self._encode_all()
            self._search_fn = None  # new quant state -> stale closures
            self._ivf_layout = None
            self._sparse_fn = None
            self._sq8_layout = None
            self._sq8_fn = None
        else:
            self.train_index()
