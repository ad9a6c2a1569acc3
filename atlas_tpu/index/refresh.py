"""Sharded in-place index refresh: the whole mesh embeds the corpus in parallel.

The reference's build_index embeds the rank-local passage shard batch-by-batch on one
GPU and writes columns in place (/root/reference/src/atlas.py:61-88). The TPU-native
version keeps that in-place contract but parallelizes over the WHOLE mesh: the corpus
rows are already row-sharded (index.flat), so each device embeds exactly the rows of
its own shard — a shard_map whose per-device body runs the passage tower on `b` local
rows and dynamic-update-slices them into the donated local embedding block. No
cross-device traffic at all during refresh; the only host work is streaming
tokenized slabs.

Staleness toolkit around it (SURVEY.md §3.3): IndexRefreshScheduler decides when
(utils/schedules.py), retrieve_with_rerank re-scores with the live passage tower
between refreshes (core/atlas.py), query-side finetuning avoids refreshes entirely.

Beyond parity: start_refresh()/advance() run the same rebuild INCREMENTALLY, a few
slabs per train step, instead of stalling training for the whole corpus pass like
the reference does (train.py:65-73). Slab tokenization for the next advance runs on
a worker thread while the device executes the train step, so on a tokenize-bound
host the refresh embeds ride along at near-zero marginal wall time.
"""

from __future__ import annotations

import logging
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from atlas_tpu.models.contriever import retriever_embed

logger = logging.getLogger(__name__)


class ShardedCorpusEmbedder:
    """Embeds a passage corpus into a row-sharded index across the full mesh."""

    def __init__(self, atlas, index, passages: Sequence[dict], batch_rows: int = 256):
        self.atlas = atlas
        self.index = index
        # keep lazily-materializing stores (NativePassageStore) as-is
        self.passages = passages if hasattr(passages, "__getitem__") else list(passages)
        self.mesh = index.mesh
        self.n_dev = index.n_devices
        self.shard_rows = index.n_pad // self.n_dev
        # per-device rows per step, padded so every shard runs the same step count
        self.b = min(batch_rows, self.shard_rows)
        self.n_steps = math.ceil(self.shard_rows / self.b)
        self._embed_step = None

    # ------------------------------------------------------------------- device

    def _build_step(self, params_tree):
        atlas = self.atlas
        bcfg = atlas.retriever_cfg
        dtype = self.index.dtype

        def body(params, emb_local, ids_local, mask_local, start):
            # emb_local (shard_rows, D); ids_local (b, L): this device's rows
            rows = retriever_embed(
                params, bcfg, ids_local, mask_local,
                is_passages=True, deterministic=True,
            ).astype(dtype)
            return jax.lax.dynamic_update_slice(emb_local, rows, (start, 0))

        param_specs = jax.tree.map(lambda _: P(), params_tree)
        shmapped = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(param_specs, P(("dp", "mp"), None), P(("dp", "mp"), None),
                      P(("dp", "mp"), None), P()),
            out_specs=P(("dp", "mp"), None),
            check_vma=False,
        )
        return jax.jit(shmapped, donate_argnums=(1,))

    # --------------------------------------------------------------------- host

    # Length buckets (utils/buckets.py, shared with batch tokenization): the
    # embed cost is proportional to the padded length, and wiki passages average
    # ~1/3 of text_maxlength. Bucketing pads each slab to the smallest bucket >=
    # its longest sequence — a handful of compiled shapes instead of per-slab
    # recompiles (the reference pads "longest" per batch, atlas.py:70-76, which
    # would recompile XLA every step).
    def _bucket(self, longest: int) -> int:
        from atlas_tpu.utils.buckets import pick_bucket

        return pick_bucket(longest, self.atlas._retr_maxlen())

    def _tokenize_slab(self, start_local: int) -> tuple:
        """Assemble the token slab for THIS PROCESS's devices: segment d holds local
        shard d's rows [start_local, start_local + b). A device's local passage
        index is its block-local row (flat.py row space); rows past the local
        corpus tail embed the empty string.

        Collective-free by design: this runs on the prefetch worker thread, and a
        cross-host collective off the main thread could reorder against the train
        step's own collectives (deadlock). Bucket agreement happens on the main
        thread in _bucket_pad."""
        fstr = self.atlas.cfg.retriever_format
        dev_per_proc = self.n_dev // max(jax.process_count(), 1)
        texts = []
        for d in range(dev_per_proc):
            base = d * self.shard_rows + start_local  # local row within this process's block
            for j in range(self.b):
                lrow = base + j
                if lrow < len(self.passages):
                    texts.append(fstr.format(**self.passages[lrow]))
                else:
                    texts.append("")
        tok = self.atlas.retriever_tokenizer(
            texts, padding="longest", truncation=True,
            max_length=self.atlas._retr_maxlen(), return_tensors="np",
        )
        return np.asarray(tok["input_ids"]), np.asarray(tok["attention_mask"])

    def _bucket_pad(self, ids, mask) -> tuple:
        """Pad/clip a locally-tokenized slab to the cross-host-agreed length
        bucket. Main thread only (multi-process runs do a host allgather here)."""
        longest = ids.shape[1]
        if jax.process_count() > 1:  # bucket must agree across hosts
            from jax.experimental import multihost_utils

            longest = int(multihost_utils.process_allgather(np.array([longest])).max())
        L = self._bucket(longest)
        if ids.shape[1] < L:
            ids = np.pad(ids, ((0, 0), (0, L - ids.shape[1])))
            mask = np.pad(mask, ((0, 0), (0, L - mask.shape[1])))
        else:
            ids, mask = ids[:, :L], mask[:, :L]
        return ids, mask

    def _place_slab(self, ids, mask):
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            spec = P(("dp", "mp"), None)
            return (multihost_utils.host_local_array_to_global_array(ids, self.mesh, spec),
                    multihost_utils.host_local_array_to_global_array(mask, self.mesh, spec))
        row_sharding = NamedSharding(self.mesh, P(("dp", "mp"), None))
        return (jax.device_put(jnp.asarray(ids), row_sharding),
                jax.device_put(jnp.asarray(mask), row_sharding))

    # ------------------------------------------------------- incremental refresh

    @property
    def in_progress(self) -> bool:
        return self._pending is not None

    _pending = None  # (params, next_slab_step) while a refresh is in flight
    _tok_exec = None  # worker thread tokenizing the NEXT slab during device work
    _tok_next = None  # (slab_step, future) for that slab's token arrays

    def start_refresh(self, retriever_params=None) -> None:
        """Begin an incremental refresh: snapshot the retriever params now (the
        reference freezes an fp16 copy for the whole rebuild, atlas.py:54-59) and
        re-embed lazily via advance(). Searches between advances see a mix of old
        and new rows on the flat index — bounded staleness instead of the
        reference's full training stall (train.py:65-73 blocks every rank until
        build_index returns). Approx indexes keep searching their existing codes
        and re-encode once at completion, so they stay internally consistent."""
        assert self._pending is None, "refresh already in progress"
        params = self.atlas._cast(
            retriever_params if retriever_params is not None else self.atlas.retriever_params
        )
        # a REAL copy, not a reference: the train step donates its state, so by
        # the first advance() the live params these leaves alias would be deleted
        # buffers ("Array has been deleted"). One retriever copy per refresh.
        params = jax.tree.map(jnp.copy, params)
        if self._embed_step is None:
            self._embed_step = self._build_step(params)
        from concurrent.futures import ThreadPoolExecutor

        self._tok_exec = ThreadPoolExecutor(max_workers=1, thread_name_prefix="refresh-tok")
        self._pending = (params, 0)
        self._prefetch_tok(0)

    def _start_local(self, slab_step: int) -> int:
        # last partial step re-embeds a small overlap instead of a ragged shape
        return min(slab_step * self.b, self.shard_rows - self.b)

    def _prefetch_tok(self, slab_step: int) -> None:
        if slab_step < self.n_steps:
            self._tok_next = (slab_step, self._tok_exec.submit(
                self._tokenize_slab, self._start_local(slab_step)))
        else:
            self._tok_next = None

    def _take_tok(self, slab_step: int):
        if self._tok_next is not None and self._tok_next[0] == slab_step:
            fut = self._tok_next[1]
            self._tok_next = None
            return fut.result()
        return self._tokenize_slab(self._start_local(slab_step))

    def advance(self, k: int = 1) -> bool:
        """Run up to k embed slabs of the in-flight refresh; True when complete.
        The updated embedding buffer is re-installed after every call, so callers
        may search between advances (the donated-buffer chain stays index-owned)."""
        assert self._pending is not None, "no refresh in progress"
        params, slab = self._pending
        emb = self.index.embeddings
        for _ in range(k):
            if slab >= self.n_steps:
                break
            ids, mask = self._take_tok(slab)
            self._prefetch_tok(slab + 1)  # tokenize next slab during device embed
            ids, mask = self._place_slab(*self._bucket_pad(ids, mask))
            emb = self._embed_step(params, emb, ids, mask,
                                   jnp.int32(self._start_local(slab)))
            slab += 1
        self.index.set_embeddings(emb)
        if slab >= self.n_steps:
            self._pending = None
            self._tok_exec.shutdown(wait=False, cancel_futures=True)
            self._tok_exec = None
            # unconditional: faiss resets + retrains at every refresh
            # (/root/reference/src/index.py:348-358 via build_index) — an approx
            # index that skipped this would search STALE codes against the new
            # embeddings. Flat's train_index is a no-op.
            self.index.train_index()
            return True
        self._pending = (params, slab)
        return False

    def refresh(self, retriever_params=None) -> None:
        """Re-embed the full corpus in place (donated buffers, zero extra HBM)."""
        self.start_refresh(retriever_params)
        self.advance(self.n_steps)
