"""Atlas model core: retriever + index + FiD reader orchestration.

Behavioral reference: /root/reference/src/atlas.py:42-636. Split into a host side
(tokenization/formatting, retrieval-result handling — the reference does this inline
in forward, atlas.py:399-444) and pure jitted device functions (embedding, search,
joint loss). Tokenization pads to static max lengths so every device call hits a
cached XLA executable.

Params pytree: {"reader": t5 params, "retriever": contriever params} — fp32 masters;
forward casts to the configured compute dtype (bf16 on TPU), which together with the
fp32 optimizer state reproduces AdamWFP32Copy semantics (src/AdamWFP32Copy.py:110-167)
without a custom optimizer.
"""

from __future__ import annotations

import functools
import logging
import math
import threading
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from atlas_tpu.config import AtlasConfig
from atlas_tpu.core import losses as L
from atlas_tpu.models.bert import BertConfig
from atlas_tpu.models.contriever import retriever_embed
from atlas_tpu.models.fid import fid_forward, get_crossattention_scores, select_crossattention_scores
from atlas_tpu.models.t5 import T5Config, cross_entropy, shift_right
from atlas_tpu.utils.buckets import LENGTH_BUCKETS

logger = logging.getLogger(__name__)

IGNORE_INDEX = -100
BERT_MAX_SEQ_LENGTH = 512


def _tok_locked(fn):
    """Serialize HF fast-tokenizer use across the host-prefetch worker thread
    and the main thread (rust tokenizers panic "Already borrowed" when two
    threads enter one tokenizer)."""

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        with self._tok_lock:
            return fn(self, *args, **kwargs)

    return wrapper


class _LockedTokenizer:
    """Thread-safe facade over an HF fast tokenizer: the rust core is NOT
    reentrant across threads ("Already borrowed" panic), and tokenizer calls
    happen from the train loop's pretokenize worker, the refresh embedder's
    slab worker, and the main thread. Wrapping the OBJECT (not just Atlas
    methods) covers every call site, including code that holds a direct
    reference like index/refresh.py. Non-callable attributes (pad_token_id,
    eos_token, ...) pass through unlocked — they're plain python."""

    def __init__(self, tok, lock):
        self._tok, self._lock = tok, lock

    def __call__(self, *args, **kwargs):
        with self._lock:
            return self._tok(*args, **kwargs)

    def __len__(self):
        return len(self._tok)

    def __getattr__(self, name):
        attr = getattr(self._tok, name)
        if callable(attr):
            def locked(*args, **kwargs):
                with self._lock:
                    return attr(*args, **kwargs)

            return locked
        return attr


def _dtype_of(precision: str):
    return {"bf16": jnp.bfloat16, "fp16": jnp.float16, "fp32": jnp.float32}[precision]


class Atlas:
    def __init__(
        self,
        cfg: AtlasConfig,
        reader_cfg: Optional[T5Config],
        reader_params: Optional[Dict[str, Any]],
        retriever_cfg: Optional[BertConfig],
        retriever_params: Optional[Dict[str, Any]],
        reader_tokenizer,
        retriever_tokenizer,
    ):
        self.cfg = cfg
        self.reader_cfg = reader_cfg
        self.reader_params = reader_params
        self.retriever_cfg = retriever_cfg
        self.retriever_params = retriever_params
        # HF fast tokenizers are NOT thread-safe (rust "Already borrowed" panic
        # under concurrent use); the host-prefetch worker thread tokenizes the
        # NEXT batch while the main thread tokenizes retrieved passages (and
        # the refresh embedder tokenizes slabs on its own worker), so BOTH
        # tokenizer objects are wrapped to serialize on one lock. ByteTokenizer
        # never hits it, which is why only real-tokenizer runs (mini_nq_canary)
        # exposed the race. RLock: tokenize_passages nests retriever calls.
        self._tok_lock = threading.RLock()
        self.reader_tokenizer = (
            _LockedTokenizer(reader_tokenizer, self._tok_lock)
            if reader_tokenizer is not None else None)
        self.retriever_tokenizer = (
            _LockedTokenizer(retriever_tokenizer, self._tok_lock)
            if retriever_tokenizer is not None else None)
        self.compute_dtype = _dtype_of(cfg.precision)
        self.mesh = None  # set by the entry points; enables dp batch sharding

        self._embed_jit = jax.jit(self._embed_fn, static_argnames=("is_passages",))
        self._reader_eval_jit = jax.jit(self._reader_eval_fn)

    def set_mesh(self, mesh) -> None:
        """Attach the global device mesh: every device batch built from here on is
        sharded over "dp" (the reference gets this implicitly from DDP wrapping,
        train.py:198-216; here it is an explicit placement)."""
        self.mesh = mesh

    def _put_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        """Shard a host batch over the mesh's dp axis (no-op without a mesh)."""
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        from atlas_tpu.parallel.sharding import shard_batch

        return shard_batch(self.mesh, batch)

    def _put_local(self, arrays: Dict[str, Any]) -> Dict[str, Any]:
        """dp-shard PROCESS-LOCAL device inputs (query embed, eval decode). Unlike
        the train batch these must stay host-local in multi-process runs: their
        consumers (search_knn's union protocol, per-rank generation) read them back
        with np.asarray."""
        if self.mesh is None or jax.process_count() > 1:
            return {k: jnp.asarray(v) for k, v in arrays.items()}
        from atlas_tpu.parallel.sharding import shard_batch

        return shard_batch(self.mesh, arrays)

    # ------------------------------------------------------------- device helpers

    def _cast(self, params):
        dt = self.compute_dtype
        return jax.tree.map(lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    def _embed_fn(self, retr_params, ids, mask, is_passages: bool):
        return retriever_embed(
            self._cast(retr_params), self.retriever_cfg, ids, mask,
            is_passages=is_passages,
            query_side_training=self.cfg.query_side_retriever_training,
            deterministic=True,
        ).astype(jnp.float32)

    def embed_queries_device(self, ids, mask):
        return self._embed_jit(self.retriever_params, ids, mask, is_passages=False)

    @staticmethod
    def _params_multihost_global(params) -> bool:
        """True when params span non-addressable devices (multi-host FSDP/TP):
        per-process jit calls with DIFFERENT local inputs are then undefined SPMD
        — every process must enter one global computation with identical or
        globally-sharded inputs."""
        for leaf in jax.tree.leaves(params):
            return isinstance(leaf, jax.Array) and not leaf.is_fully_addressable
        return False

    def _embed_union(self, ids, mask, is_passages: bool) -> np.ndarray:
        """Embed the UNION of all processes' token batches in ONE global SPMD
        call and return THIS process's rows as host numpy. This is the
        reference's varsize_all_gather-then-local protocol (src/index.py:127)
        moved to the token level, required whenever the retriever params are
        globally sharded (see _params_multihost_global)."""
        from jax.experimental import multihost_utils
        from jax.sharding import NamedSharding, PartitionSpec as P

        ids, mask = np.asarray(ids), np.asarray(mask)
        n_local = ids.shape[0]
        counts = multihost_utils.process_allgather(
            np.array([n_local], np.int64)).reshape(-1)
        m = max(int(counts.max()), 1)

        def pad(a):
            out = np.zeros((m,) + a.shape[1:], a.dtype)
            out[: a.shape[0]] = a
            return out

        all_ids = multihost_utils.process_allgather(pad(ids)).reshape(-1, ids.shape[-1])
        all_mask = multihost_utils.process_allgather(pad(mask)).reshape(-1, mask.shape[-1])
        emb = self._embed_jit(self.retriever_params, jnp.asarray(all_ids),
                              jnp.asarray(all_mask), is_passages=is_passages)
        emb = jax.jit(lambda x: x, out_shardings=NamedSharding(self.mesh, P()))(emb)
        start = jax.process_index() * m
        return np.asarray(emb)[start : start + n_local]

    def embed_passages_device(self, ids, mask):
        """Frozen-snapshot passage embedding (the reference's fp16 deepcopy,
        atlas.py:54-59, is here just 'current params, cast, no grad')."""
        return self._embed_jit(self.retriever_params, ids, mask, is_passages=True)

    def _reader_eval_fn(self, reader_params, reader_ids, reader_mask, decoder_input_ids, labels):
        loss, logits, _ = fid_forward(
            self._cast(reader_params), self.reader_cfg,
            reader_ids, reader_mask, decoder_input_ids, labels=labels, deterministic=True,
        )
        return loss, logits

    # --------------------------------------------------------- tokenization (host)

    def append_query(self, query: str, passages: Sequence[dict]) -> List[str]:
        return [self.cfg.encoder_format.format(query=query, **p) for p in passages]

    def _retr_maxlen(self) -> int:
        return min(self.cfg.text_maxlength, BERT_MAX_SEQ_LENGTH)

    @_tok_locked
    def retriever_tokenize(self, queries: Sequence[str]) -> Optional[Dict[str, np.ndarray]]:
        if self.retriever_tokenizer is None:
            return None
        return self.retriever_tokenizer(
            list(queries), max_length=self._retr_maxlen(), padding="max_length",
            truncation=True, return_tensors="np",
        )

    @_tok_locked
    def reader_tokenize(self, query, target, target_tokens=None):
        """-> (labels (B,T), decoder_input_ids (B,T)) np arrays (atlas.py:201-247)."""
        cfg = self.cfg
        tmax = cfg.target_maxlength if cfg.target_maxlength is not None else cfg.generation_max_length
        modified_query = None
        if target_tokens is None:
            if cfg.decoder_prompt_format is not None:
                modified_query = [cfg.decoder_prompt_format.format_map({"query": q}) for q in query]
                target = [q + t for (q, t) in zip(modified_query, target)]
            if cfg.decoder_format is not None:
                target = [cfg.decoder_format.format(target=t) for t in target]
            target = [t + "</s>" if not t.endswith("</s>") else t for t in target]
            target_tokens = self.reader_tokenizer(
                target, max_length=tmax, padding="max_length", truncation=True,
                return_tensors="np", add_special_tokens=False,
            )
        ids = np.asarray(target_tokens["input_ids"])
        attn = np.asarray(target_tokens["attention_mask"]).astype(bool)
        labels = np.where(attn, ids, IGNORE_INDEX)
        decoder_input_ids = np.asarray(shift_right(jnp.asarray(ids), self.reader_cfg))
        if cfg.decoder_prompt_format is not None:
            qm = self.reader_tokenizer(
                modified_query, max_length=tmax, padding="max_length", truncation=True,
                return_tensors="np", add_special_tokens=False,
            )["attention_mask"]
            qm = np.asarray(qm)
            if qm.shape[-1] < ids.shape[-1]:
                qm = np.pad(qm, ((0, 0), (0, ids.shape[-1] - qm.shape[-1])))
            labels = np.where(qm[:, : ids.shape[-1]].astype(bool), IGNORE_INDEX, labels)
        return labels, decoder_input_ids

    @_tok_locked
    def tokenize(self, query, target, target_tokens=None):
        if query is None and target is None:
            return None, None, None
        assert target_tokens is None or self.cfg.decoder_prompt_format is None, (
            "decoder_prompt_format not compatible with target tokenized in iterator"
        )
        query_enc = self.retriever_tokenize(query) if not self.cfg.use_file_passages else None
        labels, decoder_input_ids = self.reader_tokenize(query, target, target_tokens)
        return query_enc, labels, decoder_input_ids

    # Bucketed sequence lengths (used when cfg.bucket_lengths): the reference pads
    # "longest" per batch (atlas.py:26-39 via tokenizer padding), free under torch
    # but a recompile per novel length under XLA — so batches round up to the
    # shared ladder of compiled shapes (utils/buckets.py, same trade as the
    # refresh embed path). Deliberately collective-free here: eval batches are
    # process-LOCAL arrays and eval ranks skip padding batches, so a sync inside
    # tokenization would deadlock ragged multi-host eval; tokenize_passages
    # syncs once (both towers in one allgather) only when asked by the train
    # path, whose global batch shape is shared across hosts.

    @staticmethod
    def _pad_tok(tok: Dict[str, np.ndarray], L: int, pad_id: int):
        """Right-pad the last (length) axis of every tokenizer array to L."""
        return {
            k: np.pad(v, ((0, 0),) * (v.ndim - 1) + ((0, L - v.shape[-1]),),
                      constant_values=pad_id if k == "input_ids" else 0)
            if v.shape[-1] < L else v
            for k, v in tok.items()
        }

    def encode_passages_batch(self, batch: List[List[str]], tokenizer, max_length: int,
                              n_min: int = 0):
        """(B lists of <=N strings) -> (B, N, L) fixed-shape arrays (atlas.py:26-39).
        n_min pads the passage axis to a stable count so ragged file-passage lists
        don't trigger a recompile per batch. L is max_length, or the smallest
        length bucket covering the batch when cfg.bucket_lengths (padding is
        masked, so the loss/logits are invariant; only the compiled shape moves)."""
        from atlas_tpu.utils.buckets import pick_bucket

        bsz = len(batch)
        n = max(max(len(ex) for ex in batch), n_min)
        flat = [s for ex in batch for s in ex + [""] * (n - len(ex))]
        bucketing = getattr(self.cfg, "bucket_lengths", False)
        tok = tokenizer(flat, padding="longest" if bucketing else "max_length",
                        max_length=max_length, truncation=True, return_tensors="np")
        out = {k: np.asarray(v) for k, v in tok.items()}
        if bucketing:
            L = pick_bucket(out["input_ids"].shape[-1], max_length)
            out = self._pad_tok(out, L, getattr(tokenizer, "pad_token_id", 0) or 0)
        return {k: v.reshape(bsz, n, -1) for k, v in out.items()}

    LENGTH_BUCKETS = LENGTH_BUCKETS  # shared ladder (utils/buckets.py)

    @_tok_locked
    def tokenize_passages(self, query, passages, sync_buckets: bool = False):
        """-> (reader_tok (B,N,L), retriever_tok (B,N,Lr)) (atlas.py:261-280).

        sync_buckets: with cfg.bucket_lengths in a multi-process run, re-pad
        both towers' bucketed lengths to the cross-host max in ONE allgather —
        required by callers that assemble GLOBAL batch arrays (the train path;
        every process reaches make_batch in lockstep). Callers working on
        process-local arrays (the eval loop, whose padding ranks skip
        tokenization entirely) must leave it False: a collective here would
        desync ragged multi-host eval."""
        if len(query) == 0:
            return None, None
        query_passages = [self.append_query(q, p) for q, p in zip(query, passages)]
        fstr = self.cfg.retriever_format
        retriever_passages = [[fstr.format(**p) for p in ex] for ex in passages]
        n_min = self.cfg.n_context if self.cfg.use_file_passages else 0
        retriever_tok = None
        if self.retriever_tokenizer is not None:
            retriever_tok = self.encode_passages_batch(
                retriever_passages, self.retriever_tokenizer, self._retr_maxlen(), n_min
            )
        reader_tok = self.encode_passages_batch(
            query_passages, self.reader_tokenizer, self.cfg.text_maxlength, n_min
        )
        if (sync_buckets and getattr(self.cfg, "bucket_lengths", False)
                and jax.process_count() > 1):
            from jax.experimental import multihost_utils

            lr = reader_tok["input_ids"].shape[-1]
            lq = retriever_tok["input_ids"].shape[-1] if retriever_tok else 0
            g = multihost_utils.process_allgather(np.array([lr, lq], np.int32))
            reader_tok = self._pad_tok(
                reader_tok, int(np.max(g[..., 0])),
                getattr(self.reader_tokenizer, "pad_token_id", 0) or 0)
            if retriever_tok is not None:
                retriever_tok = self._pad_tok(
                    retriever_tok, int(np.max(g[..., 1])),
                    getattr(self.retriever_tokenizer, "pad_token_id", 0) or 0)
        return reader_tok, retriever_tok

    # ------------------------------------------------------------------ retrieval

    def _retrieve(
        self, index, topk, query, query_ids_retriever, query_mask_retriever,
        batch_metadata=None, filtering_fun=None, iter_stats={}, training=False,
    ):
        if jax.process_count() > 1 and self._params_multihost_global(self.retriever_params):
            query_emb = self._embed_union(
                query_ids_retriever, query_mask_retriever, is_passages=False)
        else:
            q = self._put_local({"ids": query_ids_retriever, "mask": query_mask_retriever})
            query_emb = self.embed_queries_device(q["ids"], q["mask"])
        search_start = time.time()
        if filtering_fun is not None:
            passages, scores = index.search_knn(query_emb, topk * self.cfg.filtering_overretrieve_ratio)
            passages, scores = filtering_fun(batch_metadata, passages, scores, topk, training=training)
        else:
            passages, scores = index.search_knn(query_emb, topk)
        jax.block_until_ready(query_emb)
        iter_stats["runtime/search"] = (time.time() - search_start, 1)
        return passages, scores, query_emb

    def retrieve_with_rerank(
        self, index, topk, query, query_ids_retriever, query_mask_retriever,
        batch_metadata=None, filtering_fun=None, iter_stats={}, training=False,
    ):
        """Over-retrieve then re-score with the CURRENT passage tower
        (atlas.py:121-176) — the staleness mitigation between refreshes."""
        bsz = len(query)
        to_rerank = self.cfg.n_to_rerank_with_retrieve_with_rerank
        passages, _, query_emb = self._retrieve(
            index, to_rerank, query, query_ids_retriever, query_mask_retriever,
            batch_metadata, filtering_fun, iter_stats, training,
        )
        fstr = self.cfg.retriever_format
        flat = [fstr.format(**p) for ps in passages for p in ps]
        n = max(len(ps) for ps in passages)
        embed_bs = min(max(len(flat), 1), self.cfg.per_gpu_embedder_batch_size)
        n_chunks = -(-len(flat) // embed_bs) or 1
        union = jax.process_count() > 1 and self._params_multihost_global(self.retriever_params)
        if union:
            # _embed_union is a collective: every process must enter the SAME
            # number of chunk calls even when its local rerank batch is smaller
            from jax.experimental import multihost_utils

            n_chunks = int(multihost_utils.process_allgather(
                np.array([n_chunks], np.int64)).max())
        embs = []
        for ci in range(n_chunks):
            chunk = flat[ci * embed_bs : (ci + 1) * embed_bs]
            chunk = chunk + [""] * (embed_bs - len(chunk))  # static shape
            tok = self.retriever_tokenizer(
                chunk, padding="max_length", max_length=self._retr_maxlen(),
                truncation=True, return_tensors="np",
            )
            if union:
                emb = self._embed_union(tok["input_ids"], tok["attention_mask"],
                                        is_passages=True)
            else:
                emb = self.embed_passages_device(
                    jnp.asarray(tok["input_ids"]), jnp.asarray(tok["attention_mask"]))
            embs.append(np.asarray(emb))
        passage_emb = np.concatenate(embs, axis=0)[: len(flat)].reshape(bsz, n, -1)
        qn = np.asarray(query_emb)
        rerank_scores = np.einsum("id,ijd->ij", qn, passage_emb)
        top_idx = np.argsort(-rerank_scores, axis=1)[:, :topk]
        output_passages = [[passages[i][j] for j in top_idx[i]] for i in range(bsz)]
        output_scores = [[float(rerank_scores[i, j]) for j in top_idx[i]] for i in range(bsz)]
        return output_passages, output_scores

    def retrieve(self, index, topk, query, query_ids_retriever, query_mask_retriever, **kw):
        retrieve_func = self.retrieve_with_rerank if self.cfg.retrieve_with_rerank else self._retrieve
        passages, scores = retrieve_func(index, topk, query, query_ids_retriever, query_mask_retriever, **kw)[:2]
        return passages, scores

    # ---------------------------------------------------------------- index build

    def _get_corpus_embedder(self, index, passages: Sequence[dict], embedder_batch_size: int):
        from atlas_tpu.index.refresh import ShardedCorpusEmbedder

        embedder = getattr(self, "_corpus_embedder", None)
        if (embedder is None or embedder.index is not index
                or embedder.passages is not passages
                or len(embedder.passages) != len(passages)):
            per_dev = max(1, embedder_batch_size // max(index.n_devices, 1))
            embedder = ShardedCorpusEmbedder(self, index, passages, batch_rows=per_dev)
            self._corpus_embedder = embedder
        return embedder

    def build_index(self, index, passages: Sequence[dict], embedder_batch_size: int, logger_=None) -> None:
        """Embed the corpus in place (atlas.py:61-88 semantics) using the sharded
        refresh pipeline: every device embeds its own index-shard rows in parallel
        (index/refresh.py), so refresh wall time scales with 1/n_devices."""
        self._get_corpus_embedder(index, passages, embedder_batch_size).refresh()

    def start_index_refresh(self, index, passages: Sequence[dict], embedder_batch_size: int) -> None:
        """Begin an incremental (train-overlapped) refresh; see index/refresh.py.
        Retriever params are snapshotted now, matching the reference's frozen fp16
        rebuild copy (atlas.py:54-59)."""
        self._get_corpus_embedder(index, passages, embedder_batch_size).start_refresh()

    def advance_index_refresh(self, k: int = 1) -> bool:
        """Run up to k embed slabs of the in-flight refresh; True when complete."""
        return self._corpus_embedder.advance(k)

    @property
    def index_refresh_in_progress(self) -> bool:
        emb = getattr(self, "_corpus_embedder", None)
        return emb is not None and emb.in_progress

    # ------------------------------------------------------------------- forward

    @_tok_locked
    def pretokenize(self, query, target, target_tokens=None):
        """The retrieval-INDEPENDENT host half of make_batch: query/target
        tokenization. Depends only on raw text + tokenizers (no params, no index),
        so the train loop runs it on a worker thread for the NEXT batch while the
        device executes the current step — the reference tokenizes synchronously
        inside every step (atlas.py:428-444), a known host stall SURVEY §7 says
        not to replicate. Passage tokenization cannot be prefetched: it needs the
        retrieval results from the CURRENT retriever params."""
        cfg = self.cfg
        query_mask_reader = self.reader_tokenizer(
            list(query), max_length=cfg.text_maxlength, padding="max_length",
            truncation=True, return_tensors="np", add_special_tokens=False,
        )["attention_mask"]
        query_enc, labels, decoder_input_ids = self.tokenize(query, target, target_tokens)
        return {"query_mask_reader": query_mask_reader, "query_enc": query_enc,
                "labels": labels, "decoder_input_ids": decoder_input_ids}

    def make_batch(self, index, query, target, target_tokens=None, passages=None,
                   batch_metadata=None, filtering_fun=None, training=False, iter_stats={},
                   pretokenized=None):
        """Host half of forward (atlas.py:399-444): tokenize + retrieve + tokenize
        passages. Returns the device-ready array batch."""
        cfg = self.cfg
        pre = pretokenized or self.pretokenize(query, target, target_tokens)
        query_mask_reader = pre["query_mask_reader"]
        query_enc, labels, decoder_input_ids = (
            pre["query_enc"], pre["labels"], pre["decoder_input_ids"])
        if not cfg.use_file_passages:
            retrieve_start = time.time()
            passages, _ = self.retrieve(
                index, cfg.retriever_n_context, query,
                query_enc["input_ids"], query_enc["attention_mask"],
                batch_metadata=batch_metadata, filtering_fun=filtering_fun,
                iter_stats=iter_stats, training=training,
            )
            iter_stats["runtime/retrieve"] = (time.time() - retrieve_start, 1)
        reader_tok, retriever_tok = self.tokenize_passages(
            query, passages, sync_buckets=True)  # feeds GLOBAL batch arrays
        batch = {
            "reader_ids": reader_tok["input_ids"],
            "reader_mask": reader_tok["attention_mask"],
            "decoder_input_ids": decoder_input_ids,
            "labels": labels,
            "query_mask_reader": query_mask_reader,
        }
        if query_enc is not None:
            batch["retr_q_ids"] = query_enc["input_ids"]
            batch["retr_q_mask"] = query_enc["attention_mask"]
        if retriever_tok is not None:
            batch["retr_p_ids"] = retriever_tok["input_ids"]
            batch["retr_p_mask"] = retriever_tok["attention_mask"]
        return self._put_batch(batch), passages

    def loss_fn(self, params, batch, rng, train_retriever: bool, training: bool = True):
        """Pure joint loss (device half of atlas.py:446-550). Differentiable w.r.t.
        params; gold scores computed under stop_gradient."""
        cfg = self.cfg
        mode = cfg.gold_score_mode
        reader_params = self._cast(params["reader"])
        rcfg = self.reader_cfg

        reader_ids, reader_mask = batch["reader_ids"], batch["reader_mask"]
        dec_in, labels = batch["decoder_input_ids"], batch["labels"]
        B, N_ret, Lr = reader_ids.shape
        n_ctx_train = min(cfg.n_context, N_ret)
        aux: Dict[str, jnp.ndarray] = {}

        rng_q, rng_p, rng_r = (jax.random.split(rng, 3) if rng is not None
                               else (None, None, None))
        retriever_score = None
        gold = None
        if train_retriever:
            retr_params = self._cast(params["retriever"])
            query_emb = retriever_embed(
                retr_params, self.retriever_cfg, batch["retr_q_ids"], batch["retr_q_mask"],
                is_passages=False, deterministic=not training, rng=rng_q,
            )
            p_ids, p_mask = batch["retr_p_ids"], batch["retr_p_mask"]
            if "std" in mode:
                p_ids, p_mask = p_ids[:, :n_ctx_train], p_mask[:, :n_ctx_train]
            Np, Lp = p_ids.shape[1], p_ids.shape[2]
            passage_emb = retriever_embed(
                retr_params, self.retriever_cfg, p_ids.reshape(B * Np, Lp),
                p_mask.reshape(B * Np, Lp), is_passages=True,
                query_side_training=cfg.query_side_retriever_training,
                deterministic=not training, rng=rng_p,
            ).reshape(B, Np, -1)
            retriever_score = jnp.einsum("id,ijd->ij", query_emb, passage_emb,
                                         preferred_element_type=jnp.float32)
            retriever_score = retriever_score / jnp.sqrt(query_emb.shape[-1] * 1.0)
            if "std" not in mode:
                gold = jax.lax.stop_gradient(
                    L.gold_score(mode, reader_params, rcfg, reader_ids, reader_mask,
                                 dec_in, labels, mask_query=batch.get("query_mask_reader"))
                )

        ids_t = reader_ids[:, :n_ctx_train]
        mask_t = reader_mask[:, :n_ctx_train]
        capture = train_retriever and (cfg.compute_crossattention_stats or "std" in mode)
        reader_loss, _, stats = fid_forward(
            reader_params, rcfg, ids_t, mask_t, dec_in, labels=labels,
            deterministic=not training, rng=rng_r, capture_cross_attn=capture,
        )
        if capture:
            stats = jax.lax.stop_gradient(stats)
            agg = get_crossattention_scores(
                stats, mask_t, labels, ids_t, mode="all",
                mask_query=batch.get("query_mask_reader"),
            )
            if "std" in mode:
                gold = select_crossattention_scores(agg, mode)
            if cfg.compute_crossattention_stats:
                for k, v in agg.items():
                    # emdr gold is (B*N, T, V) logits, not a per-passage score —
                    # correlation is only defined for (B, N)-shaped golds
                    # (the reference crashes here too, atlas.py:527-534)
                    if gold is not None and gold.size == v.size:
                        aux[f"corr/{k}"] = _corr(gold, v)
                    else:
                        aux[f"corr/{k}"] = jnp.float32(0)

        retriever_loss = None
        if train_retriever and gold is not None:
            if cfg.gold_score_mode == "emdr":
                retriever_loss = L.emdr_logprob(retriever_score, gold, labels,
                                                cfg.temperature_score, cfg.temperature_gold)
            else:
                retriever_loss = L.kldivloss(retriever_score, gold,
                                             cfg.temperature_score, cfg.temperature_gold)

        aux["loss/reader_loss"] = reader_loss
        total = reader_loss.astype(jnp.float32)
        if retriever_loss is not None:
            aux["loss/retriever_loss"] = retriever_loss
            total = total + retriever_loss
        return total, aux

    def _union_rows(self, arrays: Dict[str, Any]):
        """Assemble the UNION of all processes' rows (padded to the max local
        count with copies of row 0 — rows are independent) and place it over
        the mesh dp-sharded. Required for generation/eval under multi-host
        TP/FSDP: the reader params are globally sharded, so per-process jit
        calls with different local inputs are undefined SPMD — every process
        must enter ONE global computation (same protocol as _embed_union).
        -> (global arrays dict, this process's row offset, local row count)."""
        from jax.experimental import multihost_utils
        from jax.sharding import NamedSharding, PartitionSpec as P

        arrays = {k: np.asarray(v) for k, v in arrays.items()}
        n_local = next(iter(arrays.values())).shape[0]
        counts = multihost_utils.process_allgather(
            np.array([n_local], np.int64)).reshape(-1)
        m = max(int(counts.max()), 1)

        def union(a):
            pad = np.repeat(a[:1], m - a.shape[0], axis=0) if a.shape[0] < m else a[:0]
            full = multihost_utils.process_allgather(
                np.concatenate([a, pad], axis=0))  # (world, m, ...)
            return full.reshape((-1,) + a.shape[1:])

        dp = self.mesh.shape.get("dp", 1)
        rows = m * jax.process_count()
        lead = "dp" if rows % dp == 0 else None  # replicate ragged unions

        def place(a):
            u = union(a)
            sh = NamedSharding(self.mesh, P(lead, *([None] * (u.ndim - 1))))
            return jax.make_array_from_callback(u.shape, sh, lambda idx: u[idx])

        return ({k: place(v) for k, v in arrays.items()},
                jax.process_index() * m, n_local)

    def _union_out(self, out) -> np.ndarray:
        """Replicate a union-row result so every process can read all rows."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        return np.asarray(jax.jit(
            lambda x: x, out_shardings=NamedSharding(self.mesh, P()))(out))

    def generate(self, reader_tok, query, choices=None):
        """Autoregressive decode (atlas.py:592-636): greedy or beam, with optional
        decoder-prompt forcing. Returns (B, max_length) np token ids incl. start."""
        cfg = self.cfg
        multihost = (self.mesh is not None
                     and self._params_multihost_global(self.reader_params))
        if multihost:
            tok, row0, n_local = self._union_rows(
                {"ids": reader_tok["input_ids"], "mask": reader_tok["attention_mask"]})
        else:
            tok = self._put_local({"ids": reader_tok["input_ids"],
                                   "mask": reader_tok["attention_mask"]})
        ids, mask = tok["ids"], tok["mask"]
        if ids.ndim == 2:
            ids, mask = ids[:, None], mask[:, None]
        n_ctx = min(cfg.n_context, ids.shape[1])
        ids, mask = ids[:, :n_ctx], mask[:, :n_ctx]
        # cache the compute-dtype cast across generate() calls (params are fixed
        # during an eval pass; re-casting per batch would copy the whole tree)
        cached = getattr(self, "_cast_reader_cache", None)
        if cached is None or cached[0] is not self.reader_params:
            cached = (self.reader_params, self._cast(self.reader_params))
            self._cast_reader_cache = cached
        reader_params = cached[1]
        min_len = cfg.generation_min_length or 0
        from atlas_tpu.eval.generate import beam_generate, greedy_generate

        forced, plen = None, None
        if cfg.decoder_prompt_format is not None:
            prefix_strs = [cfg.decoder_prompt_format.format_map({"query": q}) for q in query]
            enc = self.reader_tokenizer(
                prefix_strs, padding="max_length", truncation=True,
                max_length=cfg.generation_max_length, return_tensors="np",
                add_special_tokens=False,
            )
            forced = enc["input_ids"]
            plen = np.asarray(enc["attention_mask"]).sum(axis=1)
            if multihost:
                fx, _, _ = self._union_rows({"forced": forced, "plen": plen})
                forced, plen = fx["forced"], fx["plen"]
            else:
                forced, plen = jnp.asarray(forced), jnp.asarray(plen)

        if cfg.generation_num_beams > 1:
            out = beam_generate(
                reader_params, self.reader_cfg, ids, mask,
                max_length=cfg.generation_max_length,
                num_beams=cfg.generation_num_beams, min_length=min_len,
                length_penalty=cfg.generation_length_penalty,
                forced_prefix=forced, prefix_len=plen, has_prefix=forced is not None,
            )
        else:
            out = greedy_generate(
                reader_params, self.reader_cfg, ids, mask,
                max_length=cfg.generation_max_length, min_length=min_len,
                forced_prefix=forced, prefix_len=plen, has_prefix=forced is not None,
            )
        if multihost:
            return self._union_out(out)[row0 : row0 + n_local]
        return np.asarray(out)

    def compute_reader_loss_and_logits(self, reader_tok, decoder_input_ids, labels):
        """Eval-loss path (atlas.py:577-590)."""
        arrs = self._put_local({
            "ids": reader_tok["input_ids"], "mask": reader_tok["attention_mask"],
            "dec": decoder_input_ids, "labels": labels,
        })
        loss, logits = self._reader_eval_jit(
            self.reader_params, arrs["ids"], arrs["mask"], arrs["dec"], arrs["labels"]
        )
        return float(loss), logits


def _corr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pearson correlation of flattened score tensors (atlas.py:527-534)."""
    a = a.reshape(-1).astype(jnp.float32)
    b = b.reshape(-1).astype(jnp.float32)
    a = a - a.mean()
    b = b - b.mean()
    denom = jnp.sqrt((a * a).sum() * (b * b).sum())
    return jnp.where(denom > 0, (a * b).sum() / denom, 0.0)
