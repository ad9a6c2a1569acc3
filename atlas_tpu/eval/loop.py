"""Evaluation loops: full eval (loss + generation + metrics) and retrieve-only.

Behavioral reference: /root/reference/evaluate.py:25-165 — rank batch-count padding so
every process runs the same number of (possibly empty) steps, per-sample task metrics,
MCQA choice logits, permutation postprocessing, distributed metric averaging, and
prediction writing.
"""

from __future__ import annotations

import logging
import os
from collections import defaultdict

import jax
import numpy as np

from atlas_tpu.tasks import get_task
from atlas_tpu.utils.io import save_distributed_dataset
from atlas_tpu.utils.stats import avg_dist_dict

logger = logging.getLogger(__name__)


def _local_batch_size(cfg, atlas):
    """Process-local eval batch: per-device batch x this process's dp rows."""
    if getattr(atlas, "mesh", None) is None:
        return cfg.per_gpu_batch_size
    from atlas_tpu.parallel.mesh import local_dp_size

    return cfg.per_gpu_batch_size * local_dp_size(atlas.mesh)


def _prefetch_tokenized(batches, atlas, enabled=True):
    """Yield (batch, (query_enc, labels, decoder_input_ids)) with the NEXT batch's
    query/target tokenization on a worker thread while the device evaluates the
    current one (same overlap as train/loop.py; eval params are fixed, but
    retrieval still runs in batch order so the sharded-search collectives stay in
    lockstep across ranks)."""
    if not enabled:
        for b in batches:
            yield b, atlas.tokenize(b.get("query", [""]), b.get("target", [""]),
                                    target_tokens=b.get("target_tokens"))
        return
    from concurrent.futures import ThreadPoolExecutor

    ex = ThreadPoolExecutor(max_workers=1, thread_name_prefix="eval-pretok")
    pending = None
    try:
        for b in batches:
            fut = ex.submit(atlas.tokenize, b.get("query", [""]), b.get("target", [""]),
                            b.get("target_tokens"))
            if pending is not None:
                pb, pf = pending
                yield pb, pf.result()
            pending = (b, fut)
        if pending is not None:
            pb, pf = pending
            yield pb, pf.result()
    finally:
        ex.shutdown(wait=False, cancel_futures=True)


def _get_eval_data_iterator(cfg, data_path, task, batch_size=None):
    data_iterator = task.data_iterator(data_path, cfg.global_rank, cfg.world_size,
                                       opt=cfg, is_eval=True)
    data_iterator = filter(None, map(task.process, data_iterator))
    data_iterator = list(task.batch_iterator(data_iterator, batch_size or cfg.per_gpu_batch_size))
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        n = multihost_utils.process_allgather(np.array([len(data_iterator)])).max()
        if len(data_iterator) < int(n):
            data_iterator.extend({} for _ in range(int(n) - len(data_iterator)))
    return data_iterator


def run_retrieval_only(atlas, index, cfg, data_path, step=None):
    """Standalone retriever mode (evaluate.py:41-83)."""
    metrics = defaultdict(list)
    dataset_wpred = []
    task = get_task(cfg, atlas.reader_tokenizer)
    data_iterator = _get_eval_data_iterator(cfg, data_path, task, _local_batch_size(cfg, atlas))

    for batch in data_iterator:
        query = batch.get("query", [""])
        answers = batch.get("target", [""])
        batch_metadata = batch.get("metadata")
        query_enc = atlas.retriever_tokenize(query)
        retrieved_passages, _ = atlas.retrieve(
            index, cfg.n_context, query,
            query_enc["input_ids"], query_enc["attention_mask"],
            batch_metadata=batch_metadata, filtering_fun=task.filter,
        )
        if (len(query) == 0) or (len(query[0]) == 0):  # padding batch
            continue
        if cfg.write_results:
            for k in range(len(retrieved_passages)):
                gold = [answers[k]] if "answers" not in batch else batch["answers"][k]
                ex = {"query": query[k], "answers": gold, "passages": retrieved_passages[k]}
                if batch_metadata is not None:
                    ex["metadata"] = batch_metadata[k]
                if "id" in batch:
                    ex["id"] = batch["id"][k]
                dataset_wpred.append(ex)

    if cfg.write_results:
        dataset_name, _ = os.path.splitext(os.path.basename(data_path))
        save_distributed_dataset(dataset_wpred, f"{dataset_name}-step-{step}", cfg)
    return metrics


def evaluate(atlas, index, cfg, data_path, step=None):
    """Full eval (evaluate.py:87-165)."""
    metrics = defaultdict(list)
    dataset_wpred = []
    task = get_task(cfg, atlas.reader_tokenizer)
    data_iterator = _get_eval_data_iterator(cfg, data_path, task, _local_batch_size(cfg, atlas))

    for batch, (query_enc, labels, decoder_input_ids) in _prefetch_tokenized(
        data_iterator, atlas, enabled=getattr(cfg, "host_prefetch", True)
    ):
        query = batch.get("query", [""])
        answers = batch.get("target", [""])
        batch_metadata = batch.get("metadata")
        is_padding_batch = (len(query) == 0) or (len(query[0]) == 0)
        if not cfg.use_file_passages:
            # padding ranks still run the retrieval (it participates in the
            # sharded-search collective like the reference's all_gather protocol)
            retrieved_passages, _ = atlas.retrieve(
                index, cfg.n_context, query,
                query_enc["input_ids"], query_enc["attention_mask"],
                batch_metadata=batch_metadata, filtering_fun=task.filter,
            )
        elif is_padding_batch:
            continue
        else:
            assert "passages" in batch, "cant use use_file_passages without passing passages"
            retrieved_passages = [p[: cfg.n_context] for p in batch["passages"]]

        if is_padding_batch:
            continue

        reader_tokens, _ = atlas.tokenize_passages(query, retrieved_passages)

        logits = None
        if "eval_loss" in task.metrics:
            eval_loss, logits = atlas.compute_reader_loss_and_logits(
                reader_tokens, decoder_input_ids, labels
            )
            metrics["eval_loss"].append(eval_loss)

        generation = atlas.generate(reader_tokens, query)

        for k, g in enumerate(generation):
            if cfg.decoder_prompt_format is not None:
                query_ids = atlas.reader_tokenizer(
                    cfg.decoder_prompt_format.format_map({"query": query[k]}),
                    add_special_tokens=False,
                )["input_ids"]
                g = g[len(query_ids) + 1 :]
            pred = atlas.reader_tokenizer.decode(g, skip_special_tokens=True)
            gold = [answers[k]] if "answers" not in batch else batch["answers"][k]
            sample_metrics = task.evaluation(pred, gold)
            for key, value in sample_metrics.items():
                metrics[key].append(value)

            if cfg.write_results:
                ex = {"query": query[k], "answers": gold, "generation": pred}
                if not cfg.dont_write_passages:
                    ex["passages"] = retrieved_passages[k]
                if batch_metadata is not None:
                    ex["metadata"] = batch_metadata[k]
                if cfg.task == "multiple_choice":
                    ex["choice_logits"] = task.get_choice_logits(np.asarray(logits)[k])
                if "id" in batch:
                    ex["id"] = batch["id"][k]
                dataset_wpred.append(ex)

    metrics, dataset_wpred = task.evaluation_postprocessing(metrics, dataset_wpred)
    metrics = avg_dist_dict(task.metrics, metrics)
    metrics = {key: value if key == "eval_loss" else 100 * value for key, value in metrics.items()}
    if cfg.write_results:
        dataset_name, _ = os.path.splitext(os.path.basename(data_path))
        save_distributed_dataset(dataset_wpred, f"{dataset_name}-step-{step}", cfg)
    return metrics
