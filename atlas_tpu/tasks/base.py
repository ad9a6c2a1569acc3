"""Base task: jsonl iteration with deterministic mod-rank sharding, batching,
retrieval-result filtering.

Behavioral reference: /root/reference/src/tasks/base.py:17-128 — same data sharding
(every world_size-th line to each rank, :40-41), same batch dict shape, same
filter_results_by_id semantics (drop self-passage, backfill if short, :93-128).
"""

from __future__ import annotations

import json
import logging
import random
from collections import defaultdict

from atlas_tpu.eval.metrics import exact_match_score

logger = logging.getLogger(__name__)


class BaseTask:
    metrics = ["accuracy", "eval_loss"]

    def __init__(self, *args, **kwargs):
        self.filter = None

    @staticmethod
    def data_iterator(filenames, world_rank=-1, world_size=-1,
                      repeat_if_less_than_world_size=False, *args, **kwargs):
        if isinstance(filenames, str):
            filenames = [filenames]

        def _iter():
            return (line for filename in filenames for line in open(filename, encoding="utf-8"))

        def _stop():
            return (total_yielded >= world_size) if repeat_if_less_than_world_size else (total_yielded > 0)

        total_yielded = 0
        while not _stop():
            for line in _iter():
                total_yielded += 1
                if world_rank > -1 and total_yielded % world_size != world_rank:
                    continue
                yield json.loads(line)

    @staticmethod
    def batch_iterator(data_iterator, batch_size, drop_last=False, shuffle=False):
        if shuffle:
            data_iterator = BaseTask.shuffle_iterator(data_iterator)
        batch = defaultdict(list)
        batch["__size__"] = 0
        for example in data_iterator:
            for k, v in example.items():
                batch[k].append(v)
            batch["__size__"] += 1
            if batch["__size__"] == batch_size:
                yield batch
                batch = defaultdict(list)
                batch["__size__"] = 0
        if batch["__size__"] > 0 and not drop_last:
            yield batch

    @staticmethod
    def shuffle_iterator(dataset):
        d = list(dataset)
        random.shuffle(d)
        yield from d

    def process(self, example, *args, **kwargs):
        assert "target" in example and isinstance(example["target"], str), (
            "base task requires a `target` field string"
        )
        assert "query" in example and isinstance(example["query"], str), (
            "base task requires a `query` field string"
        )
        if "passages" not in example:
            example["passages"] = [{"title": "", "text": ""}]
        return example

    def evaluation(self, prediction, ground_truths):
        return {"accuracy": exact_match_score(prediction, ground_truths)}

    def evaluation_postprocessing(self, metrics, dataset_with_predictions):
        return metrics, dataset_with_predictions


def filter_results_by_id(batch_metadata, passages, scores, topk, training=False):
    """Drop retrieved passages whose id equals the source instance's id (anti-cheat
    for mlm/lm/section); backfill with violators if fewer than topk remain."""
    if batch_metadata is None:
        logger.warning("Trying to filter a batch with no metadata - returning the topk")
        return [ps[:topk] for ps in passages], [ss[:topk] for ss in scores]

    output_passages, output_scores = [], []
    for metadata, passage_li, scores_li in zip(batch_metadata, passages, scores):
        kept, violating = [], []
        for p, s in zip(passage_li, scores_li):
            (violating if p.get("id") == metadata.get("id") else kept).append((p, s))
        if topk > len(kept):
            logger.warning(f"{len(kept)} passages after filtering for topk = {topk}")
        kept += violating
        ps, ss = zip(*kept) if kept else ((), ())
        output_passages.append(list(ps)[:topk])
        output_scores.append(list(ss)[:topk])
    return output_passages, output_scores


Task = BaseTask
