"""Base task: jsonl iteration with deterministic mod-rank sharding, batching,
retrieval-result filtering.

Behavioral spec: /root/reference/src/tasks/base.py:17-128 — every world_size-th
line goes to each rank, batches are dict-of-lists with a `__size__` count, and
`filter_results_by_id` drops self-passages and backfills when short. The
implementation here is original; `tests/test_tasks.py` pins the semantics.
"""

from __future__ import annotations

import json
import logging
import random
from collections import defaultdict

from atlas_tpu.eval.metrics import exact_match_score

logger = logging.getLogger(__name__)

EMPTY_PASSAGE = {"title": "", "text": ""}


class BaseTask:
    metrics = ["accuracy", "eval_loss"]

    def __init__(self, *args, **kwargs):
        self.filter = None

    @staticmethod
    def data_iterator(filenames, world_rank=-1, world_size=-1,
                      repeat_if_less_than_world_size=False, *args, **kwargs):
        """Deal jsonl lines round-robin to ranks: rank r takes every line whose
        1-based running count ≡ r (mod world_size). With
        `repeat_if_less_than_world_size`, keep re-reading the files until every
        rank has seen at least one line (tiny few-shot sets on big worlds)."""
        if isinstance(filenames, str):
            filenames = [filenames]
        dealt = 0
        while True:
            for filename in filenames:
                with open(filename, encoding="utf-8") as fh:
                    for line in fh:
                        dealt += 1
                        if world_rank < 0 or dealt % world_size == world_rank:
                            yield json.loads(line)
            done = dealt >= world_size if repeat_if_less_than_world_size else dealt > 0
            if done:
                return

    @staticmethod
    def _collate(examples):
        """List of example dicts -> dict of lists (+ `__size__`). Keys missing
        from some examples simply contribute shorter lists, as in the reference."""
        batch = defaultdict(list)
        batch["__size__"] = len(examples)
        for ex in examples:
            for key, value in ex.items():
                batch[key].append(value)
        return batch

    @staticmethod
    def batch_iterator(data_iterator, batch_size, drop_last=False, shuffle=False):
        source = BaseTask.shuffle_iterator(data_iterator) if shuffle else data_iterator
        pending = []
        for example in source:
            pending.append(example)
            if len(pending) == batch_size:
                yield BaseTask._collate(pending)
                pending = []
        if pending and not drop_last:
            yield BaseTask._collate(pending)

    @staticmethod
    def shuffle_iterator(dataset):
        buffered = list(dataset)
        random.shuffle(buffered)
        return iter(buffered)

    def process(self, example, *args, **kwargs):
        for required in ("target", "query"):
            assert isinstance(example.get(required), str), (
                f"base task requires a `{required}` field string"
            )
        example.setdefault("passages", [dict(EMPTY_PASSAGE)])
        return example

    def evaluation(self, prediction, ground_truths):
        return {"accuracy": exact_match_score(prediction, ground_truths)}

    def evaluation_postprocessing(self, metrics, dataset_with_predictions):
        return metrics, dataset_with_predictions


def filter_results_by_id(batch_metadata, passages, scores, topk, training=False):
    """Drop retrieved passages whose id equals the source instance's id (anti-cheat
    for mlm/lm/section); backfill with the dropped ones if fewer than topk remain."""
    if batch_metadata is None:
        logger.warning("Trying to filter a batch with no metadata - returning the topk")
        return [ps[:topk] for ps in passages], [ss[:topk] for ss in scores]

    kept_passages, kept_scores = [], []
    for metadata, plist, slist in zip(batch_metadata, passages, scores):
        source_id = metadata.get("id")
        # stable partition: clean hits keep retrieval order, self-hits fall behind
        ranked = sorted(zip(plist, slist), key=lambda kv: kv[0].get("id") == source_id)
        n_clean = sum(1 for p, _ in ranked if p.get("id") != source_id)
        if n_clean < topk:
            logger.warning(f"{n_clean} passages after filtering for topk = {topk}")
        kept_passages.append([p for p, _ in ranked[:topk]])
        kept_scores.append([s for _, s in ranked[:topk]])
    return kept_passages, kept_scores


Task = BaseTask
