"""Prefix-LM task: condition on a random-length text prefix, continue the rest.

Behavioral spec: /root/reference/src/tasks/lm.py — whitespace-preserving split at
a uniform random word boundary between the two context ratios, min-word
filtering, self-passage filtering by instance id, EM/F1/ROUGE scoring.
"""

from __future__ import annotations

import random
import re

from atlas_tpu.eval.metrics import exact_match_score, f1_score, rouge_score
from atlas_tpu.tasks.base import EMPTY_PASSAGE, BaseTask, filter_results_by_id


class Task(BaseTask):
    metrics = ["eval_loss", "accuracy", "f1", "rouge_1", "rouge_2", "rouge_L"]

    def __init__(self, cfg, *args, **kwargs):
        self.min_words = cfg.min_words_per_lm_instance
        self.ratio_bounds = (cfg.min_lm_context_ratio, cfg.max_lm_context_ratio)

    def filter(self, *args, **kwargs):
        return filter_results_by_id(*args, **kwargs)

    def process(self, example, *args, **kwargs):
        text = example.get("text", "")
        if not text.strip():
            return None
        if self.min_words is not None and len(text.split()) < self.min_words:
            return None
        context, continuation = self.split(text, *self.ratio_bounds)
        example.setdefault("passages", [dict(EMPTY_PASSAGE)])
        example["query"] = context
        example["target"] = continuation
        example["metadata"] = {"id": example["id"]}
        return example

    @staticmethod
    def split(text, min_context_ratio, max_context_ratio):
        """(context, continuation) cut at a random word boundary whose position is
        bounded by the two ratios. re.split with a capturing group keeps the
        whitespace tokens, so context + continuation == text exactly."""
        pieces = re.split(r"(\S+)", text)
        n = len(pieces)
        lo = int(max(2, n * min_context_ratio))
        hi = int(max(min(n - 2, n * max_context_ratio), lo + 1))
        cut = random.randint(lo, hi)
        return "".join(pieces[:cut]), "".join(pieces[cut:])

    def evaluation(self, prediction, ground_truths):
        r1, r2, rl = rouge_score(prediction, ground_truths)
        return {
            "accuracy": exact_match_score(prediction, ground_truths),
            "f1": f1_score(prediction, ground_truths),
            "rouge_1": r1, "rouge_2": r2, "rouge_L": rl,
        }
