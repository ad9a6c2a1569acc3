"""KILT-format seq2seq task.

Behavioral spec: /root/reference/src/tasks/kilt.py — gold answers collected from
the KILT `output` list, fever labels mapped to true/false, one sampled answer as
the training target, accuracy + normalized EM/F1 scoring.
"""

from __future__ import annotations

import random

from atlas_tpu.eval.metrics import exact_match_score, f1_score, normalize_answer
from atlas_tpu.tasks.base import EMPTY_PASSAGE, BaseTask


class Task(BaseTask):
    metrics = ["accuracy", "exact_match", "f1"]

    def process(self, example, *args, **kwargs):
        answers = self.get_gold_answers(example)
        if "fever" in example.get("filename", ""):
            answers = [("true", "false")[a != "SUPPORTS"] for a in answers]
        picked = random.choice(answers)
        example.setdefault("metadata", {})["clean_target"] = picked
        example["query"] = f"question: {example['input']} answer: <extra_id_0>"
        example["target"] = f"<extra_id_0> {picked}"
        example["answers"] = answers
        example["passages"] = [dict(EMPTY_PASSAGE)]
        return example

    def get_gold_answers(self, gold):
        """Unique non-empty answer strings, in first-seen order (the reference
        collects them into a set; order only affects which one random.choice
        samples, not the answer pool)."""
        answers = []
        for candidate in gold["output"]:
            text = (candidate.get("answer") or "").strip()
            if text and text not in answers:
                answers.append(text)
        return answers

    def evaluation(self, prediction, ground_truths):
        em_raw = exact_match_score(prediction, ground_truths)
        em_norm = exact_match_score(prediction, ground_truths, normalize_answer)
        f1 = f1_score(prediction, ground_truths, normalize_answer)
        return {"accuracy": em_raw, "exact_match": em_norm, "f1": f1}
