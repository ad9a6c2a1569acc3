"""Open-domain QA task.

Behavioral spec: /root/reference/src/tasks/qa.py — prompt format from
`--qa_prompt_format`, `<extra_id_0>`-prefixed targets, answer sampled from the
`answers` list when no explicit target, SQuAD-normalized EM/F1 scoring.
"""

from __future__ import annotations

import random

from atlas_tpu.eval.metrics import exact_match_score, f1_score, normalize_answer
from atlas_tpu.tasks.base import EMPTY_PASSAGE, BaseTask


class Task(BaseTask):
    metrics = ["exact_match", "f1", "eval_loss"]

    def __init__(self, cfg, *args, **kwargs):
        super().__init__()
        self.prompt = cfg.qa_prompt_format

    def get_qa_prompt(self, question: str) -> str:
        return self.prompt.format(question=question)

    def process(self, example, *args, **kwargs):
        answer = example.get("target")
        if answer is None and example.get("answers"):
            answer = random.choice(example["answers"])
        example.setdefault("passages", [dict(EMPTY_PASSAGE)])
        example.setdefault("metadata", {})
        example["query"] = self.prompt.format(question=example["question"])
        if answer is not None:
            example["target"] = f"<extra_id_0> {answer}"
        return example

    def evaluation(self, prediction, ground_truths):
        em = exact_match_score(prediction, ground_truths, normalize_answer)
        f1 = f1_score(prediction, ground_truths, normalize_answer)
        return {"exact_match": em, "f1": f1}
