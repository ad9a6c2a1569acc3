"""FEVER fact-verification task (reference: /root/reference/src/tasks/fever.py)."""

from __future__ import annotations

from atlas_tpu.eval.metrics import exact_match_score
from atlas_tpu.tasks.base import BaseTask

_LABEL_MAP = {"NOT ENOUGH INFO": "maybe", "REFUTES": "false", "SUPPORTS": "true"}


class Task(BaseTask):
    metrics = ["accuracy"]

    def process(self, example, *args, **kwargs):
        clean_input = example["claim"]
        clean_target = _LABEL_MAP.get(example.get("label", ""), "")
        example["metadata"] = example.get("metadata", {})
        example["query"] = f"question: {clean_input} answer: <extra_id_0>"
        example["target"] = f"<extra_id_0> {clean_target}"
        example["passages"] = [{"title": "", "text": ""}]
        example["metadata"]["clean_target"] = clean_target
        example["answers"] = [clean_target]
        return example

    def evaluation(self, prediction, ground_truths):
        return {"accuracy": exact_match_score(prediction, ground_truths)}
