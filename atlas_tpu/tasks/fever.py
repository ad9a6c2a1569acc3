"""FEVER fact-verification task.

Behavioral spec: /root/reference/src/tasks/fever.py — claims become
`question: ... answer: <extra_id_0>` queries; the three FEVER labels map to
true/false/maybe verbalizers; accuracy scoring.
"""

from __future__ import annotations

from atlas_tpu.eval.metrics import exact_match_score
from atlas_tpu.tasks.base import EMPTY_PASSAGE, BaseTask

VERBALIZER = {"SUPPORTS": "true", "REFUTES": "false", "NOT ENOUGH INFO": "maybe"}


class Task(BaseTask):
    metrics = ["accuracy"]

    def process(self, example, *args, **kwargs):
        verdict = VERBALIZER.get(example.get("label", ""), "")
        example.setdefault("metadata", {})["clean_target"] = verdict
        example.update(
            query=f"question: {example['claim']} answer: <extra_id_0>",
            target=f"<extra_id_0> {verdict}",
            answers=[verdict],
            passages=[dict(EMPTY_PASSAGE)],
        )
        return example

    def evaluation(self, prediction, ground_truths):
        return {"accuracy": exact_match_score(prediction, ground_truths)}
