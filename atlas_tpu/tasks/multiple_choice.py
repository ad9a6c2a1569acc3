"""Multiple-choice QA (MMLU-style) with answer-order permutation de-biasing.

Behavioral spec: /root/reference/src/tasks/multiple_choice.py — permutation
cloning (single/cyclic/all), probability marginalization across permutations,
permutation reduction in postprocessing. `choice_position` is derived from the
tokenizer instead of hardcoding index 1 so any tokenizer whose "<extra_id_0> A"
target places the letter at a different offset still scores the right logit.
"""

from __future__ import annotations

import copy
import itertools
import string
from collections import defaultdict

import numpy as np

from atlas_tpu.eval.metrics import exact_match_score
from atlas_tpu.tasks.base import EMPTY_PASSAGE, BaseTask


def _get_permutation_orderings(N, permutations_type):
    identity = list(range(N))
    if permutations_type == "cyclic":
        return [identity[shift:] + identity[:shift] for shift in range(0, -N, -1)]
    if permutations_type == "all":
        return list(itertools.permutations(identity))
    return [identity]


class Task(BaseTask):
    metrics = ["debiased_accuracy", "accuracy", "eval_loss"]

    def __init__(self, cfg, tokenizer, *args, **kwargs):
        super().__init__()
        self.tokenizer = tokenizer
        self.maximum_question_length = 356
        self.choices = string.ascii_uppercase[: cfg.multiple_choice_num_options]
        self.choice2index = {
            letter: self.tokenizer(letter, add_special_tokens=False)["input_ids"][0]
            for letter in self.choices
        }
        # decoder position of the choice token within the teacher-forced target
        probe = self.tokenizer("<extra_id_0> A", add_special_tokens=False)["input_ids"]
        self.choice_position = len(probe) - 1

    @staticmethod
    def get_multiple_choice_question_prompt(tokenizer, question, choices, maximum_length=356):
        """`question: ... options: (A) ... answer: <extra_id_0>`, truncating the
        question from the LEFT (keep its tail) when the whole prompt exceeds the
        token budget — options and scaffolding are never cut."""

        def build(q):
            rendered = " ".join(f"({L}) {T}" for L, T in choices.items()).strip()
            return f"question: {q.strip()} options: {rendered} answer: <extra_id_0>"

        def n_tokens(s):
            return len(tokenizer(s, add_special_tokens=True)["input_ids"])

        prompt = build(question)
        if n_tokens(prompt) > maximum_length:
            question_budget = maximum_length - n_tokens(build(""))
            question_ids = tokenizer(question, add_special_tokens=False)["input_ids"]
            kept_tail = tokenizer.decode(question_ids[-question_budget:], skip_special_tokens=True)
            prompt = build(kept_tail)
        return prompt

    def process(self, example, *args, **kwargs):
        return {
            "query": self.get_multiple_choice_question_prompt(
                self.tokenizer, example["question"], example["options"],
                maximum_length=self.maximum_question_length,
            ),
            "target": f'<extra_id_0> {example["answer"]}',
            "choices": self.choices,
            "passages": [dict(EMPTY_PASSAGE)],
            "answers": [example["answer"]],
            "metadata": example,
        }

    @staticmethod
    def get_permutations(example, permutations_type):
        """Clone the example once per answer ordering; the answer letter follows
        its text. Every clone carries a shared `uid` and an `is_original` mark so
        postprocessing can fold the clones back together."""
        letters = sorted(example["options"])
        texts = [example["options"][letter] for letter in letters]
        answer_text = example["options"][example["answer"]]
        uid = example["question"] + " ".join(example["options"].values())

        clones = []
        for ordering in _get_permutation_orderings(len(letters), permutations_type):
            reordered = {letter: texts[src] for letter, src in zip(letters, ordering)}
            clone = copy.deepcopy(example)
            clone["options"] = reordered
            clone["answer"] = next(l for l, t in reordered.items() if t == answer_text)
            clone["is_original"] = reordered == example["options"]
            clone["uid"] = uid
            clones.append(clone)
        return clones

    @staticmethod
    def data_iterator(*args, **kwargs):
        opt = kwargs["opt"]
        perms_type = (opt.multiple_choice_eval_permutations if kwargs.get("is_eval", False)
                      else opt.multiple_choice_train_permutations)
        for example in BaseTask.data_iterator(*args, **kwargs):
            yield from Task.get_permutations(example, perms_type)

    def evaluation(self, prediction, ground_truths):
        return {"accuracy": exact_match_score(prediction, ground_truths)}

    def get_choice_logits(self, logits):
        """Per-letter logits at the choice decoder position."""
        row = np.asarray(logits)[self.choice_position]
        return {letter: float(row[index]) for letter, index in self.choice2index.items()}

    def _get_original_instance(self, permutations):
        return next(p for p in permutations if p["metadata"]["is_original"])

    def _marginalize_across_permutations(self, permutations):
        """Average each answer TEXT's softmax probability over all permutations,
        then map texts back to the original instance's letters."""
        original = self._get_original_instance(permutations)
        letter_of_text = {text: letter for letter, text in original["metadata"]["options"].items()}
        probs_per_text = defaultdict(list)
        for perm in permutations:
            logits = np.array([perm["choice_logits"][letter] for letter in self.choices])
            expd = np.exp(logits - logits.max())
            softmax = expd / expd.sum()
            for letter, prob in zip(self.choices, softmax):
                probs_per_text[perm["metadata"]["options"][letter]].append(float(prob))
        marginalized = {letter_of_text[t]: float(np.mean(ps)) for t, ps in probs_per_text.items()}
        return marginalized, dict(probs_per_text)

    def _reduce_permutations(self, dataset_wpred):
        """Fold each uid's permutation clones into one prediction row whose
        generation is the argmax of the marginalized choice probabilities."""
        by_uid = defaultdict(list)
        for row in dataset_wpred:
            by_uid[row["metadata"]["uid"]].append(row)
        reduced = []
        for perms in by_uid.values():
            merged = copy.deepcopy(self._get_original_instance(perms))
            merged.pop("choice_logits", None)
            choice_probs, text_probs = self._marginalize_across_permutations(perms)
            merged["choice_probs"] = choice_probs
            merged["generation"] = max(choice_probs, key=choice_probs.get)
            merged["all_probs"] = text_probs
            merged["permutations"] = perms
            reduced.append(merged)
        return reduced

    def evaluation_postprocessing(self, metrics, dataset_with_predictions):
        dataset_with_predictions = self._reduce_permutations(dataset_with_predictions)
        metrics["debiased_accuracy"] = [
            float(row["generation"] == row["metadata"]["answer"])
            for row in dataset_with_predictions
        ]
        return metrics, dataset_with_predictions
