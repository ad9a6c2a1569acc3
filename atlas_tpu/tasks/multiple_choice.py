"""Multiple-choice QA (MMLU-style) with answer-order permutation de-biasing.

Behavioral reference: /root/reference/src/tasks/multiple_choice.py — permutation
cloning (single/cyclic/all, :77-98), probability marginalization across permutations
(:126-139), permutation reduction in postprocessing (:141-157). `choice_position` is
derived from the tokenizer instead of hardcoding index 1 so any tokenizer whose
"<extra_id_0> A" target places the letter at a different offset still scores the right
logit.
"""

from __future__ import annotations

import copy
import itertools
import string

import numpy as np

from atlas_tpu.eval.metrics import exact_match_score
from atlas_tpu.tasks.base import BaseTask


def _get_permutation_orderings(N, permutations_type):
    li = list(range(N))
    if permutations_type == "cyclic":
        orderings = [li[N - i :] + li[: N - i] for i in range(N)]
    elif permutations_type == "all":
        orderings = list(itertools.permutations(li))
    else:
        orderings = [li]
    return orderings


class Task(BaseTask):
    metrics = ["debiased_accuracy", "accuracy", "eval_loss"]

    def __init__(self, cfg, tokenizer, *args, **kwargs):
        super().__init__()
        self.tokenizer = tokenizer
        self.maximum_question_length = 356
        self.choices = string.ascii_uppercase[: cfg.multiple_choice_num_options]
        self.choice2index = {o: self.tokenizer(o, add_special_tokens=False)["input_ids"][0] for o in self.choices}
        # decoder position of the choice token within the teacher-forced target
        probe = self.tokenizer("<extra_id_0> A", add_special_tokens=False)["input_ids"]
        self.choice_position = len(probe) - 1

    @staticmethod
    def get_multiple_choice_question_prompt(tokenizer, question, choices, maximum_length=356):
        def _length_in_tokens(s):
            return len(tokenizer(s, add_special_tokens=True)["input_ids"])

        def _get_prompt(question, choices_wseparator):
            return f"question: {question.strip()} options: {choices_wseparator} answer: <extra_id_0>"

        choices_wseparator = " ".join(f"({L}) {T}" for L, T in choices.items()).strip()
        question_with_options = _get_prompt(question, choices_wseparator)
        if _length_in_tokens(question_with_options) > maximum_length:
            max_qlen = maximum_length - _length_in_tokens(_get_prompt("", choices_wseparator))
            qids = tokenizer(question, add_special_tokens=False)["input_ids"]
            truncated = tokenizer.decode(qids[-max_qlen:], skip_special_tokens=True)
            question_with_options = _get_prompt(truncated, choices_wseparator)
        return question_with_options

    def process(self, example, *args, **kwargs):
        preprocessed_question = self.get_multiple_choice_question_prompt(
            self.tokenizer, example["question"], example["options"],
            maximum_length=self.maximum_question_length,
        )
        return {
            "query": preprocessed_question,
            "target": f'<extra_id_0> {example["answer"]}',
            "choices": self.choices,
            "passages": [{"title": "", "text": ""}],
            "answers": [example["answer"]],
            "metadata": example,
        }

    @staticmethod
    def get_permutations(example, permutations_type):
        options, answer = example["options"], example["answer"]
        uid = example["question"] + " ".join(options.values())
        choice_keys = sorted(options.keys())
        choice_values = [options[l] for l in choice_keys]
        orderings = _get_permutation_orderings(len(choice_keys), permutations_type)

        permuted_examples = []
        for ordering in orderings:
            permuted_options = {l: choice_values[o] for l, o in zip(choice_keys, ordering)}
            permuted_answer = [k for k, ans in permuted_options.items() if ans == options[answer]][0]
            ex = copy.deepcopy(example)
            ex["options"] = permuted_options
            ex["answer"] = permuted_answer
            ex["is_original"] = permuted_options == example["options"]
            ex["uid"] = uid
            permuted_examples.append(ex)
        return permuted_examples

    @staticmethod
    def data_iterator(*args, **kwargs):
        super_iterator = BaseTask.data_iterator(*args, **kwargs)
        perms_type = (
            kwargs["opt"].multiple_choice_eval_permutations
            if kwargs.get("is_eval", False)
            else kwargs["opt"].multiple_choice_train_permutations
        )
        for example in super_iterator:
            yield from Task.get_permutations(example, perms_type)

    def evaluation(self, prediction, ground_truths):
        return {"accuracy": exact_match_score(prediction, ground_truths)}

    def get_choice_logits(self, logits):
        """Per-letter logits at the choice decoder position (ref :117-121)."""
        row = np.asarray(logits)[self.choice_position]
        return {letter: float(row[idx]) for letter, idx in self.choice2index.items()}

    def _get_original_instance(self, permutations):
        return [p for p in permutations if p["metadata"]["is_original"]][0]

    def _marginalize_across_permutations(self, permutations):
        original_instance = self._get_original_instance(permutations)
        text_answer_2_letter = {v: k for k, v in original_instance["metadata"]["options"].items()}
        aggregate_probs = {}
        for perm in permutations:
            logits = np.array([perm["choice_logits"][c] for c in self.choices])
            e = np.exp(logits - logits.max())
            probs = (e / e.sum()).tolist()
            perm_text_options = [perm["metadata"]["options"][c] for c in self.choices]
            for t, p in zip(perm_text_options, probs):
                aggregate_probs.setdefault(t, []).append(p)
        marginalized = {text_answer_2_letter[t]: float(np.mean(v)) for t, v in aggregate_probs.items()}
        return marginalized, aggregate_probs

    def _reduce_permutations(self, dataset_wpred):
        to_agg = {}
        for output in dataset_wpred:
            to_agg.setdefault(output["metadata"]["uid"], []).append(output)
        output_dataset_wpred = []
        for _, perms in to_agg.items():
            original_instance = copy.deepcopy(self._get_original_instance(perms))
            scores, all_scores = self._marginalize_across_permutations(perms)
            del original_instance["choice_logits"]
            original_instance["choice_probs"] = scores
            original_instance["generation"] = max(scores.items(), key=lambda x: x[1])[0]
            original_instance["all_probs"] = all_scores
            original_instance["permutations"] = perms
            output_dataset_wpred.append(original_instance)
        return output_dataset_wpred

    def evaluation_postprocessing(self, metrics, dataset_with_predictions):
        dataset_with_predictions = self._reduce_permutations(dataset_with_predictions)
        metrics["debiased_accuracy"] = [
            float(d["generation"] == d["metadata"]["answer"]) for d in dataset_with_predictions
        ]
        return metrics, dataset_with_predictions
