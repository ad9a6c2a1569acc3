#!/usr/bin/env python
"""Offline MMLU scorer: per-category accuracy + permutation-debiased accuracy.

Role parity: reference evaluation_scripts/evaluate_mmlu_predictions.py — re-scores
the prediction jsonl files written by evaluate.py (with --write_results and the
multiple_choice task's permutation reduction) against gold files, independently of
the training process. The subject -> category taxonomy is the MMLU authors' standard
grouping (Hendrycks et al.).
"""

from __future__ import annotations

import argparse
import json
import os

# Standard MMLU taxonomy (Hendrycks et al.): subject -> top-level category.
_CATEGORY_OF = {
    # humanities
    "high_school_european_history": "humanities", "high_school_us_history": "humanities",
    "high_school_world_history": "humanities", "prehistory": "humanities",
    "formal_logic": "humanities", "logical_fallacies": "humanities",
    "moral_disputes": "humanities", "moral_scenarios": "humanities",
    "philosophy": "humanities", "world_religions": "humanities",
    "international_law": "humanities", "jurisprudence": "humanities",
    "professional_law": "humanities",
    # social sciences
    "high_school_government_and_politics": "Soc Sci.", "public_relations": "Soc Sci.",
    "security_studies": "Soc Sci.", "us_foreign_policy": "Soc Sci.",
    "human_sexuality": "Soc Sci.", "sociology": "Soc Sci.",
    "econometrics": "Soc Sci.", "high_school_macroeconomics": "Soc Sci.",
    "high_school_microeconomics": "Soc Sci.", "high_school_geography": "Soc Sci.",
    "high_school_psychology": "Soc Sci.", "professional_psychology": "Soc Sci.",
    # STEM
    "astronomy": "STEM", "college_physics": "STEM", "conceptual_physics": "STEM",
    "high_school_physics": "STEM", "college_chemistry": "STEM",
    "high_school_chemistry": "STEM", "college_biology": "STEM",
    "high_school_biology": "STEM", "college_computer_science": "STEM",
    "computer_security": "STEM", "high_school_computer_science": "STEM",
    "machine_learning": "STEM", "abstract_algebra": "STEM",
    "college_mathematics": "STEM", "elementary_mathematics": "STEM",
    "high_school_mathematics": "STEM", "high_school_statistics": "STEM",
    "electrical_engineering": "STEM",
    # other
    "global_facts": "other", "miscellaneous": "other",
    "professional_accounting": "other", "business_ethics": "other",
    "management": "other", "marketing": "other", "anatomy": "other",
    "clinical_knowledge": "other", "college_medicine": "other",
    "human_aging": "other", "medical_genetics": "other", "nutrition": "other",
    "professional_medicine": "other", "virology": "other",
}

CATEGORIES = ["humanities", "Soc Sci.", "STEM", "other", "all"]


def _uuid(question: str, options: dict) -> str:
    return question + str(options)


def _dataset_key(name: str) -> str:
    return name.replace("_test", "").replace("_valid", "")


def load_predictions_file(path: str) -> dict:
    predictions: dict = {}
    with open(path) as f:
        for line in f:
            dp = json.loads(line)
            perms = dp.get("permutations") or dp.get("permuatations")
            original = next(p for p in perms if p["metadata"]["is_original"])
            dataset = _dataset_key(original["metadata"]["dataset"])
            uuid = _uuid(original["metadata"]["question"], original["metadata"]["options"])
            raw_pred = max(original["choice_logits"].items(), key=lambda kv: kv[1])[0]
            predictions.setdefault(dataset, {})[uuid] = {
                "prediction": raw_pred,
                "debiased_prediction": dp["generation"],
            }
    return predictions


def load_predictions(path: str, step=None, split=None) -> dict:
    if not os.path.isdir(path):
        return load_predictions_file(path)
    predictions: dict = {}
    for domain in os.listdir(path):
        ppath = os.path.join(path, domain, f"{domain}.{split}-step-{step}.jsonl")
        if not os.path.exists(ppath):
            raise ValueError(f"{ppath} expected but missing")
        predictions.update(load_predictions_file(ppath))
    return predictions


def load_gold_file(path: str) -> dict:
    gold: dict = {}
    with open(path) as f:
        for line in f:
            dp = json.loads(line)
            gold.setdefault(_dataset_key(dp["dataset"]), {})[_uuid(dp["question"], dp["options"])] = dp["answer"]
    return gold


def score(gold: dict, predictions: dict) -> dict:
    per_cat = {c: {"n": 0, "acc": 0, "debiased": 0} for c in CATEGORIES}
    for dataset, questions in gold.items():
        cat = _CATEGORY_OF.get(dataset)
        preds = predictions.get(dataset, {})
        for uuid, answer in questions.items():
            p = preds[uuid]
            for bucket in (cat, "all"):
                if bucket is None:
                    continue
                per_cat[bucket]["n"] += 1
                per_cat[bucket]["acc"] += int(p["prediction"] == answer)
                per_cat[bucket]["debiased"] += int(p["debiased_prediction"] == answer)
    return {
        c: (100 * v["acc"] / v["n"], 100 * v["debiased"] / v["n"])
        for c, v in per_cat.items() if v["n"] > 0
    }


def main(predictions_path: str, gold_path: str, step=None, split=None) -> None:
    print(f"predictions for {predictions_path}")
    results = score(load_gold_file(gold_path), load_predictions(predictions_path, step, split))
    print(f"{'category':>15}\t{'Acc(%)':>10}\t{'Debias Acc(%)':>14}")
    print("-" * 47)
    for cat in CATEGORIES:
        if cat in results:
            acc, deb = results[cat]
            print(f"{cat:>15}\t{acc:>10.2f}\t{deb:>14.2f}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--predictions_path", type=str, required=True,
                        help="prediction jsonl (or per-domain directory for 5-shot)")
    parser.add_argument("--gold_path", type=str, required=True)
    parser.add_argument("--step", type=int, default=16, help="5-shot only: step to score")
    parser.add_argument("--split", type=str, default="valid", help="5-shot only: split")
    args = parser.parse_args()
    main(args.predictions_path, args.gold_path, step=args.step, split=args.split)
