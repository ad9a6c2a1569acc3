"""Answer metrics: SQuAD-style EM/F1 with normalization, ROUGE-1/2/L.

Behavioral reference: /root/reference/src/evaluation.py:21-82 (same SQuAD
normalization semantics; max over ground truths)."""

from __future__ import annotations

import string
from collections import Counter
from typing import Callable, List

import regex

try:
    from rouge import Rouge

    _rouge = Rouge()
except Exception:  # pragma: no cover
    _rouge = None


def normalize_answer(s: str) -> str:
    """Lower, strip punctuation/articles, normalize whitespace (evaluation.py:21-36)."""

    def remove_articles(text):
        return regex.sub(r"\b(a|an|the)\b", " ", text)

    def white_space_fix(text):
        return " ".join(text.split())

    def remove_punc(text):
        exclude = set(string.punctuation)
        return "".join(ch for ch in text if ch not in exclude)

    return white_space_fix(remove_articles(remove_punc(s.lower())))


def em(prediction: str, ground_truth: str, normalize_fn) -> float:
    return float(normalize_fn(prediction) == normalize_fn(ground_truth))


def f1(prediction: str, ground_truth: str, normalize_fn) -> float:
    prediction_tokens = normalize_fn(prediction).split()
    ground_truth_tokens = normalize_fn(ground_truth).split()
    common = Counter(prediction_tokens) & Counter(ground_truth_tokens)
    num_same = sum(common.values())
    if num_same == 0:
        return 0.0
    precision = num_same / len(prediction_tokens)
    recall = num_same / len(ground_truth_tokens)
    return (2 * precision * recall) / (precision + recall)


def exact_match_score(prediction, ground_truths, normalize_fn: Callable[[str], str] = lambda x: x) -> float:
    return max(em(prediction, gt, normalize_fn) for gt in ground_truths)


def f1_score(prediction, ground_truths, normalize_fn: Callable[[str], str] = lambda x: x) -> float:
    return max(f1(prediction, gt, normalize_fn) for gt in ground_truths)


def _rouge_wrapper(prediction: str, ground_truth: str):
    try:
        result = _rouge.get_scores(prediction, ground_truth, avg=True)
        return result["rouge-1"]["f"], result["rouge-2"]["f"], result["rouge-l"]["f"]
    except Exception:
        return 0.0, 0.0, 0.0


def rouge_score(prediction: str, ground_truths: List[str]):
    ground_truths = [x for x in ground_truths if len(x) > 0]
    if _rouge is None or len(prediction) == 0 or len(ground_truths) == 0:
        return 0.0, 0.0, 0.0
    scores = [_rouge_wrapper(prediction, gt) for gt in ground_truths]
    return tuple(max(s[i] for s in scores) for i in range(3))
