"""MLM (T5 span-corruption) pretraining task.

Behavioral reference: /root/reference/src/tasks/mlm.py — the same span-corruption
statistics (noise density, mean span length, sentinel interleaving) and the retrieval
self-filter; implementation is our own.
"""

from __future__ import annotations

import random

from atlas_tpu.eval.metrics import exact_match_score, f1_score, rouge_score
from atlas_tpu.tasks.base import BaseTask, filter_results_by_id


class Task(BaseTask):
    metrics = ["eval_loss", "accuracy", "f1", "rouge_1", "rouge_2", "rouge_L"]

    def __init__(self, cfg, tokenizer, *args, **kwargs):
        self.tokenizer = tokenizer
        self.min_words = cfg.min_words_per_lm_instance
        self.mlm_noise_density = cfg.mlm_noise_density
        self.mlm_mean_noise_span_length = cfg.mlm_mean_noise_span_length
        self.text_maxlength = cfg.text_maxlength

    def filter(self, *args, **kwargs):
        return filter_results_by_id(*args, **kwargs)

    def process(self, example, *args, **kwargs):
        clean_target = example["text"]
        if len(clean_target.strip()) == 0:
            return None
        if self.min_words is not None and len(clean_target.split()) < self.min_words:
            return None
        inp, out = self.apply_mlm_noise(
            self.tokenizer, clean_target, self.mlm_noise_density,
            self.mlm_mean_noise_span_length, self.text_maxlength,
        )
        output_example = {
            "query": inp,
            "target": out,
            "passages": example.get("passages", [{"title": "", "text": ""}]),
            "metadata": dict(example, clean_target=clean_target),
        }
        return output_example

    def evaluation(self, prediction, ground_truths):
        m = {
            "accuracy": exact_match_score(prediction, ground_truths),
            "f1": f1_score(prediction, ground_truths),
        }
        m["rouge_1"], m["rouge_2"], m["rouge_L"] = rouge_score(prediction, ground_truths)
        return m

    @staticmethod
    def apply_mlm_noise(tokenizer, text, mlm_noise_density, mlm_mean_noise_span_length, max_input_length):
        """T5 span corruption: pick noise spans summing to ~density*len with mean span
        length ~mean_noise_span_length; sentinel k replaces span k in the input, and
        the target is the sentinels followed by the original spans."""
        tokens = tokenizer(text, add_special_tokens=False, max_length=max_input_length,
                           truncation=True)["input_ids"]
        length = len(tokens)
        num_noise_tokens = max(round(length * mlm_noise_density), 1)
        num_noise_spans = max(round(num_noise_tokens / mlm_mean_noise_span_length), 1)
        num_nonnoise_tokens = length - num_noise_tokens

        def _random_partition(total, segments):
            """Sizes of `segments` ordered parts summing to `total` (each >= 1 when
            total >= segments; first part may be 0 tokens only via the caller)."""
            cuts = random.sample(range(1, total), segments - 1) if total > segments else []
            cuts = sorted(cuts)
            bounds = [0] + cuts + [total]
            return [bounds[i + 1] - bounds[i] for i in range(segments)]

        noise_spans = _random_partition(max(num_noise_tokens, num_noise_spans), num_noise_spans)
        nonnoise_spans = _random_partition(max(num_nonnoise_tokens, num_noise_spans), num_noise_spans)

        inputs, outputs, offset = [], [], 0
        sentinels = tokenizer.additional_special_tokens_ids
        for i, (inp_len, out_len) in enumerate(zip(nonnoise_spans, noise_spans)):
            sentinel_id = sentinels[i % len(sentinels)]
            inputs += tokens[offset : offset + inp_len] + [sentinel_id]
            offset += inp_len
            outputs += [sentinel_id] + tokens[offset : offset + out_len]
            offset += out_len
        return tokenizer.decode(inputs), tokenizer.decode(outputs)
