"""decoder_prompt_format path: label masking, forced-prefix generation, eval slicing
(reference atlas.py:201-247, 602-636, evaluate.py:134-139)."""

import numpy as np
import pytest

from atlas_tpu.config import AtlasConfig

from helpers import tiny_atlas


@pytest.fixture(scope="module")
def atlas():
    cfg = AtlasConfig(text_maxlength=32, target_maxlength=16, n_context=1,
                      retriever_n_context=1, precision="fp32",
                      generation_max_length=24,
                      decoder_prompt_format="answer to {query}: ")
    return tiny_atlas(cfg)


def test_prompt_tokens_masked_in_labels(atlas):
    labels, dec_in = atlas.reader_tokenize(["q1"], ["gold"])
    prompt_ids = atlas.reader_tokenizer("answer to q1: ", add_special_tokens=False)["input_ids"]
    # prompt positions must be ignored by the loss
    assert (labels[0, : len(prompt_ids)] == -100).all()
    # the target continuation is supervised
    assert (labels[0] != -100).sum() > 0


def test_generate_forces_prompt_prefix(atlas):
    q = ["what is x"]
    reader_tok, _ = atlas.tokenize_passages(q, [[{"title": "", "text": "ctx"}]])
    out = atlas.generate(reader_tok, q)
    prompt_ids = atlas.reader_tokenizer(
        atlas.cfg.decoder_prompt_format.format_map({"query": q[0]}),
        add_special_tokens=False)["input_ids"]
    # sequence = [start] + forced prompt + free continuation
    assert list(out[0, 1 : 1 + len(prompt_ids)]) == list(prompt_ids)
    # eval slicing (evaluate.py:134-139) drops the prompt cleanly
    g = out[0][len(prompt_ids) + 1 :]
    decoded = atlas.reader_tokenizer.decode(g, skip_special_tokens=True)
    assert atlas.cfg.decoder_prompt_format.format_map({"query": q[0]}) not in decoded
