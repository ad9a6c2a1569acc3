import numpy as np

from atlas_tpu.tokenization import ByteTokenizer


def test_roundtrip():
    tok = ByteTokenizer("t5")
    s = "hello wörld <extra_id_0> tail"
    enc = tok([s], padding="longest", return_tensors="np")
    assert enc["input_ids"].shape[0] == 1
    dec = tok.decode(enc["input_ids"][0])
    assert dec == s + "</s>"
    assert tok.decode(enc["input_ids"][0], skip_special_tokens=True) == "hello wörld  tail"


def test_sentinels_single_token():
    tok = ByteTokenizer("t5")
    ids = tok("<extra_id_0><extra_id_7>", add_special_tokens=False)["input_ids"]
    assert ids == [tok.sentinel_id(0), tok.sentinel_id(7)]
    assert tok.additional_special_tokens_ids[0] == tok.vocab_size - 1


def test_padding_and_truncation():
    tok = ByteTokenizer("t5")
    out = tok(["abc", "a much longer sentence here"], padding="max_length",
              max_length=10, truncation=True, return_tensors="np")
    assert out["input_ids"].shape == (2, 10)
    assert out["attention_mask"][0].sum() == 4  # 3 bytes + </s>
    assert out["attention_mask"][1].sum() == 10


def test_bert_style():
    tok = ByteTokenizer("bert")
    out = tok(["hi"], padding="longest", return_tensors="np")
    ids = out["input_ids"][0]
    assert ids[0] == tok.cls_token_id
    assert ids[-1] == tok.sep_token_id


def test_vocab_interface():
    tok = ByteTokenizer("t5")
    v = tok.vocab
    assert v["</s>"] == 1 and v["<pad>"] == 0
    assert v["<extra_id_0>"] == tok.vocab_size - 1
    assert len(tok) == tok.vocab_size
