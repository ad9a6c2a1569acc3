"""Interop: released torch Atlas artifacts -> atlas_tpu formats, and the MMLU scorer."""

import json
import pickle
import subprocess
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp


def _make_torch_atlas_ckpt(tmp_path):
    """Synthesize a reference-style model.pth.tar with a tiny reader+retriever."""
    from transformers import BertConfig as HFBertConfig, BertModel
    from transformers import T5Config as HFT5Config, T5ForConditionalGeneration

    t5cfg = HFT5Config(vocab_size=384, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                       num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
                       dropout_rate=0.0, feed_forward_proj="gated-gelu",
                       tie_word_embeddings=False, decoder_start_token_id=0, pad_token_id=0)
    bcfg = HFBertConfig(vocab_size=384, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    t5 = T5ForConditionalGeneration(t5cfg).eval()
    bert = BertModel(bcfg, add_pooling_layer=False).eval()
    sd = {}
    for k, v in t5.state_dict().items():
        sd[f"reader.{k}"] = v
    for k, v in bert.state_dict().items():
        sd[f"retriever.contriever.{k}"] = v
    path = tmp_path / "model.pth.tar"
    torch.save({"step": 123, "model": sd, "opt": None}, path)
    return path, t5, bert


def test_checkpoint_conversion_roundtrip(tmp_path, monkeypatch):
    src, t5, bert = _make_torch_atlas_ckpt(tmp_path)
    # shrink the size table so the tiny synthetic dims convert and load
    import atlas_tpu.models.t5 as t5mod

    monkeypatch.setitem(t5mod._T5_SIZES, "google/t5-base-lm-adapt",
                        (32, 8, 64, 2, 4, "gated-gelu", False))

    from atlas_tpu.models.bert import BertConfig
    from tools.convert_torch_artifacts import convert_checkpoint

    tiny_bert = BertConfig(vocab_size=384, hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=4, intermediate_size=64)
    dest = tmp_path / "converted"
    convert_checkpoint(str(src), str(dest), "google/t5-base-lm-adapt",
                       query_side=False, retr_cfg=tiny_bert)

    from atlas_tpu.config import AtlasConfig
    from atlas_tpu.model_io import load_atlas_model

    cfg = AtlasConfig(tiny_model=True, precision="fp32")
    atlas, _, _, step = load_atlas_model(str(dest), cfg)
    assert step == 123

    # numerical parity of the loaded reader vs the original torch model
    from atlas_tpu.models.t5 import shift_right, t5_forward

    rng = np.random.RandomState(0)
    ids = rng.randint(2, 384, (2, 8))
    mask = np.ones((2, 8), dtype=np.int64)
    labels = rng.randint(2, 384, (2, 4))
    with torch.no_grad():
        want = t5(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
                  labels=torch.tensor(labels)).logits.numpy()
    dec = shift_right(jnp.asarray(labels), atlas.reader_cfg)
    _, got, _ = t5_forward(atlas.reader_params, atlas.reader_cfg, jnp.asarray(ids),
                           jnp.asarray(mask), dec)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4, rtol=3e-4)


def test_index_conversion(tmp_path, devices):
    from atlas_tpu.parallel.mesh import make_mesh
    from tools.convert_torch_artifacts import convert_index

    rng = np.random.RandomState(1)
    n_shards, per_shard, dim = 4, 25, 16
    src = tmp_path / "torch_index"
    src.mkdir()
    all_emb = []
    for i in range(n_shards):
        emb = rng.randn(dim, per_shard).astype(np.float16)  # reference (dim, n) layout
        torch.save(torch.tensor(emb), src / f"embeddings.{i}.pt")
        passages = [{"id": str(i * per_shard + j), "title": "t", "text": f"p{i*per_shard+j}"}
                    for j in range(per_shard)]
        with open(src / f"passages.{i}.pt", "wb") as f:
            pickle.dump(passages, f)
        all_emb.append(emb.T)
    dest = tmp_path / "npy_index"
    convert_index(str(src), str(dest), n_shards)

    from atlas_tpu.index.flat import DistributedIndex

    mesh = make_mesh(4, 2)
    index = DistributedIndex(mesh=mesh, dtype=jnp.float32)
    index.load_index(str(dest), total_saved_shards=4)
    assert index.n_total == n_shards * per_shard
    full = np.concatenate(all_emb).astype(np.float32)
    docs, _ = index.search_knn(jnp.asarray(full[[37]]), 1)
    assert docs[0][0]["id"] == "37"


def test_mmlu_scorer(tmp_path):
    sys.path.insert(0, "evaluation_scripts")
    from evaluate_mmlu_predictions import load_gold_file, load_predictions, score

    gold_rows = [
        {"dataset": "astronomy_test", "question": "q1", "options": {"A": "x", "B": "y"}, "answer": "A"},
        {"dataset": "philosophy_test", "question": "q2", "options": {"A": "x", "B": "y"}, "answer": "B"},
    ]
    gold_path = tmp_path / "gold.jsonl"
    with open(gold_path, "w") as f:
        for r in gold_rows:
            f.write(json.dumps(r) + "\n")

    pred_rows = []
    for r, raw, deb in [(gold_rows[0], "A", "B"), (gold_rows[1], "B", "B")]:
        pred_rows.append({
            "generation": deb,
            "permutations": [{
                "metadata": {"is_original": True, "dataset": r["dataset"],
                             "question": r["question"], "options": r["options"]},
                "choice_logits": {"A": 5.0 if raw == "A" else 0.0,
                                  "B": 5.0 if raw == "B" else 0.0},
            }],
        })
    pred_path = tmp_path / "pred.jsonl"
    with open(pred_path, "w") as f:
        for r in pred_rows:
            f.write(json.dumps(r) + "\n")

    results = score(load_gold_file(str(gold_path)), load_predictions(str(pred_path)))
    assert results["STEM"] == (100.0, 0.0)  # astronomy: raw right, debiased wrong
    assert results["humanities"] == (100.0, 100.0)
    assert results["all"] == (100.0, 50.0)
