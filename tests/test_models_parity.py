"""Numerical parity of the JAX T5/BERT against torch transformers (CPU, fp32).

The reference vendors transformers-4.18 T5/BERT; modern transformers keeps identical
math for these architectures, so agreement with HF torch on random tiny models is the
parity oracle (no network needed).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from atlas_tpu.models.bert import bert_encode
from atlas_tpu.models.contriever import contriever_embed
from atlas_tpu.models.hf_import import (
    bert_config_from_hf,
    bert_params_from_state_dict,
    t5_config_from_hf,
    t5_params_from_state_dict,
)
from atlas_tpu.models.t5 import cross_entropy, shift_right, t5_forward

VOCAB = 128


def _tiny_hf_t5(tied=False, gated=True):
    from transformers import T5Config as HFT5Config, T5ForConditionalGeneration

    hf_cfg = HFT5Config(
        vocab_size=VOCAB,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=3,
        num_decoder_layers=3,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
        dropout_rate=0.0,
        feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=tied,
        decoder_start_token_id=0,
        pad_token_id=0,
    )
    torch.manual_seed(0)
    model = T5ForConditionalGeneration(hf_cfg).eval()
    return model, hf_cfg


@pytest.mark.parametrize("tied,gated", [(False, True), (True, False)])
def test_t5_forward_parity(tied, gated):
    model, hf_cfg = _tiny_hf_t5(tied=tied, gated=gated)
    cfg = t5_config_from_hf(hf_cfg)
    params = t5_params_from_state_dict(model.state_dict(), cfg)

    rng = np.random.RandomState(0)
    B, L, Lt = 2, 10, 6
    input_ids = rng.randint(2, VOCAB, (B, L))
    mask = np.ones((B, L), dtype=np.int64)
    mask[0, 7:] = 0
    labels = rng.randint(2, VOCAB, (B, Lt))
    labels[1, 4:] = -100

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(mask),
            labels=torch.tensor(labels),
        )

    dec_in = shift_right(jnp.asarray(labels), cfg)
    loss, logits, _ = t5_forward(
        params, cfg, jnp.asarray(input_ids), jnp.asarray(mask), dec_in, labels=jnp.asarray(labels)
    )
    np.testing.assert_allclose(np.asarray(logits), out.logits.numpy(), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(float(loss), float(out.loss), atol=1e-5, rtol=1e-5)


def test_bert_contriever_parity():
    from transformers import BertConfig as HFBertConfig, BertModel

    hf_cfg = HFBertConfig(
        vocab_size=VOCAB,
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = BertModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = bert_config_from_hf(hf_cfg)
    params = bert_params_from_state_dict(model.state_dict(), cfg)

    rng = np.random.RandomState(1)
    B, L = 2, 12
    input_ids = rng.randint(2, VOCAB, (B, L))
    mask = np.ones((B, L), dtype=np.int64)
    mask[1, 9:] = 0

    with torch.no_grad():
        hf_out = model(
            input_ids=torch.tensor(input_ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    ours = bert_encode(params, cfg, jnp.asarray(input_ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(ours), hf_out, atol=2e-4, rtol=2e-4)

    # Contriever pooling parity vs manual torch computation (retrievers.py:50-59)
    emb = contriever_embed(params, cfg, jnp.asarray(input_ids), jnp.asarray(mask), pooling="average")
    masked = hf_out * mask[..., None]
    expect = masked.sum(axis=1) / mask.sum(axis=1)[..., None]
    np.testing.assert_allclose(np.asarray(emb), expect, atol=2e-4, rtol=2e-4)


def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(2)
    logits = rng.randn(4, 6, VOCAB).astype(np.float32)
    labels = rng.randint(0, VOCAB, (4, 6))
    labels[0, 3:] = -100
    want = torch.nn.functional.cross_entropy(
        torch.tensor(logits).view(-1, VOCAB), torch.tensor(labels).flatten(), ignore_index=-100
    )
    got = cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), float(want), atol=1e-6, rtol=1e-6)


def test_remat_matches_no_remat():
    import dataclasses

    model, hf_cfg = _tiny_hf_t5()
    cfg = t5_config_from_hf(hf_cfg)
    params = t5_params_from_state_dict(model.state_dict(), cfg)
    rng = np.random.RandomState(3)
    ids = jnp.asarray(rng.randint(2, VOCAB, (2, 8)))
    mask = jnp.ones((2, 8), dtype=jnp.int32)
    dec = jnp.asarray(rng.randint(2, VOCAB, (2, 4)))
    _, logits_a, _ = t5_forward(params, cfg, ids, mask, dec)
    _, logits_b, _ = t5_forward(params, dataclasses.replace(cfg, remat=True), ids, mask, dec)
    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b), atol=1e-5)
