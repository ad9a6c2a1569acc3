"""FiD fan-out/fan-in parity and cross-attention aggregation tests."""

import numpy as np
import torch

import jax.numpy as jnp

from atlas_tpu.models.fid import (
    aggregate_cross_attention,
    fid_forward,
    get_crossattention_scores,
    select_crossattention_scores,
)
from atlas_tpu.models.hf_import import t5_config_from_hf, t5_params_from_state_dict
from atlas_tpu.models.t5 import shift_right

VOCAB = 128


def _tiny_hf_t5():
    from transformers import T5Config as HFT5Config, T5ForConditionalGeneration

    hf_cfg = HFT5Config(
        vocab_size=VOCAB, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        decoder_start_token_id=0, pad_token_id=0,
    )
    torch.manual_seed(0)
    return T5ForConditionalGeneration(hf_cfg).eval(), hf_cfg


def test_fid_forward_matches_hf_fused_decode():
    """FiD == HF T5 encoder on (B*N, L) + decoder over concatenated states (fid.py:47-77)."""
    model, hf_cfg = _tiny_hf_t5()
    cfg = t5_config_from_hf(hf_cfg)
    params = t5_params_from_state_dict(model.state_dict(), cfg)

    rng = np.random.RandomState(0)
    B, N, L, T = 2, 3, 8, 5
    ids = rng.randint(2, VOCAB, (B, N, L))
    mask = np.ones((B, N, L), dtype=np.int64)
    mask[0, 1, 5:] = 0
    labels = rng.randint(2, VOCAB, (B, T))
    labels[1, 3:] = -100

    with torch.no_grad():
        enc = model.encoder(
            input_ids=torch.tensor(ids.reshape(B * N, L)),
            attention_mask=torch.tensor(mask.reshape(B * N, L)),
        ).last_hidden_state.reshape(B, N * L, -1)
        dec_in = model._shift_right(torch.tensor(labels))
        out = model(
            encoder_outputs=(enc,),
            attention_mask=torch.tensor(mask.reshape(B, N * L)),
            decoder_input_ids=dec_in,
            labels=torch.tensor(labels),
        )

    dec_in_j = shift_right(jnp.asarray(labels), cfg)
    loss, logits, _ = fid_forward(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask), dec_in_j, labels=jnp.asarray(labels)
    )
    np.testing.assert_allclose(np.asarray(logits), out.logits.numpy(), atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(float(loss), float(out.loss), atol=1e-5, rtol=1e-5)


def _numpy_aggregate(layer_scores, mask, labels, ids, prefix, mask_query=None):
    """Independent numpy oracle for fid.py:166-199 aggregate_value semantics."""
    nL, B, T, _ = layer_scores.shape
    N, L = mask.shape[1], mask.shape[2]
    s = layer_scores.reshape(nL, B, T, N, L).copy()
    s[~np.broadcast_to(mask[None, :, None].astype(bool), s.shape)] = 0.0
    label_valid = (labels != -100).sum(1)[:, None].astype(np.float64)
    ntokens_sum = 256 * nL * label_valid
    ntokens_wquery = mask.astype(bool).sum(2) * nL * label_valid
    ntokens_first = mask.astype(bool).sum(2) * nL
    s = s.sum(0)
    out = {}
    for k in (5, 10, 20):
        kk = min(k, L)
        topk = np.sort(s, axis=-1)[..., -kk:].sum(-1)
        topk[labels == -100] = 0.0
        out[f"{prefix}top{k}"] = topk.sum(1) / (kk * nL * label_valid)
    s[(labels == -100)] = 0.0
    out[f"{prefix}nosep"] = np.where((ids == 1)[:, None], s, 0.0).sum(axis=(1, 3)) / ntokens_sum
    out[f"{prefix}first"] = s[:, 0].sum(2) / ntokens_first
    out[f"{prefix}sum"] = s.sum(axis=(1, 3)) / ntokens_sum
    out[f"{prefix}avg"] = s.sum(axis=(1, 3)) / ntokens_wquery
    if mask_query is not None:
        mq = mask_query.astype(bool)
        if mq.shape[-1] < L:
            mq = np.pad(mq, ((0, 0), (0, L - mq.shape[-1])))
        keep = mask.astype(bool) & ~mq[:, None]
        out[f"{prefix}woquery"] = np.where(keep[:, None], s, 0.0).sum(axis=(1, 3)) / ntokens_sum
    return out


def test_aggregation_matches_numpy_oracle():
    rng = np.random.RandomState(1)
    nL, B, T, N, L = 2, 2, 4, 3, 8
    layer_scores = rng.randn(nL, B, T, N * L).astype(np.float32)
    mask = np.ones((B, N, L), dtype=np.int64)
    mask[0, 2, 4:] = 0
    labels = rng.randint(2, 100, (B, T))
    labels[1, 2:] = -100
    ids = rng.randint(2, 100, (B, N, L))
    ids[:, :, 5] = 1  # sep tokens
    mask_query = np.zeros((B, 6), dtype=np.int64)
    mask_query[:, :3] = 1

    got = aggregate_cross_attention(
        jnp.asarray(layer_scores), jnp.asarray(mask), jnp.asarray(labels), jnp.asarray(ids),
        "norms", mask_query=jnp.asarray(mask_query),
    )
    want = _numpy_aggregate(layer_scores, mask, labels, ids, "norms", mask_query)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), want[k], atol=1e-5, rtol=1e-4, err_msg=k)


def test_select_crossattention_scores():
    scores = {"normssum": jnp.ones((2, 3)), "probsavg": jnp.zeros((2, 3))}
    assert select_crossattention_scores(scores, "evalnormsum") is scores["normssum"]
    assert select_crossattention_scores(scores, "evalprobsavg") is scores["probsavg"]


def test_capture_shapes():
    model, hf_cfg = _tiny_hf_t5()
    cfg = t5_config_from_hf(hf_cfg)
    params = t5_params_from_state_dict(model.state_dict(), cfg)
    B, N, L, T = 1, 2, 6, 3
    rng = np.random.RandomState(2)
    ids = jnp.asarray(rng.randint(2, VOCAB, (B, N, L)))
    mask = jnp.ones((B, N, L), dtype=jnp.int32)
    labels = jnp.asarray(rng.randint(2, VOCAB, (B, T)))
    dec_in = shift_right(labels, cfg)
    _, _, stats = fid_forward(params, cfg, ids, mask, dec_in, labels=labels, capture_cross_attn=True)
    for k in ("scores", "probs", "norms"):
        assert stats[k].shape == (cfg.num_decoder_layers, B, T, N * L)
    agg = get_crossattention_scores(stats, mask, labels, ids, mode="all")
    assert agg["normssum"].shape == (B, N)
    assert "scoresavg" in agg and "probstop5" in agg
