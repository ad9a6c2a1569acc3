"""Fused FFN kernel (ops/ffn_fused.py) parity against the XLA two-matmul path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atlas_tpu.ops.ffn_fused import ffn_fits, ffn_fused, ffn_wins


def _xla_ffn(x, w1, b1, w2, b2):
    h = jax.nn.gelu(x @ w1 + b1, approximate=False)
    return h @ w2 + b2


@pytest.mark.parametrize("T", [256, 300])  # exact tile and ragged-tail pad
def test_ffn_fused_matches_xla(T):
    H, F = 128, 512
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (T, H), jnp.float32)
    w1 = 0.05 * jax.random.normal(ks[1], (H, F), jnp.float32)
    b1 = 0.1 * jax.random.normal(ks[2], (F,), jnp.float32)
    w2 = 0.05 * jax.random.normal(ks[3], (F, H), jnp.float32)
    b2 = 0.1 * jax.random.normal(ks[4], (H,), jnp.float32)
    got = ffn_fused(x, w1, b1, w2, b2)
    want = _xla_ffn(x, w1, b1, w2, b2)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ffn_fused_bf16_close_to_fp32_reference():
    H, F = 128, 512
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    x32 = jax.random.normal(ks[0], (256, H), jnp.float32)
    w1 = 0.05 * jax.random.normal(ks[1], (H, F), jnp.float32)
    b1 = jnp.zeros((F,))
    w2 = 0.05 * jax.random.normal(ks[2], (F, H), jnp.float32)
    b2 = jnp.zeros((H,))
    got = ffn_fused(x32.astype(jnp.bfloat16), w1, b1, w2, b2)
    want = _xla_ffn(x32, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=0.05, atol=0.05)


def test_dispatch_policy():
    assert ffn_fits(768, 3072)        # bert-base: 9.4MB of weights
    assert not ffn_fits(1024, 4096)   # bert-large: 16MB
    assert not ffn_wins("auto", False, 768, 3072)   # training: XLA keeps the vjp
    assert not ffn_wins("xla", True, 768, 3072)
    assert ffn_wins("fused", False, 768, 3072)      # explicit override, fits
    with pytest.raises(ValueError, match="VMEM"):   # over the residency budget:
        ffn_wins("fused", False, 1024, 4096)        # policy error, not Mosaic


def test_bert_encode_routes_fused(monkeypatch):
    """ffn_impl='fused' produces the same embeddings as 'xla' (interpret mode)."""
    from atlas_tpu.models.bert import BertConfig, bert_encode, init_bert

    cfg = BertConfig(vocab_size=64, hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=128,
                     max_position_embeddings=32, dtype=jnp.float32)
    params = init_bert(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 64)
    mask = jnp.ones((2, 16), jnp.int32)
    import dataclasses

    h_xla = bert_encode(params, dataclasses.replace(cfg, ffn_impl="xla"),
                        ids, mask, deterministic=True)
    h_fused = bert_encode(params, dataclasses.replace(cfg, ffn_impl="fused"),
                          ids, mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(h_fused), np.asarray(h_xla),
                               rtol=1e-4, atol=1e-4)
