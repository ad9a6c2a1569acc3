"""Single-block attention kernel (ops/block_attn.py) parity tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atlas_tpu.ops.attention import dot_product_attention, make_attention_bias
from atlas_tpu.ops.block_attn import block_attention, block_attn_wins


def test_block_attention_matches_xla():
    B, H, L, Dh = 3, 4, 24, 16  # L % 8 == 0
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, H, L, Dh), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, L, Dh), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, L, Dh), jnp.float32)
    mask = (jax.random.uniform(ks[3], (B, L)) > 0.3).astype(jnp.int32)
    mask = mask.at[:, 0].set(1)
    got = block_attention(q, k, v, kv_mask=mask)
    want = dot_product_attention(q, k, v, bias=make_attention_bias(mask),
                                 dropout_rate=0.0, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_block_attention_ragged_length_pads():
    B, H, L, Dh = 2, 2, 21, 8  # L % 8 != 0: padded keys must not attend
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (B, H, L, Dh), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, L, Dh), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, L, Dh), jnp.float32)
    got = block_attention(q, k, v)
    want = dot_product_attention(q, k, v, dropout_rate=0.0, deterministic=True)
    assert got.shape == (B, H, L, Dh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_dispatch_policy():
    # auto NEVER engages: measured 0.878x vs XLA at the refresh shape (closed)
    assert not block_attn_wins("auto", 192, 192, 12, deterministic=True)
    assert not block_attn_wins("xla", 192, 192, 12, deterministic=True)
    assert block_attn_wins("block", 192, 192, 12, deterministic=True)
    assert not block_attn_wins("block", 384, 192, 12, deterministic=True)  # lq != lk
    assert not block_attn_wins("block", 512, 512, 32, deterministic=True)  # VMEM
    with pytest.raises(ValueError, match="forward-only"):  # no dropout / no VJP
        block_attn_wins("block", 192, 192, 12, deterministic=False)


def test_bert_encode_routes_block():
    from atlas_tpu.models.bert import BertConfig, bert_encode, init_bert

    cfg = BertConfig(vocab_size=64, hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=128,
                     max_position_embeddings=32, dtype=jnp.float32)
    params = init_bert(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 64)
    mask = jnp.ones((2, 16), jnp.int32).at[1, 12:].set(0)
    h_xla = bert_encode(params, dataclasses.replace(cfg, attn_impl="xla"),
                        ids, mask, deterministic=True)
    h_blk = bert_encode(params, dataclasses.replace(cfg, attn_impl="block"),
                        ids, mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(h_blk), np.asarray(h_xla),
                               rtol=1e-4, atol=1e-4)
