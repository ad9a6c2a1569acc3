"""Flash-attention kernel parity vs the materializing fallback.

Runs the Pallas kernel in TPU-interpret mode on CPU (same kernel code path as the
compiled TPU version). Oracle: ops.attention.dot_product_attention with the composed
(B, H, Lq, Lk) bias — the reference semantics (modeling_t5.py:367-377).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atlas_tpu.ops.attention import dot_product_attention, make_attention_bias, make_causal_bias
from atlas_tpu.ops.flash import flash_attention

B, H, LQ, LK, DH = 2, 3, 256, 256, 64


def _inputs(lq=LQ, lk=LK, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    q = jax.random.normal(ks[0], (B, H, lq, DH), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, lk, DH), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, lk, DH), jnp.float32)
    pos_bias = jax.random.normal(ks[3], (H, lq, lk), jnp.float32)
    mask = jax.random.bernoulli(ks[4], 0.8, (B, lk))
    mask = mask.at[:, 0].set(True)  # keep at least one valid key per row
    return q, k, v, pos_bias, mask


def _ref(q, k, v, pos_bias=None, mask=None, causal=False):
    bias = jnp.zeros((1, 1, 1, 1), jnp.float32)
    if pos_bias is not None:
        bias = bias + pos_bias[None]
    if mask is not None:
        bias = bias + make_attention_bias(mask)
    if causal:
        bias = bias + make_causal_bias(q.shape[2])
    return dot_product_attention(q, k, v, bias=bias)


@pytest.mark.parametrize(
    "use_bias,use_mask,causal",
    [(True, True, False), (False, True, False), (True, False, True), (False, False, False)],
)
def test_fwd_parity(use_bias, use_mask, causal):
    q, k, v, pos_bias, mask = _inputs()
    want = _ref(q, k, v, pos_bias if use_bias else None, mask if use_mask else None, causal)
    got = flash_attention(
        q, k, v,
        pos_bias=pos_bias if use_bias else None,
        kv_mask=mask if use_mask else None,
        causal=causal, block_q=128, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_fwd_parity_ragged_lengths():
    """Non-block-multiple Lq/Lk exercise the padding + auto-mask path."""
    q, k, v, pos_bias, mask = _inputs(lq=200, lk=160)
    want = _ref(q, k, v, pos_bias, mask)
    got = flash_attention(q, k, v, pos_bias=pos_bias, kv_mask=mask,
                          block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_grad_parity():
    q, k, v, pos_bias, mask = _inputs()
    tang = jax.random.normal(jax.random.PRNGKey(9), (B, H, LQ, DH), jnp.float32)

    def loss_ref(q, k, v, pb):
        return jnp.sum(_ref(q, k, v, pb, mask) * tang)

    def loss_flash(q, k, v, pb):
        return jnp.sum(
            flash_attention(q, k, v, pos_bias=pb, kv_mask=mask,
                            block_q=128, block_k=128, interpret=True) * tang
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, pos_bias)
    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, pos_bias)
    for a, b, name in zip(g_fl, g_ref, ("dq", "dk", "dv", "dbias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4, err_msg=name
        )


def test_grad_parity_causal():
    q, k, v, pos_bias, _ = _inputs(lq=128, lk=128)
    tang = jax.random.normal(jax.random.PRNGKey(9), q.shape, jnp.float32)

    def loss(fn):
        return lambda q, k, v, pb: jnp.sum(fn(q, k, v, pb) * tang)

    ref_fn = loss(lambda q, k, v, pb: _ref(q, k, v, pb, None, causal=True))
    fl_fn = loss(lambda q, k, v, pb: flash_attention(
        q, k, v, pos_bias=pb, causal=True, block_q=128, block_k=128, interpret=True))
    g_ref = jax.grad(ref_fn, argnums=(0, 1, 2, 3))(q, k, v, pos_bias)
    g_fl = jax.grad(fl_fn, argnums=(0, 1, 2, 3))(q, k, v, pos_bias)
    for a, b, name in zip(g_fl, g_ref, ("dq", "dk", "dv", "dbias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4, err_msg=name
        )


def test_dropout_deterministic_and_unbiased():
    q, k, v, pos_bias, mask = _inputs(lq=128, lk=128)
    rng = jax.random.PRNGKey(3)
    kwargs = dict(pos_bias=pos_bias, kv_mask=mask, dropout_rate=0.3,
                  block_q=128, block_k=128, interpret=True)
    a = flash_attention(q, k, v, dropout_rng=rng, **kwargs)
    b = flash_attention(q, k, v, dropout_rng=rng, **kwargs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = flash_attention(q, k, v, dropout_rng=jax.random.PRNGKey(4), **kwargs)
    assert not np.allclose(np.asarray(a), np.asarray(c))

    # E[dropout attention] over seeds approaches the deterministic output
    outs = [
        np.asarray(flash_attention(q, k, v, dropout_rng=jax.random.PRNGKey(s), **kwargs))
        for s in range(24)
    ]
    base = np.asarray(flash_attention(q, k, v, pos_bias=pos_bias, kv_mask=mask,
                                      block_q=128, block_k=128, interpret=True))
    err = np.abs(np.mean(outs, axis=0) - base).mean() / (np.abs(base).mean() + 1e-9)
    assert err < 0.15, err


def test_dropout_grad_is_true_vjp():
    """Finite-difference check: with a fixed seed the op is deterministic, so its
    custom bwd must match the directional derivative of its own fwd."""
    lq = lk = 128
    q, k, v, pos_bias, mask = _inputs(lq=lq, lk=lk)
    rng = jax.random.PRNGKey(7)
    tang = jax.random.normal(jax.random.PRNGKey(11), q.shape, jnp.float32)

    def f(qq):
        out = flash_attention(qq, k, v, pos_bias=pos_bias, kv_mask=mask,
                              dropout_rate=0.2, dropout_rng=rng,
                              block_q=128, block_k=128, interpret=True)
        return jnp.sum(out * tang)

    g = jax.grad(f)(q)
    u = jax.random.normal(jax.random.PRNGKey(12), q.shape, jnp.float32)
    eps = 1e-3
    fd = (f(q + eps * u) - f(q - eps * u)) / (2 * eps)
    an = jnp.sum(g * u)
    np.testing.assert_allclose(float(fd), float(an), rtol=2e-2)


def test_t5_forward_flash_vs_xla():
    """End-to-end wiring check: full T5 fwd+grads with attn_impl='flash' (interpret
    kernels on CPU) match attn_impl='xla' — encoder self, decoder causal self, and
    decoder cross attention all engage flash at these shapes."""
    import dataclasses

    from atlas_tpu.models.t5 import T5Config, init_t5, t5_forward

    base = T5Config(vocab_size=64, d_model=32, d_kv=16, d_ff=64, num_layers=2,
                    num_decoder_layers=2, num_heads=2, dropout_rate=0.0)
    params = init_t5(jax.random.PRNGKey(0), base)
    rng = jax.random.PRNGKey(1)
    B, L, LT = 2, 128, 128
    ids = jax.random.randint(rng, (B, L), 0, 64)
    mask = jnp.ones((B, L), jnp.int32).at[:, 100:].set(0)
    dec = jax.random.randint(jax.random.PRNGKey(2), (B, LT), 0, 64)
    labels = jax.random.randint(jax.random.PRNGKey(3), (B, LT), 0, 64)

    def loss(params, impl):
        cfg = dataclasses.replace(base, attn_impl=impl)
        l, _, _ = t5_forward(params, cfg, ids, mask, dec, labels)
        return l

    l_x, g_x = jax.value_and_grad(loss)(params, "xla")
    l_f, g_f = jax.value_and_grad(loss)(params, "flash")
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=1e-5)
    flat_x = jax.tree.leaves(g_x)
    flat_f = jax.tree.leaves(g_f)
    for a, b in zip(flat_f, flat_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


def test_bert_forward_flash_vs_xla():
    """BERT wiring check: bert_encode with attn_impl='flash' (interpret kernels on
    CPU) matches 'xla' in values and grads — the joint-train retriever path."""
    from atlas_tpu.models.bert import BertConfig, bert_encode, init_bert

    base = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=64,
                      hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    params = init_bert(jax.random.PRNGKey(0), base)
    B, L = 2, 128
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, 64)
    mask = jnp.ones((B, L), jnp.int32).at[:, 100:].set(0)

    def loss(params, impl):
        import dataclasses

        cfg = dataclasses.replace(base, attn_impl=impl)
        h = bert_encode(params, cfg, ids, mask, deterministic=False,
                        rng=jax.random.PRNGKey(2))
        return jnp.sum(h * h)

    l_x, g_x = jax.value_and_grad(loss)(params, "xla")
    l_f, g_f = jax.value_and_grad(loss)(params, "flash")
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)
