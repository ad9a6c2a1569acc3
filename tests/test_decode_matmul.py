"""Parity tests for the streaming decode matmul kernels (ops/decode_matmul.py).

Interpret mode on CPU; the real-chip perf claims live in bench.py / CLAUDE.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atlas_tpu.ops.decode_matmul import (
    _ffn_block,
    stream_ffn_stacked,
    stream_matmul,
    stream_matmul_stacked,
)


def test_ffn_block_divides():
    assert _ffn_block(3072) == 1024
    assert _ffn_block(2048) == 1024
    assert _ffn_block(2816) == 256  # v1.1-large d_ff: 2816 = 256 * 11
    assert _ffn_block(65536) == 1024
    assert _ffn_block(64) == 64  # tiny test dims: single step
    for f in (3072, 2816, 2048, 64, 37):
        assert f % _ffn_block(f) == 0


@pytest.mark.parametrize("m,k,n", [(8, 64, 384), (5, 32, 100), (16, 128, 256)])
def test_stream_matmul(m, k, n):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (m, k), dtype=jnp.float32)
    w = jax.random.normal(kw, (k, n), dtype=jnp.float32)
    got = stream_matmul(x, w, block_n=128, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x @ w), rtol=1e-5, atol=1e-5)


def test_stream_matmul_transposed():
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (8, 48), dtype=jnp.float32)
    w = jax.random.normal(kw, (300, 48), dtype=jnp.float32)  # (N, K) rows: tied lm_head
    got = stream_matmul(x, w, transpose_w=True, block_n=128, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x @ w.T), rtol=1e-5, atol=1e-5)


def test_stream_matmul_stacked():
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (8, 64), dtype=jnp.float32)
    w = jax.random.normal(kw, (3, 64, 200), dtype=jnp.float32)
    for l in range(3):
        got = stream_matmul_stacked(x, w, jnp.int32(l), block_n=128, out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(x @ w[l]), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("f", [256, 64])
def test_stream_ffn_relu(f):
    kx, k0, k1 = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(kx, (8, 32), dtype=jnp.float32)
    wi = jax.random.normal(k0, (2, 32, f), dtype=jnp.float32)
    wo = jax.random.normal(k1, (2, f, 32), dtype=jnp.float32)
    for l in range(2):
        got = stream_ffn_stacked(x, wi, wo, jnp.int32(l), out_dtype=jnp.float32)
        want = jnp.maximum(x @ wi[l], 0.0) @ wo[l]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_stream_ffn_gated():
    kx, k0, k1, k2 = jax.random.split(jax.random.PRNGKey(4), 4)
    x = jax.random.normal(kx, (4, 32), dtype=jnp.float32)
    wi0 = jax.random.normal(k0, (2, 32, 256), dtype=jnp.float32)
    wi1 = jax.random.normal(k1, (2, 32, 256), dtype=jnp.float32)
    wo = jax.random.normal(k2, (2, 256, 32), dtype=jnp.float32)
    for l in range(2):
        got = stream_ffn_stacked(x, wi0, wo, jnp.int32(l), wi1=wi1, gated=True,
                                 out_dtype=jnp.float32)
        want = (jax.nn.gelu(x @ wi0[l], approximate=True) * (x @ wi1[l])) @ wo[l]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_bf16_matches_xla_semantics():
    """bf16 inputs, fp32 MXU accumulation — same contract as the XLA decode path."""
    kx, kw = jax.random.split(jax.random.PRNGKey(5))
    x = jax.random.normal(kx, (8, 64), dtype=jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(kw, (64, 256), dtype=jnp.float32).astype(jnp.bfloat16)
    got = stream_matmul(x, w, block_n=128, out_dtype=jnp.float32)
    want = jnp.dot(x, w, preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-2, atol=1e-2)
