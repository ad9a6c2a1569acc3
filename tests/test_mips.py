"""Fused streaming MIPS top-k vs numpy oracle."""

import numpy as np

import jax.numpy as jnp

from atlas_tpu.ops.mips import mips_topk


def _oracle(q, e, k, n_valid=None):
    s = q @ e.T
    if n_valid is not None:
        s[:, n_valid:] = -np.inf
    ids = np.argsort(-s, axis=1)[:, :k]
    return np.take_along_axis(s, ids, axis=1), ids


def test_mips_topk_exact():
    rng = np.random.RandomState(0)
    q = rng.randn(5, 32).astype(np.float32)
    e = rng.randn(1000, 32).astype(np.float32)
    vals, idx = mips_topk(jnp.asarray(q), jnp.asarray(e), 10, chunk=256)
    ov, oi = _oracle(q, e, 10)
    np.testing.assert_allclose(np.asarray(vals), ov, atol=1e-4, rtol=1e-4)
    got = np.take_along_axis(q @ e.T, np.asarray(idx), axis=1)
    np.testing.assert_allclose(got, ov, atol=1e-4)


def test_mips_topk_nonmultiple_chunk():
    rng = np.random.RandomState(1)
    q = rng.randn(3, 16).astype(np.float32)
    e = rng.randn(777, 16).astype(np.float32)
    vals, idx = mips_topk(jnp.asarray(q), jnp.asarray(e), 7, chunk=100)
    ov, _ = _oracle(q, e, 7)
    np.testing.assert_allclose(np.asarray(vals), ov, atol=1e-4, rtol=1e-4)
    assert int(np.asarray(idx).max()) < 777


def test_mips_topk_n_valid_masking():
    rng = np.random.RandomState(2)
    q = np.ones((2, 8), dtype=np.float32)
    e = -np.abs(rng.randn(64, 8)).astype(np.float32)  # all-negative scores
    e[50:] = 10.0  # big scores in "padding" region
    vals, idx = mips_topk(jnp.asarray(q), jnp.asarray(e), 5, n_valid=jnp.int32(50), chunk=16)
    assert int(np.asarray(idx).max()) < 50
    ov, _ = _oracle(q, e, 5, n_valid=50)
    np.testing.assert_allclose(np.asarray(vals), ov, atol=1e-4)


def test_k_larger_than_chunk():
    rng = np.random.RandomState(3)
    q = rng.randn(2, 8).astype(np.float32)
    e = rng.randn(300, 8).astype(np.float32)
    vals, _ = mips_topk(jnp.asarray(q), jnp.asarray(e), 150, chunk=64)
    ov, _ = _oracle(q, e, 150)
    np.testing.assert_allclose(np.asarray(vals), ov, atol=1e-4, rtol=1e-4)
