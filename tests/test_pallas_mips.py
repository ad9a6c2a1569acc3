"""Pallas fused MIPS kernel vs numpy window-max oracle (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from atlas_tpu.ops.pallas_mips import LANES, MAJOR, mips_topk_pallas


def _window_oracle(q, e, k, n_valid=None):
    """One candidate per CONTIGUOUS 128-row window (the bf16 kernel's rule)."""
    s = q @ e.T
    if n_valid is not None:
        s[:, n_valid:] = -np.inf
    B, N = s.shape
    win = s.reshape(B, N // LANES, LANES)
    vals = win.max(-1)
    idx = win.argmax(-1) + np.arange(N // LANES)[None, :] * LANES
    order = np.argsort(-vals, axis=1)[:, :k]
    return np.take_along_axis(vals, order, 1), np.take_along_axis(idx, order, 1)


def _strided_window_oracle(q, e, k, n_valid=None):
    """The sq8 kernel's rule: within each MAJOR-row block, winner w is the best
    row of {r : r % LANES == w} (strided windows — lane-aligned vreg reduce)."""
    s = q @ e.T
    if n_valid is not None:
        s[:, n_valid:] = -np.inf
    B, N = s.shape
    nblk = N // MAJOR
    win = s.reshape(B, nblk, MAJOR // LANES, LANES)
    vals = win.max(2).reshape(B, -1)  # (B, nblk*LANES)
    arg = win.argmax(2)  # (B, nblk, LANES): the winning c
    idx = (np.arange(nblk)[None, :, None] * MAJOR + arg * LANES
           + np.arange(LANES)[None, None, :]).reshape(B, -1)
    order = np.argsort(-vals, axis=1)[:, :k]
    return np.take_along_axis(vals, order, 1), np.take_along_axis(idx, order, 1)


def test_pallas_kernel_matches_oracle():
    rng = np.random.RandomState(0)
    B, N, D, K = 8, 16384, 128, 10
    q = rng.randn(B, D).astype(np.float32)
    e = rng.randn(N, D).astype(np.float32)
    vals, idx = mips_topk_pallas(jnp.asarray(q), jnp.asarray(e), K)
    ov, oi = _window_oracle(q, e, K)
    np.testing.assert_allclose(np.asarray(vals), ov, atol=1e-3, rtol=1e-3)
    # scores at returned indices must match the true scores
    true = np.take_along_axis(q @ e.T, np.asarray(idx), 1)
    np.testing.assert_allclose(np.asarray(vals), true, atol=1e-3)


def test_pallas_kernel_masks_padding():
    rng = np.random.RandomState(1)
    B, N, D = 4, 16384, 64
    q = np.ones((B, D), dtype=np.float32)
    e = -np.abs(rng.randn(N, D)).astype(np.float32)
    e[12000:] = 5.0  # high scores in the padding region
    vals, idx = mips_topk_pallas(jnp.asarray(q), jnp.asarray(e), 5,
                                 n_valid=jnp.int32(12000))
    assert int(np.asarray(idx).max()) < 12000


def test_pallas_recall_close_to_exact():
    rng = np.random.RandomState(2)
    B, N, D, K = 16, 65536, 64, 50
    q = rng.randn(B, D).astype(np.float32)
    e = rng.randn(N, D).astype(np.float32)
    _, idx = mips_topk_pallas(jnp.asarray(q), jnp.asarray(e), K)
    exact = np.argsort(-(q @ e.T), 1)[:, :K]
    rec = np.mean([len(set(np.asarray(idx)[b]) & set(exact[b])) / K for b in range(B)])
    assert rec > 0.9, rec


def test_pallas_kernel_uint8_codes_match_cast():
    """The sq8 byte-stream path: uint8 codes DMA'd raw, re-biased to int8 in
    register for the MXU (q.c_u8 = q.(c_u8-128) + 128*sum(q), offset restored on
    the winners) must agree with the same kernel on a pre-cast bf16 corpus. The
    two accumulate in different orders, so near-tied windows may legitimately
    pick either row — ids must match except where the scores tie."""
    rng = np.random.RandomState(2)
    B, N, D, K = 4, 16384, 128, 8
    codes = rng.randint(0, 256, (N, D)).astype(np.uint8)
    q = rng.randn(B, D).astype(np.float32)
    v8, i8 = mips_topk_pallas(jnp.asarray(q, jnp.bfloat16), jnp.asarray(codes), K)
    vf, if_ = mips_topk_pallas(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(codes).astype(jnp.bfloat16), K)
    v8, i8, vf, if_ = map(np.asarray, (v8, i8, vf, if_))
    np.testing.assert_allclose(v8, vf, rtol=1e-4)
    exact = q.astype(np.float64) @ codes.astype(np.float64).T
    for b in range(B):
        for j in np.nonzero(i8[b] != if_[b])[0]:
            assert abs(exact[b, i8[b, j]] - exact[b, if_[b, j]]) < 1.0, (b, j)


def test_pallas_sq8_blocked_matches_oracle():
    """Transposed-block sq8 kernel (the production sq8 search path on TPU):
    window-max selection + re-bias restore must match the numpy oracle."""
    from atlas_tpu.ops.pallas_mips import mips_topk_pallas_sq8, sq8_blocks

    rng = np.random.RandomState(3)
    B, N, D, K = 4, 16384, 128, 8
    codes = rng.randint(0, 256, (N, D)).astype(np.uint8)
    q = rng.randn(B, D).astype(np.float32)
    blocks = sq8_blocks(jnp.asarray(codes))
    vals, idx = mips_topk_pallas_sq8(jnp.asarray(q), blocks, K)
    ov, oi = _strided_window_oracle(q, codes.astype(np.float64), K)
    np.testing.assert_allclose(np.asarray(vals), ov, rtol=1e-4)
    assert np.array_equal(np.asarray(idx), oi)


def test_pallas_sq8_blocked_masks_padding():
    """In-kernel n_valid masking: rows >= n_valid carry maximal codes (255) so
    any masking slip would surface them at the top; and a tiny n_valid < k
    leaves NEG tail entries the merge contract discards by score, not by id."""
    from atlas_tpu.ops.pallas_mips import mips_topk_pallas_sq8, sq8_blocks

    rng = np.random.RandomState(4)
    N, D = 16384, 64
    codes = rng.randint(0, 64, (N, D)).astype(np.uint8)
    codes[300:] = 255  # high scores in the padding region
    q = np.abs(rng.randn(2, D)).astype(np.float32)
    n_valid = 300
    blocks = sq8_blocks(jnp.asarray(codes))
    vals, idx = mips_topk_pallas_sq8(jnp.asarray(q), blocks, 5,
                                     n_valid=jnp.int32(n_valid))
    vals, idx = np.asarray(vals), np.asarray(idx)
    assert (idx[vals > -1e20] < n_valid).all()
    ov, oi = _strided_window_oracle(q, codes.astype(np.float64), 5, n_valid=n_valid)
    live = ov > -1e20
    np.testing.assert_allclose(vals[live], ov[live], rtol=1e-4)
    assert np.array_equal(idx[live], oi[live])
    # n_valid < k: only 3 windows can hold a candidate, the rest return NEG
    vals3, idx3 = mips_topk_pallas_sq8(jnp.asarray(q), blocks, 5,
                                       n_valid=jnp.int32(3))
    vals3, idx3 = np.asarray(vals3), np.asarray(idx3)
    assert (idx3[vals3 > -1e20] < 3).all() and (vals3 > -1e20).sum() == 2 * 3


def test_pallas_sq8_large_batch_splits():
    """B > 128 splits into per-kernel chunks (v5e scoped-vmem limit on the
    winner outputs) and must equal per-chunk results stitched together."""
    from atlas_tpu.ops.pallas_mips import mips_topk_pallas_sq8, sq8_blocks

    rng = np.random.RandomState(5)
    N, D, K = 16384, 64, 6
    codes = rng.randint(0, 256, (N, D)).astype(np.uint8)
    q = rng.randn(200, D).astype(np.float32)  # 200 = 128 + 72
    blocks = sq8_blocks(jnp.asarray(codes))
    vals, idx = mips_topk_pallas_sq8(jnp.asarray(q), blocks, K)
    v0, i0 = mips_topk_pallas_sq8(jnp.asarray(q[:128]), blocks, K)
    v1, i1 = mips_topk_pallas_sq8(jnp.asarray(q[128:]), blocks, K)
    assert np.array_equal(np.asarray(idx), np.concatenate([np.asarray(i0), np.asarray(i1)]))
    np.testing.assert_allclose(
        np.asarray(vals), np.concatenate([np.asarray(v0), np.asarray(v1)]), rtol=1e-6)


def test_pallas_sq8_packed_blocks_match_int8():
    """Word-packed int32 blocks (sq8_blocks_packed + in-kernel bitcast) select
    the same winners as the int8 block layout, across dma_split settings."""
    from atlas_tpu.ops.pallas_mips import (
        mips_topk_pallas_sq8, sq8_blocks, sq8_blocks_packed)

    rng = np.random.RandomState(7)
    N, D, K = 40000, 64, 10
    codes = jnp.asarray(rng.randint(0, 256, (N, D)).astype(np.uint8))
    q = jnp.asarray(rng.randn(4, D).astype(np.float32))
    v_ref, i_ref = mips_topk_pallas_sq8(q, sq8_blocks(codes, 1024), K, n_valid=N)
    for blocks in (sq8_blocks_packed(codes, 1024), sq8_blocks(codes, 2048)):
        for split in (1, 4):
            v, i = mips_topk_pallas_sq8(q, blocks, K, n_valid=N, dma_split=split)
            assert np.array_equal(np.asarray(i), np.asarray(i_ref))
            np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), rtol=1e-5)
