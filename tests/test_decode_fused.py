"""Fused single-kernel decode step (ops/decode_fused.py) vs the XLA scan step.

Runs the Pallas kernel in interpret mode on the CPU mesh with a small but
alignment-satisfying T5 (d_model/inner multiples of 128). The XLA decode path
(models/t5.py t5_decode_step) is the semantic oracle — itself HF-parity-tested
in test_generate.py — so agreement here chains to HF generate().
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from atlas_tpu.eval.generate import greedy_generate
from atlas_tpu.models.fid import fid_encode
from atlas_tpu.models.t5 import (
    T5Config,
    init_decode_cache,
    init_t5,
    t5_decode_step,
)

B, N, L, MAXLEN = 4, 2, 32, 10


def _setup(ffn, tied, cache_dtype, seed=0):
    cfg = T5Config(
        vocab_size=384, d_model=128, d_kv=64, d_ff=256, num_layers=2,
        num_decoder_layers=2, num_heads=2, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout_rate=0.0,
        feed_forward_proj=ffn, tie_word_embeddings=tied, dtype=jnp.float32,
        decode_cache_dtype=cache_dtype, decode_fused="on",
    )
    params = init_t5(jax.random.PRNGKey(seed), cfg)
    rng = np.random.RandomState(seed + 1)
    ids = jnp.asarray(rng.randint(2, 384, (B, N, L)))
    mask = np.ones((B, N, L), dtype=np.int32)
    mask[1, 1, 20:] = 0
    mask[3, 0, 5:] = 0
    return cfg, params, ids, jnp.asarray(mask)


@pytest.mark.parametrize(
    "ffn,tied,cache_dtype",
    [("gated-gelu", False, "bf16"), ("relu", True, "bf16"), ("relu", True, "int8")],
)
def test_fused_step_logits_match_xla(ffn, tied, cache_dtype):
    cfg, params, ids, mask = _setup(ffn, tied, cache_dtype)
    cfg_off = cfg.__class__(**{**cfg.__dict__, "decode_fused": "off"})
    enc = fid_encode(params, cfg, ids, mask, deterministic=True)
    enc_mask = mask.reshape(B, N * L)

    cache_f = init_decode_cache(params, cfg, enc, enc_mask, MAXLEN)
    cache_s = init_decode_cache(params, cfg_off, enc, enc_mask, MAXLEN)
    assert "cross_k_col" in cache_f and "cross_k" in cache_s

    tok0 = jnp.zeros((B,), jnp.int32)
    lf, cache_f = t5_decode_step(params, cfg, tok0, jnp.int32(0), cache_f)
    ls, cache_s = t5_decode_step(params, cfg_off, tok0, jnp.int32(0), cache_s)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(ls), atol=2e-3, rtol=1e-3)

    # second step exercises the in-kernel self-cache update at pos=0 read back
    tok1 = jnp.asarray(np.argmax(np.asarray(ls), -1), jnp.int32)
    lf2, _ = t5_decode_step(params, cfg, tok1, jnp.int32(1), cache_f)
    ls2, _ = t5_decode_step(params, cfg_off, tok1, jnp.int32(1), cache_s)
    np.testing.assert_allclose(np.asarray(lf2), np.asarray(ls2), atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("cache_dtype", ["bf16", "int8"])
def test_fused_greedy_tokens_match_xla(cache_dtype):
    cfg, params, ids, mask = _setup("gated-gelu", False, cache_dtype, seed=7)
    cfg_off = cfg.__class__(**{**cfg.__dict__, "decode_fused": "off"})
    got = np.asarray(greedy_generate(params, cfg, ids, mask, max_length=MAXLEN))
    ref = np.asarray(greedy_generate(params, cfg_off, ids, mask, max_length=MAXLEN))
    assert (got == ref).all(), (got, ref)


@pytest.mark.parametrize("cache_dtype", ["bf16", "int8"])
def test_fused_beam_tokens_match_xla(cache_dtype):
    # beams share a batch row's cross cache inside the kernel (query row b ->
    # cross row b // K); the between-step self-cache permute runs on the
    # column-grouped layout (eval/generate.py gather_cache)
    from atlas_tpu.eval.generate import beam_generate

    cfg, params, ids, mask = _setup("relu", True, cache_dtype, seed=11)
    cfg_off = cfg.__class__(**{**cfg.__dict__, "decode_fused": "off"})
    got = np.asarray(beam_generate(params, cfg, ids, mask, max_length=MAXLEN,
                                   num_beams=3, length_penalty=1.0))
    ref = np.asarray(beam_generate(params, cfg_off, ids, mask, max_length=MAXLEN,
                                   num_beams=3, length_penalty=1.0))
    assert (got == ref).all(), (got, ref)


def test_auto_gate_geometry():
    """auto-mode gating: greedy-only, and a VMEM estimate that rejects shapes
    too big for v5e VMEM (checked pretending to be on TPU — the backend check
    is bypassed by calling the estimate directly). _fused_dims shrinks stream
    blocks through a cascade before giving up: t5-large bf16 only fits at
    blk_l=512 (the cross-cache stream block dominates), while shapes that fit
    at full blocks must keep them."""
    import jax.numpy as jnp

    from atlas_tpu.models.t5 import _fused_dims, t5_config_for
    from atlas_tpu.ops.decode_fused import FUSED_VMEM_BUDGET, fused_vmem_bytes

    base = t5_config_for("t5-base", dtype=jnp.bfloat16)
    # serving greedy shapes fit at full stream blocks
    d = _fused_dims(base, 8, 8, 20 * 256, 32, True)
    assert fused_vmem_bytes(d) <= FUSED_VMEM_BUDGET
    assert d.blk_l == 1024 and d.blk_v == 2048
    # t5-large bf16 fits only via the block cascade
    large = t5_config_for("t5-large", dtype=jnp.bfloat16)
    d_lg = _fused_dims(large, 8, 8, 20 * 256, 32, False)
    assert fused_vmem_bytes(d_lg) <= FUSED_VMEM_BUDGET
    assert d_lg.blk_l == 512
    # ... while t5-large int8 still fits at full blocks (no needless shrink)
    d_lgi = _fused_dims(large, 8, 8, 20 * 256, 32, True)
    assert d_lgi.blk_l == 1024
    # a 3B reader (t5-xl) fits via blocked attention projections (NQ/NP > 1)
    from atlas_tpu.models.t5 import t5_config_for as _cfg_for

    xl = _cfg_for("google/t5-xl-lm-adapt", dtype=jnp.bfloat16)
    d_xl = _fused_dims(xl, 8, 8, 20 * 256, 32, True)
    assert fused_vmem_bytes(d_xl) <= FUSED_VMEM_BUDGET
    assert d_xl.blk_i and d_xl.NP > 1
    # an 11B reader (t5-xxl dims) still falls back: the per-layer self cache
    # block alone exceeds the budget at any stream-block size
    xxl = _cfg_for("google/t5-xxl-lm-adapt", dtype=jnp.bfloat16)
    d_big = _fused_dims(xxl, 8, 8, 20 * 256, 32, True)
    assert fused_vmem_bytes(d_big) > FUSED_VMEM_BUDGET


def test_fused_multiblock_cross_matches_xla():
    """NC > 1 (cross cache walked in multiple stream blocks): Lk=1152 picks
    blk_l=384, so the in-kernel running-softmax merge across cross blocks is
    exercised in interpret mode (serving shapes hit NC=5-10 on chip)."""
    from atlas_tpu.models.t5 import _fused_dims

    cfg, params, _, _ = _setup("relu", True, "bf16", seed=3)
    N, L = 2, 576
    rng = np.random.RandomState(5)
    ids = jnp.asarray(rng.randint(2, 384, (2, N, L)))
    mask = np.ones((2, N, L), dtype=np.int32)
    mask[1, 1, 200:] = 0
    mask = jnp.asarray(mask)

    d = _fused_dims(cfg, 2, 2, N * L, MAXLEN, False)
    assert d.NC > 1, d

    cfg_off = cfg.__class__(**{**cfg.__dict__, "decode_fused": "off"})
    enc = fid_encode(params, cfg, ids, mask, deterministic=True)
    enc_mask = mask.reshape(2, N * L)
    cache_f = init_decode_cache(params, cfg, enc, enc_mask, MAXLEN)
    cache_s = init_decode_cache(params, cfg_off, enc, enc_mask, MAXLEN)
    tok0 = jnp.zeros((2,), jnp.int32)
    lf, _ = t5_decode_step(params, cfg, tok0, jnp.int32(0), cache_f)
    ls, _ = t5_decode_step(params, cfg_off, tok0, jnp.int32(0), cache_s)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(ls), atol=2e-3, rtol=1e-3)


def test_auto_gate_beam_falls_back(monkeypatch):
    """In auto mode beam search must NOT fuse (measured slower on chip)."""
    import jax

    from atlas_tpu.models.t5 import _fused_decode_ok, t5_config_for

    cfg = t5_config_for("t5-base", dtype=jnp.bfloat16)
    cfg = cfg.__class__(**{**cfg.__dict__, "decode_fused": "auto"})
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert _fused_decode_ok(cfg, 8, None, 256, 32)
    assert _fused_decode_ok(cfg, 8, 8, 256, 32)
    assert not _fused_decode_ok(cfg, 8, 32, 256, 32)


@pytest.mark.parametrize("cache_dtype", ["bf16", "int8"])
def test_fused_blocked_projections_match_xla(cache_dtype, monkeypatch):
    """NQ > 1 / NP > 1 (attention projections streamed in blocks — the 3B-reader
    geometry): qkv row blocks, cross_q row blocks, and self_o/cross_o partial
    contractions accumulating into the residual must reproduce the XLA step.
    Forced here by pinning blk_q3 = blk_i = 128 on an I=256 config."""
    import atlas_tpu.models.t5 as t5mod

    cfg = T5Config(
        vocab_size=384, d_model=128, d_kv=64, d_ff=256, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        dtype=jnp.float32, decode_cache_dtype=cache_dtype, decode_fused="on",
    )
    real = t5mod._fused_dims

    def forced(*a, **kw):
        return real(*a, **kw)._replace(blk_q3=128, blk_i=128)

    monkeypatch.setattr(t5mod, "_fused_dims", forced)
    params = init_t5(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(4)
    ids = jnp.asarray(rng.randint(2, 384, (B, N, L)))
    mask = np.ones((B, N, L), dtype=np.int32)
    mask[0, 1, 12:] = 0
    mask = jnp.asarray(mask)
    cfg_off = cfg.__class__(**{**cfg.__dict__, "decode_fused": "off"})

    enc = fid_encode(params, cfg, ids, mask, deterministic=True)
    enc_mask = mask.reshape(B, N * L)
    cache_f = init_decode_cache(params, cfg, enc, enc_mask, MAXLEN)
    d = t5mod._fused_dims(cfg, B, B, N * L, MAXLEN, cache_dtype == "int8")
    assert d.NQ == 6 and d.NP == 2, d
    cache_s = init_decode_cache(params, cfg_off, enc, enc_mask, MAXLEN)
    tok0 = jnp.zeros((B,), jnp.int32)
    lf, cache_f = t5_decode_step(params, cfg, tok0, jnp.int32(0), cache_f)
    ls, cache_s = t5_decode_step(params, cfg_off, tok0, jnp.int32(0), cache_s)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(ls), atol=2e-3, rtol=1e-3)
    tok1 = jnp.asarray(np.argmax(np.asarray(ls), -1), jnp.int32)
    lf2, _ = t5_decode_step(params, cfg, tok1, jnp.int32(1), cache_f)
    ls2, _ = t5_decode_step(params, cfg_off, tok1, jnp.int32(1), cache_s)
    np.testing.assert_allclose(np.asarray(lf2), np.asarray(ls2), atol=2e-3, rtol=1e-3)

    # int8 weights x blocked projections — the production t5-xl "int8:w8"
    # geometry: the blocked scale tables (sqkv/scq indexed past block 0) must
    # reproduce the unblocked int8w step exactly (same quantization both sides,
    # only the blocking differs)
    cfg_w8 = cfg.__class__(**{**cfg.__dict__, "decode_weights": "int8"})
    cache_wb = init_decode_cache(params, cfg_w8, enc, enc_mask, MAXLEN)
    lb, _ = t5_decode_step(params, cfg_w8, tok0, jnp.int32(0), cache_wb)
    monkeypatch.setattr(t5mod, "_fused_dims", real)  # unblocked geometry
    cache_wu = init_decode_cache(params, cfg_w8, enc, enc_mask, MAXLEN)
    lu, _ = t5_decode_step(params, cfg_w8, tok0, jnp.int32(0), cache_wu)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(lu), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize(
    "path,ffn,cache_dtype",
    [("fused", "gated-gelu", "bf16"), ("fused", "relu", "int8"),
     ("scan", "gated-gelu", "bf16"), ("scan", "relu", "int8")],
)
def test_int8_weights_match_dequantized_oracle(path, ffn, cache_dtype):
    """decode_weights="int8" on BOTH decode paths (fused kernel / XLA scan) vs
    a bf16-weight oracle run on DEQUANTIZED params (the same per-output-channel
    roundtrip the cache builders apply) — quantization is then the only
    difference between the paths, so f32 logits must agree tightly.
    (Untied configs: the tied lm head shares the input-embedding table, which
    stays unquantized, so an exact shared-params oracle can't be built; the
    tied wlm source is otherwise the same code path.)"""
    from atlas_tpu.models.t5 import _quant_rows_int8

    cfg, params, ids, mask = _setup(ffn, False, cache_dtype, seed=13)
    cfg = cfg.__class__(**{**cfg.__dict__, "decode_weights": "int8",
                           "decode_fused": "on" if path == "fused" else "off"})
    cfg_off = cfg.__class__(**{**cfg.__dict__, "decode_fused": "off",
                               "decode_weights": "bf16"})

    def rt(w):  # roundtrip through the fused stacks' quantization scheme
        q, s = _quant_rows_int8(jnp.swapaxes(w, -1, -2))
        return jnp.swapaxes(q.astype(jnp.float32) * s[..., None], -1, -2)

    layers = params["decoder"]["layers"]
    sa, ca, ffn_p = layers["self_attn"], layers["cross_attn"], layers["ffn"]
    deq_layers = dict(
        layers,
        self_attn=dict(sa, q=rt(sa["q"]), k=rt(sa["k"]), v=rt(sa["v"]), o=rt(sa["o"])),
        cross_attn=dict(ca, q=rt(ca["q"]), o=rt(ca["o"])),  # cross k/v: cache-side
        ffn={k: rt(v) for k, v in ffn_p.items()},
    )
    params_deq = dict(
        params,
        decoder=dict(params["decoder"], layers=deq_layers),
        lm_head=rt(params["lm_head"]),
    )

    enc = fid_encode(params, cfg, ids, mask, deterministic=True)
    enc_mask = mask.reshape(B, N * L)
    cache_f = init_decode_cache(params, cfg, enc, enc_mask, MAXLEN)
    if path == "fused":
        assert cache_f["fused_w"]["wqkvT"].dtype == jnp.int8
        assert "sD" in cache_f["fused_w"]
    else:
        assert cache_f["wqkv"].dtype == jnp.int8 and "w8_lm" in cache_f
    cache_s = init_decode_cache(params_deq, cfg_off, enc, enc_mask, MAXLEN)
    assert "w8_lm" not in cache_s

    tok0 = jnp.zeros((B,), jnp.int32)
    lf, cache_f = t5_decode_step(params, cfg, tok0, jnp.int32(0), cache_f)
    ls, cache_s = t5_decode_step(params_deq, cfg_off, tok0, jnp.int32(0), cache_s)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(ls), atol=2e-3, rtol=2e-3)
    tok1 = jnp.asarray(np.argmax(np.asarray(ls), -1), jnp.int32)
    lf2, _ = t5_decode_step(params, cfg, tok1, jnp.int32(1), cache_f)
    ls2, _ = t5_decode_step(params_deq, cfg_off, tok1, jnp.int32(1), cache_s)
    np.testing.assert_allclose(np.asarray(lf2), np.asarray(ls2), atol=2e-3, rtol=2e-3)

    if path == "scan":
        # the beam-shaped step (B*K query rows over B cross rows) also honors
        # the int8 stacks — the production use of the scan path on TPU
        K = 3
        cb_f = init_decode_cache(params, cfg, enc, enc_mask, MAXLEN, self_batch=B * K)
        cb_s = init_decode_cache(params_deq, cfg_off, enc, enc_mask, MAXLEN,
                                 self_batch=B * K)
        tokb = jnp.tile(tok0, K).reshape(K, B).T.reshape(B * K)
        bf, _ = t5_decode_step(params, cfg, tokb, jnp.int32(0), cb_f, beam_size=K)
        bs, _ = t5_decode_step(params_deq, cfg_off, tokb, jnp.int32(0), cb_s,
                               beam_size=K)
        np.testing.assert_allclose(np.asarray(bf), np.asarray(bs), atol=2e-3,
                                   rtol=2e-3)


def test_int8_weights_geometry():
    """int8 weight stacks halve the streamed weight VMEM, so the cascade keeps
    larger blocks (never smaller) and t5-xl still fits the budget."""
    import jax.numpy as jnp

    from atlas_tpu.models.t5 import _fused_dims, t5_config_for
    from atlas_tpu.ops.decode_fused import FUSED_VMEM_BUDGET, fused_vmem_bytes

    xl = t5_config_for("google/t5-xl-lm-adapt", dtype=jnp.bfloat16)
    xl_w8 = t5_config_for("google/t5-xl-lm-adapt", dtype=jnp.bfloat16,
                          decode_weights="int8")
    d = _fused_dims(xl, 8, 8, 20 * 256, 32, True)
    d_w8 = _fused_dims(xl_w8, 8, 8, 20 * 256, 32, True)
    assert d_w8.int8w and not d.int8w
    assert fused_vmem_bytes(d_w8) <= FUSED_VMEM_BUDGET
    assert d_w8.total_steps <= d.total_steps
    # small models keep full blocks either way
    base = t5_config_for("t5-base", dtype=jnp.bfloat16, decode_weights="int8")
    d_b = _fused_dims(base, 8, 8, 20 * 256, 32, True)
    assert d_b.blk_l == 1024 and d_b.NP == 1 and d_b.int8w
