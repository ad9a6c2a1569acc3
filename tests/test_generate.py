"""Generation parity: jitted greedy/beam vs HF torch generate on a tiny T5."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from atlas_tpu.eval.generate import beam_generate, greedy_generate
from atlas_tpu.models.hf_import import t5_config_from_hf, t5_params_from_state_dict

VOCAB = 128


def _tiny():
    from transformers import T5Config as HFT5Config, T5ForConditionalGeneration

    hf_cfg = HFT5Config(
        vocab_size=VOCAB, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
    )
    torch.manual_seed(3)
    model = T5ForConditionalGeneration(hf_cfg).eval()
    cfg = t5_config_from_hf(hf_cfg)
    params = t5_params_from_state_dict(model.state_dict(), cfg)
    return model, cfg, params


def _strip(seq):
    """Cut at first eos (inclusive), drop trailing pads."""
    out = []
    for t in seq:
        out.append(int(t))
        if t == 1:
            break
    return out


def test_greedy_matches_hf():
    model, cfg, params = _tiny()
    rng = np.random.RandomState(0)
    B, L, MAX = 3, 10, 12
    ids = rng.randint(2, VOCAB, (B, L))
    mask = np.ones((B, L), dtype=np.int64)
    mask[2, 6:] = 0

    with torch.no_grad():
        hf = model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            max_length=MAX, num_beams=1, do_sample=False,
        ).numpy()

    ours = np.asarray(greedy_generate(
        params, cfg, jnp.asarray(ids[:, None]), jnp.asarray(mask[:, None]), max_length=MAX
    ))
    for b in range(B):
        assert _strip(ours[b]) == _strip(hf[b]), (b, ours[b], hf[b])


def test_greedy_min_length():
    model, cfg, params = _tiny()
    rng = np.random.RandomState(1)
    ids = rng.randint(2, VOCAB, (2, 8))
    mask = np.ones((2, 8), dtype=np.int64)
    with torch.no_grad():
        hf = model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            max_length=12, min_length=6, num_beams=1, do_sample=False,
        ).numpy()
    ours = np.asarray(greedy_generate(
        params, cfg, jnp.asarray(ids[:, None]), jnp.asarray(mask[:, None]),
        max_length=12, min_length=6,
    ))
    for b in range(2):
        assert _strip(ours[b]) == _strip(hf[b])


def test_beam_matches_hf():
    model, cfg, params = _tiny()
    rng = np.random.RandomState(2)
    B, L, MAX = 2, 8, 10
    ids = rng.randint(2, VOCAB, (B, L))
    mask = np.ones((B, L), dtype=np.int64)
    with torch.no_grad():
        hf = model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            max_length=MAX, num_beams=3, do_sample=False, length_penalty=1.0,
        ).numpy()
    ours = np.asarray(beam_generate(
        params, cfg, jnp.asarray(ids[:, None]), jnp.asarray(mask[:, None]),
        max_length=MAX, num_beams=3, length_penalty=1.0,
    ))
    for b in range(B):
        assert _strip(ours[b]) == _strip(hf[b]), (b, ours[b], hf[b])


def test_forced_prefix():
    _, cfg, params = _tiny()
    rng = np.random.RandomState(4)
    ids = rng.randint(2, VOCAB, (2, 8))
    mask = np.ones((2, 8), dtype=np.int64)
    prefix = np.array([[7, 9, 11], [20, 21, 22]], dtype=np.int32)
    plen = np.array([3, 2])
    out = np.asarray(greedy_generate(
        params, cfg, jnp.asarray(ids[:, None]), jnp.asarray(mask[:, None]),
        max_length=10, forced_prefix=jnp.asarray(prefix), prefix_len=jnp.asarray(plen),
        has_prefix=True,
    ))
    assert list(out[0, 1:4]) == [7, 9, 11]
    assert list(out[1, 1:3]) == [20, 21]


def test_beam_forced_prefix():
    _, cfg, params = _tiny()
    rng = np.random.RandomState(5)
    ids = rng.randint(2, VOCAB, (2, 8))
    mask = np.ones((2, 8), dtype=np.int64)
    prefix = np.array([[7, 9, 11], [20, 21, 22]], dtype=np.int32)
    plen = np.array([3, 2])
    out = np.asarray(beam_generate(
        params, cfg, jnp.asarray(ids[:, None]), jnp.asarray(mask[:, None]),
        max_length=10, num_beams=3,
        forced_prefix=jnp.asarray(prefix), prefix_len=jnp.asarray(plen), has_prefix=True,
    ))
    assert list(out[0, 1:4]) == [7, 9, 11]
    assert list(out[1, 1:3]) == [20, 21]


@pytest.mark.parametrize("penalty", [-0.7, 0.0, 2.0])
def test_beam_length_penalty_edges_match_hf(penalty):
    """HF early_stopping=False divides its termination bound by the CURRENT
    length for every penalty sign (BeamHypotheses.is_done) — negative and zero
    penalties exercise that heuristic where a max_length-based bound diverges."""
    model, cfg, params = _tiny()
    rng = np.random.RandomState(7)
    B, L, MAX = 2, 8, 12
    ids = rng.randint(2, VOCAB, (B, L))
    mask = np.ones((B, L), dtype=np.int64)
    with torch.no_grad():
        hf = model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            max_length=MAX, num_beams=3, do_sample=False, length_penalty=penalty,
        ).numpy()
    ours = np.asarray(beam_generate(
        params, cfg, jnp.asarray(ids[:, None]), jnp.asarray(mask[:, None]),
        max_length=MAX, num_beams=3, length_penalty=penalty,
    ))
    for b in range(B):
        assert _strip(ours[b]) == _strip(hf[b]), (b, penalty, ours[b], hf[b])


def test_int8_cross_cache_greedy_parity():
    """--decode_kv_cache int8: per-key-scale quantized cross K/V must reproduce
    the bf16-cache generations on the tiny model (the quantization error is far
    below the logit margins at every step here; real models accept ~1e-2 logit
    noise for half the decode bandwidth floor)."""
    import dataclasses

    _, cfg, params = _tiny()
    rng = np.random.RandomState(11)
    B, L, MAX = 2, 8, 12
    ids = rng.randint(2, VOCAB, (B, L))
    mask = np.ones((B, L), dtype=np.int64)
    base = np.asarray(greedy_generate(
        params, cfg, jnp.asarray(ids[:, None]), jnp.asarray(mask[:, None]), max_length=MAX))
    cfg8 = dataclasses.replace(cfg, decode_cache_dtype="int8")
    q8 = np.asarray(greedy_generate(
        params, cfg8, jnp.asarray(ids[:, None]), jnp.asarray(mask[:, None]), max_length=MAX))
    assert np.array_equal(base, q8), (base, q8)

    hf_beam = np.asarray(beam_generate(
        params, cfg, jnp.asarray(ids[:, None]), jnp.asarray(mask[:, None]),
        max_length=MAX, num_beams=3))
    q8_beam = np.asarray(beam_generate(
        params, cfg8, jnp.asarray(ids[:, None]), jnp.asarray(mask[:, None]),
        max_length=MAX, num_beams=3))
    assert np.array_equal(hf_beam, q8_beam), (hf_beam, q8_beam)


def test_decode_stream_parity():
    """--decode_stream on: the Pallas streaming weight-matmul decode path must
    reproduce the XLA path's generations exactly (same bf16/fp32 accumulation
    contract; only the d_ff block-summation order differs, far below logit
    margins on the tiny model). Covers greedy, beam, and the int8-cache combo."""
    import dataclasses

    _, cfg, params = _tiny()
    rng = np.random.RandomState(12)
    B, L, MAX = 2, 8, 12
    ids = rng.randint(2, VOCAB, (B, L))
    mask = np.ones((B, L), dtype=np.int64)
    base = np.asarray(greedy_generate(
        params, cfg, jnp.asarray(ids[:, None]), jnp.asarray(mask[:, None]), max_length=MAX))
    cfg_s = dataclasses.replace(cfg, decode_stream="on")
    got = np.asarray(greedy_generate(
        params, cfg_s, jnp.asarray(ids[:, None]), jnp.asarray(mask[:, None]), max_length=MAX))
    assert np.array_equal(base, got), (base, got)

    base_beam = np.asarray(beam_generate(
        params, cfg, jnp.asarray(ids[:, None]), jnp.asarray(mask[:, None]),
        max_length=MAX, num_beams=3))
    got_beam = np.asarray(beam_generate(
        params, cfg_s, jnp.asarray(ids[:, None]), jnp.asarray(mask[:, None]),
        max_length=MAX, num_beams=3))
    assert np.array_equal(base_beam, got_beam), (base_beam, got_beam)

    cfg_s8 = dataclasses.replace(cfg_s, decode_cache_dtype="int8")
    got8 = np.asarray(greedy_generate(
        params, cfg_s8, jnp.asarray(ids[:, None]), jnp.asarray(mask[:, None]), max_length=MAX))
    assert np.array_equal(base, got8), (base, got8)


def test_decode_stream_parity_tied_relu():
    """Tied-embedding + relu FFN (original t5-*) exercises the transpose_w lm_head
    stream and the relu fused-FFN kernel."""
    import dataclasses

    from transformers import T5Config as HFT5Config, T5ForConditionalGeneration

    from atlas_tpu.models.hf_import import t5_config_from_hf, t5_params_from_state_dict

    hf_cfg = HFT5Config(
        vocab_size=VOCAB, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout_rate=0.0,
        feed_forward_proj="relu", tie_word_embeddings=True,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
    )
    torch.manual_seed(7)
    model = T5ForConditionalGeneration(hf_cfg).eval()
    cfg = t5_config_from_hf(hf_cfg)
    params = t5_params_from_state_dict(model.state_dict(), cfg)
    rng = np.random.RandomState(13)
    ids = rng.randint(2, VOCAB, (2, 8))
    mask = np.ones((2, 8), dtype=np.int64)
    base = np.asarray(greedy_generate(
        params, cfg, jnp.asarray(ids[:, None]), jnp.asarray(mask[:, None]), max_length=12))
    cfg_s = dataclasses.replace(cfg, decode_stream="on")
    got = np.asarray(greedy_generate(
        params, cfg_s, jnp.asarray(ids[:, None]), jnp.asarray(mask[:, None]), max_length=12))
    assert np.array_equal(base, got), (base, got)
