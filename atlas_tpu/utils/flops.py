"""Analytic model-FLOPs accounting for MFU on bench metrics.

The reference publishes no throughput numbers (BASELINE.md), so this
framework's bench lines become the standard — and raw tokens/s cannot say
whether a number is good or mediocre on a given chip. Every compute bench
metric therefore carries `mfu` = model FLOPs / wall time / chip bf16 peak.

Conventions (the standard "model FLOPs" of the scaling literature):
- a matmul of (m, k) @ (k, n) costs 2*m*k*n FLOPs;
- train = 3x forward (one fwd + ~2x bwd); rematerialization recompute is NOT
  counted (so full-remat runs report a conservative MFU);
- attention terms included: 4*keys*inner per query token (QK^T + PV), causal
  self-attention averaged to half its keys;
- embedding gathers, layernorms, softmaxes, elementwise: not counted.

Chip peaks: bf16 dense matmul peak per chip; v5e = 197 TFLOP/s.
"""

from __future__ import annotations

from typing import Optional

# bf16 dense peak FLOP/s per chip
CHIP_PEAK_FLOPS = {
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
}


def device_peak_flops(default: str = "v5e") -> float:
    """Peak bf16 FLOP/s of the attached chip (by device_kind), defaulting to
    v5e (the bench chip) when the kind string is unrecognized."""
    import jax

    kind = ""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        pass
    for name, peak in CHIP_PEAK_FLOPS.items():
        if name in kind.replace(" ", ""):
            return peak
    if "v5litepod" in kind.replace(" ", "") or "lite" in kind:
        return CHIP_PEAK_FLOPS["v5e"]
    return CHIP_PEAK_FLOPS[default]


def _ffn_mult(cfg) -> int:
    # relu FFN: wi + wo = 2 matmuls; gated-gelu: wi_0 + wi_1 + wo = 3
    return 6 if getattr(cfg, "feed_forward_proj", "relu") == "gated-gelu" else 4


def t5_encoder_fwd_flops(cfg, tokens: float, seq_len: int) -> float:
    """Forward FLOPs of the T5 encoder stack over `tokens` total tokens packed
    in sequences of `seq_len` (FiD: each passage attends within itself)."""
    d, inner = cfg.d_model, cfg.num_heads * cfg.d_kv
    per_tok = 8 * d * inner + 4 * seq_len * inner + _ffn_mult(cfg) * d * cfg.d_ff
    return tokens * per_tok * cfg.num_layers


def t5_decoder_fwd_flops(cfg, dec_tokens: float, self_keys: float,
                         cross_keys: float, enc_tokens_for_kv: float,
                         count_lm_head: bool = True) -> float:
    """Forward FLOPs of the decoder stack: `dec_tokens` query tokens attending
    `self_keys` (average) self keys and `cross_keys` cross keys, plus the
    one-time cross K/V projection over `enc_tokens_for_kv` encoder tokens."""
    d, inner = cfg.d_model, cfg.num_heads * cfg.d_kv
    nL = cfg.num_decoder_layers
    per_tok = (8 * d * inner                      # self qkv + o
               + 4 * self_keys * inner            # self QK^T + PV
               + 4 * d * inner                    # cross q + o
               + 4 * cross_keys * inner           # cross QK^T + PV
               + _ffn_mult(cfg) * d * cfg.d_ff)
    total = dec_tokens * per_tok * nL
    total += 4 * enc_tokens_for_kv * d * inner * nL  # cross K/V projections
    if count_lm_head:
        total += dec_tokens * 2 * d * cfg.vocab_size
    return total


def fid_fwd_flops(cfg, B: int, N: int, L: int, T: int) -> float:
    """One FiD forward: encode B*N passages of length L, decode T target
    tokens attending all N*L encoder keys (causal self-attn averaged)."""
    enc_tokens = B * N * L
    return (t5_encoder_fwd_flops(cfg, enc_tokens, L)
            + t5_decoder_fwd_flops(cfg, B * T, T / 2, N * L, enc_tokens))


def fid_train_flops(cfg, B: int, N: int, L: int, T: int) -> float:
    """FiD fwd+bwd model FLOPs (3x forward; remat recompute not counted)."""
    return 3.0 * fid_fwd_flops(cfg, B, N, L, T)


def fid_greedy_decode_flops(cfg, B: int, N: int, L: int, gen: int,
                            beams: int = 1) -> float:
    """One full generate call: FiD encode + cross-cache init + `gen`
    incremental decode steps (`beams` decoder rows per input row)."""
    enc_tokens = B * N * L
    dec_tokens = B * beams * gen
    return (t5_encoder_fwd_flops(cfg, enc_tokens, L)
            + t5_decoder_fwd_flops(cfg, dec_tokens, gen / 2, N * L, enc_tokens))


def ppmean_gold_flops(cfg, B: int, N: int, L: int, T: int) -> float:
    """ppmean gold scores (core/losses.py): a per-passage reader forward —
    encode B*N passages independently, decode the labels against EACH passage
    (B*N decoder rows of T tokens, cross keys = L)."""
    enc_tokens = B * N * L
    return (t5_encoder_fwd_flops(cfg, enc_tokens, L)
            + t5_decoder_fwd_flops(cfg, B * N * T, T / 2, L, enc_tokens))


def bert_fwd_flops(cfg, tokens: float, seq_len: int) -> float:
    """BERT/contriever encoder forward over `tokens` tokens at `seq_len`."""
    d = cfg.hidden_size
    per_tok = 8 * d * d + 4 * seq_len * d + 4 * d * cfg.intermediate_size
    return tokens * per_tok * cfg.num_hidden_layers


def joint_train_flops(rcfg, bcfg, B: int, N: int, L: int, T: int,
                      retr_len: int) -> float:
    """The production joint step at ppmean: FiD reader fwd+bwd + gold-score
    forward (stop_gradient: fwd only) + retriever fwd+bwd over the query and
    the N passages."""
    retr_tokens = B * (N + 1) * retr_len
    return (fid_train_flops(rcfg, B, N, L, T)
            + ppmean_gold_flops(rcfg, B, N, L, T)
            + 3.0 * bert_fwd_flops(bcfg, retr_tokens, retr_len))


def mfu(flops: float, seconds: float, peak: Optional[float] = None) -> float:
    """Model-FLOPs utilization in [0, 1] against the chip bf16 peak."""
    return flops / seconds / (peak or device_peak_flops())
