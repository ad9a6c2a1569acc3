"""T5 v1.1 / original-T5 encoder-decoder as pure-functional JAX.

Behavioral reference: the vendored transformers-4.18 T5 fork
(/root/reference/src/modeling_t5.py: T5Attention :314, RMSNorm :235, T5Block :602,
T5Stack :816, T5ForConditionalGeneration :1440). TPU-first design choices, not a port:

- Parameters are nested dict pytrees with all layers STACKED on a leading axis and the
  stack driven by `jax.lax.scan` — one compiled block regardless of depth (fast XLA
  compiles, natural `jax.checkpoint` remat boundary, scan `ys` give per-layer
  cross-attention stats functionally instead of the reference's monkey-patched
  module-attribute storage, fid.py:221-357).
- bf16-friendly: softmax and layernorm statistics accumulate in fp32; no fp16 inf
  clamps needed (the reference's clamp_value blocks, modeling_t5.py:659-708, are an
  fp16 artifact).
- Matmuls hit the MXU via jnp.einsum with fp32 accumulation.

Weight convention: all projection matrices are (in_features, out_features), i.e. y=x@W.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from atlas_tpu.ops.attention import (
    NEG_INF,
    dot_product_attention,
    make_attention_bias,
    make_causal_bias,
)
from atlas_tpu.ops.decode_matmul import (
    stream_ffn_stacked,
    stream_matmul,
    stream_matmul_stacked,
)
from atlas_tpu.ops.flash import flash_attention

IGNORE_INDEX = -100


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 12
    num_decoder_layers: int = 12
    num_heads: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    dropout_rate: float = 0.1
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "gated-gelu"  # "gated-gelu" (v1.1) or "relu" (original)
    tie_word_embeddings: bool = False  # True for original t5-*
    decoder_start_token_id: int = 0
    pad_token_id: int = 0
    dtype: Any = jnp.float32  # activation dtype
    remat: bool = False  # jax.checkpoint each layer block
    # remat policy: "full" recomputes everything (lowest memory); "dots" saves
    # matmul outputs and recomputes only elementwise ops (~3% faster step on v5e
    # at more live memory — jax.checkpoint_policies.dots_with_no_batch_dims)
    remat_policy: str = "full"
    # "auto": Pallas flash attention on TPU for the hot shapes, XLA fallback elsewhere;
    # "flash": always (interpret-mode on CPU — tests only); "xla": never.
    attn_impl: str = "auto"
    # Unroll factor for the decode-step layer scan: unrolled iterations expose
    # static weight slices, letting XLA prefetch layer i+1's weights during
    # layer i's compute (the step is dispatch/latency-bound at small batch).
    decode_scan_unroll: int = 1
    # Cross-attention K/V cache dtype for incremental decoding: "bf16" (exact) or
    # "int8" (per-key-vector scales; halves the cache HBM traffic that floors the
    # per-token decode cost at FiD context lengths — see init_decode_cache).
    decode_cache_dtype: str = "bf16"
    # "auto": route the decode step's weight matmuls (qkv/o/cross/FFN/lm_head)
    # through the streaming Pallas kernels (ops/decode_matmul.py) on TPU, where
    # XLA's small-M matmuls run far under HBM bandwidth; "on"/"off" force it.
    decode_stream: str = "auto"
    # Whole-step fused decode kernel (ops/decode_fused.py): the entire stack of
    # decoder layers (+ lm head) runs as ONE Pallas call per token, removing the
    # ~2.6ms of per-op dispatch the critical-path-bound step otherwise pays.
    # "auto" = on for TPU greedy decoding when shapes allow; "on" forces it
    # (interpret-mode on CPU — tests), "off" keeps the XLA scan step.
    decode_fused: str = "auto"
    # Weight-only quantization for decoding: "int8" stores the decode-step
    # weight stacks as int8 with per-output-channel f32 scales (halves the
    # weight HBM traffic that bounds the per-token cost on large readers;
    # logits shift by the ~1e-3-relative quantization error, so tokens may
    # differ from the bf16-weight path). Both decode paths honor it: the fused
    # kernel via _build_fused_cache's transposed stacks, the XLA scan step
    # (beam, sharded multi-chip decode) via per-layer code+scale scan slices.
    decode_weights: str = "bf16"

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv


# Architecture table for the reference's supported reader types (options.py:174-188).
_T5_SIZES = {
    # name: (d_model, d_kv, d_ff, layers, heads, ffn, tied)
    "t5-small": (512, 64, 2048, 6, 8, "relu", True),
    "t5-base": (768, 64, 3072, 12, 12, "relu", True),
    "t5-large": (1024, 64, 4096, 24, 16, "relu", True),
    "t5-3b": (1024, 128, 16384, 24, 32, "relu", True),
    "t5-11b": (1024, 128, 65536, 24, 128, "relu", True),
    "google/t5-v1_1-base": (768, 64, 2048, 12, 12, "gated-gelu", False),
    "google/t5-v1_1-large": (1024, 64, 2816, 24, 16, "gated-gelu", False),
    "google/t5-v1_1-xl": (2048, 64, 5120, 24, 32, "gated-gelu", False),
    "google/t5-v1_1-xxl": (4096, 64, 10240, 24, 64, "gated-gelu", False),
}
# lm-adapt variants share v1.1 architecture
for _size in ("base", "large", "xl", "xxl"):
    _T5_SIZES[f"google/t5-{_size}-lm-adapt"] = _T5_SIZES[f"google/t5-v1_1-{_size}"]


def t5_config_for(model_type: str, **overrides) -> T5Config:
    d_model, d_kv, d_ff, layers, heads, ffn, tied = _T5_SIZES[model_type]
    cfg = T5Config(
        d_model=d_model,
        d_kv=d_kv,
        d_ff=d_ff,
        num_layers=layers,
        num_decoder_layers=layers,
        num_heads=heads,
        feed_forward_proj=ffn,
        tie_word_embeddings=tied,
    )
    return dataclasses.replace(cfg, **overrides)


# ----------------------------------------------------------------------- primitives


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """T5 RMSNorm (modeling_t5.py:235): no mean subtraction, no bias; fp32 variance."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (weight * xf.astype(weight.dtype)).astype(x.dtype)


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, l, _ = x.shape
    return x.reshape(b, l, num_heads, -1).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def relative_position_bucket(
    relative_position: jnp.ndarray, bidirectional: bool, num_buckets: int, max_distance: int
) -> jnp.ndarray:
    """T5 log-spaced relative-position bucketing (modeling_t5.py T5Attention.compute_bias)."""
    relative_buckets = jnp.zeros_like(relative_position)
    if bidirectional:
        num_buckets //= 2
        relative_buckets += (relative_position > 0).astype(jnp.int32) * num_buckets
        relative_position = jnp.abs(relative_position)
    else:
        relative_position = -jnp.minimum(relative_position, 0)
    max_exact = num_buckets // 2
    is_small = relative_position < max_exact
    scale = (num_buckets - max_exact) / math.log(max_distance / max_exact)
    rp_large = max_exact + (
        jnp.log(jnp.maximum(relative_position, 1).astype(jnp.float32) / max_exact) * scale
    ).astype(jnp.int32)
    rp_large = jnp.minimum(rp_large, num_buckets - 1)
    relative_buckets += jnp.where(is_small, relative_position, rp_large)
    return relative_buckets


def compute_position_bias(
    rel_bias_emb: jnp.ndarray,  # (num_buckets, num_heads)
    query_positions: jnp.ndarray,  # (Lq,)
    key_positions: jnp.ndarray,  # (Lk,)
    bidirectional: bool,
    num_buckets: int,
    max_distance: int,
) -> jnp.ndarray:
    """-> (1, H, Lq, Lk) additive bias."""
    relative_position = key_positions[None, :] - query_positions[:, None]
    buckets = relative_position_bucket(relative_position, bidirectional, num_buckets, max_distance)
    bias = rel_bias_emb[buckets]  # (Lq, Lk, H)
    return bias.transpose(2, 0, 1)[None]


# ----------------------------------------------------------------------------- init


def _normal(rng, shape, std, dtype=jnp.float32):
    return std * jax.random.normal(rng, shape, dtype=dtype)


def _init_attn(rng, cfg: T5Config):
    rq, rk, rv, ro = jax.random.split(rng, 4)
    d, i = cfg.d_model, cfg.inner_dim
    return {
        "q": _normal(rq, (d, i), (d * cfg.d_kv) ** -0.5),
        "k": _normal(rk, (d, i), d**-0.5),
        "v": _normal(rv, (d, i), d**-0.5),
        "o": _normal(ro, (i, d), i**-0.5),
    }


def _init_ffn(rng, cfg: T5Config):
    r0, r1, r2 = jax.random.split(rng, 3)
    d, f = cfg.d_model, cfg.d_ff
    if cfg.feed_forward_proj == "gated-gelu":
        return {
            "wi_0": _normal(r0, (d, f), d**-0.5),
            "wi_1": _normal(r1, (d, f), d**-0.5),
            "wo": _normal(r2, (f, d), f**-0.5),
        }
    return {"wi": _normal(r0, (d, f), d**-0.5), "wo": _normal(r2, (f, d), f**-0.5)}


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def init_t5(rng: jax.Array, cfg: T5Config) -> Dict[str, Any]:
    keys = jax.random.split(rng, 8)
    d = cfg.d_model
    enc_layers = _stack(
        [
            {
                "self_attn": _init_attn(jax.random.fold_in(keys[1], i), cfg),
                "ln1": jnp.ones((d,)),
                "ffn": _init_ffn(jax.random.fold_in(keys[2], i), cfg),
                "ln2": jnp.ones((d,)),
            }
            for i in range(cfg.num_layers)
        ]
    )
    dec_layers = _stack(
        [
            {
                "self_attn": _init_attn(jax.random.fold_in(keys[3], i), cfg),
                "ln1": jnp.ones((d,)),
                "cross_attn": _init_attn(jax.random.fold_in(keys[4], i), cfg),
                "ln2": jnp.ones((d,)),
                "ffn": _init_ffn(jax.random.fold_in(keys[5], i), cfg),
                "ln3": jnp.ones((d,)),
            }
            for i in range(cfg.num_decoder_layers)
        ]
    )
    params = {
        "shared": _normal(keys[0], (cfg.vocab_size, d), 1.0),
        "encoder": {
            "rel_bias": _normal(keys[6], (cfg.relative_attention_num_buckets, cfg.num_heads), d**-0.5),
            "layers": enc_layers,
            "final_ln": jnp.ones((d,)),
        },
        "decoder": {
            "rel_bias": _normal(keys[7], (cfg.relative_attention_num_buckets, cfg.num_heads), d**-0.5),
            "layers": dec_layers,
            "final_ln": jnp.ones((d,)),
        },
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _normal(jax.random.fold_in(keys[0], 1), (d, cfg.vocab_size), d**-0.5)
    return params


# -------------------------------------------------------------------------- dropout


def _dropout(x, rate, deterministic, rng):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _ckpt(fn, cfg: T5Config):
    if getattr(cfg, "remat_policy", "full") == "dots":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    return jax.checkpoint(fn)


def _ffn_apply(ffn, x, cfg: T5Config, deterministic, rng):
    if cfg.feed_forward_proj == "gated-gelu":
        h = jax.nn.gelu(x @ ffn["wi_0"], approximate=True) * (x @ ffn["wi_1"])
    else:
        h = jax.nn.relu(x @ ffn["wi"])
    h = _dropout(h, cfg.dropout_rate, deterministic, rng)
    return h.astype(x.dtype) @ ffn["wo"]


def _use_flash(cfg, lq: int, lk: int, capture: bool = False,
               deterministic: bool = False) -> bool:
    """Dispatch to the shared ops.flash policy (measured thresholds live
    there); cfg is any config with an attn_impl field (T5Config, BertConfig)."""
    from atlas_tpu.ops.flash import flash_wins

    return flash_wins(getattr(cfg, "attn_impl", "auto"), lq, lk,
                      capture=capture, deterministic=deterministic)


def _attn_apply(
    attn, x, kv, bias, cfg: T5Config, deterministic, rng, return_stats=False,
    use_flash=False, pos_bias=None, kv_mask=None, causal=False,
):
    """bias is the composed (broadcastable) additive bias for the XLA fallback;
    pos_bias (H,Lq,Lk) / kv_mask (B,Lk) / causal are its decomposition for flash."""
    q = _split_heads(x @ attn["q"], cfg.num_heads)
    k = _split_heads(kv @ attn["k"], cfg.num_heads)
    v = _split_heads(kv @ attn["v"], cfg.num_heads)
    if use_flash and not return_stats:
        rate = 0.0 if deterministic else cfg.dropout_rate
        out = flash_attention(
            q, k, v, pos_bias=pos_bias, kv_mask=kv_mask, causal=causal,
            dropout_rate=rate, dropout_rng=rng,
        )
        return _merge_heads(out) @ attn["o"]
    out = dot_product_attention(
        q, k, v, bias=bias, dropout_rate=cfg.dropout_rate,
        deterministic=deterministic, dropout_rng=rng, return_stats=return_stats,
    )
    if return_stats:
        out, stats = out
        return _merge_heads(out) @ attn["o"], stats
    return _merge_heads(out) @ attn["o"]


# -------------------------------------------------------------------------- encoder


def t5_encode(
    params: Dict[str, Any],
    cfg: T5Config,
    input_ids: jnp.ndarray,  # (B, L)
    attention_mask: jnp.ndarray,  # (B, L)
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """-> (B, L, d_model) final hidden states (after final RMSNorm + dropout)."""
    L = input_ids.shape[1]
    x = jnp.take(params["shared"], input_ids, axis=0).astype(cfg.dtype)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rng, r0 = jax.random.split(rng)
    x = _dropout(x, cfg.dropout_rate, deterministic, r0)

    positions = jnp.arange(L)
    pos_bias = compute_position_bias(
        params["encoder"]["rel_bias"].astype(jnp.float32),
        positions,
        positions,
        bidirectional=True,
        num_buckets=cfg.relative_attention_num_buckets,
        max_distance=cfg.relative_attention_max_distance,
    )
    use_flash = _use_flash(cfg, L, L, deterministic=deterministic)
    if use_flash:
        bias = None  # flash composes pos_bias + key mask in-kernel, never in HBM
    else:
        bias = pos_bias + make_attention_bias(attention_mask)  # (B, H, L, L)

    def layer(carry, lp):
        x, rng = carry
        rng, r1, r2, r3, r4 = jax.random.split(rng, 5)
        h = rms_norm(x, lp["ln1"], cfg.layer_norm_epsilon)
        h = _attn_apply(
            lp["self_attn"], h, h, bias, cfg, deterministic, r1,
            use_flash=use_flash, pos_bias=pos_bias[0], kv_mask=attention_mask,
        )
        x = x + _dropout(h, cfg.dropout_rate, deterministic, r2)
        h = rms_norm(x, lp["ln2"], cfg.layer_norm_epsilon)
        h = _ffn_apply(lp["ffn"], h, cfg, deterministic, r3)
        x = x + _dropout(h, cfg.dropout_rate, deterministic, r4)
        return (x, rng), None

    if cfg.remat:
        layer = _ckpt(layer, cfg)
    (x, _), _ = jax.lax.scan(layer, (x, rng), params["encoder"]["layers"])

    x = rms_norm(x, params["encoder"]["final_ln"], cfg.layer_norm_epsilon)
    rng, r5 = jax.random.split(rng)
    return _dropout(x, cfg.dropout_rate, deterministic, r5)


# -------------------------------------------------------------------------- decoder


def t5_decode(
    params: Dict[str, Any],
    cfg: T5Config,
    decoder_input_ids: jnp.ndarray,  # (B, Lt)
    encoder_hidden: jnp.ndarray,  # (B, Lk, D)
    encoder_mask: jnp.ndarray,  # (B, Lk)
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    capture_cross_attn: bool = False,
) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
    """-> (B, Lt, vocab) logits, plus per-layer cross-attention stats when captured.

    Stats dict values are (n_layers, B, Lt, Lk): scores (head-mean raw scores incl.
    mask), probs (head-mean softmax), norms (head-mean ||v||*prob) — the three
    storages of fid.py:335-341 — produced as scan ys instead of module attributes.
    """
    B, Lt = decoder_input_ids.shape
    x = jnp.take(params["shared"], decoder_input_ids, axis=0).astype(cfg.dtype)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rng, r0 = jax.random.split(rng)
    x = _dropout(x, cfg.dropout_rate, deterministic, r0)

    positions = jnp.arange(Lt)
    self_pos_bias = compute_position_bias(
        params["decoder"]["rel_bias"].astype(jnp.float32),
        positions,
        positions,
        bidirectional=False,
        num_buckets=cfg.relative_attention_num_buckets,
        max_distance=cfg.relative_attention_max_distance,
    )
    Lk = encoder_hidden.shape[1]
    self_flash = _use_flash(cfg, Lt, Lt, deterministic=deterministic)
    cross_flash = _use_flash(cfg, Lt, Lk, capture=capture_cross_attn,
                             deterministic=deterministic)
    self_bias = None if self_flash else self_pos_bias + make_causal_bias(Lt)
    cross_bias = None if cross_flash else make_attention_bias(encoder_mask)  # (B,1,1,Lk)
    enc = encoder_hidden.astype(cfg.dtype)

    def layer(carry, lp):
        x, rng = carry
        rng, r1, r2, r3, r4, r5, r6 = jax.random.split(rng, 7)
        h = rms_norm(x, lp["ln1"], cfg.layer_norm_epsilon)
        h = _attn_apply(
            lp["self_attn"], h, h, self_bias, cfg, deterministic, r1,
            use_flash=self_flash, pos_bias=self_pos_bias[0], causal=True,
        )
        x = x + _dropout(h, cfg.dropout_rate, deterministic, r2)
        h = rms_norm(x, lp["ln2"], cfg.layer_norm_epsilon)
        if capture_cross_attn:
            h, stats = _attn_apply(
                lp["cross_attn"], h, enc, cross_bias, cfg, deterministic, r3, return_stats=True
            )
        else:
            h = _attn_apply(
                lp["cross_attn"], h, enc, cross_bias, cfg, deterministic, r3,
                use_flash=cross_flash, kv_mask=encoder_mask,
            )
            stats = None
        x = x + _dropout(h, cfg.dropout_rate, deterministic, r4)
        h = rms_norm(x, lp["ln3"], cfg.layer_norm_epsilon)
        h = _ffn_apply(lp["ffn"], h, cfg, deterministic, r5)
        x = x + _dropout(h, cfg.dropout_rate, deterministic, r6)
        return (x, rng), stats

    if cfg.remat:
        layer = _ckpt(layer, cfg)
    (x, _), stats = jax.lax.scan(layer, (x, rng), params["decoder"]["layers"])

    x = rms_norm(x, params["decoder"]["final_ln"], cfg.layer_norm_epsilon)
    rng, r7 = jax.random.split(rng)
    x = _dropout(x, cfg.dropout_rate, deterministic, r7)

    logits = _lm_logits(params, cfg, x)
    stats_dict = None
    if capture_cross_attn:
        stats_dict = {"scores": stats[0], "probs": stats[1], "norms": stats[2]}
    return logits, stats_dict


def _lm_logits(params, cfg: T5Config, x: jnp.ndarray) -> jnp.ndarray:
    if cfg.tie_word_embeddings:
        # modeling_t5.py: sequence_output * d_model**-0.5 @ shared.T when tied
        x = x * (cfg.d_model**-0.5)
        return jnp.einsum("bld,vd->blv", x, params["shared"].astype(x.dtype),
                          preferred_element_type=jnp.float32)
    return jnp.einsum("bld,dv->blv", x, params["lm_head"].astype(x.dtype),
                      preferred_element_type=jnp.float32)


# ------------------------------------------------------------------ loss / helpers


def shift_right(input_ids: jnp.ndarray, cfg: T5Config) -> jnp.ndarray:
    """T5 _shift_right: prepend decoder_start_token, drop last, -100 -> pad."""
    shifted = jnp.concatenate(
        [jnp.full_like(input_ids[:, :1], cfg.decoder_start_token_id), input_ids[:, :-1]], axis=1
    )
    return jnp.where(shifted == IGNORE_INDEX, cfg.pad_token_id, shifted)


def cross_entropy(
    logits: jnp.ndarray,  # (..., V) fp32
    labels: jnp.ndarray,  # (...), IGNORE_INDEX-masked
    reduction: str = "mean",
) -> jnp.ndarray:
    """Token CE with ignore_index semantics matching torch F.cross_entropy."""
    mask = labels != IGNORE_INDEX
    safe_labels = jnp.where(mask, labels, 0)
    logz = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
    gold = jnp.take_along_axis(
        logits.astype(jnp.float32), safe_labels[..., None], axis=-1
    ).squeeze(-1)
    nll = (logz - gold) * mask
    if reduction == "none":
        return nll
    return nll.sum() / jnp.maximum(mask.sum(), 1)


# --------------------------------------------------------------- cached decoding


def _fused_dims(cfg: T5Config, Bq: int, Bc: int, Lk: int, max_len: int, int8: bool,
                int8w: Optional[bool] = None):
    """FusedDims for (query rows, cross rows) at RAW lengths; _build_fused_cache
    applies the same shared padding helpers, so the VMEM-gate estimate and the
    real cache geometry cannot drift.

    Stream-block sizes adapt to the VMEM budget: the cross-cache block
    (Bc*I*blk_l, double-buffered in+out) dominates at large models — t5-large
    bf16 at B=8, Lk=5120 is ~120MiB at blk_l=1024 but ~88MiB at blk_l=512
    (same total bytes moved, 2x the cross phases) — so blocks shrink through a
    fixed cascade until the estimate fits, and only then does the gate fall
    back to the XLA scan step."""
    from atlas_tpu.ops.decode_fused import (
        FUSED_VMEM_BUDGET, FusedDims, _pick_block, fused_vmem_bytes, pad_lk,
        pad_tmax, pad_vocab,
    )

    Lkp = pad_lk(Lk)
    Tmaxp = pad_tmax(max_len)
    Vp = pad_vocab(cfg.vocab_size)
    if int8w is None:
        int8w = getattr(cfg, "decode_weights", "bf16") == "int8"

    I = cfg.num_heads * cfg.d_kv

    def mk(blk_l_t: int, blk_v_t: int, blk_f_t: int, i_div: int):
        blk_i = 0 if i_div == 1 else _pick_block(I, I // i_div)
        return FusedDims(
            nL=cfg.num_decoder_layers, B=Bq, D=cfg.d_model, H=cfg.num_heads,
            Dh=cfg.d_kv, F=cfg.d_ff, V=Vp, Lk=Lkp, Tmax=Tmaxp,
            blk_l=_pick_block(Lkp, blk_l_t),
            blk_f=_pick_block(cfg.d_ff, blk_f_t),
            blk_v=_pick_block(Vp, blk_v_t),
            gated=cfg.feed_forward_proj == "gated-gelu",
            tied=cfg.tie_word_embeddings, int8=int8, dtype=cfg.dtype,
            K=Bq // Bc, blk_q3=blk_i, blk_i=blk_i, int8w=int8w,
        )

    # later stages also stream the attention projections in I/i_div blocks —
    # what lets a 3B-class reader (D = I = 2048) under the budget at all
    d = mk(1024, 2048, 1024, 1)
    for blk_l_t, blk_v_t, blk_f_t, i_div in (
        (512, 2048, 1024, 1), (512, 1024, 1024, 1), (256, 1024, 1024, 1),
        (256, 1024, 512, 2), (256, 1024, 512, 4), (128, 1024, 512, 4),
        (128, 512, 512, 8),
    ):
        if fused_vmem_bytes(d) <= FUSED_VMEM_BUDGET:
            break
        d = mk(blk_l_t, blk_v_t, blk_f_t, i_div)
    return d


def _fused_decode_ok(
    cfg: T5Config, batch: int, self_batch: Optional[int], Lk: int, max_len: int
) -> bool:
    """Gate for the single-kernel fused decode step (ops/decode_fused.py):
    TPU, aligned shapes, and a VMEM-budget estimate. "auto" fuses GREEDY only:
    the kernel supports beam (query rows share a batch row's cross cache,
    K = rows/cross-rows), but measured on v5e at t5-base B=8 beam-4 int8 the
    fused step was 2.8x SLOWER than the XLA scan (420.9 vs 149.6 ms/gen in one
    process — the per-query-row VPU loops scale with B*K while the XLA step
    stays matmul-shaped) and compiled-mode tokens diverged from the XLA beam
    (greedy stays token-identical; not root-caused, interpret mode matches) —
    so beam NEVER fuses on a real TPU, even under "on". "on" forces fusion
    (incl. beam off-TPU, interpret mode — tests), "off" keeps the XLA scan
    step.

    Greedy token-exactness vs the scan step is model-family-dependent: relu
    models (t5-base/large) measured token-IDENTICAL; gated-gelu models agree
    to bf16 tanh-gelu noise (chip probe at v1_1-base: max logit delta 0.07 on
    a ~9 range, 100% top-1 at probed steps) so near-tie argmax flips can
    diverge random-init greedy sequences — quality-neutral, not a bug."""
    mode = getattr(cfg, "decode_fused", "auto")
    if mode == "off":
        return False
    if mode == "auto" and jax.default_backend() != "tpu":
        return False
    if (self_batch is not None and self_batch != batch
            and jax.default_backend() == "tpu"):
        # Beam never fuses on real hardware — measured slower than the XLA scan
        # AND compiled-mode tokens diverge (interpret mode matches; not
        # root-caused). "on" still fuses beam off-TPU for the interpret tests.
        return False
    Bq = self_batch if self_batch is not None else batch
    if Bq % batch:
        return False
    if cfg.d_model % 128 or cfg.inner_dim % 128 or cfg.d_ff % 128:
        return False
    if (Bq * cfg.num_heads) % 8:
        return False
    if mode == "auto" and (cfg.d_model > 1024 or cfg.num_heads > 16):
        # Measured on chip (2026-08-19, tools/bench_greedy_fused.py, one
        # process each): fused WINS through t5-large / v1_1-base dims (1.3-1.7x,
        # CLAUDE.md decode rows) but LOSES at t5-xl (d_model 2048, H=32):
        # 2511.5 vs 1632.5 ms/gen = 0.65x — the per-(b,h) VPU attention loops
        # and (D, B) residual-stream ops scale with H and D while the XLA scan
        # stays matmul-shaped. Same failure mode as the closed beam fusion.
        # "on" still forces fusion for experiments.
        return False
    if mode == "auto":
        from atlas_tpu.ops.decode_fused import FUSED_VMEM_BUDGET, fused_vmem_bytes

        int8 = getattr(cfg, "decode_cache_dtype", "bf16") == "int8"
        d = _fused_dims(cfg, Bq, batch, Lk, max_len, int8)  # block cascade inside
        if fused_vmem_bytes(d) > FUSED_VMEM_BUDGET:
            return False
    return True


def _quant_rows_int8(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-row symmetric int8 over the LAST (contraction) axis:
    w ≈ q * s[..., None]. Rows of the fused kernel's pre-transposed weight
    stacks are output channels, so this is standard per-output-channel
    weight-only quantization; the kernel rescales matmul result rows by s
    (exact for blocked contractions — the scale distributes over partial
    sums)."""
    a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-1)
    s = jnp.maximum(a, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s[..., None]), -127, 127)
    return q.astype(jnp.int8), s.astype(jnp.float32)


def _quant_cols_int8(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-COLUMN symmetric int8 over the second-to-last (contraction)
    axis: w ≈ q * s[..., None, :]. The XLA scan step's weights contract
    activations as h @ w, so output channels are columns there; the step
    rescales matmul result columns by s (same scheme as _quant_rows_int8 on
    the fused kernel's transposed stacks)."""
    a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    s = jnp.maximum(a, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s[..., 0, :].astype(jnp.float32)


def _build_fused_cache(
    params, cfg: T5Config, ck, cv, kscale, vscale, encoder_mask, bias_table,
    max_len: int, self_batch: int,
) -> Dict[str, jnp.ndarray]:
    """Column-grouped cache + packed weight stacks for the fused decode kernel.

    ck/cv: (nL, B, H, Lk, Dh) cross K/V (int8 codes or compute dtype);
    kscale/vscale: (nL, B, H, Lk) f32 or None; self_batch = B*beams query rows
    (the self cache carries every beam, the cross cache one copy per row).
    Layouts are documented in ops/decode_fused.py; everything here is one-time
    per generate() call and amortizes over the generated tokens."""
    from atlas_tpu.ops.decode_fused import pad_lk, pad_tmax, pad_vocab

    nL, B, H, Lk, Dh = ck.shape
    I, D = H * Dh, cfg.d_model
    dt = cfg.dtype
    Lkp = pad_lk(Lk)
    Tmaxp = pad_tmax(max_len)

    def colify(x):  # (nL, B, H, Lk, Dh) -> (nL, B*I, Lkp), r = (b*H+h)*Dh+d
        x = jnp.swapaxes(x, 3, 4).reshape(nL, B * I, Lk)
        return jnp.pad(x, ((0, 0), (0, 0), (0, Lkp - Lk)))

    cache: Dict[str, jnp.ndarray] = {
        "self_k_col": jnp.zeros((nL, self_batch * I, Tmaxp), dtype=dt),
        "self_v_col": jnp.zeros((nL, self_batch * I, Tmaxp), dtype=dt),
        "cross_k_col": colify(ck),
        "cross_v_col": colify(cv),
        "cross_bias2d": jnp.pad(
            make_attention_bias(encoder_mask).reshape(B, Lk),
            ((0, 0), (0, Lkp - Lk)), constant_values=NEG_INF,
        ).astype(jnp.float32),
        # (T, H, Tmaxp): row `pos` is that step's rel-pos + causal bias
        "self_bias_colT": jnp.pad(
            bias_table, ((0, 0), (0, 0), (0, Tmaxp - bias_table.shape[-1])),
            constant_values=NEG_INF,
        ).transpose(1, 0, 2),
    }
    if kscale is not None:
        pad = ((0, 0), (0, 0), (0, 0), (0, Lkp - Lk))
        cache["ks"] = jnp.pad(kscale, pad, constant_values=1.0)  # (nL, B, H, Lkp)
        cache["vs"] = jnp.pad(vscale, pad, constant_values=1.0)

    layers = params["decoder"]["layers"]
    sa, ca, ffn = layers["self_attn"], layers["cross_attn"], layers["ffn"]
    gated = cfg.feed_forward_proj == "gated-gelu"
    lnrows = jnp.stack(
        [
            layers["ln1"], layers["ln2"], layers["ln3"],
            jnp.broadcast_to(params["decoder"]["final_ln"], layers["ln1"].shape),
        ],
        axis=1,
    )  # (nL, 4, D)
    # lm head as (V, D) rows: tied = shared as-is, untied = lm_head transposed
    wlm = params["shared"] if cfg.tie_word_embeddings else params["lm_head"].T
    V = wlm.shape[0]
    Vp = pad_vocab(V)
    wlm = jnp.pad(wlm, ((0, Vp - V), (0, 0)))
    cache["fused_w"] = {
        "wqkvT": jnp.concatenate([sa["q"], sa["k"], sa["v"]], axis=-1)
        .swapaxes(1, 2).astype(dt),  # (nL, 3I, D)
        "lnsT": jnp.pad(lnrows, ((0, 0), (0, 4), (0, 0))).swapaxes(1, 2).astype(dt),
        "self_oT": sa["o"].swapaxes(1, 2).astype(dt),  # (nL, D, I)
        "cross_qT": ca["q"].swapaxes(1, 2).astype(dt),  # (nL, I, D)
        "cross_oT": ca["o"].swapaxes(1, 2).astype(dt),  # (nL, D, I)
        "wiT": (ffn["wi_0"] if gated else ffn["wi"]).swapaxes(1, 2).astype(dt),
        "wi1T": ffn["wi_1"].swapaxes(1, 2).astype(dt)
        if gated else jnp.zeros((1, 8, 128), dt),
        "woT": ffn["wo"].swapaxes(1, 2).astype(dt),  # (nL, D, F)
        "wlm": wlm.astype(dt),  # (Vp, D)
    }
    if getattr(cfg, "decode_weights", "bf16") == "int8":
        fw = cache["fused_w"]

        def q8(name):
            fw[name], s = _quant_rows_int8(fw[name])
            return s

        def lanes8(s):  # (..., R) -> (..., R, 8) f32, value broadcast over lanes
            return jnp.broadcast_to(s[..., None], s.shape + (8,))

        s_qkv, s_cq = q8("wqkvT"), q8("cross_qT")  # (nL, 3I) / (nL, I)
        s_so, s_co, s_wo = q8("self_oT"), q8("cross_oT"), q8("woT")  # (nL, D)
        s_wi = q8("wiT")  # (nL, F)
        s_wi1 = q8("wi1T") if gated else jnp.ones_like(s_wi)
        s_lm = q8("wlm")  # (Vp,)
        fw["sqkv"], fw["scq"], fw["slm"] = lanes8(s_qkv), lanes8(s_cq), lanes8(s_lm)
        # sD lanes: 0 = self_o, 1 = cross_o, 2 = wo; sF: 0 = wi, 1 = wi_1
        fw["sD"] = jnp.pad(jnp.stack([s_so, s_co, s_wo], -1), ((0, 0), (0, 0), (0, 5)))
        fw["sF"] = jnp.pad(jnp.stack([s_wi, s_wi1], -1), ((0, 0), (0, 0), (0, 6)))
    return cache


def _fused_t5_decode_step(
    params, cfg: T5Config, tokens: jnp.ndarray, pos: jnp.ndarray,
    cache: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    from atlas_tpu.ops.decode_fused import fused_decode_step

    w = cache["fused_w"]
    B = tokens.shape[0]  # query rows = batch * beams
    H, Dh = cfg.num_heads, cfg.d_kv
    I = H * Dh
    nL, _, Tmax = cache["self_k_col"].shape
    Lk = cache["cross_k_col"].shape[-1]
    Bc = cache["cross_k_col"].shape[1] // I
    # ONE geometry source: the same _fused_dims the VMEM gate estimated with
    # (cache dims are pad_* fixed points, so re-padding is the identity)
    d = _fused_dims(cfg, B, Bc, Lk, Tmax, "ks" in cache,
                    int8w=w["wqkvT"].dtype == jnp.int8)
    assert (d.nL, d.Tmax, d.Lk, d.V) == (nL, Tmax, Lk, w["wlm"].shape[0]), (
        d, cache["self_k_col"].shape, w["wlm"].shape)
    x = jnp.take(params["shared"], tokens, axis=0).astype(cfg.dtype)  # (B, D)
    sb = cache["self_bias_colT"][pos]  # (H, Tmax) f32
    sbias = jnp.broadcast_to(sb[None], (B, H, Tmax))
    logitsT, sk, sv = fused_decode_step(d, pos, x.T, w, cache, sbias)
    V = params["shared"].shape[0]
    return logitsT[:V].T, dict(cache, self_k_col=sk, self_v_col=sv)


def init_decode_cache(
    params, cfg: T5Config, encoder_hidden: jnp.ndarray, encoder_mask: jnp.ndarray,
    max_len: int, self_batch: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """Build the KV cache: cross-attention K/V precomputed once per layer (vmapped
    over the stacked layer axis), zeroed self-attention K/V of length max_len.

    For beam search pass self_batch = rows*beams: the self cache carries every beam
    while the cross cache stays one copy per row (see t5_decode_step beam_size)."""
    B = encoder_hidden.shape[0]
    H, Dh = cfg.num_heads, cfg.d_kv
    enc = encoder_hidden.astype(cfg.dtype)

    def proj(w):  # (nL, D, I) -> (nL, B, H, Lk, Dh)
        return jax.vmap(lambda wl: _split_heads(enc @ wl, H))(w)

    ca = params["decoder"]["layers"]["cross_attn"]
    sa = params["decoder"]["layers"]["self_attn"]
    nL = ca["k"].shape[0]
    sb = self_batch if self_batch is not None else B
    # decode-step op-count reductions (the step is dispatch-bound at small B):
    # one fused qkv matmul instead of three, and the full (H, T, T) self bias
    # (rel-pos buckets + causal mask) precomputed once — sliced per step instead
    # of re-bucketing every token
    wqkv = jnp.concatenate([sa["q"], sa["k"], sa["v"]], axis=-1)  # (nL, D, 3I)
    tpos = jnp.arange(max_len)
    bias_table = compute_position_bias(
        params["decoder"]["rel_bias"].astype(jnp.float32), tpos, tpos,
        bidirectional=False,
        num_buckets=cfg.relative_attention_num_buckets,
        max_distance=cfg.relative_attention_max_distance,
    )[0] + jnp.where(tpos[:, None] >= tpos[None, :], 0.0, NEG_INF)[None]  # (H,T,T)
    kscale = vscale = None
    if getattr(cfg, "decode_cache_dtype", "bf16") == "int8":
        # per-key-vector symmetric int8: k = k_q * ks with ks = max|k| / 127 over
        # Dh. Exact per-key rescale: q.k = (q.k_q) * ks applied to the score, and
        # p.v = (p * vs) . v_q folded into the probabilities — the cache read
        # (the decode bandwidth floor at Lk = N*L) halves.
        #
        # Built ONE LAYER AT A TIME (lax.map, a sequential scan): quantization
        # routes the cross K/V through f32, and at t5-xl shapes the all-layer
        # f32 stack is 7.5G that XLA materializes (with a 2x layout-padding
        # copy on top — 15G, a hard OOM on a 16G chip). Per-layer the f32
        # temp is 1/nL of that; the codes are the only all-layer tensors.
        def quant(x):  # (B, H, Lk, Dh) -> int8 codes + (B, H, Lk) scales
            a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
            s = jnp.maximum(a, 1e-8) / 127.0
            codes = jnp.clip(jnp.round(x.astype(jnp.float32) / s[..., None]),
                             -127, 127).astype(jnp.int8)
            return codes, s.astype(jnp.float32)

        def build_layer(wkv):
            wk, wv = wkv
            kc, ks = quant(_split_heads(enc @ wk, H))
            vc, vs = quant(_split_heads(enc @ wv, H))
            return kc, ks, vc, vs

        ck, kscale, cv, vscale = jax.lax.map(build_layer, (ca["k"], ca["v"]))
    else:
        ck, cv = proj(ca["k"]), proj(ca["v"])

    if _fused_decode_ok(cfg, B, self_batch, encoder_mask.shape[-1], max_len):
        return _build_fused_cache(
            params, cfg, ck, cv, kscale, vscale, encoder_mask, bias_table,
            max_len, sb,
        )

    cache = {
        "self_k": jnp.zeros((nL, sb, H, max_len, Dh), dtype=cfg.dtype),
        "self_v": jnp.zeros((nL, sb, H, max_len, Dh), dtype=cfg.dtype),
        "cross_bias": make_attention_bias(encoder_mask),  # (B,1,1,Lk)
        "wqkv": wqkv,
        "self_bias_table": bias_table,
    }
    if kscale is not None:
        cache["cross_k"], cache["cross_k_scale"] = ck, kscale
        cache["cross_v"], cache["cross_v_scale"] = cv, vscale
    else:
        cache["cross_k"], cache["cross_v"] = ck, cv
    if getattr(cfg, "decode_weights", "bf16") == "int8":
        # XLA-scan-step weight-only int8 (the beam path and sharded multi-chip
        # decoding ride this step; greedy single-chip TPU decoding fuses and
        # quantizes inside _build_fused_cache instead). Per-output-column
        # codes + f32 scales; the step rescales matmul result columns.
        if _decode_stream_parts(cfg):
            raise ValueError("decode_weights=int8 is incompatible with "
                             "decode_stream parts (kernels read raw params)")
        layers = params["decoder"]["layers"]
        ffn = layers["ffn"]
        gated = cfg.feed_forward_proj == "gated-gelu"
        cache["wqkv"], cache["wqkv_scale"] = _quant_cols_int8(wqkv)
        for key, w in (("self_o", sa["o"]), ("cross_q", ca["q"]),
                       ("cross_o", ca["o"]),
                       ("wi", ffn["wi_0"] if gated else ffn["wi"]),
                       ("wo", ffn["wo"])):
            cache[f"w8_{key}"], cache[f"w8_{key}_scale"] = _quant_cols_int8(w)
        if gated:
            cache["w8_wi1"], cache["w8_wi1_scale"] = _quant_cols_int8(ffn["wi_1"])
        lm = params["shared"].T if cfg.tie_word_embeddings else params["lm_head"]
        cache["w8_lm"], cache["w8_lm_scale"] = _quant_cols_int8(lm)  # (D, V)
    return cache


_STREAM_PARTS = frozenset(("lm", "ffn", "qkv", "proj"))
# Measured on v5e (t5-base FiD greedy, B=8, N=20, L=256, int8 cache, ms/gen of 32
# tokens): off 223.7, lm 223.5, ffn 228.6, qkv 225.4, proj 224.4, all-on 263.5
# (bf16 cache). NO part wins: XLA already overlaps the decode step's weight
# streams with compute, so the step is critical-path/dispatch-bound and each
# pallas_call adds fixed launch cost (~13us) without buying bandwidth. The
# kernels stay available as a tuning surface for other chips/shapes; "auto"
# therefore streams nothing.
_AUTO_PARTS = frozenset()


def _decode_stream_parts(cfg: T5Config) -> frozenset:
    """decode_stream = "auto" | "on" | "off" | comma-set of {lm,ffn,qkv,proj}."""
    mode = getattr(cfg, "decode_stream", "auto")
    if mode == "on":
        return _STREAM_PARTS
    if mode == "off":
        return frozenset()
    if mode == "auto":
        return _AUTO_PARTS if jax.default_backend() == "tpu" else frozenset()
    parts = frozenset(p.strip() for p in mode.split(",") if p.strip())
    unknown = parts - _STREAM_PARTS
    if unknown:
        raise ValueError(f"decode_stream: unknown parts {sorted(unknown)}")
    return parts


def t5_decode_step(
    params, cfg: T5Config, tokens: jnp.ndarray, pos: jnp.ndarray,
    cache: Dict[str, jnp.ndarray], beam_size: int = 1,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One incremental decode step: tokens (B,) at position `pos` -> (logits (B,V),
    updated cache). Layer stack driven by lax.scan over (params, cache) slices.

    With beam_size=K > 1, tokens/self-cache carry B = rows*K flattened beams while
    the cross K/V cache stays UNREPLICATED at `rows` — beams of a row share their
    encoder states, so the cross attention contracts (rows, K, H, d) against
    (rows, H, Lk, d) directly instead of copying the multi-GB cross cache K times.

    Matmuls named in _decode_stream_parts go through the streaming Pallas kernels:
    for those, the layer scan carries only the LAYER INDEX and the kernel reads the
    full stacked weight array by scalar-prefetched index — slicing weights into
    scan xs would materialize an HBM copy per layer in front of each opaque kernel
    call.

    A cache built by _build_fused_cache (greedy decoding on TPU) routes to the
    single-kernel fused step instead — see ops/decode_fused.py.
    """
    if "cross_k_col" in cache:
        # beam_size is implicit in the cache geometry (query rows / cross rows)
        return _fused_t5_decode_step(params, cfg, tokens, pos, cache)
    B = tokens.shape[0]
    Tmax = cache["self_k"].shape[3]
    x = jnp.take(params["shared"], tokens[:, None], axis=0).astype(cfg.dtype)  # (B,1,D)

    if "self_bias_table" in cache:
        # precomputed rel-pos + causal table (init_decode_cache): slice one row
        self_bias = cache["self_bias_table"][:, pos][None, :, None, :]  # (1,H,1,Tmax)
    else:
        kpos = jnp.arange(Tmax)
        self_bias = compute_position_bias(
            params["decoder"]["rel_bias"].astype(jnp.float32),
            pos[None] if pos.ndim == 0 else pos,
            kpos,
            bidirectional=False,
            num_buckets=cfg.relative_attention_num_buckets,
            max_distance=cfg.relative_attention_max_distance,
        )  # (1,H,1,Tmax)
        self_bias = self_bias + jnp.where(kpos <= pos, 0.0, NEG_INF)[None, None, None, :]
    cross_bias = cache["cross_bias"]
    sa = params["decoder"]["layers"]["self_attn"]
    wqkv = cache.get("wqkv")
    if wqkv is None:  # cache built by an older init: fuse on the fly
        wqkv = jnp.concatenate([sa["q"], sa["k"], sa["v"]], axis=-1)
    inner = cfg.inner_dim

    int8_cache = "cross_k_scale" in cache
    w8 = "w8_lm" in cache  # weight-only int8 stacks (init_decode_cache)
    parts = frozenset() if w8 else _decode_stream_parts(cfg)
    s_lm, s_ffn = "lm" in parts, "ffn" in parts
    s_qkv, s_proj = "qkv" in parts, "proj" in parts
    layers = params["decoder"]["layers"]
    gated = cfg.feed_forward_proj == "gated-gelu"

    def qmm(h, q, s):  # int8 weight matmul: per-output-column rescale
        return ((h @ q.astype(h.dtype)) * s).astype(h.dtype)

    def layer(x, xs):
        def proj(h, lp, idx, plain_key, w8_key, stream_w=None):
            """One projection, dispatched once: int8 codes+scale (w8) /
            streaming Pallas kernel (decode_stream) / plain scan-slice matmul."""
            if w8:
                return qmm(h, lp[w8_key], lp[w8_key + "_scale"])
            if stream_w is not None:
                return stream_matmul_stacked(h[:, 0], stream_w, idx)[:, None]
            return h @ lp[plain_key]
        if int8_cache:
            idx, lp, sk, sv, ck, cv, ks, vs = xs
        else:
            idx, lp, sk, sv, ck, cv = xs
            ks = vs = None
        h = rms_norm(x, lp["ln1"], cfg.layer_norm_epsilon)
        # (B, 1, 3I): one matmul instead of three
        qkv = proj(h, lp, idx, "wqkv", "wqkv", wqkv if s_qkv else None)
        q = _split_heads(qkv[..., :inner], cfg.num_heads)
        new_k = _split_heads(qkv[..., inner : 2 * inner], cfg.num_heads)  # (B,H,1,Dh)
        new_v = _split_heads(qkv[..., 2 * inner :], cfg.num_heads)
        sk = jax.lax.dynamic_update_slice(sk, new_k.astype(sk.dtype), (0, 0, pos, 0))
        sv = jax.lax.dynamic_update_slice(sv, new_v.astype(sv.dtype), (0, 0, pos, 0))
        a = dot_product_attention(q, sk, sv, bias=self_bias)
        am = _merge_heads(a)
        x = x + proj(am, lp, idx, "self_o", "w8_self_o",
                     layers["self_attn"]["o"] if s_proj else None)
        h = rms_norm(x, lp["ln2"], cfg.layer_norm_epsilon)
        cq = proj(h, lp, idx, "cross_q", "w8_cross_q",
                  layers["cross_attn"]["q"] if s_proj else None)
        q = _split_heads(cq, cfg.num_heads)  # (B,H,1,Dh)
        kf = ck.astype(q.dtype) if int8_cache else ck  # int8 codes -> compute dtype
        vf = cv.astype(q.dtype) if int8_cache else cv
        if beam_size > 1:
            rows = B // beam_size
            qb = q.reshape(rows, beam_size, cfg.num_heads, cfg.d_kv)
            scores = jnp.einsum("rkhd,rhld->rkhl", qb, kf,
                                preferred_element_type=jnp.float32)
            if int8_cache:
                scores = scores * ks[:, None, :, :]  # (rows,H,Lk) per-key rescale
            scores = scores + cross_bias[:, None, :, 0, :]  # (rows,1,1,Lk) -> bcast
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            if int8_cache:
                probs = probs * vs[:, None, :, :]  # fold v scales into the probs
            probs = probs.astype(q.dtype)
            ab = jnp.einsum("rkhl,rhld->rkhd", probs, vf)
            a = ab.reshape(B, cfg.num_heads, 1, cfg.d_kv)
        elif int8_cache:
            scores = jnp.einsum("bhqd,bhld->bhql", q, kf,
                                preferred_element_type=jnp.float32)
            scores = scores * ks[:, :, None, :] + cross_bias
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            a = jnp.einsum("bhql,bhld->bhqd", (probs * vs[:, :, None, :]).astype(q.dtype), vf)
        else:
            a = dot_product_attention(q, ck, cv, bias=cross_bias)
        am = _merge_heads(a)
        x = x + proj(am, lp, idx, "cross_o", "w8_cross_o",
                     layers["cross_attn"]["o"] if s_proj else None)
        h = rms_norm(x, lp["ln3"], cfg.layer_norm_epsilon)
        if w8:
            a8 = (h @ lp["w8_wi"].astype(h.dtype)) * lp["w8_wi_scale"]
            if gated:
                a8 = jax.nn.gelu(a8, approximate=True) * (
                    (h @ lp["w8_wi1"].astype(h.dtype)) * lp["w8_wi1_scale"])
            else:
                a8 = jnp.maximum(a8, 0.0)
            x = x + qmm(a8.astype(h.dtype), lp["w8_wo"], lp["w8_wo_scale"])
        elif s_ffn:
            if gated:
                f = stream_ffn_stacked(
                    h[:, 0], layers["ffn"]["wi_0"], layers["ffn"]["wo"], idx,
                    wi1=layers["ffn"]["wi_1"], gated=True,
                )
            else:
                f = stream_ffn_stacked(h[:, 0], layers["ffn"]["wi"], layers["ffn"]["wo"], idx)
            x = x + f[:, None]
        else:
            x = x + _ffn_apply(lp["ffn"], h, cfg, True, None)
        return x, (sk, sv)

    # xs carries ONLY what the XLA ops consume per layer: weights routed through a
    # streaming kernel are read from the full stacked arrays by prefetched index
    # (a sliced scan input feeding an opaque pallas_call would be copied per layer)
    nL = layers["ln1"].shape[0]
    lp_xs = {k: layers[k] for k in ("ln1", "ln2", "ln3")}
    if w8:
        lp_xs["wqkv"], lp_xs["wqkv_scale"] = wqkv, cache["wqkv_scale"]
        w8_keys = ("self_o", "cross_q", "cross_o", "wi", "wo") + (
            ("wi1",) if gated else ())
        for key in w8_keys:
            lp_xs[f"w8_{key}"] = cache[f"w8_{key}"]
            lp_xs[f"w8_{key}_scale"] = cache[f"w8_{key}_scale"]
    else:
        if not s_qkv:
            lp_xs["wqkv"] = wqkv
        if not s_proj:
            lp_xs["self_o"] = layers["self_attn"]["o"]
            lp_xs["cross_q"] = layers["cross_attn"]["q"]
            lp_xs["cross_o"] = layers["cross_attn"]["o"]
        if not s_ffn:
            lp_xs["ffn"] = layers["ffn"]
    xs = (jnp.arange(nL, dtype=jnp.int32), lp_xs, cache["self_k"],
          cache["self_v"], cache["cross_k"], cache["cross_v"])
    if int8_cache:
        xs = xs + (cache["cross_k_scale"], cache["cross_v_scale"])
    (x), (new_sk, new_sv) = jax.lax.scan(
        layer, x, xs,
        unroll=max(1, getattr(cfg, "decode_scan_unroll", 1)),
    )
    x = rms_norm(x, params["decoder"]["final_ln"], cfg.layer_norm_epsilon)
    if w8:
        x2 = x[:, 0]
        if cfg.tie_word_embeddings:
            x2 = x2 * (cfg.d_model**-0.5)
        logits = ((x2 @ cache["w8_lm"].astype(x2.dtype))
                  * cache["w8_lm_scale"]).astype(jnp.float32)
    elif s_lm:
        x2 = x[:, 0]
        if cfg.tie_word_embeddings:
            logits = stream_matmul(
                x2 * (cfg.d_model**-0.5), params["shared"].astype(x2.dtype),
                transpose_w=True, out_dtype=jnp.float32,
            )
        else:
            logits = stream_matmul(
                x2, params["lm_head"].astype(x2.dtype), out_dtype=jnp.float32)
    else:
        logits = _lm_logits(params, cfg, x)[:, 0]  # (B, V)
    cache = dict(cache, self_k=new_sk, self_v=new_sv)
    return logits, cache


def t5_forward(
    params,
    cfg: T5Config,
    input_ids,
    attention_mask,
    decoder_input_ids,
    labels=None,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    capture_cross_attn: bool = False,
):
    """Full encoder-decoder forward. Returns (loss_or_None, logits, cross_attn_stats)."""
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    enc = t5_encode(params, cfg, input_ids, attention_mask, deterministic, r1)
    logits, stats = t5_decode(
        params, cfg, decoder_input_ids, enc, attention_mask,
        deterministic=deterministic, rng=r2, capture_cross_attn=capture_cross_attn,
    )
    loss = cross_entropy(logits, labels) if labels is not None else None
    return loss, logits, stats
