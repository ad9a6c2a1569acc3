"""BERT encoder as pure-functional JAX (retriever backbone).

Behavioral reference: the vendored transformers-4.18 BERT
(/root/reference/src/modeling_bert.py: BertModel :872, BertEncoder :554,
BertSelfAttention :250) — near-stock BERT: learned absolute position + token-type
embeddings with post-embedding LayerNorm, post-norm transformer blocks, 1/sqrt(d)
scaled attention, exact-erf GELU FFN. Same TPU-first choices as t5.py: stacked layer
params driven by lax.scan, fp32 softmax/layernorm statistics, remat via jax.checkpoint.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from atlas_tpu.ops.attention import dot_product_attention, make_attention_bias
from atlas_tpu.ops.flash import flash_attention


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    pad_token_id: int = 0
    dtype: Any = jnp.float32
    remat: bool = False
    # "auto" | "flash" | "xla" — same dispatch policy as T5 (models/t5.py
    # _use_flash): flash wins on training fwd+bwd (no score re-materialization,
    # in-kernel PRNG dropout), XLA stays for short deterministic forwards
    # (the refresh embed path — measured ~6% faster at L<=256 on v5e).
    attn_impl: str = "auto"
    # "auto" | "fused" | "xla" — fused FFN (ops/ffn_fused.py) keeps the (T, F)
    # intermediate in VMEM; forward-only, so auto engages on deterministic TPU
    # forwards (the refresh embed path) where the weights fit VMEM.
    ffn_impl: str = "auto"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def bert_config_for(name: str = "bert-base-uncased", **overrides) -> BertConfig:
    # Contriever is bert-base-uncased (SURVEY.md §2 #7-8); expose large for completeness.
    sizes = {
        "bert-base-uncased": dict(hidden_size=768, num_hidden_layers=12, num_attention_heads=12, intermediate_size=3072),
        "bert-large-uncased": dict(hidden_size=1024, num_hidden_layers=24, num_attention_heads=16, intermediate_size=4096),
    }
    return dataclasses.replace(BertConfig(**sizes[name]), **overrides)


def _normal(rng, shape, std=0.02):
    return std * jax.random.normal(rng, shape, dtype=jnp.float32)


def _init_layer(rng, cfg: BertConfig):
    ks = jax.random.split(rng, 6)
    d, i = cfg.hidden_size, cfg.intermediate_size
    return {
        "attn": {
            "q": {"w": _normal(ks[0], (d, d)), "b": jnp.zeros((d,))},
            "k": {"w": _normal(ks[1], (d, d)), "b": jnp.zeros((d,))},
            "v": {"w": _normal(ks[2], (d, d)), "b": jnp.zeros((d,))},
            "o": {"w": _normal(ks[3], (d, d)), "b": jnp.zeros((d,))},
            "ln": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
        },
        "ffn": {
            "wi": {"w": _normal(ks[4], (d, i)), "b": jnp.zeros((i,))},
            "wo": {"w": _normal(ks[5], (i, d)), "b": jnp.zeros((d,))},
            "ln": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
        },
    }


def init_bert(rng: jax.Array, cfg: BertConfig) -> Dict[str, Any]:
    ks = jax.random.split(rng, 4)
    d = cfg.hidden_size
    layers = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[_init_layer(jax.random.fold_in(ks[3], i), cfg) for i in range(cfg.num_hidden_layers)],
    )
    return {
        "embeddings": {
            "word": _normal(ks[0], (cfg.vocab_size, d)),
            "position": _normal(ks[1], (cfg.max_position_embeddings, d)),
            "token_type": _normal(ks[2], (cfg.type_vocab_size, d)),
            "ln": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
        },
        "layers": layers,
    }


def layer_norm(x, p, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf * p["w"] + p["b"]).astype(x.dtype)


def _dense(x, p):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def _dropout(x, rate, deterministic, rng):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def bert_encode(
    params: Dict[str, Any],
    cfg: BertConfig,
    input_ids: jnp.ndarray,  # (B, L)
    attention_mask: jnp.ndarray,  # (B, L)
    token_type_ids: Optional[jnp.ndarray] = None,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """-> (B, L, hidden) last hidden state."""
    B, L = input_ids.shape
    emb = params["embeddings"]
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    x = (
        jnp.take(emb["word"], input_ids, axis=0)
        + emb["position"][None, :L]
        + jnp.take(emb["token_type"], token_type_ids, axis=0)
    ).astype(cfg.dtype)
    x = layer_norm(x, emb["ln"], cfg.layer_norm_eps)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rng, r0 = jax.random.split(rng)
    x = _dropout(x, cfg.hidden_dropout_prob, deterministic, r0)

    from atlas_tpu.ops.block_attn import block_attention, block_attn_wins
    from atlas_tpu.ops.ffn_fused import ffn_fused, ffn_wins
    from atlas_tpu.ops.flash import flash_wins

    use_flash = flash_wins(cfg.attn_impl, L, L, deterministic=deterministic)
    # short deterministic forwards (the refresh embed path): whole-length
    # single-block attention, scores VMEM-only (ops/block_attn.py)
    use_block = (not use_flash) and block_attn_wins(
        cfg.attn_impl, L, L, cfg.num_attention_heads, deterministic)
    use_ffn = ffn_wins(cfg.ffn_impl, deterministic,
                       cfg.hidden_size, cfg.intermediate_size)
    bias = None if (use_flash or use_block) else make_attention_bias(attention_mask)
    scale = cfg.head_dim**-0.5

    def layer(carry, lp):
        x, rng = carry
        rng, r1, r2, r3 = jax.random.split(rng, 4)
        a = lp["attn"]
        q = _dense(x, a["q"]).reshape(B, L, cfg.num_attention_heads, -1).transpose(0, 2, 1, 3)
        k = _dense(x, a["k"]).reshape(B, L, cfg.num_attention_heads, -1).transpose(0, 2, 1, 3)
        v = _dense(x, a["v"]).reshape(B, L, cfg.num_attention_heads, -1).transpose(0, 2, 1, 3)
        if use_flash:
            out = flash_attention(
                q * scale, k, v, kv_mask=attention_mask,
                dropout_rate=0.0 if deterministic else cfg.attention_probs_dropout_prob,
                dropout_rng=r1,
            )
        elif use_block:
            out = block_attention(q * scale, k, v, kv_mask=attention_mask)
        else:
            out = dot_product_attention(
                q * scale, k, v, bias=bias,
                dropout_rate=cfg.attention_probs_dropout_prob,
                deterministic=deterministic, dropout_rng=r1,
            )
        out = out.transpose(0, 2, 1, 3).reshape(B, L, -1)
        out = _dense(out, a["o"])
        x = layer_norm(x + _dropout(out, cfg.hidden_dropout_prob, deterministic, r2), a["ln"], cfg.layer_norm_eps)
        f = lp["ffn"]
        if use_ffn:
            h = ffn_fused(x.reshape(B * L, -1), f["wi"]["w"], f["wi"]["b"],
                          f["wo"]["w"], f["wo"]["b"]).reshape(B, L, -1)
        else:
            h = jax.nn.gelu(_dense(x, f["wi"]), approximate=False)
            h = _dense(h, f["wo"])
        x = layer_norm(x + _dropout(h, cfg.hidden_dropout_prob, deterministic, r3), f["ln"], cfg.layer_norm_eps)
        return (x, rng), None

    if cfg.remat:
        layer = jax.checkpoint(layer)
    (x, _), _ = jax.lax.scan(layer, (x, rng), params["layers"])
    return x
