"""Convert HuggingFace/torch checkpoints into atlas_tpu param pytrees.

Covers the reference's init sources (/root/reference/src/model_io.py:41-84: T5 readers
+ facebook/contriever BERT) and the released Atlas `.pth.tar` checkpoints
(model_io.py:127-167: keys prefixed `reader.` / `retriever.`, with tied→untied
retriever surgery at :62-71 handled by contriever.untie_retriever).

All converters take a flat `state_dict`-like Mapping[str, np.ndarray]; torch Linear
weights (out,in) are transposed to our (in,out) convention.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp

from atlas_tpu.models.bert import BertConfig
from atlas_tpu.models.t5 import T5Config


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _stack_t(sd: Mapping, fmt: str, n: int, transpose: bool = True) -> jnp.ndarray:
    mats = [_np(sd[fmt.format(i=i)]) for i in range(n)]
    if transpose:
        mats = [m.T for m in mats]
    return jnp.asarray(np.stack(mats))


def t5_params_from_state_dict(sd: Mapping[str, Any], cfg: T5Config, prefix: str = "") -> Dict[str, Any]:
    p = prefix
    nl, nd = cfg.num_layers, cfg.num_decoder_layers

    def attn(stack: str, i_layer: int, mod: str):
        base = f"{p}{stack}.block.{{i}}.layer.{i_layer}.{mod}"
        return {
            "q": _stack_t(sd, base + ".q.weight", nl if stack == "encoder" else nd),
            "k": _stack_t(sd, base + ".k.weight", nl if stack == "encoder" else nd),
            "v": _stack_t(sd, base + ".v.weight", nl if stack == "encoder" else nd),
            "o": _stack_t(sd, base + ".o.weight", nl if stack == "encoder" else nd),
        }

    def ln(stack: str, i_layer: int, n: int):
        return _stack_t(sd, f"{p}{stack}.block.{{i}}.layer.{i_layer}.layer_norm.weight", n, transpose=False)

    def ffn(stack: str, i_layer: int, n: int):
        base = f"{p}{stack}.block.{{i}}.layer.{i_layer}.DenseReluDense"
        if cfg.feed_forward_proj == "gated-gelu":
            return {
                "wi_0": _stack_t(sd, base + ".wi_0.weight", n),
                "wi_1": _stack_t(sd, base + ".wi_1.weight", n),
                "wo": _stack_t(sd, base + ".wo.weight", n),
            }
        return {"wi": _stack_t(sd, base + ".wi.weight", n), "wo": _stack_t(sd, base + ".wo.weight", n)}

    params = {
        "shared": jnp.asarray(_np(sd[f"{p}shared.weight"])),
        "encoder": {
            "rel_bias": jnp.asarray(
                _np(sd[f"{p}encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"])
            ),
            "layers": {
                "self_attn": attn("encoder", 0, "SelfAttention"),
                "ln1": ln("encoder", 0, nl),
                "ffn": ffn("encoder", 1, nl),
                "ln2": ln("encoder", 1, nl),
            },
            "final_ln": jnp.asarray(_np(sd[f"{p}encoder.final_layer_norm.weight"])),
        },
        "decoder": {
            "rel_bias": jnp.asarray(
                _np(sd[f"{p}decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"])
            ),
            "layers": {
                "self_attn": attn("decoder", 0, "SelfAttention"),
                "ln1": ln("decoder", 0, nd),
                "cross_attn": attn("decoder", 1, "EncDecAttention"),
                "ln2": ln("decoder", 1, nd),
                "ffn": ffn("decoder", 2, nd),
                "ln3": ln("decoder", 2, nd),
            },
            "final_ln": jnp.asarray(_np(sd[f"{p}decoder.final_layer_norm.weight"])),
        },
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(_np(sd[f"{p}lm_head.weight"]).T)
    return params


def bert_params_from_state_dict(sd: Mapping[str, Any], cfg: BertConfig, prefix: str = "") -> Dict[str, Any]:
    p, n = prefix, cfg.num_hidden_layers

    def wb(fmt: str, transpose: bool = True):
        return {
            "w": _stack_t(sd, f"{p}{fmt}.weight", n, transpose=transpose),
            "b": _stack_t(sd, f"{p}{fmt}.bias", n, transpose=False),
        }

    return {
        "embeddings": {
            "word": jnp.asarray(_np(sd[f"{p}embeddings.word_embeddings.weight"])),
            "position": jnp.asarray(_np(sd[f"{p}embeddings.position_embeddings.weight"])),
            "token_type": jnp.asarray(_np(sd[f"{p}embeddings.token_type_embeddings.weight"])),
            "ln": {
                "w": jnp.asarray(_np(sd[f"{p}embeddings.LayerNorm.weight"])),
                "b": jnp.asarray(_np(sd[f"{p}embeddings.LayerNorm.bias"])),
            },
        },
        "layers": {
            "attn": {
                "q": wb("encoder.layer.{i}.attention.self.query"),
                "k": wb("encoder.layer.{i}.attention.self.key"),
                "v": wb("encoder.layer.{i}.attention.self.value"),
                "o": wb("encoder.layer.{i}.attention.output.dense"),
                "ln": wb("encoder.layer.{i}.attention.output.LayerNorm", transpose=False),
            },
            "ffn": {
                "wi": wb("encoder.layer.{i}.intermediate.dense"),
                "wo": wb("encoder.layer.{i}.output.dense"),
                "ln": wb("encoder.layer.{i}.output.LayerNorm", transpose=False),
            },
        },
    }


def t5_config_from_hf(hf_config) -> T5Config:
    ffn = "gated-gelu" if "gated" in getattr(hf_config, "feed_forward_proj", "relu") else "relu"
    return T5Config(
        vocab_size=hf_config.vocab_size,
        d_model=hf_config.d_model,
        d_kv=hf_config.d_kv,
        d_ff=hf_config.d_ff,
        num_layers=hf_config.num_layers,
        num_decoder_layers=hf_config.num_decoder_layers,
        num_heads=hf_config.num_heads,
        relative_attention_num_buckets=hf_config.relative_attention_num_buckets,
        relative_attention_max_distance=getattr(hf_config, "relative_attention_max_distance", 128),
        dropout_rate=hf_config.dropout_rate,
        layer_norm_epsilon=hf_config.layer_norm_epsilon,
        feed_forward_proj=ffn,
        tie_word_embeddings=hf_config.tie_word_embeddings,
        decoder_start_token_id=hf_config.decoder_start_token_id,
        pad_token_id=hf_config.pad_token_id,
    )


def bert_config_from_hf(hf_config) -> BertConfig:
    return BertConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_hidden_layers=hf_config.num_hidden_layers,
        num_attention_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        type_vocab_size=hf_config.type_vocab_size,
        layer_norm_eps=hf_config.layer_norm_eps,
    )
