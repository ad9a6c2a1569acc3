"""GSPMD sharding rules for model params, optimizer state, and batches.

TPU-native replacement for the reference's parallelism wrappers (SURVEY.md §2
checklist): DDP / fairscale ShardedDataParallel + OSS (train.py:198-216,
util.py:173-178) become sharding ANNOTATIONS — batch over "dp" (gradients psum'd by
GSPMD), Megatron-style tensor parallelism of the T5/BERT matmuls over "mp", optimizer
state inheriting its param's spec (ZeRO-by-annotation).

Param layout reminder (models/t5.py, models/bert.py): every layer stack leaf carries a
leading n_layers axis; projection leaves are (nL, in, out).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def t5_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """Megatron TP over "mp": attention q/k/v and ffn wi split the inner/head axis,
    o and wo split the input axis (so each pair forms a col-split @ row-split with a
    single psum inserted by GSPMD); embeddings/lm_head split the vocab axis."""

    def attn(_):
        return {"q": P(None, None, "mp"), "k": P(None, None, "mp"),
                "v": P(None, None, "mp"), "o": P(None, "mp", None)}

    def ffn(f):
        if "wi_0" in f:
            return {"wi_0": P(None, None, "mp"), "wi_1": P(None, None, "mp"),
                    "wo": P(None, "mp", None)}
        return {"wi": P(None, None, "mp"), "wo": P(None, "mp", None)}

    specs: Dict[str, Any] = {
        "shared": P("mp", None),
        "encoder": {
            "rel_bias": P(),
            "final_ln": P(),
            "layers": {
                "self_attn": attn(None),
                "ln1": P(),
                "ffn": ffn(params["encoder"]["layers"]["ffn"]),
                "ln2": P(),
            },
        },
        "decoder": {
            "rel_bias": P(),
            "final_ln": P(),
            "layers": {
                "self_attn": attn(None),
                "ln1": P(),
                "cross_attn": attn(None),
                "ln2": P(),
                "ffn": ffn(params["decoder"]["layers"]["ffn"]),
                "ln3": P(),
            },
        },
    }
    if "lm_head" in params:
        specs["lm_head"] = P(None, "mp")
    return specs


def bert_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    wb_col = {"w": P(None, None, "mp"), "b": P(None, "mp")}
    wb_row = {"w": P(None, "mp", None), "b": P(None, None)}
    ln = {"w": P(), "b": P()}
    ln_l = {"w": P(None, None), "b": P(None, None)}
    return {
        "embeddings": {"word": P("mp", None), "position": P(), "token_type": P(), "ln": ln},
        "layers": {
            "attn": {"q": wb_col, "k": wb_col, "v": wb_col, "o": wb_row, "ln": ln_l},
            "ffn": {"wi": wb_col, "wo": wb_row, "ln": ln_l},
        },
    }


def retriever_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    if "contriever" in params:
        return {"contriever": bert_param_specs(params["contriever"])}
    return {
        "query_contriever": bert_param_specs(params["query_contriever"]),
        "passage_contriever": bert_param_specs(params["passage_contriever"]),
    }


def atlas_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    if params.get("reader") is not None:
        out["reader"] = t5_param_specs(params["reader"])
    if params.get("retriever") is not None:
        out["retriever"] = retriever_param_specs(params["retriever"])
    return out


def to_shardings(mesh: Mesh, specs):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_specs(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Every batch array is sharded over its leading (global batch) axis."""
    return {k: P("dp") for k in batch}


def shard_params(mesh: Mesh, params, specs=None):
    """Place a param tree onto the mesh with the given (or derived) specs."""
    if specs is None:
        specs = atlas_param_specs(params)
    shardings = to_shardings(mesh, specs)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), params, shardings)


# Optimizer-state sharding: adam mu/nu mirror the param tree, so initializing the
# state inside jit with already-sharded params (jax.jit(opt.init)(params)) lets XLA
# propagate each param's sharding onto its moments — ZeRO-by-annotation with no
# explicit spec plumbing. See train/state.py.
