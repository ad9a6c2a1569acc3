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
    # keys present in `params` must stay present in the spec tree even when
    # the tower is absent (closed_book / retrieve_only carry None): jax.tree
    # treats None as an empty subtree, but a MISSING dict key is a structure
    # mismatch that fails tree_map(params, shardings) at train() start.
    out: Dict[str, Any] = {}
    if "reader" in params:
        out["reader"] = (t5_param_specs(params["reader"])
                         if params["reader"] is not None else None)
    if "retriever" in params:
        out["retriever"] = (retriever_param_specs(params["retriever"])
                            if params["retriever"] is not None else None)
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


def put_global(x, sharding):
    """Place a leaf onto a (possibly multi-process) NamedSharding.

    Host arrays can't device_put onto non-addressable shardings; every process
    holds the SAME full array (npz checkpoints store replicated host copies), so
    each contributes its addressable slices via make_array_from_callback.
    """
    import numpy as np

    if isinstance(x, jax.Array) or jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def place_like(new, old):
    """Place `new` where `old` lives; pass through when already there."""
    if not hasattr(old, "sharding") or not hasattr(new, "shape"):
        return new
    if isinstance(new, jax.Array) and new.sharding == old.sharding:
        return new
    return put_global(new, old.sharding)


def shard_params(mesh: Mesh, params, specs=None):
    """Place a param tree onto the mesh with the given (or derived) specs."""
    if specs is None:
        specs = atlas_param_specs(params)
    shardings = to_shardings(mesh, specs)
    return jax.tree.map(put_global, params, shardings)


def _spec_axes(spec) -> set:
    used = set()
    for entry in tuple(spec):
        if entry is None:
            continue
        used.update(entry if isinstance(entry, tuple) else (entry,))
    return used


def fsdp_param_specs(params, specs, dp_size: int, min_size: int = 1024):
    """Widen param specs with "dp" sharding on the largest free divisible axis.

    TPU-native ZeRO/FSDP: the reference shards optimizer state and gradients over
    data-parallel workers with fairscale OSS + ShardedDataParallel
    (/root/reference/src/util.py:173-178, train.py:199-208). Here the PARAMS (and by
    sharding propagation their gradients and Adam moments) are sharded over the "dp"
    mesh axis; XLA inserts the all-gathers/reduce-scatters. Leaves smaller than
    `min_size` elements or with no free axis divisible by dp stay on their base spec.
    """

    def widen(x, spec):
        base = tuple(spec) + (None,) * (x.ndim - len(tuple(spec)))
        if dp_size <= 1 or x.size < min_size or "dp" in _spec_axes(base):
            return P(*base)
        best_dim, best_ax = 0, None
        for ax, (dim, entry) in enumerate(zip(x.shape, base)):
            if entry is None and dim % dp_size == 0 and dim > best_dim:
                best_dim, best_ax = dim, ax
        if best_ax is None:
            return P(*base)
        widened = list(base)
        widened[best_ax] = "dp"
        return P(*widened)

    return jax.tree.map(widen, params, specs)


def batch_spec(x) -> P:
    """Shard an array over its leading (global batch) axis."""
    return P("dp", *([None] * (x.ndim - 1)))


def shard_batch(mesh: Mesh, batch):
    """Place a host-local batch tree onto the mesh, sharded over "dp".

    Single-process: device_put over dp (replicate when the batch size does not
    divide dp — e.g. a ragged final eval batch). Multi-process: each process
    contributes its local rows of the global batch
    (multihost_utils.host_local_array_to_global_array), replacing the reference's
    implicit DDP per-rank batches (train.py:198-216).
    """
    import numpy as np

    batch = jax.tree.map(np.asarray, batch)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        specs = jax.tree.map(batch_spec, batch)
        return multihost_utils.host_local_array_to_global_array(batch, mesh, specs)
    dp = mesh.shape.get("dp", 1)

    def put(x):
        spec = batch_spec(x) if x.ndim > 0 and x.shape[0] % dp == 0 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


# Optimizer-state sharding: adam mu/nu mirror the param tree, so initializing the
# state inside jit with already-sharded params (jax.jit(opt.init)(params)) lets XLA
# propagate each param's sharding onto its moments — ZeRO-by-annotation with no
# explicit spec plumbing. See train/step.py.
