"""Analytic per-device HBM accounting for big-reader training (no arrays built).

The reference trains up to 11B readers with fairscale ZeRO + grad checkpointing
(/root/reference/README.md:17,265-274, src/util.py:173-178); whether a given
mesh fits is discovered there by OOM. Here the same question is answered by
geometry: param shapes come from jax.eval_shape over the real initializers, the
sharding denominators from the SAME spec functions the train loop places params
with (parallel/sharding.py), so the plan moves in lockstep with the code.

Accounted per device, mirroring train/step.py's actual live sets:
- fp32 state: params + Adam mu + nu (12 B/param), sharded per FSDP+TP specs
- bf16 compute copy of the param tree (loss_fn casts), sharded the same way
- transient per-scan-step layer gather: one layer slice of every stacked leaf
  all-gathered over "dp" for its matmuls (remat re-gathers, it does not hold)
- fp32 gradients (reduce-scattered onto the param specs) live through the update
- activations under full remat: per-layer saved residuals + encoder output /
  cross-attn K/V + decoder logits + retriever tower
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict

import jax
import jax.numpy as jnp

from atlas_tpu.parallel.sharding import atlas_param_specs, fsdp_param_specs

GiB = 2**30

# HBM per chip (GiB) for the meshes the reference's model family targets
CHIP_HBM_GIB = {"v5e": 16.0, "v5p": 95.0, "v4": 32.0}


def _spec_denominator(leaf, spec, axis_sizes: Dict[str, int], only: str = "") -> int:
    """Product of mesh-axis sizes the spec shards this leaf over."""
    ent = tuple(spec) + (None,) * (leaf.ndim - len(tuple(spec)))
    denom = 1
    for e in ent:
        if e is None:
            continue
        for ax in e if isinstance(e, tuple) else (e,):
            if not only or ax == only:
                denom *= axis_sizes[ax]
    return denom


def _tree_elems_per_device(tree, specs, axis_sizes, only: str = "") -> float:
    leaves = jax.tree.leaves(
        jax.tree.map(
            lambda l, s: math.prod(l.shape) / _spec_denominator(l, s, axis_sizes, only),
            tree, specs,
        )
    )
    return float(sum(leaves))


def _layer_gather_elems(tree, specs, axis_sizes) -> float:
    """One scan step's weights: stacked leaves (leading nL axis) contribute a
    single layer slice, gathered over "dp" but still "mp"-sharded; non-stacked
    leaves (embeddings, lm_head) are gathered whole for their matmul."""

    def one(leaf, spec):
        n = math.prod(leaf.shape)
        if leaf.ndim >= 3:  # layer-stacked (models/t5.py layout)
            n /= leaf.shape[0]
        return n / _spec_denominator(leaf, spec, axis_sizes, only="mp")

    return float(sum(jax.tree.leaves(jax.tree.map(one, tree, specs))))


@dataclasses.dataclass
class MemoryPlan:
    reader_type: str
    dp: int
    mp: int
    state_gib: float  # fp32 params + mu + nu, sharded
    bf16_params_gib: float  # compute-cast tree, sharded
    layer_gather_gib: float  # transient all-gathered scan-step weights
    grads_gib: float  # fp32 grads on the param specs
    activations_gib: float  # full-remat live set
    overhead: float = 1.15  # XLA fragmentation / temp fusion buffers

    @property
    def total_gib(self) -> float:
        return self.overhead * (
            self.state_gib + self.bf16_params_gib + self.layer_gather_gib
            + self.grads_gib + self.activations_gib
        )

    def fits(self, chip: str, headroom: float = 0.9) -> bool:
        return self.total_gib <= CHIP_HBM_GIB[chip] * headroom


def plan_train_memory(
    reader_type: str,
    dp: int,
    mp: int,
    per_device_batch: int = 1,
    n_context: int = 40,
    text_len: int = 384,
    target_len: int = 64,
    train_retriever: bool = True,
    shard_optim: bool = True,
) -> MemoryPlan:
    from atlas_tpu.models.bert import bert_config_for
    from atlas_tpu.models.contriever import init_retriever
    from atlas_tpu.models.t5 import init_t5, t5_config_for

    rcfg = t5_config_for(reader_type, dtype=jnp.bfloat16, remat=True)
    shapes = {"reader": jax.eval_shape(lambda k: init_t5(k, rcfg), jax.random.PRNGKey(0))}
    if train_retriever:
        bcfg = bert_config_for("bert-base-uncased")
        shapes["retriever"] = jax.eval_shape(
            lambda k: init_retriever(k, bcfg), jax.random.PRNGKey(1)
        )
    axis = {"dp": dp, "mp": mp}
    specs = atlas_param_specs(shapes)
    if shard_optim:
        specs = fsdp_param_specs(shapes, specs, dp)

    elems = _tree_elems_per_device(shapes, specs, axis)
    gather = _layer_gather_elems(shapes["reader"], specs["reader"], axis)

    # activations (bf16) under full remat at the FiD operating point
    enc_tokens = per_device_batch * n_context * text_len
    d = rcfg.d_model
    act = enc_tokens * d * 2 * rcfg.num_layers  # saved per-layer scan inputs
    act += enc_tokens * d * 2 * 3  # encoder output + decoder cross K/V
    act += per_device_batch * target_len * d * 2 * rcfg.num_decoder_layers
    act += per_device_batch * target_len * rcfg.vocab_size * 4  # fp32 logits + softmax
    if train_retriever:
        act += per_device_batch * (n_context + 1) * 512 * 768 * 2 * 12  # bert residuals

    return MemoryPlan(
        reader_type=reader_type, dp=dp, mp=mp,
        state_gib=elems * 12 / GiB,
        bf16_params_gib=elems * 2 / GiB,
        layer_gather_gib=gather * 2 / GiB,
        grads_gib=elems * 4 / GiB,
        activations_gib=act / GiB,
    )


@dataclasses.dataclass
class DecodePlan:
    reader_type: str
    mp: int
    weights_gib: float       # resident decode weights (bf16 or int8), mp-sharded
    cross_cache_gib: float   # per-layer cross K/V over N*L keys
    self_cache_gib: float    # max_len self K/V (beams included)
    workspace_gib: float     # encoder pass live set (the peak transient)
    overhead: float = 1.15

    @property
    def total_gib(self) -> float:
        return self.overhead * (self.weights_gib + self.cross_cache_gib
                                + self.self_cache_gib + self.workspace_gib)

    def fits(self, chip: str, headroom: float = 0.9) -> bool:
        return self.total_gib <= CHIP_HBM_GIB[chip] * headroom


def plan_decode_memory(
    reader_type: str,
    mp: int = 1,
    batch: int = 8,
    n_context: int = 40,
    text_len: int = 384,
    max_len: int = 64,
    num_beams: int = 1,
    weights: str = "bf16",        # "bf16" | "int8" (--decode_weights)
    cache_dtype: str = "int8",    # decode_cache_dtype
) -> DecodePlan:
    """Serving-side HBM plan: which mesh fits a reader's FiD decode?

    Mirrors the real live sets: mp-sharded bf16 (or --decode_weights int8)
    weights, the all-layer cross K/V cache over batch*n_context*text_len keys
    (int8 via decode_cache_dtype, built layer-at-a-time so no f32 transient,
    models/t5.py init_decode_cache), the max_len self cache carrying beams, and
    the encoder forward's live activations (the transient peak before decoding
    starts). Answers e.g. "can one v5e chip serve atlas-xxl w8 at N=20?" and
    "what mp does 11B bf16 serving need?" without an OOM hunt — the reference
    discovers this empirically on 8xA100 hosts (README_MMLU.md:73)."""
    from atlas_tpu.models.t5 import init_t5, t5_config_for

    cfg = t5_config_for(reader_type, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda k: init_t5(k, cfg), jax.random.PRNGKey(0))
    n_params = float(sum(math.prod(l.shape) for l in jax.tree.leaves(shapes)))
    wbytes = 1 if weights == "int8" else 2
    cbytes = 1 if cache_dtype == "int8" else 2

    Lk = n_context * text_len
    H, Dh, nL = cfg.num_heads, cfg.d_kv, cfg.num_decoder_layers
    cross = 2 * nL * batch * H * Lk * Dh * cbytes           # K and V
    if cache_dtype == "int8":
        # per-key-vector f32 scales for K and V (models/t5.py init_decode_cache)
        cross += 2 * nL * batch * H * Lk * 4
    # the self cache is always allocated at cfg.dtype (bf16) — only the cross
    # cache quantizes (models/t5.py:840-841)
    selfc = 2 * nL * batch * num_beams * H * max_len * Dh * 2
    # encoder live set (no remat at eval): rows = B*N, the widest tensor per
    # layer is the (rows, L, d_ff) FFN intermediate plus the (rows, L, d) stream
    rows = batch * n_context
    work = rows * text_len * (cfg.d_ff + 4 * cfg.d_model) * 2

    return DecodePlan(
        reader_type=reader_type, mp=mp,
        weights_gib=n_params * wbytes / mp / GiB,
        cross_cache_gib=cross / mp / GiB,   # heads shard over mp
        self_cache_gib=selfc / mp / GiB,
        workspace_gib=work / mp / GiB,
    )
