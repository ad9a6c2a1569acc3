"""Compiler-verified HBM accounting: AOT-lower the PRODUCTION steps, ask XLA.

parallel/geometry.py answers "does this reader fit this mesh?" by hand-derived
arithmetic over the real param shapes and spec functions. This module answers
the SAME question from the compiler: it lowers the production train step
(train/step.py make_train_step over core/atlas.py loss_fn) and the production
greedy decode (eval/generate.py greedy_generate) at full xl/xxl dimensions over
a virtual device mesh — abstract ShapeDtypeStructs carrying the REAL GSPMD
shardings, so an 11B-param step lowers without materializing a single array —
compiles them, and reads `compiled.memory_analysis()` per-device bytes.

A sharding-spec regression (e.g. fsdp widening silently not engaging) now
surfaces as XLA-reported per-device bytes blowing past the chip budget, not as
a hand-math number quietly drifting from the code. tools/plan_mesh.py --verify
prints planner-vs-XLA side by side and fails on >15% divergence
(tests/test_scale_geometry.py pins xl in-process and xxl over 32 virtual
devices).

Reference scale claims being verified: 11B reader + ZeRO + grad checkpointing
(/root/reference/README.md:17,265-274, src/util.py:173-178).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

GiB = 2**30
_BERT_MAX = 512  # core/atlas.py BERT_MAX_SEQ_LENGTH


@dataclasses.dataclass
class XlaMemory:
    """Per-device bytes from XLA's own compiled-memory analysis."""

    argument_gib: float  # live inputs (donated state + batch)
    temp_gib: float      # transient buffers at the scheduler's peak
    output_gib: float    # outputs (mostly aliased back onto donated args)
    alias_gib: float     # donated bytes counted in both argument and output

    @property
    def total_gib(self) -> float:
        return self.argument_gib + self.temp_gib + self.output_gib - self.alias_gib


def _mem(compiled) -> XlaMemory:
    ma = compiled.memory_analysis()
    return XlaMemory(
        argument_gib=ma.argument_size_in_bytes / GiB,
        temp_gib=ma.temp_size_in_bytes / GiB,
        output_gib=ma.output_size_in_bytes / GiB,
        alias_gib=ma.alias_size_in_bytes / GiB,
    )


def make_virtual_mesh(dp: int, mp: int) -> Mesh:
    devs = jax.devices()
    if len(devs) < dp * mp:
        raise RuntimeError(
            f"need {dp * mp} devices for a dp={dp} x mp={mp} mesh, have "
            f"{len(devs)} — set XLA_FLAGS=--xla_force_host_platform_device_count")
    return Mesh(np.array(devs[: dp * mp]).reshape(dp, mp), ("dp", "mp"))


def _abstract(tree, shardings, dtype=None):
    return jax.tree.map(
        lambda l, s: jax.ShapeDtypeStruct(l.shape, dtype or l.dtype, sharding=s),
        tree, shardings,
    )


def abstract_train_args(
    reader_type: str,
    mesh: Mesh,
    per_device_batch: int = 1,
    n_context: int = 40,
    text_len: int = 384,
    target_len: int = 64,
    train_retriever: bool = True,
):
    """Build (jitted step, abstract TrainState, abstract batch, abstract rng)
    for the production train step at full dims — zero arrays materialized."""
    from atlas_tpu.config import AtlasConfig
    from atlas_tpu.core.atlas import Atlas
    from atlas_tpu.models.bert import bert_config_for
    from atlas_tpu.models.contriever import init_retriever
    from atlas_tpu.models.t5 import init_t5, t5_config_for
    from atlas_tpu.parallel.sharding import (
        atlas_param_specs, fsdp_param_specs, to_shardings)
    from atlas_tpu.tokenization import ByteTokenizer
    from atlas_tpu.train.optim import make_optimizers
    from atlas_tpu.train.step import TrainState, _opt_state_shardings, make_train_step

    dp, mp = mesh.shape["dp"], mesh.shape["mp"]
    cfg = AtlasConfig(
        task="qa", precision="bf16", train_retriever=train_retriever,
        shard_optim=True, n_context=n_context, retriever_n_context=n_context,
        text_maxlength=text_len, target_maxlength=target_len,
        per_gpu_batch_size=per_device_batch, total_steps=1000, warmup_steps=10,
    )
    rcfg = t5_config_for(reader_type, dtype=jnp.bfloat16, remat=True)
    shapes: Dict[str, Any] = {
        "reader": jax.eval_shape(lambda k: init_t5(k, rcfg), jax.random.PRNGKey(0))
    }
    bcfg = None
    if train_retriever:
        bcfg = bert_config_for("bert-base-uncased")
        shapes["retriever"] = jax.eval_shape(
            lambda k: init_retriever(k, bcfg), jax.random.PRNGKey(1))
    specs = atlas_param_specs(shapes)
    specs = fsdp_param_specs(shapes, specs, dp)
    shardings = to_shardings(mesh, specs)
    params_abs = {t: _abstract(shapes[t], shardings[t]) for t in shapes}
    params_abs.setdefault("retriever", None)

    reader_opt, retr_opt = make_optimizers(cfg)
    opt_abs = {}
    for tower, opt in (("reader", reader_opt), ("retriever", retr_opt)):
        if params_abs.get(tower) is None:
            continue
        osh = _opt_state_shardings(opt, params_abs[tower])
        oshape = jax.eval_shape(opt.init, params_abs[tower])
        opt_abs[tower] = _abstract(oshape, osh)

    repl = NamedSharding(mesh, P())
    scalar = lambda dt: jax.ShapeDtypeStruct((), dt, sharding=repl)
    state_abs = TrainState(
        step=scalar(jnp.int32), params=params_abs, opt_state=opt_abs,
        grad_acc=None, acc_count=scalar(jnp.int32),
    )

    B = per_device_batch * dp
    Lq = min(text_len, _BERT_MAX)
    dpsh = lambda shape: jax.ShapeDtypeStruct(
        shape, jnp.int32, sharding=NamedSharding(mesh, P("dp", *([None] * (len(shape) - 1)))))
    batch_abs = {
        "reader_ids": dpsh((B, n_context, text_len)),
        "reader_mask": dpsh((B, n_context, text_len)),
        "decoder_input_ids": dpsh((B, target_len)),
        "labels": dpsh((B, target_len)),
        "query_mask_reader": dpsh((B, text_len)),
    }
    if train_retriever:
        batch_abs.update({
            "retr_q_ids": dpsh((B, Lq)),
            "retr_q_mask": dpsh((B, Lq)),
            "retr_p_ids": dpsh((B, n_context, Lq)),
            "retr_p_mask": dpsh((B, n_context, Lq)),
        })
    rng_abs = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=repl)

    atlas = Atlas(cfg, rcfg, None, bcfg, None,
                  ByteTokenizer("t5"), ByteTokenizer("bert"))
    atlas.set_mesh(mesh)
    step_fn = make_train_step(atlas, cfg, reader_opt, retr_opt)
    return step_fn, state_abs, batch_abs, rng_abs


def aot_train_memory(
    reader_type: str,
    dp: int,
    mp: int,
    per_device_batch: int = 1,
    n_context: int = 40,
    text_len: int = 384,
    target_len: int = 64,
    train_retriever: bool = True,
    mesh: Optional[Mesh] = None,
) -> XlaMemory:
    """Compile the production train step at full dims; return XLA's per-device
    bytes. Matches plan_train_memory's operating-point arguments."""
    mesh = mesh or make_virtual_mesh(dp, mp)
    step_fn, state, batch, rng = abstract_train_args(
        reader_type, mesh, per_device_batch, n_context, text_len, target_len,
        train_retriever)
    lowered = step_fn.lower(state, batch, rng, train_retriever=train_retriever)
    return _mem(lowered.compile())


def aot_decode_memory(
    reader_type: str,
    mp: int = 1,
    batch: int = 8,
    n_context: int = 20,
    text_len: int = 256,
    max_len: int = 32,
    weights: str = "bf16",
    cache_dtype: str = "int8",
    mesh: Optional[Mesh] = None,
) -> XlaMemory:
    """Compile the production greedy decode (fid_encode + cache + XLA scan
    step — the path xl/xxl serve on) at full dims over an mp mesh; return
    XLA's per-device bytes. Matches plan_decode_memory's arguments."""
    from atlas_tpu.eval.generate import greedy_generate
    from atlas_tpu.models.t5 import init_t5, t5_config_for
    from atlas_tpu.parallel.sharding import t5_param_specs, to_shardings

    mesh = mesh or make_virtual_mesh(1, mp)
    cfg = t5_config_for(
        reader_type, dtype=jnp.bfloat16, decode_cache_dtype=cache_dtype,
        decode_weights=weights, decode_fused="off", decode_stream="off",
        dropout_rate=0.0)
    shapes = jax.eval_shape(lambda k: init_t5(k, cfg), jax.random.PRNGKey(0))
    shardings = to_shardings(mesh, t5_param_specs(shapes))
    params_abs = _abstract(shapes, shardings, dtype=jnp.bfloat16)
    repl = NamedSharding(mesh, P())
    ids = jax.ShapeDtypeStruct((batch, n_context, text_len), jnp.int32, sharding=repl)
    lowered = greedy_generate.lower(params_abs, cfg, ids, ids, max_length=max_len)
    return _mem(lowered.compile())


def verify_train_plan(
    reader_type: str,
    dp: int,
    mp: int,
    tolerance: float = 0.15,
    **kw,
) -> Dict[str, float]:
    """Compiler-verify the planner's TRAIN accounting at full dims.

    What is asserted, and why exactly this:
    - XLA argument bytes == planner fp32-state bytes (within `tolerance`; the
      slack covers the batch token arrays). Input buffer sizes are purely
      sharding-determined — backend-invariant — so a ZeRO/TP spec regression
      (fsdp widening silently not engaging would grow them dp-fold) fails here
      by compiler-math, not hand-math.
    - output == alias == argument bytes: the step's donation really aliases
      the state in place (a donation regression doubles resident state).
    - temp bytes are REPORTED, not asserted against the planner: XLA-CPU
      computes bf16 matmuls through fp32 (this box's documented oneDNN
      behavior) and schedules loop grads unscattered, inflating transients
      ~5-20x over the TPU live set. Remat regressions are caught separately
      (verify_remat_engages) by an A/B against the same backend.

    Measured on this box (2026-08-19): xl dp4/mp2 arg 4.13 GiB = planner state
    4.13; xxl dp16/mp2 over 32 virtual devices arg 3.93 = planner 3.93.
    """
    from atlas_tpu.parallel.geometry import plan_train_memory

    plan = plan_train_memory(reader_type, dp, mp,
                             **{k: v for k, v in kw.items() if k != "mesh"})
    xla = aot_train_memory(reader_type, dp, mp, **kw)
    ratio = xla.argument_gib / plan.state_gib
    if abs(ratio - 1.0) > tolerance:
        raise AssertionError(
            f"train sharding for {reader_type} dp={dp} mp={mp}: XLA argument "
            f"bytes {xla.argument_gib:.2f} GiB vs planner state "
            f"{plan.state_gib:.2f} GiB ({(ratio - 1) * 100:+.1f}%) — a "
            f"sharding-spec (ZeRO/TP) regression")
    if abs(xla.alias_gib / xla.argument_gib - 1.0) > tolerance:
        raise AssertionError(
            f"donation regression: only {xla.alias_gib:.2f} of "
            f"{xla.argument_gib:.2f} GiB argument bytes aliased in place")
    return {"planner_state_gib": plan.state_gib, "xla_arg_gib": xla.argument_gib,
            "xla_temp_gib": xla.temp_gib, "xla_alias_gib": xla.alias_gib,
            "planner_total_gib": plan.total_gib, "ratio": ratio}


def verify_decode_plan(
    reader_type: str,
    mp: int = 1,
    tolerance: float = 0.15,
    **kw,
) -> Dict[str, float]:
    """Compiler-verify the serving plan's weight bytes: XLA argument bytes ==
    planner mp-sharded weights (sharding-determined, backend-invariant); temp
    reported (CPU-inflated, see verify_train_plan)."""
    from atlas_tpu.parallel.geometry import plan_decode_memory

    plan = plan_decode_memory(reader_type, mp=mp,
                              **{k: v for k, v in kw.items() if k != "mesh"})
    xla = aot_decode_memory(reader_type, mp=mp, **kw)
    ratio = xla.argument_gib / plan.weights_gib
    if abs(ratio - 1.0) > tolerance:
        raise AssertionError(
            f"decode sharding for {reader_type} mp={mp}: XLA argument bytes "
            f"{xla.argument_gib:.2f} GiB vs planner weights "
            f"{plan.weights_gib:.2f} GiB ({(ratio - 1) * 100:+.1f}%)")
    return {"planner_weights_gib": plan.weights_gib,
            "xla_arg_gib": xla.argument_gib, "xla_temp_gib": xla.temp_gib,
            "planner_total_gib": plan.total_gib, "ratio": ratio}


def verify_remat_engages(reader_type: str = "google/t5-v1_1-large",
                         dp: int = 4, mp: int = 2,
                         max_ratio: float = 0.4, **kw) -> Tuple[float, float]:
    """Self-calibrating remat check: compile the FiD fwd+bwd with and without
    jax.checkpoint ON THE SAME BACKEND and assert the remat temp is a small
    fraction of the no-remat temp. Backend inflation cancels in the ratio, so
    this catches a remat/policy regression (ratio -> 1.0) by compiler-math.
    Measured on this box: large 7.98 vs 92.19 GiB = 0.086."""
    import dataclasses as _dc

    from atlas_tpu.models.fid import fid_forward
    from atlas_tpu.models.t5 import init_t5, t5_config_for
    from atlas_tpu.parallel.sharding import (
        fsdp_param_specs, t5_param_specs, to_shardings)

    mesh = kw.pop("mesh", None) or make_virtual_mesh(dp, mp)
    B, N, L, T = dp, kw.pop("n_context", 40), kw.pop("text_len", 384), kw.pop("target_len", 64)

    def temp_gib(remat: bool) -> float:
        cfg = t5_config_for(reader_type, dtype=jnp.bfloat16, remat=remat)
        shapes = jax.eval_shape(lambda k: init_t5(k, cfg), jax.random.PRNGKey(0))
        specs = fsdp_param_specs(shapes, t5_param_specs(shapes), dp)
        params = _abstract(shapes, to_shardings(mesh, specs))
        dsh = lambda s: jax.ShapeDtypeStruct(
            s, jnp.int32, sharding=NamedSharding(mesh, P("dp", *([None] * (len(s) - 1)))))
        rng = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=NamedSharding(mesh, P()))

        def loss(p, ids, mask, dec, lab, rng):
            pc = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
            l, _, _ = fid_forward(pc, cfg, ids, mask, dec, lab,
                                  deterministic=False, rng=rng)
            return l

        f = jax.jit(lambda *a: jax.value_and_grad(loss)(*a))
        lowered = f.lower(params, dsh((B, N, L)), dsh((B, N, L)),
                          dsh((B, T)), dsh((B, T)), rng)
        return _mem(lowered.compile()).temp_gib

    with_remat, without = temp_gib(True), temp_gib(False)
    ratio = with_remat / without
    if ratio > max_ratio:
        raise AssertionError(
            f"remat not engaging: fwd+bwd temp {with_remat:.2f} GiB with remat "
            f"vs {without:.2f} without (ratio {ratio:.2f} > {max_ratio})")
    return with_remat, without
