"""The jitted train step: joint loss -> grads -> stats/NaN-gate -> clip -> update.

Reference semantics being reproduced (TPU-native, one compiled function):
- train.py:91-131: total = reader_loss + retriever_loss, backward, grad stats with
  NaN/Inf step-skip (util.py:200-222), clip_grad_norm over ALL params, two optimizer
  steps (reader + retriever) with their own schedules, gradient accumulation.
- The dynamic loss-scale machinery (train.py:96-116) is an fp16 artifact — bf16 on
  TPU needs none — but the grad statistics it consumed are still computed and logged.
- DDP/ShardedDataParallel never appears: the batch is sharded over "dp", so GSPMD
  inserts the gradient psum; optimizer state is sharded by propagation (ZeRO).

Gradient accumulation keeps an fp32 grad buffer in the state and applies the update
every `accumulation_steps` calls (train.py:118 semantics).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from atlas_tpu.config import AtlasConfig


class TrainState(NamedTuple):
    step: jnp.ndarray  # scalar int32, counts optimizer steps context
    params: Dict[str, Any]  # {"reader": ..., "retriever": ...} fp32 masters
    opt_state: Dict[str, Any]  # {"reader": ..., "retriever": ...}
    grad_acc: Optional[Dict[str, Any]]  # fp32 grad buffer when accumulating
    acc_count: jnp.ndarray  # scalar int32 micro-steps since last update


def _opt_state_shardings(opt, params):
    """Shardings for opt.init's output: each moment leaf inherits its param's
    sharding, scalars (e.g. Adam count) are replicated.

    XLA does NOT propagate input shardings onto value-independent outputs (the
    zero-initialized moments come out SingleDeviceSharding from a bare
    jax.jit(opt.init)), so ZeRO needs these stated explicitly. Moments are matched
    to params by key-path suffix: optax states embed the param tree whole, so a mu
    leaf's path ends with its param's path.
    """
    from jax.sharding import NamedSharding, PartitionSpec
    from jax.tree_util import keystr, tree_flatten_with_path, tree_map_with_path

    mesh = None
    for leaf in jax.tree.leaves(params):
        sh = getattr(leaf, "sharding", None)
        if isinstance(sh, NamedSharding):
            mesh = sh.mesh
            break
    if mesh is None:  # host/single-device params: let jit place freely
        return None
    param_paths = [(keystr(path), leaf.sharding, tuple(leaf.shape))
                   for path, leaf in tree_flatten_with_path(params)[0]]
    replicated = NamedSharding(mesh, PartitionSpec())

    def assign(path, leaf):
        ks = keystr(path)
        best = None
        for pks, sh, shape in param_paths:
            if ks.endswith(pks) and shape == tuple(leaf.shape):
                if best is None or len(pks) > len(best[0]):
                    best = (pks, sh)
        return best[1] if best is not None else replicated

    return tree_map_with_path(assign, jax.eval_shape(opt.init, params))


def _init_opt_state(opt, params):
    shardings = _opt_state_shardings(opt, params)
    if shardings is None:
        return jax.jit(opt.init)(params)
    return jax.jit(opt.init, out_shardings=shardings)(params)


def create_train_state(params, reader_opt, retr_opt, accumulation_steps: int = 1) -> TrainState:
    """Initialize optimizer state with each moment sharded like its param (ZeRO).

    The train step donates its state buffers; the state therefore takes a PRIVATE
    copy of the params so callers' references (e.g. Atlas.reader_params) stay valid.
    """
    # jitted identity copy: out shardings propagate from the inputs, so an
    # FSDP/TP-sharded param tree stays sharded through the private copy
    params = jax.jit(lambda t: jax.tree.map(jnp.copy, t))(params)
    opt_state = {"reader": _init_opt_state(reader_opt, params["reader"])}
    if params.get("retriever") is not None:
        opt_state["retriever"] = _init_opt_state(retr_opt, params["retriever"])
    grad_acc = None
    if accumulation_steps > 1:
        shardings = jax.tree.map(lambda x: x.sharding, params)
        grad_acc = jax.jit(
            lambda t: jax.tree.map(lambda x: jnp.zeros_like(x, dtype=jnp.float32), t),
            out_shardings=shardings,
        )(params)
    return TrainState(
        step=jnp.int32(0), params=params, opt_state=opt_state,
        grad_acc=grad_acc, acc_count=jnp.int32(0),
    )


def grad_stats(grads) -> Dict[str, jnp.ndarray]:
    """min/max/mean of |grad| + skip flag (util.py:200-222, reader grads there; we
    cover the whole tree)."""
    leaves = [g for g in jax.tree.leaves(grads) if g is not None]
    absmax = jnp.max(jnp.stack([jnp.max(jnp.abs(g)) for g in leaves]))
    absmin = jnp.min(jnp.stack([jnp.min(jnp.abs(g)) for g in leaves]))
    total = sum(jnp.sum(jnp.abs(g)) for g in leaves)
    # float, not int: at 3B+ params the Python-int element count exceeds int32
    # and overflows when traced into the division (caught by AOT-lowering the
    # xl train step, parallel/aot.py)
    count = float(sum(g.size for g in leaves))
    mean = total / count
    finite = jnp.all(jnp.stack([jnp.all(jnp.isfinite(g)) for g in leaves]))
    return {"stats/gmax": absmax, "stats/gmin": absmin, "stats/gmean": mean,
            "skip_example": ~finite}


def make_train_step(
    atlas,
    cfg: AtlasConfig,
    reader_opt: optax.GradientTransformation,
    retr_opt: optax.GradientTransformation,
):
    """Build the pure (state, batch, rng, train_retriever) -> (state, metrics) step."""
    accum = max(cfg.accumulation_steps, 1)

    def apply_updates(params, opt_state, grads, skip):
        new_params, new_opt = {}, {}
        for tower, opt in (("reader", reader_opt), ("retriever", retr_opt)):
            if tower not in opt_state or params.get(tower) is None:
                if tower in params:
                    # keep the key even when the tower is absent (None):
                    # dropping it changes the state's tree STRUCTURE after the
                    # first step and closed_book runs then KeyError in the
                    # train loop's params[\"retriever\"] refresh
                    new_params[tower] = params[tower]
                continue
            updates, opt_s = opt.update(grads[tower], opt_state[tower], params[tower])
            p = optax.apply_updates(params[tower], updates)
            # NaN/Inf gate: keep old params/state on skip (train.py:102-106)
            new_params[tower] = jax.tree.map(lambda new, old: jnp.where(skip, old, new),
                                             p, params[tower])
            new_opt[tower] = jax.tree.map(
                lambda new, old: jnp.where(skip, old, new) if hasattr(new, "shape") else new,
                opt_s, opt_state[tower],
            )
        return new_params, new_opt

    def train_step(state: TrainState, batch, rng, train_retriever: bool):
        rng = jax.random.fold_in(rng, state.step)

        def loss(params):
            return atlas.loss_fn(params, batch, rng, train_retriever=train_retriever, training=True)

        (total_loss, aux), grads = jax.value_and_grad(loss, has_aux=True)(state.params)
        grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        stats = grad_stats(grads)
        skip = stats.pop("skip_example")

        if accum > 1:
            grad_acc = jax.tree.map(
                lambda a, g: a + jnp.where(skip, 0.0, g / accum), state.grad_acc, grads
            )
            acc_count = state.acc_count + jnp.where(skip, 0, 1)
            do_update = acc_count >= accum

            def upd(_):
                g = jax.tree.map(lambda a: a, grad_acc)
                g, gnorm = _clip(g, cfg.clip)
                p, o = apply_updates(state.params, state.opt_state, g, False)
                zeroed = jax.tree.map(jnp.zeros_like, grad_acc)
                return p, o, zeroed, jnp.int32(0), gnorm

            def no_upd(_):
                return (state.params, state.opt_state, grad_acc, acc_count, jnp.float32(0))

            params, opt_state, grad_acc, acc_count, gnorm = jax.lax.cond(do_update, upd, no_upd, None)
        else:
            grads, gnorm = _clip(grads, cfg.clip)
            params, opt_state = apply_updates(state.params, state.opt_state, grads, skip)
            grad_acc, acc_count = state.grad_acc, state.acc_count

        metrics = dict(aux)
        metrics.update(stats)
        metrics["loss/train_loss"] = total_loss
        metrics["stats/skipped"] = skip.astype(jnp.float32)
        metrics["stats/grad_norm"] = gnorm
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state,
            grad_acc=grad_acc, acc_count=acc_count,
        )
        return new_state, metrics

    return jax.jit(train_step, static_argnames=("train_retriever",), donate_argnums=(0,))


def _clip(grads, max_norm: float):
    """Global-norm clip over the WHOLE param tree (reader+retriever jointly,
    train.py:119-122 non-sharded path)."""
    leaves = jax.tree.leaves(grads)
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), gnorm
