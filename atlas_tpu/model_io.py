"""Model construction + checkpoint save/load/resume.

Behavioral reference: /root/reference/src/model_io.py:
- three load modes (fresh init / resume-from-latest / finetune-from-path, :170-197)
- atomic step-N dirs + `latest` symlink (:200-244)
- tied->untied retriever state surgery when enabling query-side training (:62-71)
- reader dropped when retrieve_only, retriever dropped when use_file_passages (:116-120)
- interop: the released torch Atlas checkpoints (`reader.` / `retriever.` prefixed
  state dicts) import through models/hf_import converters.

Our checkpoint format: `state.npz` (flattened param/opt pytrees; optax states via
flax.serialization) + `meta.json` (step + config) per step-N dir.
"""

from __future__ import annotations

import errno
import json
import logging
import os
from dataclasses import asdict
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from atlas_tpu.config import AtlasConfig
from atlas_tpu.core.atlas import Atlas
from atlas_tpu.models.bert import BertConfig, bert_config_for
from atlas_tpu.models.contriever import init_retriever, untie_retriever
from atlas_tpu.models.t5 import T5Config, init_t5, t5_config_for
from atlas_tpu.tokenization import load_tokenizer

logger = logging.getLogger(__name__)


def get_checkpoint_path(cfg: AtlasConfig) -> Path:
    return Path(cfg.checkpoint_dir) / cfg.name


def create_checkpoint_directories(cfg: AtlasConfig):
    checkpoint_path = get_checkpoint_path(cfg)
    os.makedirs(checkpoint_path, exist_ok=True)
    if cfg.save_index_path:
        os.makedirs(cfg.save_index_path, exist_ok=True)
    return checkpoint_path, cfg.save_index_path


# ------------------------------------------------------------- tree <-> flat dict


def _flatten_state(state, prefix="") -> Dict[str, np.ndarray]:
    """Nested state dict -> flat {slash/path: np.ndarray} with None/{} markers."""
    out: Dict[str, np.ndarray] = {}

    def rec(node, path):
        if isinstance(node, dict):
            if not node:  # e.g. optax EmptyState -> {}
                out[path + "/__empty__"] = np.zeros(0)
                return
            for k, v in node.items():
                rec(v, f"{path}/{k}" if path else str(k))
        elif node is None:
            out[path + "/__none__"] = np.zeros(0)
        else:
            out[path] = np.asarray(jax.device_get(node))

    rec(state, prefix)
    return out


def tree_to_flat(tree, prefix="") -> Dict[str, np.ndarray]:
    return _flatten_state(serialization.to_state_dict(tree), prefix)


def flat_to_tree(flat: Dict[str, np.ndarray], target):
    nested: Dict[str, Any] = {}
    for k, v in flat.items():
        parts = k.split("/")
        if parts[-1] == "__none__":
            parts, v = parts[:-1], None
        elif parts[-1] == "__empty__":
            parts, v = parts[:-1], {}
        node = nested
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return serialization.from_state_dict(target, nested)


# ----------------------------------------------------------------- constructors


def _reader_vocab_size(tokenizer) -> int:
    return len(tokenizer)


def load_reader(cfg: AtlasConfig) -> Tuple[Optional[T5Config], Optional[Dict], Any]:
    reader_tokenizer = load_tokenizer(
        cfg.reader_tokenizer_path or cfg.reader_model_type, style="t5")
    if cfg.retrieve_only:
        return None, None, reader_tokenizer
    dtype = jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32
    reader_cfg = t5_config_for(
        cfg.reader_model_type,
        vocab_size=_reader_vocab_size(reader_tokenizer),
        dropout_rate=cfg.dropout,
        dtype=dtype,
        remat=cfg.use_gradient_checkpoint_reader,
        attn_impl=cfg.attn_impl,
        decode_cache_dtype=getattr(cfg, "decode_kv_cache", "bf16"),
        decode_stream=getattr(cfg, "decode_stream", "auto"),
        decode_fused=getattr(cfg, "decode_fused", "auto"),
        decode_weights=getattr(cfg, "decode_weights", "bf16"),
        remat_policy=getattr(cfg, "remat_policy", "full"),
    )
    if cfg.tiny_model:
        import dataclasses

        dim = getattr(cfg, "tiny_model_dim", 32)
        reader_cfg = dataclasses.replace(
            reader_cfg, d_model=dim, d_kv=max(8, dim // 4), d_ff=2 * dim,
            num_layers=2, num_decoder_layers=2, num_heads=4,
            relative_attention_num_buckets=8,
        )
    params = _try_load_hf_t5(cfg.reader_model_type, reader_cfg)
    if params is None:
        params = init_t5(jax.random.PRNGKey(cfg.seed), reader_cfg)
    return reader_cfg, params, reader_tokenizer


def load_retriever(cfg: AtlasConfig, cfg_checkpoint: Optional[AtlasConfig] = None):
    if cfg.use_file_passages:
        return None, None, None
    retriever_tokenizer = load_tokenizer(
        cfg.retriever_tokenizer_path or cfg.retriever_model_path, style="bert")
    retr_cfg = bert_config_for(
        "bert-base-uncased",
        vocab_size=len(retriever_tokenizer),
        remat=cfg.use_gradient_checkpoint_retriever,
        # --dropout applies to EVERY tower: the reference's set_dropout walks
        # all nn.Dropout modules of the whole Atlas model (src/model_io.py:103,
        # src/util.py:161-164), retriever included. Leaving BERT's 0.1 default
        # here made --dropout 0 runs nondeterministic through the retriever
        # (found via the r04 two-process parity gap: position-dependent
        # retriever dropout masks made the loss row-order sensitive).
        hidden_dropout_prob=cfg.dropout,
        attention_probs_dropout_prob=cfg.dropout,
    )
    if cfg.tiny_model:
        import dataclasses

        dim = getattr(cfg, "tiny_model_dim", 32)
        retr_cfg = dataclasses.replace(
            retr_cfg, hidden_size=dim, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=2 * dim,
        )
    untied = cfg.query_side_retriever_training or (
        cfg_checkpoint is not None and cfg_checkpoint.query_side_retriever_training
    )
    params = _try_load_hf_bert(cfg.retriever_model_path, retr_cfg, untied)
    if params is None:
        params = init_retriever(jax.random.PRNGKey(cfg.seed + 1), retr_cfg, untied=untied)
    return retr_cfg, params, retriever_tokenizer


def _try_load_hf_t5(path: str, cfg: T5Config):
    """Import a local HF torch T5 checkpoint when present (hub names have no local
    assets in an air-gapped pod -> random init + warning)."""
    if not os.path.isdir(path):
        return None
    try:
        import torch

        from atlas_tpu.models.hf_import import t5_params_from_state_dict

        for fname in ("pytorch_model.bin", "model.safetensors"):
            p = os.path.join(path, fname)
            if os.path.exists(p):
                if fname.endswith(".safetensors"):
                    from safetensors.torch import load_file

                    sd = load_file(p)
                else:
                    sd = torch.load(p, map_location="cpu")
                return t5_params_from_state_dict(sd, cfg)
    except Exception as e:  # pragma: no cover
        logger.warning("failed to import HF T5 from %s: %s", path, e)
    return None


def _try_load_hf_bert(path: str, cfg: BertConfig, untied: bool):
    if not os.path.isdir(path):
        return None
    try:
        import torch

        from atlas_tpu.models.hf_import import bert_params_from_state_dict

        for fname in ("pytorch_model.bin", "model.safetensors"):
            p = os.path.join(path, fname)
            if os.path.exists(p):
                if fname.endswith(".safetensors"):
                    from safetensors.torch import load_file

                    sd = load_file(p)
                else:
                    sd = torch.load(p, map_location="cpu")
                bert = bert_params_from_state_dict(sd, cfg)
                params = {"contriever": bert}
                return untie_retriever(params) if untied else params
    except Exception as e:  # pragma: no cover
        logger.warning("failed to import HF BERT from %s: %s", path, e)
    return None


def init_atlas_model(cfg: AtlasConfig) -> Tuple[Atlas, int]:
    reader_cfg, reader_params, reader_tok = load_reader(cfg)
    retr_cfg, retr_params, retr_tok = load_retriever(cfg)
    atlas = Atlas(cfg, reader_cfg, reader_params, retr_cfg, retr_params, reader_tok, retr_tok)
    return atlas, 0


# ------------------------------------------------------------------ save / load


def _sync_processes(tag: str) -> None:
    """Cross-process barrier so rank-0-only files (meta.json, `latest`) are
    visible before any rank's save_atlas_model returns (a resume immediately
    after save would otherwise race, like the save_index race in index/flat.py)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def _symlink_force(target, link_name):
    try:
        os.symlink(target, link_name)
    except OSError as e:
        if e.errno == errno.EEXIST:
            os.remove(link_name)
            os.symlink(target, link_name)
        else:
            raise


def _tree_to_flat_arrays(tree, prefix="") -> Dict[str, Any]:
    """Like tree_to_flat but keeps (possibly sharded) device arrays in place."""
    state = serialization.to_state_dict(tree)
    out: Dict[str, Any] = {}

    def rec(node, path):
        if isinstance(node, dict):
            if not node:
                out[path + "/__empty__"] = np.zeros(1)  # orbax rejects 0-size arrays
                return
            for k, v in node.items():
                rec(v, f"{path}/{k}" if path else str(k))
        elif node is None:
            out[path + "/__none__"] = np.zeros(1)
        else:
            out[path] = node

    rec(state, prefix)
    return out


def save_atlas_model(atlas: Atlas, opt_state, step: int, cfg: AtlasConfig,
                     dir_path, name: str) -> None:
    """Write step dir + flip `latest` (model_io.py:200-244).

    npz format: rank 0 gathers the full tree to host (reference parity — caps model
    size at host RAM). orbax format: EVERY process participates; sharded jax arrays
    stream to tensorstore without ever assembling the full tree on one host, which
    is what makes the xl/xxl readers checkpointable (SURVEY §5.4 scale caveat).
    """
    path = os.path.join(str(dir_path), "checkpoint")
    epoch_path = os.path.join(path, name)
    if cfg.checkpoint_format == "orbax":
        import orbax.checkpoint as ocp

        os.makedirs(epoch_path, exist_ok=True)
        flat = _tree_to_flat_arrays(
            {"reader": atlas.reader_params, "retriever": atlas.retriever_params}, "model"
        )
        if cfg.save_optimizer and opt_state is not None:
            flat.update(_tree_to_flat_arrays(opt_state, "optimizer"))
        # "." keys: orbax maps tree keys to directory entries, "/" would nest
        flat = {k.replace("/", "."): v for k, v in flat.items()}
        ocp.PyTreeCheckpointer().save(
            os.path.abspath(os.path.join(epoch_path, "state.orbax")), flat, force=True
        )
        if cfg.is_main:
            with open(os.path.join(epoch_path, "meta.json"), "w") as f:
                json.dump({"step": step, "cfg": asdict(cfg)}, f)
            _symlink_force(epoch_path, os.path.join(path, "latest"))
        _sync_processes("atlas_tpu:save_atlas_model")  # meta/symlink are rank-0 writes
        return

    if cfg.is_main:
        os.makedirs(epoch_path, exist_ok=True)
        flat = tree_to_flat({"reader": atlas.reader_params, "retriever": atlas.retriever_params}, "model")
        if cfg.save_optimizer and opt_state is not None:
            flat.update(tree_to_flat(opt_state, "optimizer"))
        np.savez(os.path.join(epoch_path, "state.npz"), **flat)
        with open(os.path.join(epoch_path, "meta.json"), "w") as f:
            json.dump({"step": step, "cfg": asdict(cfg)}, f)
        _symlink_force(epoch_path, os.path.join(path, "latest"))
    _sync_processes("atlas_tpu:save_atlas_model")


def _flat_restore_shardings(cfg: AtlasConfig, mesh, params) -> Dict[str, Any]:
    """Flat {'.'-keyed checkpoint path: (NamedSharding, shape)} for the model tree.

    Mirrors _tree_to_flat_arrays' key generation over the SAME sharding specs the
    train loop places params with (atlas_param_specs + optional fsdp widening), so
    orbax can restore every leaf directly onto its mesh placement — the reference
    resume path (model_io.py:170-197) materializes the whole state dict on host,
    which caps resumable model size at host RAM.
    """
    from jax.sharding import NamedSharding, PartitionSpec
    from atlas_tpu.parallel.sharding import atlas_param_specs, fsdp_param_specs, to_shardings

    specs = atlas_param_specs(params)
    if cfg.shard_optim or cfg.shard_grads:
        specs = fsdp_param_specs(
            {k: v for k, v in params.items() if v is not None}, specs,
            mesh.shape.get("dp", 1),
        )
    shardings = to_shardings(mesh, specs)
    repl = NamedSharding(mesh, PartitionSpec())
    out: Dict[str, Any] = {}

    def rec(node, sh, path):
        if isinstance(node, dict):
            if not node:
                out[path + ".__empty__"] = (repl, (1,))
                return
            for k, v in node.items():
                sub = sh.get(k) if isinstance(sh, dict) else None
                rec(v, sub, f"{path}.{k}")
        elif node is None:
            out[path + ".__none__"] = (repl, (1,))
        else:
            out[path] = (sh if isinstance(sh, NamedSharding) else repl,
                         tuple(np.shape(node)))

    rec(serialization.to_state_dict(params), shardings, "model")
    return out


def _checkpoint_restore_args(cfg: AtlasConfig, mesh, params, ckpt_meta) -> Dict[str, Any]:
    """Per-checkpoint-key orbax ArrayRestoreArgs with target shardings.

    Model keys match exactly (incl. a tied->untied alias, reference surgery
    model_io.py:62-71). Optimizer moment keys (e.g. optimizer.reader.0.mu.<path>)
    are matched to their param by longest key-path suffix + shape — the same rule
    train/step.py's _opt_state_shardings uses to place freshly-initialized moments,
    so restored optimizer state lands exactly where the jitted step expects it.
    """
    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding, PartitionSpec

    model_map = _flat_restore_shardings(cfg, mesh, params)
    repl = NamedSharding(mesh, PartitionSpec())
    # suffix table: "<subpath>" -> (sharding, shape) per tower
    suffixes = []
    for mk, (sh, shape) in model_map.items():
        parts = mk.split(".", 2)  # "model", tower, subpath
        if len(parts) == 3 and not parts[2].endswith(("__none__", "__empty__")):
            suffixes.append((parts[1], parts[2], sh, shape))

    def assign(key: str, shape) -> Any:
        hit = model_map.get(key)
        if hit is not None and hit[1] == tuple(shape):
            return hit[0]
        # tied checkpoint restored into an untied config: contriever.<x> keys map
        # onto the query tower's placement (untie_retriever duplicates after)
        if key.startswith("model.retriever.contriever."):
            alt = model_map.get(
                "model.retriever.query_contriever." + key[len("model.retriever.contriever."):])
            if alt is not None and alt[1] == tuple(shape):
                return alt[0]
        if key.startswith("optimizer."):
            best = None
            for tower, sub, sh, pshape in suffixes:
                if (key.startswith(f"optimizer.{tower}.") and key.endswith("." + sub)
                        and pshape == tuple(shape)):
                    if best is None or len(sub) > len(best[0]):
                        best = (sub, sh)
            if best is not None:
                return best[1]
        return repl

    args: Dict[str, Any] = {}
    for key, m in ckpt_meta.items():
        args[key] = ocp.ArrayRestoreArgs(
            restore_type=jax.Array, sharding=assign(key, m.shape)
        )
    return args


def _as_device_array(x):
    """jnp.asarray for host leaves; global/sharded jax arrays pass through
    (jnp.asarray on a non-fully-addressable array would force a transfer)."""
    return x if isinstance(x, jax.Array) else jnp.asarray(x)


def load_atlas_model(dir_path: str, cfg: AtlasConfig, reset_params=False, eval_only=False,
                     mesh=None):
    epoch_path = os.path.realpath(dir_path)
    with open(os.path.join(epoch_path, "meta.json")) as f:
        meta = json.load(f)
    known = {k: v for k, v in meta["cfg"].items() if k in AtlasConfig.__dataclass_fields__}
    cfg_checkpoint = AtlasConfig(**known)
    step = meta["step"]

    reader_cfg, reader_params, reader_tok = load_reader(cfg)
    retr_cfg, retr_params, retr_tok = load_retriever(cfg, cfg_checkpoint)

    npz_path = os.path.join(epoch_path, "state.npz")
    if os.path.exists(npz_path):
        data = dict(np.load(npz_path, allow_pickle=False))
    else:  # orbax step dir (format auto-detected so npz runs can resume orbax ones)
        import orbax.checkpoint as ocp
        from atlas_tpu.parallel.mesh import get_mesh

        sp = os.path.abspath(os.path.join(epoch_path, "state.orbax"))
        ckpt = ocp.PyTreeCheckpointer()
        if mesh is None:
            mesh = get_mesh(cfg.dp_size, cfg.mp_size)
        try:
            ckpt_meta = dict(ckpt.metadata(sp).item_metadata.items())
            want_opt = not (reset_params or eval_only)
            if not want_opt:
                ckpt_meta = {k: v for k, v in ckpt_meta.items()
                             if not k.startswith("optimizer.")}
            restore_args = _checkpoint_restore_args(
                cfg, mesh, {"reader": reader_params, "retriever": retr_params}, ckpt_meta
            )
            raw = ckpt.restore(
                sp, item={k: 0 for k in ckpt_meta}, restore_args=restore_args,
                transforms={},
            )
            data = {k.replace(".", "/"): v for k, v in raw.items()}
        except Exception as e:
            logger.warning("sharded orbax restore failed (%s); falling back to host restore", e)
            raw = ckpt.restore(sp)
            data = {k.replace(".", "/"): np.asarray(v) for k, v in raw.items()}

    model_flat = {k[len("model/"):]: v for k, v in data.items() if k.startswith("model/")}
    saved = flat_to_tree(model_flat, None)
    saved_reader, saved_retr = saved.get("reader"), saved.get("retriever")

    # tied -> untied surgery (model_io.py:62-71)
    if saved_retr is not None and retr_params is not None:
        if "contriever" in saved_retr and "query_contriever" in retr_params:
            saved_retr = untie_retriever(saved_retr)
        saved_retr = jax.tree.map(_as_device_array, saved_retr)
    if not cfg.retrieve_only and saved_reader is not None:
        reader_params = jax.tree.map(_as_device_array, saved_reader)
    if not cfg.use_file_passages and saved_retr is not None:
        retr_params = saved_retr

    atlas = Atlas(cfg, reader_cfg, reader_params, retr_cfg, retr_params, reader_tok, retr_tok)

    # returned FLAT (key-path -> array); the train loop reattaches it to the live
    # optax state structure with flat_to_tree(raw, target)
    opt_flat = {k[len("optimizer/"):]: v for k, v in data.items() if k.startswith("optimizer/")}
    opt_state_raw = opt_flat if (opt_flat and not reset_params and not eval_only) else None
    return atlas, opt_state_raw, cfg_checkpoint, step


def load_or_initialize_atlas_model(cfg: AtlasConfig, eval_only=False, mesh=None):
    """Fresh / resume / finetune resolution (model_io.py:170-197).
    -> (atlas, raw_opt_state_or_None, step)."""
    checkpoint_path = get_checkpoint_path(cfg)
    latest = os.path.join(checkpoint_path, "checkpoint", "latest")

    if cfg.model_path == "none":
        if not os.path.exists(latest):
            atlas, step = init_atlas_model(cfg)
            return atlas, None, step
        load_path, reset_params = latest, False
    else:
        load_path, reset_params = cfg.model_path, True

    atlas, opt_state_raw, _, loaded_step = load_atlas_model(
        load_path, cfg, reset_params=reset_params, eval_only=eval_only, mesh=mesh
    )
    logger.info(f"Model loaded from {load_path}")
    step = 0 if cfg.model_path != "none" else loaded_step
    return atlas, opt_state_raw, step
