"""GSPMD sharding correctness: TP-sharded forward/step == replicated results."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from atlas_tpu.parallel.mesh import make_mesh
from atlas_tpu.parallel.sharding import atlas_param_specs, shard_params

from helpers import tiny_atlas, tiny_passages


@pytest.fixture(scope="module")
def mesh(devices):
    return make_mesh(4, 2)


def test_tp_sharded_forward_matches_replicated(mesh):
    from atlas_tpu.models.fid import fid_forward
    from atlas_tpu.models.t5 import shift_right

    atlas = tiny_atlas()
    params = atlas.reader_params
    cfg = atlas.reader_cfg
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(2, 384, (2, 3, 8)))
    mask = jnp.ones((2, 3, 8), jnp.int32)
    labels = jnp.asarray(rng.randint(2, 384, (2, 4)))
    dec = shift_right(labels, cfg)

    loss_rep, logits_rep, _ = fid_forward(params, cfg, ids, mask, dec, labels=labels)

    sharded = shard_params(mesh, {"reader": params})["reader"]
    loss_sh, logits_sh = jax.jit(
        lambda p: fid_forward(p, cfg, ids, mask, dec, labels=labels)[:2]
    )(sharded)
    np.testing.assert_allclose(float(loss_sh), float(loss_rep), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(logits_sh), np.asarray(logits_rep), atol=2e-4, rtol=2e-4)


def test_param_specs_cover_whole_tree(mesh):
    atlas = tiny_atlas(untied=True)
    params = {"reader": atlas.reader_params, "retriever": atlas.retriever_params}
    specs = atlas_param_specs(params)
    # same tree structure -> every leaf has a spec
    jax.tree.map(lambda p, s: None, params, specs,
                 is_leaf=lambda x: isinstance(x, P))
    # sharded placement succeeds and keeps shapes
    sharded = shard_params(mesh, params, specs)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                 params, sharded)


def test_fsdp_specs_shard_over_dp_and_match_replicated(mesh):
    """ZeRO/FSDP over dp: same loss as replicated; moments sharded over dp."""
    from atlas_tpu.config import AtlasConfig
    from atlas_tpu.index.flat import DistributedIndex
    from atlas_tpu.parallel.sharding import fsdp_param_specs
    from atlas_tpu.train.optim import make_optimizers
    from atlas_tpu.train.step import create_train_state, make_train_step

    cfg = AtlasConfig(text_maxlength=32, target_maxlength=16, n_context=2,
                      retriever_n_context=2, precision="fp32", train_retriever=True,
                      total_steps=10, warmup_steps=1, lr=1e-3, lr_retriever=1e-3)
    atlas = tiny_atlas(cfg)
    passages = tiny_passages(16)
    index = DistributedIndex(mesh=mesh, dtype=jnp.float32)
    index.init_embeddings(passages, dim=atlas.retriever_cfg.hidden_size)
    atlas.build_index(index, passages, embedder_batch_size=8)
    batch, _ = atlas.make_batch(
        index,
        query=["question: a? answer: <extra_id_0>"] * 4,
        target=["<extra_id_0> a"] * 4,
        training=True,
    )
    params = {"reader": atlas.reader_params, "retriever": atlas.retriever_params}
    reader_opt, retr_opt = make_optimizers(cfg)
    step_fn = make_train_step(atlas, cfg, reader_opt, retr_opt)
    rng = jax.random.PRNGKey(0)

    losses = {}
    for kind in ("replicated", "fsdp"):
        specs = atlas_param_specs(params)
        if kind == "fsdp":
            specs = fsdp_param_specs(params, specs, mesh.shape["dp"], min_size=64)
        p = shard_params(mesh, params, specs)
        state = create_train_state(p, reader_opt, retr_opt)
        if kind == "fsdp":
            dp_sharded = [
                l for l in jax.tree.leaves(state.opt_state)
                if hasattr(l, "sharding") and getattr(l.sharding, "spec", None)
                and any("dp" in (e if isinstance(e, tuple) else (e,))
                        for e in l.sharding.spec if e is not None)
            ]
            assert dp_sharded, "no optimizer-state leaf sharded over dp"
        for _ in range(2):
            state, metrics = step_fn(state, batch, rng, True)
        losses[kind] = float(metrics["loss/train_loss"])
    np.testing.assert_allclose(losses["fsdp"], losses["replicated"], atol=1e-5, rtol=1e-5)


def test_tp_sharded_generate_matches_replicated(mesh):
    """Greedy + beam decode with TP-sharded reader params produce the same
    tokens as replicated — the path an mp-sharded (xl/xxl) reader serves on."""
    from atlas_tpu.eval.generate import beam_generate, greedy_generate

    atlas = tiny_atlas()
    params = atlas.reader_params
    cfg = atlas.reader_cfg
    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.randint(2, 384, (2, 3, 8)))
    mask = jnp.ones((2, 3, 8), jnp.int32)

    tok_rep = np.asarray(greedy_generate(params, cfg, ids, mask, max_length=8))
    sharded = shard_params(mesh, {"reader": params})["reader"]
    tok_sh = np.asarray(jax.jit(
        lambda p: greedy_generate(p, cfg, ids, mask, max_length=8))(sharded))
    assert (tok_rep == tok_sh).all(), (tok_rep, tok_sh)

    beam_rep = np.asarray(beam_generate(params, cfg, ids, mask, max_length=8,
                                        num_beams=2))
    beam_sh = np.asarray(jax.jit(
        lambda p: beam_generate(p, cfg, ids, mask, max_length=8, num_beams=2)
    )(sharded))
    assert (beam_rep == beam_sh).all(), (beam_rep, beam_sh)

    # int8 decode weights under TP sharding (the big-reader serving config):
    # quantization of mp-sharded params runs under GSPMD in the decode-cache
    # build and must reproduce the replicated quantized tokens exactly
    cfg8 = cfg.__class__(**{**cfg.__dict__, "decode_weights": "int8"})
    tok8_rep = np.asarray(greedy_generate(params, cfg8, ids, mask, max_length=8))
    tok8_sh = np.asarray(jax.jit(
        lambda p: greedy_generate(p, cfg8, ids, mask, max_length=8))(sharded))
    assert (tok8_rep == tok8_sh).all(), (tok8_rep, tok8_sh)
