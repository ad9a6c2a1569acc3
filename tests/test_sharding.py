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
