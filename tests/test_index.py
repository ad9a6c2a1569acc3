"""Flat distributed index: recall parity vs numpy oracle on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from atlas_tpu.index.flat import DistributedIndex
from atlas_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh(devices):
    return make_mesh(dp_size=4, mp_size=2)


def _make_index(mesh, n=1000, dim=32, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    passages = [{"id": str(i), "title": f"t{i}", "text": f"passage {i}"} for i in range(n)]
    index = DistributedIndex(mesh=mesh, dtype=dtype)
    index.init_embeddings(passages, dim=dim)
    embs = rng.randn(n, dim).astype(np.float32)
    index.write_embeddings_rows(0, jnp.asarray(embs))
    return index, embs


def test_exact_search_matches_numpy(mesh):
    index, embs = _make_index(mesh, n=1000, dim=32)
    rng = np.random.RandomState(1)
    q = rng.randn(5, 32).astype(np.float32)
    scores, gids = index.device_search(jnp.asarray(q), 10)
    scores, gids = np.asarray(scores), np.asarray(gids)

    want = q @ embs.T  # (5, 1000)
    want_ids = np.argsort(-want, axis=1)[:, :10]
    want_scores = np.take_along_axis(want, want_ids, axis=1)
    np.testing.assert_allclose(scores, want_scores, atol=1e-4, rtol=1e-4)
    # ids may tie-swap; check score sets match and ids score-consistent
    got_scores_from_ids = np.take_along_axis(want, gids, axis=1)
    np.testing.assert_allclose(got_scores_from_ids, want_scores, atol=1e-4)


def test_search_knn_returns_docs(mesh):
    index, embs = _make_index(mesh, n=100, dim=16, seed=2)
    q = embs[[7, 42]]  # query with its own embedding -> top-1 must be itself
    docs, scores = index.search_knn(jnp.asarray(q), 3)
    assert docs[0][0]["id"] == "7"
    assert docs[1][0]["id"] == "42"
    assert len(docs) == 2 and len(docs[0]) == 3 and len(scores[0]) == 3
    assert scores[0][0] >= scores[0][1] >= scores[0][2]


def test_padding_rows_never_returned(mesh):
    # n=9 on 8 devices -> n_pad=16: 7 zero padding rows must never appear
    index, embs = _make_index(mesh, n=9, dim=8, seed=3)
    # make all true scores negative so 0-score padding rows would win if unmasked
    neg = -np.abs(embs) - 1.0
    index.write_embeddings_rows(0, jnp.asarray(neg))
    q = np.ones((2, 8), dtype=np.float32)
    _, gids = index.device_search(jnp.asarray(q), 9)
    assert np.asarray(gids).max() < 9


def test_write_rows_updates_in_place(mesh):
    index, _ = _make_index(mesh, n=64, dim=8, seed=4)
    new_rows = np.full((4, 8), 7.0, dtype=np.float32)
    index.write_embeddings_rows(10, jnp.asarray(new_rows))
    got = np.asarray(jax.device_get(index.embeddings[10:14]))
    np.testing.assert_allclose(got, 7.0)


def test_save_load_roundtrip(mesh, tmp_path):
    index, embs = _make_index(mesh, n=50, dim=16, seed=5)
    index.save_index(str(tmp_path), total_saved_shards=4)
    index2 = DistributedIndex(mesh=mesh, dtype=jnp.float32)
    index2.load_index(str(tmp_path), total_saved_shards=4)
    assert index2.n_total == 50
    assert len(index2.doc_store.passages) == 50
    q = embs[[5]]
    docs, _ = index2.search_knn(jnp.asarray(q), 1)
    assert docs[0][0]["id"] == "5"
