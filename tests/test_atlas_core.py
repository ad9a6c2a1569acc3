"""Atlas core: end-to-end retrieve + joint loss for all gold-score modes."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from atlas_tpu.config import AtlasConfig
from atlas_tpu.core.losses import emdr_logprob, kldivloss
from atlas_tpu.index.flat import DistributedIndex
from atlas_tpu.parallel.mesh import make_mesh

from helpers import tiny_atlas, tiny_passages


@pytest.fixture(scope="module")
def setup(devices):
    mesh = make_mesh(4, 2)
    atlas = tiny_atlas()
    passages = tiny_passages(40)
    index = DistributedIndex(mesh=mesh, dtype=jnp.float32)
    index.init_embeddings(passages, dim=atlas.retriever_cfg.hidden_size)
    atlas.build_index(index, passages, embedder_batch_size=16)
    return atlas, index, passages


def test_build_index_writes_real_embeddings(setup):
    atlas, index, passages = setup
    emb = np.asarray(jax.device_get(index.embeddings[:40]))
    assert np.abs(emb).sum() > 0
    assert not np.allclose(emb[0], emb[1])


def test_retrieve_returns_topk(setup):
    atlas, index, _ = setup
    q = ["this is passage number 3", "this is passage number 20"]
    enc = atlas.retriever_tokenize(q)
    passages, scores = atlas.retrieve(index, 4, q, enc["input_ids"], enc["attention_mask"])
    assert len(passages) == 2 and len(passages[0]) == 4
    assert scores[0][0] >= scores[0][-1]


def test_retrieve_with_rerank(setup):
    atlas, index, _ = setup
    atlas.cfg.retrieve_with_rerank = True
    atlas.cfg.n_to_rerank_with_retrieve_with_rerank = 8
    try:
        q = ["this is passage number 3"]
        enc = atlas.retriever_tokenize(q)
        passages, scores = atlas.retrieve(index, 2, q, enc["input_ids"], enc["attention_mask"])
        assert len(passages[0]) == 2
        assert scores[0][0] >= scores[0][1]
    finally:
        atlas.cfg.retrieve_with_rerank = False


@pytest.mark.parametrize("mode", ["ppmean", "loop", "emdr", "evalnormssum", "stdnormssum"])
def test_joint_loss_modes(setup, mode):
    atlas, index, _ = setup
    atlas.cfg.gold_score_mode = mode
    try:
        batch, _ = atlas.make_batch(
            index,
            query=["question: about passage 3 answer: <extra_id_0>"] * 2,
            target=["<extra_id_0> three", "<extra_id_0> four"],
            training=True,
        )
        params = {"reader": atlas.reader_params, "retriever": atlas.retriever_params}
        loss, aux = atlas.loss_fn(params, batch, jax.random.PRNGKey(0),
                                  train_retriever=True, training=False)
        assert np.isfinite(float(loss))
        assert "loss/retriever_loss" in aux
        assert np.isfinite(float(aux["loss/retriever_loss"]))
    finally:
        atlas.cfg.gold_score_mode = "ppmean"


def test_joint_loss_grads_flow(setup):
    atlas, index, _ = setup
    batch, _ = atlas.make_batch(
        index, query=["question: q answer: <extra_id_0>"], target=["<extra_id_0> a"],
        training=True,
    )
    params = {"reader": atlas.reader_params, "retriever": atlas.retriever_params}

    grads, aux = jax.grad(
        lambda p: atlas.loss_fn(p, batch, jax.random.PRNGKey(0), train_retriever=True, training=False),
        has_aux=True,
    )(params)
    # reader and retriever both get nonzero grads
    r_norm = jax.tree.reduce(lambda a, x: a + float(jnp.abs(x).sum()), grads["reader"], 0.0)
    q_norm = jax.tree.reduce(lambda a, x: a + float(jnp.abs(x).sum()), grads["retriever"], 0.0)
    assert r_norm > 0 and q_norm > 0


def test_query_side_training_freezes_passage_tower(setup):
    atlas, index, _ = setup
    cfg = AtlasConfig(text_maxlength=32, target_maxlength=16, n_context=2,
                      retriever_n_context=2, precision="fp32",
                      query_side_retriever_training=True)
    atlas2 = tiny_atlas(cfg)
    batch, _ = atlas2.make_batch(
        index, query=["question: q answer: <extra_id_0>"], target=["<extra_id_0> a"],
        training=True,
    )
    params = {"reader": atlas2.reader_params, "retriever": atlas2.retriever_params}
    grads, _ = jax.grad(
        lambda p: atlas2.loss_fn(p, batch, jax.random.PRNGKey(0), train_retriever=True, training=False),
        has_aux=True,
    )(params)
    p_norm = jax.tree.reduce(lambda a, x: a + float(jnp.abs(x).sum()),
                             grads["retriever"]["passage_contriever"], 0.0)
    q_norm = jax.tree.reduce(lambda a, x: a + float(jnp.abs(x).sum()),
                             grads["retriever"]["query_contriever"], 0.0)
    assert p_norm == 0.0 and q_norm > 0.0


def test_kldivloss_matches_torch():
    rng = np.random.RandomState(0)
    score = rng.randn(4, 5).astype(np.float32)
    gold = rng.randn(4, 5).astype(np.float32)
    want = torch.nn.KLDivLoss()(
        torch.log_softmax(torch.tensor(score) / 0.01, dim=-1),
        torch.softmax(torch.tensor(gold) / 0.01, dim=-1),
    )
    got = kldivloss(jnp.asarray(score), jnp.asarray(gold), 0.01, 0.01)
    np.testing.assert_allclose(float(got), float(want), atol=1e-5, rtol=1e-4)


def test_emdr_logprob_matches_reference_formula():
    rng = np.random.RandomState(1)
    B, N, T, V = 2, 3, 4, 11
    score = rng.randn(B, N).astype(np.float32)
    gold_logits = rng.randn(B * N, T, V).astype(np.float32)
    labels = rng.randint(0, V, (B, T))
    labels[1, 2:] = -100
    ts, tg = 0.01, 0.01

    # torch reimplementation of atlas.py:557-575
    lab = torch.tensor(labels)
    rep = torch.repeat_interleave(lab, N, dim=0).clone()
    rep[rep == -100] = 0
    mask = lab >= 0
    glp = torch.log_softmax(torch.tensor(gold_logits) / tg, dim=-1)
    gl = torch.gather(glp, -1, rep[..., None]).view(B, N, T)
    ls = torch.log_softmax(torch.tensor(score) / ts, dim=-1)
    lp = gl + ls[..., None]
    want = -(torch.logsumexp(lp, dim=1) * mask).sum() / mask.sum()

    got = emdr_logprob(jnp.asarray(score), jnp.asarray(gold_logits), jnp.asarray(labels), ts, tg)
    np.testing.assert_allclose(float(got), float(want), atol=1e-5, rtol=1e-4)


def test_prefetch_pretokenized_equivalence(setup):
    """The worker-thread pretokenize path produces the exact same device batch as
    the synchronous path (train/loop.py overlap, SURVEY §7 host-stall note)."""
    from atlas_tpu.train.loop import _prefetch_pretokenized

    atlas, index, passages = setup
    batches = [
        {"query": [f"question: q{i} answer: <extra_id_0>"], "target": [f"<extra_id_0> a{i}"]}
        for i in range(3)
    ]
    seen = []
    for batch, pretok in _prefetch_pretokenized(iter(batches), atlas, enabled=True):
        assert pretok is not None
        sync = atlas.pretokenize(batch["query"], batch["target"])
        for k in sync:
            if isinstance(sync[k], dict):
                for kk in sync[k]:
                    np.testing.assert_array_equal(pretok[k][kk], sync[k][kk])
            else:
                np.testing.assert_array_equal(pretok[k], sync[k])
        b1, _ = atlas.make_batch(index, batch["query"], batch["target"], pretokenized=pretok)
        b2, _ = atlas.make_batch(index, batch["query"], batch["target"])
        for k in b2:
            np.testing.assert_array_equal(np.asarray(b1[k]), np.asarray(b2[k]))
        seen.append(batch["query"][0])
    assert seen == [b["query"][0] for b in batches]  # order preserved


def test_refresh_retrains_approx_index(setup):
    """The faiss lifecycle resets + retrains at EVERY refresh (index.py:348-358):
    after re-embedding with different retriever params, an approx index's codes
    must reflect the NEW embeddings, not the ones it was first trained on."""
    from atlas_tpu.index.approx import DistributedApproxIndex

    atlas, _, passages = setup
    mesh = make_mesh(4, 2)
    index = DistributedApproxIndex("sq8", mesh=mesh, dtype=jnp.float32)
    index.init_embeddings(passages, dim=atlas.retriever_cfg.hidden_size)
    atlas.build_index(index, passages, embedder_batch_size=16)
    codes0 = np.asarray(index.codes[:40]).copy()
    assert index.is_index_trained()

    # perturb the retriever so the refresh produces different embeddings
    old_params = atlas.retriever_params
    try:
        atlas.retriever_params = jax.tree.map(
            lambda x: x + 0.05 * jnp.ones_like(x) if x.ndim >= 2 else x, old_params)
        atlas._corpus_embedder = None  # new index object -> new embedder
        atlas.build_index(index, passages, embedder_batch_size=16)
    finally:
        atlas.retriever_params = old_params
    codes1 = np.asarray(index.codes[:40])
    assert not np.array_equal(codes0, codes1), "refresh left stale codes"
    # and the refreshed index must behave exactly like one built fresh on the
    # same embeddings (quantizer retrained, no stale state anywhere)
    fresh = DistributedApproxIndex("sq8", mesh=mesh, dtype=jnp.float32)
    fresh.init_embeddings(passages, dim=atlas.retriever_cfg.hidden_size)
    fresh.write_embeddings_rows(0, index.embeddings[: index.n_pad])
    fresh.train_index()
    q = index.embeddings[:3].astype(jnp.float32)
    s1, g1 = index.device_search(q, 3)
    s2, g2 = fresh.device_search(q, 3)
    assert np.array_equal(np.asarray(g1), np.asarray(g2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)


def test_overlapped_refresh_matches_blocking(setup):
    """start_refresh/advance (index/refresh.py incremental path) must land on
    exactly the blocking refresh's embeddings, expose a searchable mixed-version
    index mid-window, and touch only the advanced row ranges per advance."""
    atlas, _, passages = setup
    mesh = make_mesh(4, 2)
    index = DistributedIndex(mesh=mesh, dtype=jnp.float32)
    index.init_embeddings(passages, dim=atlas.retriever_cfg.hidden_size)
    atlas._corpus_embedder = None
    atlas.build_index(index, passages, embedder_batch_size=16)
    base = np.asarray(index.embeddings).copy()

    old_params = atlas.retriever_params
    try:
        # perturb the retriever so refreshed rows are distinguishable from base
        atlas.retriever_params = jax.tree.map(
            lambda x: x + 0.05 * jnp.ones_like(x) if x.ndim >= 2 else x, old_params)
        emb = atlas._get_corpus_embedder(index, passages, 16)
        emb.start_refresh()
        assert atlas.index_refresh_in_progress
        assert emb.n_steps > 1, "fixture too small to exercise partial progress"
        done = atlas.advance_index_refresh(1)
        assert not done and atlas.index_refresh_in_progress

        # mid-window: first slab of shard 0 re-embedded, its tail rows untouched
        mid = np.asarray(index.embeddings)
        b, sr = emb.b, emb.shard_rows
        assert not np.allclose(mid[:b], base[:b])
        np.testing.assert_array_equal(mid[b:sr], base[b:sr])
        # and the mixed-version index is searchable between advances
        q = index.embeddings[:2].astype(jnp.float32)
        scores, gids = index.device_search(q, 3)
        assert np.asarray(gids).shape == (2, 3)

        assert atlas.advance_index_refresh(emb.n_steps)  # finish
        assert not atlas.index_refresh_in_progress
        overlapped = np.asarray(index.embeddings).copy()

        # blocking refresh with the same params bit-matches the incremental one
        index2 = DistributedIndex(mesh=mesh, dtype=jnp.float32)
        index2.init_embeddings(passages, dim=atlas.retriever_cfg.hidden_size)
        atlas._corpus_embedder = None
        atlas.build_index(index2, passages, embedder_batch_size=16)
        np.testing.assert_array_equal(overlapped, np.asarray(index2.embeddings))
    finally:
        atlas.retriever_params = old_params
        atlas._corpus_embedder = None


def test_bucket_lengths_invariant_loss():
    """cfg.bucket_lengths pads passage batches to the smallest length bucket
    instead of text_maxlength; padding is masked, so the FiD loss must be
    IDENTICAL (up to f32 numerics) to the max_length-padded batch."""
    from atlas_tpu.models.fid import fid_forward

    from helpers import tiny_atlas

    atlas = tiny_atlas(AtlasConfig(text_maxlength=128, target_maxlength=16,
                                   n_context=2, retriever_n_context=2,
                                   precision="fp32"))
    q = ["tiny q", "second q"]
    passages = [
        [{"title": "a", "text": "short"}, {"title": "b", "text": "also short"}],
        [{"title": "c", "text": "pad me"}, {"title": "d", "text": "tail"}],
    ]
    atlas.cfg.bucket_lengths = True
    tok_b, rtok_b = atlas.tokenize_passages(q, passages)
    atlas.cfg.bucket_lengths = False
    tok_f, rtok_f = atlas.tokenize_passages(q, passages)
    Lb, Lf = tok_b["input_ids"].shape[-1], tok_f["input_ids"].shape[-1]
    assert Lf == atlas.cfg.text_maxlength == 128
    assert Lb < Lf and Lb in atlas.LENGTH_BUCKETS, (Lb, Lf)
    assert rtok_b["input_ids"].shape[-1] in atlas.LENGTH_BUCKETS
    # padded tail is pad tokens with zero mask
    np.testing.assert_array_equal(
        np.asarray(tok_b["input_ids"])[..., :Lb],
        np.asarray(tok_f["input_ids"])[..., :Lb])
    assert np.asarray(tok_f["attention_mask"])[..., Lb:].sum() == 0

    _, labels, dec_in = atlas.tokenize(q, ["yes", "no"])
    loss_b, _, _ = fid_forward(
        atlas.reader_params, atlas.reader_cfg, jnp.asarray(tok_b["input_ids"]),
        jnp.asarray(tok_b["attention_mask"]), jnp.asarray(dec_in),
        labels=jnp.asarray(labels))
    loss_f, _, _ = fid_forward(
        atlas.reader_params, atlas.reader_cfg, jnp.asarray(tok_f["input_ids"]),
        jnp.asarray(tok_f["attention_mask"]), jnp.asarray(dec_in),
        labels=jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(loss_b), np.asarray(loss_f),
                               atol=1e-5, rtol=1e-5)
