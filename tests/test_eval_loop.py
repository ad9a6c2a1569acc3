"""End-to-end evaluation loops (evaluate / run_retrieval_only) on tiny fixtures."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from atlas_tpu.config import AtlasConfig
from atlas_tpu.eval.loop import evaluate, run_retrieval_only
from atlas_tpu.index.flat import DistributedIndex
from atlas_tpu.parallel.mesh import make_mesh

from helpers import tiny_atlas, tiny_passages


@pytest.fixture(scope="module")
def setup(devices, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("eval")
    mesh = make_mesh(4, 2)
    cfg = AtlasConfig(
        text_maxlength=32, target_maxlength=16, n_context=2, retriever_n_context=2,
        precision="fp32", task="qa", generation_max_length=8,
        per_gpu_batch_size=2, write_results=True,
        checkpoint_dir=str(tmp), name="evaltest",
    )
    atlas = tiny_atlas(cfg)
    passages = tiny_passages(20)
    index = DistributedIndex(mesh=mesh, dtype=jnp.float32)
    index.init_embeddings(passages, dim=atlas.retriever_cfg.hidden_size)
    atlas.build_index(index, passages, embedder_batch_size=8)

    data_path = tmp / "qa.jsonl"
    with open(data_path, "w") as f:
        for i in range(5):
            f.write(json.dumps({"question": f"number {i}?", "answers": [f"num {i}"]}) + "\n")
    return atlas, index, cfg, str(data_path), tmp


def test_evaluate_end_to_end(setup):
    atlas, index, cfg, data_path, tmp = setup
    metrics = evaluate(atlas, index, cfg, data_path, step=0)
    assert set(metrics) >= {"exact_match", "f1", "eval_loss"}
    assert np.isfinite(metrics["eval_loss"])
    assert 0.0 <= metrics["exact_match"] <= 100.0
    out = tmp / "evaltest" / "qa-step-0.jsonl"
    assert out.exists()
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 5
    assert {"query", "answers", "generation", "passages"} <= set(rows[0])


def test_retrieve_only_end_to_end(setup):
    atlas, index, cfg, data_path, tmp = setup
    import dataclasses

    cfg2 = dataclasses.replace(cfg, retrieve_only=True)
    run_retrieval_only(atlas, index, cfg2, data_path, step=1)
    out = tmp / "evaltest" / "qa-step-1.jsonl"
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 5
    assert len(rows[0]["passages"]) == cfg.n_context


def test_evaluate_with_approx_index(setup):
    """The --index_mode faiss CLI combination: the eval loop must run unchanged
    against a quantized index (sq8 here) — retrieval results flow through the
    same search_knn contract."""
    import dataclasses

    from atlas_tpu.index.approx import DistributedApproxIndex

    from helpers import tiny_passages

    atlas, index, cfg, data_path, tmp = setup
    passages = tiny_passages(20)
    approx = DistributedApproxIndex("sq8", mesh=index.mesh, dtype=jnp.float32)
    approx.init_embeddings(passages, dim=atlas.retriever_cfg.hidden_size)
    atlas._corpus_embedder = None
    atlas.build_index(approx, passages, embedder_batch_size=8)
    atlas._corpus_embedder = None
    cfg2 = dataclasses.replace(cfg, name="approxeval")
    metrics = evaluate(atlas, approx, cfg2, data_path, step=0)
    assert np.isfinite(metrics["eval_loss"])
    assert 0.0 <= metrics["exact_match"] <= 100.0


def test_evaluate_from_prebuilt_index(setup, tmp_path):
    """The --load_index_path CLI route (index/io.py:68-73, the prebuilt-index
    recipe of example_scripts/nq/train_fewshot.sh): save the built index, reload
    it through load_or_initialize_index, and evaluation must be identical."""
    import dataclasses

    from atlas_tpu.index.io import load_or_initialize_index, save_embeddings_and_index

    atlas, index, cfg, data_path, tmp = setup
    base = evaluate(atlas, index, cfg, data_path, step=3)

    save_cfg = dataclasses.replace(cfg, save_index_path=str(tmp_path / "idx"),
                                   save_index_n_shards=4)
    save_embeddings_and_index(index, save_cfg)
    load_cfg = dataclasses.replace(cfg, load_index_path=str(tmp_path / "idx"),
                                   save_index_n_shards=4, name="loadtest")
    index2, passages = load_or_initialize_index(load_cfg, mesh=index.mesh,
                                                dim=atlas.retriever_cfg.hidden_size)
    assert len(passages) == index.n_total
    got = evaluate(atlas, index2, load_cfg, data_path, step=3)
    assert got["exact_match"] == base["exact_match"]
    assert np.isclose(got["eval_loss"], base["eval_loss"], rtol=1e-5)


def test_evaluate_multiple_choice_postprocessing(setup, tmp_path):
    atlas, index, cfg, _, tmp = setup
    import dataclasses

    mc_cfg = dataclasses.replace(
        cfg, task="multiple_choice", multiple_choice_num_options=2,
        multiple_choice_eval_permutations="cyclic", name="mctest",
    )
    atlas.cfg = mc_cfg
    try:
        data_path = tmp_path / "mc.jsonl"
        with open(data_path, "w") as f:
            for i in range(2):
                f.write(json.dumps({
                    "question": f"pick {i}", "options": {"A": f"alpha{i}", "B": f"beta{i}"},
                    "answer": "A",
                }) + "\n")
        metrics = evaluate(atlas, index, mc_cfg, str(data_path), step=0)
        assert "debiased_accuracy" in metrics
        out = tmp / "mctest" / "mc-step-0.jsonl"
        rows = [json.loads(l) for l in open(out)]
        # permutations reduced: one row per original question, with choice probs
        assert len(rows) == 2
        assert "choice_probs" in rows[0] and "permutations" in rows[0]
    finally:
        atlas.cfg = cfg
