"""End-to-end learnability regression: train() on a learnable synthetic QA task must
improve exact match — the framework's equivalent of the reference's
"example scripts reach documented metrics" oracle (SURVEY.md §4)."""

import dataclasses
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from atlas_tpu.config import AtlasConfig
from atlas_tpu.eval.loop import evaluate
from atlas_tpu.index.flat import DistributedIndex
from atlas_tpu.parallel.mesh import make_mesh
from atlas_tpu.train.loop import train

from helpers import tiny_atlas, tiny_passages


@pytest.mark.slow
def test_training_improves_exact_match(devices, tmp_path):
    mesh = make_mesh(4, 2)
    cfg = AtlasConfig(
        task="qa", text_maxlength=32, target_maxlength=8, generation_max_length=8,
        n_context=2, retriever_n_context=2, precision="fp32",
        train_retriever=True, total_steps=60, warmup_steps=2, lr=3e-3, lr_retriever=1e-3,
        # per_gpu_batch_size is PER-DEVICE since the mesh wiring: 1 x dp=4 local
        # rows = all 4 examples per step (the pre-mesh global-batch-4 intent)
        scheduler="fixed", per_gpu_batch_size=1, log_freq=1000, eval_freq=1000,
        save_freq=1000, checkpoint_dir=str(tmp_path), name="learn", shuffle=False,
        refresh_index="-1",
    )
    atlas = tiny_atlas(cfg)
    passages = tiny_passages(12)
    index = DistributedIndex(mesh=mesh, dtype=jnp.float32)
    index.init_embeddings(passages, dim=atlas.retriever_cfg.hidden_size)
    atlas.build_index(index, passages, embedder_batch_size=8)

    # a 4-example task with short, memorizable answers
    data_path = tmp_path / "train.jsonl"
    with open(data_path, "w") as f:
        for i, ans in enumerate(["cat", "dog", "sun", "sea"]):
            f.write(json.dumps({"question": f"token {i}?", "answers": [ans]}) + "\n")
    cfg.train_data = [str(data_path)]

    em_before = evaluate(atlas, index, cfg, str(data_path), step=0)["exact_match"]
    atlas, state, step = train(atlas, index, passages, 0, cfg, tmp_path / "learn")
    em_after = evaluate(atlas, index, cfg, str(data_path), step=step)["exact_match"]

    assert step == 60
    assert em_after > em_before or em_after == 100.0, (em_before, em_after)
    assert em_after >= 75.0, (em_before, em_after)  # memorize 3/4 of 4 examples
