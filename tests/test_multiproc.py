"""Real 2-process multi-host integration (VERDICT round-1 item 6).

Spawns two fresh python processes joined via jax.distributed on localhost (4 virtual
CPU devices each -> one 8-device mesh), running tests/multiproc_worker.py. This is
the only place the `jax.process_count() > 1` protocol branches execute for real:
search_knn's query-union, DocStore._exchange, refresh slab assembly, and save/load
resharding with unequal per-process passage counts.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.multiproc
def test_two_process_integration(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{os.path.join(REPO, 'tests')}"  # no device plugins
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            # step 10 adds a production train() + eval + generate (several
            # fresh XLA compiles); under full-suite CPU contention the workers
            # have exceeded 1800s while healthy
            out, _ = p.communicate(timeout=3000)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, out in enumerate(outs):
        # persist full worker output — pytest summaries truncate it, and this
        # test has flaked under full-suite CPU contention; the log survives
        with open(f"/tmp/multiproc_worker{pid}.log", "w") as f:
            f.write(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {pid} rc={p.returncode} (full log: /tmp/multiproc_worker{pid}.log)"
            f"\n{out[-4000:]}")
        assert f"WORKER{pid} OK" in out, out[-2000:]

    _assert_single_process_parity(tmp_path)


def _assert_single_process_parity(tmp_path):
    """Step 10 parity: rerun the workers' dp=4 x mp=2 production train() in THIS
    single process with the same global config — same data in the workers'
    assembled global row order, same seeds — and require the final-params loss
    probe to match the 2-process value (reduction-order noise only)."""
    import json

    import numpy as np
    import jax
    import jax.numpy as jnp

    from atlas_tpu.config import AtlasConfig
    from atlas_tpu.index.flat import DistributedIndex
    from atlas_tpu.model_io import init_atlas_model
    from atlas_tpu.parallel.mesh import make_mesh, set_global_mesh
    from atlas_tpu.train.loop import train as train_loop

    with open(tmp_path / "mp10_result.json") as f:
        got = json.load(f)

    mesh = make_mesh(4, 2)
    set_global_mesh(mesh)
    cfg = AtlasConfig(
        task="qa", text_maxlength=32, target_maxlength=16, n_context=2,
        retriever_n_context=2, precision="fp32", dropout=0.0, tiny_model=True,
        train_retriever=True, shard_optim=True,
        total_steps=3, warmup_steps=1, lr=1e-3, lr_retriever=1e-3,
        scheduler="fixed", per_gpu_batch_size=1, log_freq=100, eval_freq=1000,
        save_freq=1000, shuffle=False, refresh_index="-1",
        checkpoint_dir=str(tmp_path), name="mp10_single",
        generation_max_length=8, seed=3)
    atlas, _ = init_atlas_model(cfg)
    atlas.set_mesh(mesh)
    passages = [{"id": str(i), "title": f"t{i}", "text": f"passage about item {i}"}
                for i in range(16)]
    index = DistributedIndex(mesh=mesh, dtype=jnp.float32)
    index.init_embeddings(passages, dim=atlas.retriever_cfg.hidden_size)
    atlas.build_index(index, passages, embedder_batch_size=8)
    # workers' global batch rows are [1, 3, 0, 2]: the data deal is 1-BASED
    # (tasks/base.py:44-45 `dealt % world == rank`), so rank 0 draws file lines
    # 2,4 (items 1,3) and rank 1 draws lines 1,3 (items 0,2); rank 0's local
    # rows occupy the first dp positions. (r04's parity check assumed
    # [0, 2, 1, 3] — with the retriever-dropout fix the loss is order-invariant
    # at dropout=0, but the replay should still be the real order.)
    data = tmp_path / "mp10_single.jsonl"
    with open(data, "w") as f:
        for i in (1, 3, 0, 2):
            f.write(json.dumps({"question": f"what is item {i}?",
                                "answers": [f"thing {i}"]}) + "\n")
    cfg.train_data = [str(data)]
    atlas, state, step = train_loop(atlas, index, passages, 0, cfg,
                                    str(tmp_path / "mp10_single"))
    assert step == 3
    probe_q = [f"probe question {i}? answer: <extra_id_0>" for i in range(4)]
    probe_t = [f"<extra_id_0> thing {i}" for i in range(4)]
    order = [0, 2, 1, 3]
    batch, _ = atlas.make_batch(index, query=[probe_q[i] for i in order],
                                target=[probe_t[i] for i in order], training=False)
    loss, _ = atlas.loss_fn(state.params, batch, None,
                            train_retriever=True, training=False)
    np.testing.assert_allclose(got["loss"], float(loss), rtol=2e-4), (
        got["loss"], float(loss))
    assert np.array(got["gen_rank0"]).shape == (2, cfg.generation_max_length)
