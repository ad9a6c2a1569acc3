"""Worker process for the preemption drill (tests/test_preempt.py).

Drives the SLURM preemption path end to end (reference roles:
/root/reference/src/slurm.py:22-46 signal handling, src/model_io.py:180-197
resume-from-latest): a real SIGUSR1 is delivered to a real training process,
the handler requeues via `scontrol` (stubbed onto PATH) and exits; a relaunch
resumes from `latest` and must reach a bit-identical final state.

Modes (argv[1]), all sharing one tiny fixed-seed setup in argv[2]:
- full:    train 0 -> TOTAL uninterrupted, print the param fingerprint.
- preempt: install the production signal handlers, block at a deterministic
  rendezvous after the step-4 checkpoint (train step_hook), then deliver
  SIGUSR1 to ourselves; the handler must run `scontrol requeue` (stub records
  the call) and hard-exit 255.
- resume:  load_or_initialize from `latest`, train to TOTAL, print the
  fingerprint — must equal `full`'s bit for bit.
- preempt_refresh / resume_refresh: same drill with an OVERLAPPED index
  refresh in flight at the kill point (refresh_overlap=2, 4-slab corpus);
  the resume asserts recovery semantics: no half-applied refresh survives —
  the restart re-embeds the whole corpus with the restored retriever, so
  every passage's own text retrieves itself top-1.
"""

import json
import os
import signal
import stat
import sys
import threading
import time

TOTAL = 8


def fingerprint(tree):
    import jax
    import numpy as np

    return [float(np.asarray(x).astype("float64").sum()) for x in jax.tree.leaves(tree)]


def make_cfg(tmp, refresh: bool):
    from atlas_tpu.config import AtlasConfig

    return AtlasConfig(
        task="qa", text_maxlength=32, target_maxlength=16, n_context=2,
        retriever_n_context=2, precision="fp32", tiny_model=True,
        # scenario 1 freezes the retriever so the resume's index re-embed is
        # bit-identical to the stale index the uninterrupted run kept; the
        # refresh scenario trains it (recovery semantics, not bit-parity)
        train_retriever=refresh,
        refresh_index="0-100000:4" if refresh else "-1",
        # overlap=2 spreads the 4-slab refresh over 2 train steps, so at the
        # step-5 rendezvous the refresh is mid-flight (2 of 4 slabs applied)
        refresh_overlap=2 if refresh else 0,
        per_gpu_embedder_batch_size=8 if refresh else 512,
        save_optimizer=True,  # adam moments must survive for bit-parity
        total_steps=TOTAL, warmup_steps=1, lr=1e-3, lr_retriever=1e-3,
        scheduler="fixed", per_gpu_batch_size=1, log_freq=100, eval_freq=1000,
        save_freq=2, checkpoint_dir=tmp, name="drill", shuffle=False, seed=7,
        generation_max_length=8,
    )


def build(tmp, refresh: bool):
    import jax
    import jax.numpy as jnp

    from atlas_tpu.index.flat import DistributedIndex
    from atlas_tpu.model_io import load_or_initialize_atlas_model
    from atlas_tpu.parallel.mesh import make_mesh, set_global_mesh

    mesh = make_mesh(8, 1)
    set_global_mesh(mesh)
    cfg = make_cfg(tmp, refresh)

    data_path = os.path.join(tmp, "train.jsonl")
    if not os.path.exists(data_path):
        with open(data_path, "w") as f:
            for i in range(8):  # exactly one global batch -> order-free resume
                f.write(json.dumps({"question": f"what is item {i}?",
                                    "answers": [f"thing {i}"]}) + "\n")
    cfg.train_data = [data_path]

    atlas, opt_raw, step = load_or_initialize_atlas_model(cfg)
    atlas.set_mesh(mesh)
    # refresh scenario: 256 passages / 8 devices / embedder batch 8 = 4 slabs
    # per overlapped refresh, so the SIGUSR1 lands mid-rebuild
    n_psg = 256 if refresh else 32
    passages = [{"id": str(i), "title": f"t{i}", "text": f"passage about item {i}"}
                for i in range(n_psg)]
    if refresh:
        # mixed-version canaries: identical text in the FIRST and LAST refresh
        # slab — a half-applied rebuild embeds them under different retriever
        # versions and their index rows diverge
        passages[0]["text"] = passages[-1]["text"] = "duplicate canary text"
        passages[0]["title"] = passages[-1]["title"] = "dup"
    index = DistributedIndex(mesh=mesh, dtype=jnp.float32)
    index.init_embeddings(passages, dim=atlas.retriever_cfg.hidden_size)
    atlas.build_index(index, passages, embedder_batch_size=64)
    return cfg, atlas, index, passages, opt_raw, step


def install_preemption(tmp):
    """Production handlers + a PATH-stubbed scontrol that records the requeue."""
    from atlas_tpu.utils.signals import init_signal_handler

    stub_dir = os.path.join(tmp, "bin")
    os.makedirs(stub_dir, exist_ok=True)
    stub = os.path.join(stub_dir, "scontrol")
    with open(stub, "w") as f:
        f.write(f"#!/bin/sh\necho \"$@\" > {tmp}/requeued\n")
    os.chmod(stub, os.stat(stub).st_mode | stat.S_IEXEC)
    os.environ["PATH"] = stub_dir + os.pathsep + os.environ["PATH"]
    os.environ["SLURM_PROCID"] = "0"
    os.environ["SLURM_JOB_ID"] = "424242"
    init_signal_handler()


def make_rendezvous(tmp, refresh: bool):
    """Deterministic kill point (no timing race — the round-4 drill raced a fixed
    1s sleep against steps 5-8 and LOST on an idle box): the train loop's
    step_hook blocks once the kill condition holds — step-4 save complete and,
    for the refresh scenario, the overlapped refresh mid-flight — and a watchdog
    thread delivers SIGUSR1 (what SLURM sends before timeout) the moment the
    hook signals readiness. The signal interrupts the hook's sleep in the main
    thread; the production handler requeues and exits. Returns the step_hook."""
    ready = os.path.join(tmp, "ready_for_signal")

    def run():
        while not os.path.exists(ready):
            time.sleep(0.05)
        os.kill(os.getpid(), signal.SIGUSR1)

    threading.Thread(target=run, daemon=True).start()

    def hook(step, atlas):
        # step 5: the step-4 checkpoint (save_freq=2) is on disk and, in the
        # refresh scenario, the step-4 overlapped refresh has embedded 1 of its
        # 4 slabs — exactly the mid-rebuild state the drill must interrupt
        if step >= 5 and (not refresh or atlas.index_refresh_in_progress):
            with open(ready, "w") as f:
                f.write(str(step))
            deadline = time.time() + 300
            while time.time() < deadline:
                time.sleep(0.1)  # SIGUSR1 lands here; handler exits the process
            # signal never arrived within 5 min: fall through so the drill
            # fails loudly via NOT_PREEMPTED below

    return hook


def main():
    mode, tmp = sys.argv[1], sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from atlas_tpu.train.loop import train

    refresh = mode.endswith("_refresh")
    cfg, atlas, index, passages, opt_raw, step = build(tmp, refresh)
    ckpt = os.path.join(tmp, "drill")

    if mode.startswith("preempt"):
        assert step == 0, step  # fresh start
        install_preemption(tmp)
        hook = make_rendezvous(tmp, refresh)
        train(atlas, index, passages, 0, cfg, ckpt, opt_state_raw=opt_raw,
              step_hook=hook)
        print("NOT_PREEMPTED", flush=True)  # the drill failed: no signal landed
        sys.exit(9)

    if mode == "full":
        assert step == 0, step
        atlas, state, step = train(atlas, index, passages, 0, cfg, ckpt,
                                   opt_state_raw=opt_raw)
    else:  # resume / resume_refresh
        assert 2 <= step < TOTAL, step  # really resumed from a mid-run save
        print(f"RESUMED_AT {step}", flush=True)
        if refresh:
            # recovery semantics: the relaunch re-embedded the corpus with the
            # RESTORED retriever (build() above), so no mid-rebuild mix remains
            assert not atlas.index_refresh_in_progress
        atlas, state, step = train(atlas, index, passages, step, cfg, ckpt,
                                   opt_state_raw=opt_raw)
    assert step == TOTAL, step

    if refresh:
        # index consistency after recovery: no half-applied rebuild survives.
        # The duplicate-text canaries in the first and last slab must hold
        # BIT-IDENTICAL rows (one retriever version embedded the whole corpus,
        # whether via the restart re-embed or the finalized in-flight refresh),
        # and search still returns well-formed results.
        import numpy as np

        emb_final = np.asarray(index.embeddings, dtype=np.float32)
        np.testing.assert_array_equal(emb_final[0], emb_final[len(passages) - 1])
        assert not atlas.index_refresh_in_progress
        q = emb_final[:4]
        docs, scores = index.search_knn(q, 3)
        assert all(len(r) == 3 for r in docs)
        assert np.isfinite(np.asarray(scores)).all()
    print("FINGERPRINT " + json.dumps(fingerprint(atlas.reader_params)), flush=True)
    print(f"WORKER_{mode.upper()}_OK", flush=True)


if __name__ == "__main__":
    main()
