"""Preemption drill (VERDICT r03 item 5): a REAL SIGUSR1 against a REAL
training process, requeue side effect verified, relaunch resumes from `latest`
bit-identically — including with an overlapped index refresh in flight.

Reference roles: /root/reference/src/slurm.py:22-46 (signal -> scontrol
requeue -> exit), src/model_io.py:180-197 (resume from latest)."""

import json
import os
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "preempt_worker.py")


def _run(mode, tmp, timeout=900):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    return subprocess.run([sys.executable, WORKER, mode, str(tmp)],
                          capture_output=True, text=True, timeout=timeout, env=env)


def _fingerprint(out: str):
    line = next(l for l in out.splitlines() if l.startswith("FINGERPRINT "))
    return json.loads(line[len("FINGERPRINT "):])


@pytest.mark.slow
def test_sigusr1_requeue_resume_bit_identical(tmp_path):
    """Train 8 steps uninterrupted; separately, train until SIGUSR1 lands after
    the step-4 save (handler requeues + exits -1), then relaunch and resume to
    step 8. Final reader params must match bit for bit."""
    full_dir, drill_dir = tmp_path / "full", tmp_path / "drill"
    full_dir.mkdir(), drill_dir.mkdir()

    r_full = _run("full", full_dir)
    assert r_full.returncode == 0, r_full.stderr[-2000:]
    want = _fingerprint(r_full.stdout)

    r_pre = _run("preempt", drill_dir)
    # the SIGUSR1 handler exits -1 (exit code 255); reaching TOTAL means the
    # signal never landed and the drill proved nothing
    assert r_pre.returncode == 255, (r_pre.returncode, r_pre.stdout[-500:],
                                     r_pre.stderr[-1000:])
    assert "NOT_PREEMPTED" not in r_pre.stdout
    # the handler really drove `scontrol requeue <jobid>` (PATH-stubbed)
    with open(drill_dir / "requeued") as f:
        assert f.read().split() == ["requeue", "424242"]

    r_res = _run("resume", drill_dir)
    assert r_res.returncode == 0, r_res.stderr[-2000:]
    assert any(l.startswith("RESUMED_AT ") for l in r_res.stdout.splitlines())
    assert _fingerprint(r_res.stdout) == want, "resume diverged from uninterrupted run"


@pytest.mark.slow
def test_preempt_during_overlapped_refresh_recovers(tmp_path):
    """Kill the process while an overlapped refresh (refresh_overlap=1, 4-slab
    corpus) is mid-flight; the relaunch must come back with a CONSISTENT index
    (full re-embed under the restored retriever: every passage retrieves
    itself top-1) and finish training."""
    drill_dir = tmp_path / "drill_refresh"
    drill_dir.mkdir()

    r_pre = _run("preempt_refresh", drill_dir)
    assert r_pre.returncode == 255, (r_pre.returncode, r_pre.stdout[-500:],
                                     r_pre.stderr[-1000:])
    assert (drill_dir / "requeued").exists()

    r_res = _run("resume_refresh", drill_dir)
    assert r_res.returncode == 0, (r_res.stdout[-500:], r_res.stderr[-2000:])
    assert "WORKER_RESUME_REFRESH_OK" in r_res.stdout
