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
            out, _ = p.communicate(timeout=1800)
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
