"""Multi-million-row host rehearsal (VERDICT r03 item 8): the native lazy
loader, DocStore, sharded save/load resharding, and refresh slab accounting
exercised at 2M synthetic passages with an RSS ceiling. Defends the 33M/400M
host-side scaling claims (reference README.md:19,102, src/index.py:61-111)."""

import json
import os
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scale_host_worker.py")


@pytest.mark.slow
def test_2m_passage_host_accounting(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    # Root cause of the r05 full-suite-only failures: the worker measured
    # ru_maxrss, a per-task watermark that survives exec — forked from the
    # ~6 GiB late-suite pytest process it read 6.01 GiB before doing any work
    # (own peak: 1.94). The worker now reads VmHWM (per-address-space, resets
    # at exec). The retry + persisted /tmp/scale_host_worker.log stay as
    # diagnosis for any future environment-dependent failure.
    last = None
    for attempt in range(2):
        work = tmp_path / f"run{attempt}"
        work.mkdir()
        r = subprocess.run([sys.executable, WORKER, str(work)],
                           capture_output=True, text=True, timeout=1800, env=env)
        with open("/tmp/scale_host_worker.log", "w") as f:
            f.write(f"attempt {attempt} rc={r.returncode}\n{r.stdout}\n{r.stderr}")
        last = r
        if r.returncode == 0 and "SCALE_HOST_OK" in r.stdout:
            break
    r = last
    assert r.returncode == 0, (
        f"(full log: /tmp/scale_host_worker.log)\n{r.stderr[-3000:]}")
    assert "SCALE_HOST_OK" in r.stdout, r.stdout[-1000:]
    stats = json.loads(next(l for l in r.stdout.splitlines() if l.startswith("{")))
    # 2M rows as a lazy blob: jax+python baseline is ~1.5 GiB; materializing 2M
    # python dicts alone would add ~0.8 GiB and eager embedding copies more.
    # The whole drill — loader + docstore + 2M-row index + saves — must stay
    # under 6 GiB peak (33M rows extrapolate to ~1.4 GiB of blob+offsets).
    assert stats["rss_final_gib"] < 6.0, stats
