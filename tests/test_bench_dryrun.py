"""bench.py --dryrun: every metric's setup + trace path at tiny shapes.

VERDICT r04 item 2c: round 4 shipped `bench_north_star_ivfsq8` chip-unvalidated
and its 2M-row generator OOMed mid-suite, cascading 6 metrics into a timeout.
This test runs the WHOLE bench suite in dryrun mode (tiny corpora, 1-iter
timings, interpret-mode Pallas) in a subprocess and asserts every metric
produced a valid line — so a bench function that cannot even set up and trace
fails the suite long before the driver runs it on chip."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


@pytest.mark.slow
def test_bench_dryrun_all_metrics_valid():
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    r = subprocess.run([sys.executable, BENCH, "--dryrun"], env=env,
                       capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, r.stderr[-3000:]
    lines = [json.loads(l) for l in r.stdout.splitlines() if l.strip()]
    # one line per registered metric, in order, all valid
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench_mod", BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    want = [b.__name__ for b in mod.BENCHES]
    assert len(lines) == len(want), (len(lines), len(want), r.stdout[-2000:])
    for line, name in zip(lines, want):
        assert line.get("unit") != "error", (name, line)
        assert line.get("value") is not None, (name, line)
        assert "metric" in line and "vs_baseline" in line, (name, line)
        assert "wall_s" in line, (name, line)  # per-metric budget ledger
