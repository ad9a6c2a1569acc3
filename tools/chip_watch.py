#!/usr/bin/env python
"""Tunnel watcher + chip benchmark queue.

The axon TPU tunnel drops for hours at a time; chip A/Bs queue up behind it.
This detachable runner probes the tunnel with a SUBPROCESS (an in-process
`jax.devices()` hangs forever when the tunnel is down), and the moment a probe
succeeds runs the queued benchmarks sequentially, appending everything to the
log file. Launch detached so it survives the launching shell:

  nohup python tools/chip_watch.py /tmp/chip_results.log > /tmp/chipwatch.log 2>&1 &
  echo $! > /tmp/chipwatch.pid     # later: kill $(cat /tmp/chipwatch.pid)

Queue defined in QUEUE below; edit before launching.
"""

import os
import subprocess
import sys
import time

ENV = dict(os.environ, PYTHONPATH="/root/repo:/root/.axon_site")
PROBE = ("import jax, numpy as np; x = jax.numpy.ones((8,128)) * 2; "
         "print('ok', float(np.asarray(x).sum()))")

QUEUE = [
    # (argv, timeout_s)
    (["python", "-u", "tools/bench_greedy_fused.py", "t5-base", "20", "int8"], 2400),
    (["python", "-u", "tools/bench_greedy_fused.py", "t5-base", "20", "int8:w8"], 2400),
    (["python", "-u", "tools/bench_greedy_fused.py", "t5-large", "20",
      "int8,int8:w8"], 3600),
    (["python", "-u", "tools/bench_greedy_fused.py", "google/t5-xl-lm-adapt", "20",
      "int8,int8:w8"], 5400),
    (["python", "-u", "tools/bench_beam_w8.py", "t5-large", "20", "int8"], 3600),
]


def probe(timeout=120) -> bool:
    try:
        r = subprocess.run(["python", "-c", PROBE], env=ENV, timeout=timeout,
                           capture_output=True, text=True, cwd="/root/repo")
        return r.returncode == 0 and "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    log_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chip_results.log"
    with open(log_path, "a") as log:
        def say(msg):
            line = f"[{time.strftime('%H:%M:%S')}] {msg}"
            print(line, flush=True)
            log.write(line + "\n")
            log.flush()

        say("watching for tunnel...")
        n = 0
        while not probe():
            n += 1
            if n % 10 == 0:
                say(f"tunnel still down after {n} probes")
            time.sleep(120)
        say("TUNNEL UP — running queue")
        for argv, tmo in QUEUE:
            say(f"run: {' '.join(argv)}")
            try:
                r = subprocess.run(argv, env=ENV, timeout=tmo, cwd="/root/repo",
                                   capture_output=True, text=True)
                log.write(r.stdout + ("\n--- stderr tail ---\n" + r.stderr[-2000:]
                                      if r.returncode else "") + "\n")
                log.flush()
                say(f"rc={r.returncode}")
            except subprocess.TimeoutExpired:
                say("TIMED OUT")
        say("queue done")


if __name__ == "__main__":
    main()
