"""Preemption handling (reference: /root/reference/src/slurm.py:22-46).

SLURM sends SIGUSR1 before timeout: rank 0 requeues the job via `scontrol requeue`
and the process exits so the restart resumes from the `latest` checkpoint
(model_io.load_or_initialize_atlas_model). SIGTERM is ignored (SLURM sends it to all
processes right before a requeue kill)."""

from __future__ import annotations

import logging
import os
import signal
import socket
import subprocess
import sys

logger = logging.getLogger(__name__)


def sig_handler(signum, frame):
    logger.warning("Signal handler called with signal %s", signum)
    prod_id = int(os.environ.get("SLURM_PROCID", "0"))
    logger.warning("Host: %s - Global rank: %i", socket.gethostname(), prod_id)
    if prod_id == 0 and "SLURM_JOB_ID" in os.environ:
        logger.warning("Requeuing job %s", os.environ["SLURM_JOB_ID"])
        subprocess.run(["scontrol", "requeue", os.environ["SLURM_JOB_ID"]], check=False)
    else:
        logger.warning("Not the main process, no need to requeue.")
    # Exit IMMEDIATELY and unconditionally. sys.exit raises SystemExit in
    # whatever frame the signal interrupted — inside native/teardown frames that
    # surfaces as a spurious traceback (or gets swallowed by a broad except and
    # training continues past its SLURM grace period). The requeue has already
    # been issued; flush what we can and hard-exit with the same status
    # sys.exit(-1) would have produced (255).
    logging.shutdown()
    try:
        sys.stdout.flush()
        sys.stderr.flush()
    except Exception:
        pass
    os._exit(255)


def term_handler(signum, frame):
    logger.warning("Signal handler called with signal %s", signum)
    logger.warning("Bypassing SIGTERM.")


def init_signal_handler():
    """Handle signals sent by SLURM for time-limit / pre-emption."""
    signal.signal(signal.SIGUSR1, sig_handler)
    signal.signal(signal.SIGTERM, term_handler)
