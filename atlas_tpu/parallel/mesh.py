"""Device mesh + runtime init.

TPU-native replacement for the reference's process-group plumbing
(/root/reference/src/slurm.py:49-185, torchrun_utils.py:16-78): there is no backend
selection or socket discovery — `jax.distributed.initialize()` joins the multi-host
runtime, and a single global `jax.sharding.Mesh` with axes ("dp", "mp") carries every
collective implicitly through GSPMD/shard_map lowering onto ICI/DCN.

The passage index is sharded over the flattened mesh (both axes): "1 worker = 1 index
shard" (index.py:49-53) becomes "1 device = 1 index shard".
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

_GLOBAL_MESH: Optional[Mesh] = None


def init_distributed_mode(cfg=None) -> None:
    """Join the jax multi-host runtime when launched under a cluster scheduler.

    Replaces slurm.py:49-185: JAX discovers the coordinator from SLURM/TPU env vars
    itself; explicit addresses only needed for bare multi-process launches.
    """
    # Some platform plugins ignore the JAX_PLATFORMS env var; enforce it through
    # the config so `JAX_PLATFORMS=cpu python train.py ...` behaves as documented.
    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    # Decide from the ENVIRONMENT (not jax.process_count(), which would initialize
    # the local backend and break a later jax.distributed.initialize()).
    multi = os.environ.get("SLURM_NTASKS", "1") != "1" or "COORDINATOR_ADDRESS" in os.environ
    if multi:
        try:
            jax.distributed.initialize()
        except RuntimeError as e:
            # only double-init is benign; real failures (unreachable coordinator,
            # barrier timeout) must be loud, not a silent 1-process run
            if "already initialized" not in str(e).lower():
                raise
    if cfg is not None:
        cfg.global_rank = jax.process_index()
        cfg.world_size = jax.process_count()
        cfg.is_main = cfg.global_rank == 0
        cfg.is_distributed = cfg.world_size > 1


def make_mesh(dp_size: int = -1, mp_size: int = 1, devices=None) -> Mesh:
    """Create the global ("dp", "mp") mesh. dp_size=-1 -> all devices / mp_size."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp_size == -1:
        assert n % mp_size == 0, f"{n} devices not divisible by mp_size={mp_size}"
        dp_size = n // mp_size
    assert dp_size * mp_size == n, f"dp {dp_size} x mp {mp_size} != {n} devices"
    arr = np.asarray(devices).reshape(dp_size, mp_size)
    return Mesh(arr, axis_names=("dp", "mp"))


def set_global_mesh(mesh: Mesh) -> None:
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def get_mesh(dp_size: int = -1, mp_size: int = 1) -> Mesh:
    """Return the process-wide mesh, creating it on first use."""
    global _GLOBAL_MESH
    if _GLOBAL_MESH is None:
        _GLOBAL_MESH = make_mesh(dp_size, mp_size)
    return _GLOBAL_MESH


def mesh_shape(mesh: Mesh) -> Tuple[int, int]:
    return mesh.shape["dp"], mesh.shape["mp"]


def local_dp_size(mesh: Mesh) -> int:
    """Number of dp rows owned by this process (devices are process-ordered in
    make_mesh, so each process holds a contiguous block of dp rows)."""
    return max(1, mesh.shape.get("dp", 1) // max(jax.process_count(), 1))


def index_sharding(mesh: Mesh) -> NamedSharding:
    """Row-sharding of the passage-embedding matrix over the full mesh."""
    return NamedSharding(mesh, P(("dp", "mp"), None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
