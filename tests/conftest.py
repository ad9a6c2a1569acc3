"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native answer to "how do you test multi-node logic without a cluster"
(SURVEY.md §4): XLA exposes N host-platform devices, so pjit/shard_map code paths run
exactly as they would on an 8-chip slice.

Must set env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any preset TPU platform for tests
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the env var; force the platform through the config too.
jax.config.update("jax_platforms", "cpu")
# XLA-CPU's oneDNN fast path computes fp32 matmuls in reduced precision by default;
# parity tests against torch need true fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    d = jax.devices()
    assert len(d) == 8, f"expected 8 virtual devices, got {len(d)}"
    return d
