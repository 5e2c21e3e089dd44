"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes — this replaces the reference's
"just launch multi-GPU" approach (SURVEY.md §4) with a cluster-free
distributed test bed.
"""

import os

# force CPU: the build environment pins JAX_PLATFORMS to the tunneled TPU
# backend, which has a single chip and slow per-op dispatch — tests need the
# virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon TPU plugin overrides jax_platforms to "axon,cpu" at import time;
# pin it back to cpu-only before any backend initializes
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration tests (multi-process spawn)"
    )
