"""Force the jax backend for host-side CLI entry points.

The environment pins JAX_PLATFORMS to the TPU plugin, and the plugin
re-overrides the env var at import time — so forcing a platform needs BOTH
the env var and the config update, applied before any other jax use (the
same dance as tests/conftest.py). Shared by the checkpoint-conversion CLIs
(pure host-side numpy work that must not steal the one-TPU-job-at-a-time
slot or wedge when the tunnel is down) and the training CLI's MDT_PLATFORM
override.
"""

from __future__ import annotations

import os


def force_platform(name: str) -> None:
    os.environ["JAX_PLATFORMS"] = name
    import jax

    jax.config.update("jax_platforms", name)
