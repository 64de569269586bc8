"""Runtime platform selection for CLI entry points.

Plugin-registered backends (e.g. a PJRT plugin that tunnels to remote
TPUs) can override the ``JAX_PLATFORMS`` environment variable during
registration, so exporting ``JAX_PLATFORMS=cpu`` alone does NOT reliably
force CPU — the first backend touch still initializes the plugin (and
hangs if its device lease is unreachable). Forcing a platform requires
BOTH the env var and ``jax.config.update("jax_platforms", ...)`` before
any jax computation. This helper is the one place that encodes that,
wired to the ``--platform`` flag of ``train_multi_dataset.py`` and
``run_benchmark.py`` (the reference pins CUDA devices via
``CUDA_VISIBLE_DEVICES`` instead; a config-level device knob is the
equivalent surface here).
"""

from __future__ import annotations

import os
from typing import Optional


def force_platform(name: Optional[str]) -> None:
    """Force jax onto ``name`` ("cpu", "tpu", ...); ``None``/"default"
    keeps the ambient platform resolution. Must run before the first jax
    computation (backend init is cached for the process lifetime)."""
    if not name or name == "default":
        return
    os.environ["JAX_PLATFORMS"] = name
    import jax

    jax.config.update("jax_platforms", name)
