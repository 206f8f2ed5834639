"""Honor JAX_PLATFORMS from CLI entry points on this image.

The ambient ``sitecustomize.py`` (PYTHONPATH=/root/.axon_site) imports jax at
interpreter startup and freezes the platform to the axon TPU tunnel BEFORE any user
code runs — ``JAX_PLATFORMS=cpu python eval_librispeech.py`` silently lands on the one
real TPU chip (and contends with whatever is training there). Config updates still work
until the first backend is created, so every CLI entry calls this first thing.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """Re-apply the JAX_PLATFORMS env var over the sitecustomize freeze (no-op when
    unset or when a backend already exists)."""
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        jax.config.update("jax_platforms", want)
    except Exception:
        pass  # backend already initialized; too late to switch
