"""Persistent XLA compilation cache (VERDICT r2 #5).

The 8B bench step compiled for 624 s on the tunneled TPU backend (BENCH_r02.json) and
every cold start paid it again — the reference never has this problem (PyTorch eager),
so cold-start latency is a TPU-native cost we must engineer away. JAX serializes
compiled executables keyed by (HLO, compile options, platform version); pointing the
cache at a disk dir makes the second cold start load instead of compile.

Every entry point (trainers, bench, eval, tools) calls ``enable_compilation_cache()``
once, before the first jit. Opt out with LLAMA_X_TPU_NO_CACHE=1 (e.g. when timing true
cold compiles).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "~/.cache/llama_x_tpu/xla_cache"


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Idempotent; returns the cache dir (or None when disabled/unavailable)."""
    if os.environ.get("LLAMA_X_TPU_NO_CACHE"):
        return None
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    path = os.path.expanduser(path)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took >1 s to compile, whatever its size — the big
        # trainer steps are hundreds of seconds, tiny jits aren't worth the disk round
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return path
