"""Persistent XLA compilation cache configuration.

Compiles on this TPU runtime go through a remote-compile tunnel and can take
minutes; the persistent cache turns repeated-process compiles into ~100 ms
disk hits. Called by every CLI/bench entry point."""
from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def configure_compilation_cache(path: str | None = None) -> str:
    import jax
    path = path or os.environ.get("PYQG_TPU_CACHE", _DEFAULT)
    # per-platform subdirectory: CPU AOT artifacts compiled by the remote
    # compile service can carry host-feature mismatches (SIGILL risk) if
    # shared with local CPU runs
    try:
        platform = jax.default_backend()
    except Exception:
        platform = "unknown"
    path = os.path.join(path, platform)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
