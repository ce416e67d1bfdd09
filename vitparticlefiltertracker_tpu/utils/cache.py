"""Persistent XLA compilation cache.

On a tunneled TPU, compiles round-trip through a slow relay; caching them on
disk makes second runs of the CLI/bench start in seconds instead of minutes.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "vpt-xla-cache")


def enable_compilation_cache(path: str = "") -> None:
    path = path or os.environ.get("VPT_XLA_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older/newer jax without these flags: cache is best-effort
