"""Persistent XLA compilation cache.

First compiles through the remote-compile tunnel cost 20-100s per
program; the persistent cache makes every later process reuse them
(measured 13.1s → 1.0s). Call once before building pipelines.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.environ.get(
    "TF_TPU_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"))


def enable_compilation_cache(path: str = DEFAULT_DIR) -> str:
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache EVERYTHING: a 0.3 s eager-op compile (scatter, broadcast...)
    # through the compile tunnel is still worth persisting — dozens of
    # them land inside the timed loop when shapes first appear
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
