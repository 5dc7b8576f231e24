"""Persistent XLA compilation cache.

TPU compiles in this project are expensive (long-scan LSTM/WaveNet programs;
tunneled-AOT environments add minutes). Enabling JAX's persistent cache makes
every program compile once per machine.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.path.expanduser("~/.cache/autovc_tpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
