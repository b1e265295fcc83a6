"""Persistent XLA compilation cache helper.

The reference is a C++ binary — zero startup compilation.  The TPU build
compiles its fused per-scan / mapping / pose-graph programs on first use
(~20-60 s on a remote-attached chip), so every entry point enables JAX's
persistent compilation cache: the second and later runs of the same
config deserialize the executables instead of recompiling.
"""
from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Enable the JAX persistent compilation cache (idempotent).

    Returns the cache directory in use.  Honors JAX_COMPILATION_CACHE_DIR
    if already set; defaults to ~/.cache/lins_tpu/xla.
    """
    import jax

    cache_dir = (cache_dir
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "lins_tpu", "xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every program that takes noticeable time to compile
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
