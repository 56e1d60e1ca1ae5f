"""Persistent XLA compilation cache.

The march/render/train graphs take minutes to compile on TPU; caching them
on disk makes every process after the first start instantly. (The reference
has the same concern in miniature — its CUDA extensions JIT-compile on first
import and cache under torch's extension dir, raymarching/backend.py:31-39.)
"""

import os

import jax

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                            "laenerf_tpu_xla")


def enable_compilation_cache(path: str = None):
    path = path or os.environ.get("LAENERF_XLA_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return path
