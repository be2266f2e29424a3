"""Persistent XLA compilation cache — first compiles of the big models are
slow (minutes through a remote-compile path); cache them across processes."""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str = None) -> None:
    import jax
    try:
        if jax.default_backend() != "tpu":
            # CPU executables cached via a remote-compile service may carry
            # host-feature flags that SIGILL elsewhere; cache TPU only.
            return
    except Exception:
        return
    cache_dir = cache_dir or os.environ.get(
        "SIMPLE_TAD_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
