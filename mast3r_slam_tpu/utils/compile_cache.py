"""Persistent XLA compilation cache setup.

Full-size tracking-step graphs take minutes to compile on a TPU tunnel; the
persistent cache makes every process after the first start instantly. Called
by main.py / bench.py / __graft_entry__.py at import.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            cache_dir or os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # never block startup on cache issues
        print(f"[compile-cache] disabled: {e}")
