"""Runtime setup shared by CLIs: persistent compile cache, platform info."""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (huge win: the image-game
    train step takes minutes to compile; cached reloads take seconds)."""
    import jax

    try:
        platform = jax.default_backend()
    except Exception:
        platform = "unknown"
    cache_dir = path or os.environ.get(
        "OSGA_COMPILE_CACHE", f"/tmp/osga_jax_cache_{platform}"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
