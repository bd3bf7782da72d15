"""Persistent XLA compilation cache setup.

The deployment environment compiles through a remote service (axon tunnel)
where each fresh compile can queue for minutes; the persistent cache makes
every recompile of an unchanged program a local disk hit.  Call early.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "H264TPU_JAX_CACHE", os.path.expanduser("~/.cache/h264tpu_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
