"""Persistent XLA compilation cache setup.

The deployment environment compiles through a remote service (axon tunnel)
where each fresh compile can queue for minutes; the persistent cache makes
every recompile of an unchanged program a local disk hit.  Call early.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _host_tag() -> str:
    """Fingerprint of the host CPU.  XLA:CPU caches AOT machine code
    compiled for the build host's exact feature set; loading it on a
    re-provisioned box with different features SIGILL/segfaults (observed
    round 4: a stale cache from a previous round's host crashed the
    suite).  Keying the cache dir by CPU model isolates each host."""
    model = platform.processor() or platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    return hashlib.sha1(model.encode()).hexdigest()[:12]


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "H264TPU_JAX_CACHE", os.path.expanduser("~/.cache/h264tpu_jax"))
    cache_dir = os.path.join(cache_dir, _host_tag())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # Only cache compiles worth caching (>=1 s): sub-second eager-op
    # executables are recompiled faster than a disk round trip, and the
    # thousands of tiny entries they create maximize exposure to
    # truncated-entry corruption (cache writes are not atomic across
    # concurrent processes; a truncated entry segfaults jaxlib's
    # deserializer on the next read — observed round 4).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
