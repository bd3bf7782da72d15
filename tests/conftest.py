"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip sharding is validated on virtual CPU devices (no multi-chip TPU
hardware in CI); the real-chip benchmark path is exercised by bench.py.
Must run before jax initializes its backends.
"""

import os
import sys

# Force CPU with 8 virtual devices.  Env vars are NOT enough here: the
# environment's sitecustomize registers the axon TPU plugin at interpreter
# start and calls jax.config.update("jax_platforms", "axon,cpu"), which
# overrides JAX_PLATFORMS — so override back through jax.config before any
# backend client is created.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compile cache: this environment routes every XLA compile
# (even CPU) through a remote service whose queue can take minutes; the
# cache makes recompiles of unchanged programs a local disk hit.
from h264_scroll_encoder_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache"))

import subprocess
from pathlib import Path

import pytest

# Every compiled XLA:CPU executable pins a handful of JIT code mappings
# for the life of the process; a full-suite run accumulates ~65k and
# crosses the kernel's vm.max_map_count (65530 default), at which point
# mmap failure segfaults inside jaxlib (observed round 4: the suite died
# reproducibly in whichever test compiled next once the count was
# reached).  Two defenses: raise the limit when permitted, and clear
# jax's executable caches between test modules to bound growth.
try:
    subprocess.run(["sysctl", "-w", "vm.max_map_count=1048576"],
                   capture_output=True, check=False)
except OSError:
    pass


def _map_count() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


def _map_limit() -> int:
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            return int(f.read())
    except (OSError, ValueError):
        return 65530


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_mappings():
    yield
    # Clear only when within ~8k mappings of the limit (the largest
    # observed per-test growth is ~4k): when the sysctl raise succeeded
    # this never fires and warm caches survive the whole run.
    if _map_count() > _map_limit() - 8192:
        jax.clear_caches()

REFERENCE_DIR = Path("/root/reference")
REF_BUILD_DIR = Path("/tmp/refbuild")


def _build_reference_binaries() -> dict:
    """Compile the C reference out-of-tree for differential testing.

    The reference tree is read-only; binaries go to /tmp/refbuild.  Returns
    {} if the reference sources are unavailable (tests then fall back to the
    committed golden fixtures).
    """
    if not REFERENCE_DIR.is_dir():
        return {}
    REF_BUILD_DIR.mkdir(parents=True, exist_ok=True)
    targets = {
        "composer": [
            "gcc", "-O2", "-I", str(REFERENCE_DIR / "include"),
            *sorted(str(p) for p in (REFERENCE_DIR / "src").glob("*.c")),
            "-o", str(REF_BUILD_DIR / "composer"),
        ],
        "h264_scroll_encoder": [
            "gcc", "-O2", "-I",
            str(REFERENCE_DIR / "experiments/scroll-encoder/include"),
            *sorted(str(p) for p in
                    (REFERENCE_DIR / "experiments/scroll-encoder/src").glob("*.c")),
            "-o", str(REF_BUILD_DIR / "h264_scroll_encoder"),
        ],
        "trans_resizer": [
            "gcc", "-O2", "-I",
            str(REFERENCE_DIR / "experiments/trans-resizer"),
            str(REFERENCE_DIR / "experiments/trans-resizer/trans_resizer.c"),
            str(REFERENCE_DIR / "experiments/trans-resizer/bitwriter.c"),
            "-o", str(REF_BUILD_DIR / "trans_resizer"),
        ],
    }
    out = {}
    for name, cmd in targets.items():
        exe = REF_BUILD_DIR / name
        if not exe.exists():
            r = subprocess.run(cmd, capture_output=True)
            if r.returncode != 0:
                continue
        out[name] = exe
    return out


@pytest.fixture(scope="session")
def ref_binaries():
    bins = _build_reference_binaries()
    if not bins:
        pytest.skip("C reference unavailable for differential testing")
    return bins
