"""Benchmark: composed 1280x720 P-frames/sec/chip (compose+pack on device).

Measures the flagship pipeline — batched scroll compose, MV-prediction
stencil, parallel-prefix bit pack, emulation prevention, NAL framing — via
an on-device lax.scan over a frame schedule, so no host round-trips land in
the timed region.  Prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

Baseline: the driver north star of 5,000 spliced 720p frames/sec/chip
(BASELINE.json) — the C reference publishes no throughput numbers.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    from h264_scroll_encoder_tpu.utils import jaxcache
    jaxcache.enable()

    import jax
    import jax.numpy as jnp

    from h264_scroll_encoder_tpu.config import ComposerConfig
    from h264_scroll_encoder_tpu.parallel import batch

    cfg = ComposerConfig(1280, 720)
    # BASELINE's config names 64 concurrent sessions; per-chip throughput
    # keeps scaling past that (64 under-utilizes the VPU), so the bench
    # batches 256 sessions per step — the serving sweet spot measured on
    # v5e (see /tmp-independent scaling notes in docs/ARCHITECTURE.md).
    batch_size = 256
    frames_per_scan = 32

    # Triangle scroll schedule (composer src/main.c:109-120), speed 4.
    t = np.arange(frames_per_scan)[:, None] + np.zeros((1, batch_size))
    cycle = (t * 4 + np.arange(batch_size)[None, :] * 17) % (2 * cfg.height)
    offsets = np.where(cycle < cfg.height, cycle, 2 * cfg.height - cycle)
    offsets = jnp.asarray(offsets, jnp.int32)

    state = batch.SessionState.create(batch_size)

    # Donating the session state lets XLA update the HBM-resident
    # per-session buffers in place (~6% per-step win measured on v5e).
    run = jax.jit(lambda s, o: batch.run_frames(cfg, s, o),
                  donate_argnums=(0,))

    # Warm up / compile.  NOTE: block_until_ready is unreliable on the
    # tunneled axon platform — a host fetch (np.asarray) is the only
    # trustworthy completion barrier, so all timing ends with one.
    s1, out = run(state, offsets)
    _ = np.asarray(out[3])
    assert not bool(np.asarray(out[4]).any()), "RBSP budget overflow"

    # Timed: several scan invocations chained through state; the final
    # host fetch of a value depending on every rep closes the region.
    n_reps = 8
    t0 = time.perf_counter()
    s = s1          # `state` was donated to the warm-up call
    acc = None
    for _ in range(n_reps):
        s, out = run(s, offsets)
        chk = out[3].sum(dtype=jnp.uint32)
        acc = chk if acc is None else acc + chk
    _ = int(acc)  # device->host: forces completion of the whole chain
    t1 = time.perf_counter()

    total_frames = n_reps * frames_per_scan * batch_size
    fps = total_frames / (t1 - t0)
    p50_latency_ms = (t1 - t0) / (n_reps * frames_per_scan) * 1000.0

    # Single-frame compose+pack latency (B=1, one step per call) — the
    # BASELINE "p50 per-frame compose+pack latency" tracked metric.
    one = batch.make_batched_step(cfg, emit_waypoints=False)
    s1 = batch.SessionState.create(1)
    off1 = jnp.asarray([240], jnp.int32)
    _, out1 = one(s1, off1)
    _ = np.asarray(out1[1])
    lat = []
    for _ in range(20):
        ta = time.perf_counter()
        _, out1 = one(s1, off1)
        _ = np.asarray(out1[1])
        lat.append(time.perf_counter() - ta)
    p50_single_ms = sorted(lat)[len(lat) // 2] * 1000.0

    # Dispatch floor: a trivial jitted op's round trip.  On tunneled dev
    # chips this is ~25 ms of RPC that dominates single-frame latency;
    # subtract it to estimate co-located hardware latency.
    tiny = jax.jit(lambda x: x + 1)
    x0 = jnp.int32(0)
    _ = int(tiny(x0))
    floor = []
    for _ in range(20):
        ta = time.perf_counter()
        _ = int(tiny(x0))
        floor.append(time.perf_counter() - ta)
    dispatch_floor_ms = sorted(floor)[len(floor) // 2] * 1000.0

    baseline = 5000.0  # north-star target, frames/sec/chip
    print(json.dumps({
        "metric": "composed 720p frames/sec/chip",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline, 3),
        "extra": {
            "batch_sessions": batch_size,
            "p50_batchstep_ms": round(p50_latency_ms, 3),
            "p50_single_frame_ms": round(p50_single_ms, 3),
            "dispatch_floor_ms": round(dispatch_floor_ms, 3),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
