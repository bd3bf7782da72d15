#!/usr/bin/env python
"""Multi-session serving demo: the production-shaped driver loop.

Shows the intended large-scale deployment pattern:
  1. N UI sessions with HBM-resident state (frame_num + waypoint
     registries) batched per chip;
  2. each step composes one P-frame per session fully on-device
     (waypoint reference frames emitted automatically when a session's
     scroll crosses a 496 px boundary);
  3. packed Annex-B bytes stream back per session for egress;
  4. session state snapshot/restore for eviction (checkpoint/resume).

Run: JAX_PLATFORMS=cpu python examples/serving_demo.py   (or on TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from h264_scroll_encoder_tpu.utils import jaxcache
    jaxcache.enable()

    import jax.numpy as jnp

    from h264_scroll_encoder_tpu.config import ComposerConfig
    from h264_scroll_encoder_tpu.parallel import batch
    from h264_scroll_encoder_tpu.session import ComposerSession
    from h264_scroll_encoder_tpu.utils import snapshot
    from h264_scroll_encoder_tpu.verify import verify_stream

    cfg = ComposerConfig(1280, 720)
    n_sessions = 8
    n_frames = 40

    # Per-session headers + atlases (host, once per session).
    host_sessions = []
    for i in range(n_sessions):
        s = ComposerSession(cfg)
        s.write_parameter_sets()
        s.write_test_atlases(striped=True)
        host_sessions.append(s)

    # Device-resident batched stepping.
    step = batch.make_batched_step(cfg)
    state = batch.SessionState.create(n_sessions)

    t0 = time.perf_counter()
    emitted = 0
    for t in range(n_frames):
        # Each session scrolls at its own speed (UI-driven in production).
        offsets = np.array([(t * (2 + b)) % cfg.height
                            for b in range(n_sessions)], np.int32)
        state, (nal, nal_len, was_wp, bits, ovf) = step(
            state, jnp.asarray(offsets))
        assert not bool(ovf.any())
        nal_np = np.asarray(nal)
        for b in range(n_sessions):
            host_sessions[b].writer.append_raw(
                nal_np[b][: int(nal_len[b])].tobytes())
            emitted += 1
            # A waypoint step consumed the offset for the reference
            # frame; production schedulers re-issue the offset (here the
            # next tick simply continues).
    dt = time.perf_counter() - t0
    print(f"composed {emitted} frames across {n_sessions} sessions "
          f"in {dt*1000:.0f} ms")

    # Verify every session's full stream with the native oracle.
    for b, s in enumerate(host_sessions):
        rep = verify_stream(s.getvalue())
        assert rep.ok, (b, rep.errors[:2])
    print("all session streams verify OK")

    # Evict / restore round trip for session state.
    snapshot.save_batch_state(state, "/tmp/serving_state.npz")
    restored = snapshot.load_batch_state("/tmp/serving_state.npz")
    assert int(restored.frame_num[0]) == int(state.frame_num[0])
    print("device state snapshot/restore OK")


if __name__ == "__main__":
    main()
