"""Session checkpoint / resume.

The reference has no checkpointing; its closest analog is the
stream-internal persistent state — long-term reference pictures immune to
frame_num wraparound and the waypoint registry
(include/h264_writer.h:30-58, SURVEY.md §5).  In the TPU build that state
is exactly what must be snapshot-able to evict and restore sessions:
frame_num + waypoint registry (+ the already-emitted byte count for
exactly-once egress bookkeeping).

Two forms:
  - host `ComposerSession`: JSON dict (tiny, human-readable).
  - device `parallel.batch.SessionState`: numpy .npz of the pytree
    (orbax would also work; the state is a few hundred bytes/session so a
    plain npz keeps the dependency surface minimal).
"""

from __future__ import annotations

import json

import numpy as np


# -- host session -----------------------------------------------------------

def session_state_dict(session) -> dict:
    return {
        "frame_num": session.frame_num,
        "frames_written": session.frames_written,
        "waypoints": {
            "offsets": list(session.waypoints.offsets),
            "long_term_idx": list(session.waypoints.long_term_idx),
            "count": session.waypoints.count,
        },
        "bytes_emitted": session.writer.size,
        "enable_pskip": session.enable_pskip,
        "config": {
            "width": session.cfg.width,
            "height": session.cfg.height,
            "rbsp_bits_per_mb": session.cfg.rbsp_bits_per_mb,
        },
    }


def save_session(session, path) -> None:
    with open(path, "w") as f:
        json.dump(session_state_dict(session), f)


def restore_session(session, path) -> None:
    """Restore dynamic state into a freshly-constructed session whose
    config matches the snapshot (the emitted-stream prefix itself is the
    caller's to replay/keep — state here resumes *future* frames)."""
    with open(path) as f:
        snap = json.load(f)
    if (snap["config"]["width"], snap["config"]["height"]) != (
            session.cfg.width, session.cfg.height):
        raise ValueError("snapshot geometry does not match session config")
    session.frame_num = snap["frame_num"]
    session.frames_written = snap["frames_written"]
    wp = snap["waypoints"]
    session.waypoints.offsets = list(wp["offsets"])
    session.waypoints.long_term_idx = list(wp["long_term_idx"])
    session.waypoints.count = wp["count"]


# -- serving (splice) state -------------------------------------------------

def save_serving_state(path, batch_state, host_context: dict) -> None:
    """Evict a batched *splice-serving* session set: the device
    SessionState pytree plus the serving loop's host scheduling context
    (ref maps, per-session schedule cursors, prev-ref header state,
    donor-class pins — any JSON-able dict).

    The composite reference pictures themselves live in the DECODER's
    DPB (the emitted stream), not in host/device memory — the reference
    design's stream-internal state (SURVEY.md §5) — so this snapshot
    plus the already-emitted byte prefix is the complete session."""
    ctx = json.dumps(host_context)
    np.savez(path,
             frame_num=np.asarray(batch_state.frame_num),
             wp_offsets=np.asarray(batch_state.wp_offsets),
             wp_ltidx=np.asarray(batch_state.wp_ltidx),
             wp_valid=np.asarray(batch_state.wp_valid),
             wp_count=np.asarray(batch_state.wp_count),
             host_context=np.frombuffer(ctx.encode(), np.uint8))


def load_serving_state(path):
    """Inverse of save_serving_state -> (SessionState, host_context)."""
    state = load_batch_state(path)
    z = np.load(path)
    ctx = json.loads(z["host_context"].tobytes().decode())
    return state, ctx


# -- device batch state -----------------------------------------------------

def save_batch_state(state, path) -> None:
    np.savez(path,
             frame_num=np.asarray(state.frame_num),
             wp_offsets=np.asarray(state.wp_offsets),
             wp_ltidx=np.asarray(state.wp_ltidx),
             wp_valid=np.asarray(state.wp_valid),
             wp_count=np.asarray(state.wp_count))


def load_batch_state(path):
    import jax.numpy as jnp

    from ..parallel.batch import SessionState

    z = np.load(path)
    return SessionState(
        frame_num=jnp.asarray(z["frame_num"]),
        wp_offsets=jnp.asarray(z["wp_offsets"]),
        wp_ltidx=jnp.asarray(z["wp_ltidx"]),
        wp_valid=jnp.asarray(z["wp_valid"]),
        wp_count=jnp.asarray(z["wp_count"]),
    )
