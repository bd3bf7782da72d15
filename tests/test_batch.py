"""Batched/device path vs the host session path, sharding, snapshots."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from h264_scroll_encoder_tpu.config import ComposerConfig
from h264_scroll_encoder_tpu.parallel import batch
from h264_scroll_encoder_tpu.session import ComposerSession
from h264_scroll_encoder_tpu.utils import snapshot


CFG = ComposerConfig(64, 1024)  # tall: crosses the 496 px waypoint limit
OFFSETS = [0, 100, 496, 496, 600, 992, 992, 1000, 300, 12]
# (offsets repeat after a waypoint step, mirroring the composer scheduler)


def session_stream_nals(offsets):
    s = ComposerSession(CFG)
    s.frame_num = 2  # post-atlas, mirroring SessionState.create(frame_num=2)
    for off in offsets:
        s.write_scroll_or_waypoint_frame(off)
    from h264_scroll_encoder_tpu.syntax import parse
    return [b"\x00\x00\x00\x01" + bytes([(u.nal_ref_idc << 5)
                                         | u.nal_unit_type]) + u.data
            for u in parse.iter_nal_units(s.getvalue())]


def test_batched_step_matches_session():
    """One-session batch stepped through a waypoint-crossing schedule must
    emit byte-identical NALs to the host session (experiment scheduling:
    waypoint-if-needed else scroll, one frame per step)."""
    step = batch.make_batched_step(CFG)
    state = batch.SessionState.create(1, frame_num=2)
    got = []
    for off in OFFSETS:
        state, (nal, nal_len, wp, bits, ovf) = step(
            state, jnp.asarray([off], jnp.int32))
        assert not bool(ovf[0])
        got.append(np.asarray(nal[0])[: int(nal_len[0])].tobytes())
    exp = session_stream_nals(OFFSETS)
    assert len(got) == len(exp)
    for i, (g, e) in enumerate(zip(got, exp)):
        assert g == e, f"frame {i} differs (len {len(g)} vs {len(e)})"


def test_batch_divergent_sessions():
    """Sessions with different offsets/waypoint states in one batch must
    each match their own single-session run."""
    scheds = [[0, 4, 8, 12], [496, 496, 600, 604], [992, 40, 992, 992]]
    # Per-batch-step offsets: column b = schedule of session b.
    step = batch.make_batched_step(CFG)
    state = batch.SessionState.create(len(scheds), frame_num=2)
    got = [[] for _ in scheds]
    for t in range(4):
        offs = jnp.asarray([s[t] for s in scheds], jnp.int32)
        state, (nal, nal_len, wp, bits, ovf) = step(state, offs)
        for b in range(len(scheds)):
            got[b].append(np.asarray(nal[b])[: int(nal_len[b])].tobytes())
    for b, sched in enumerate(scheds):
        exp = session_stream_nals(sched)
        assert got[b] == exp, f"session {b}"


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual devices")
def test_sharded_step_matches_batched():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n_dev = min(8, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=("sessions",))
    bsz = 2 * n_dev
    offs = jnp.asarray((np.arange(bsz) * 8) % 512, jnp.int32)

    state = batch.SessionState.create(bsz, frame_num=2)
    ref_step = batch.make_batched_step(CFG)
    _, ref_out = ref_step(state, offs)

    sharding = NamedSharding(mesh, P("sessions"))
    sh_state = jax.tree.map(lambda x: jax.device_put(x, sharding),
                            batch.SessionState.create(bsz, frame_num=2))
    sh_step = batch.make_sharded_step(CFG, mesh)
    _, sh_out = sh_step(sh_state, jax.device_put(offs, sharding))

    for a, b in zip(ref_out, sh_out):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_run_frames_scan():
    offsets = np.tile(np.asarray(OFFSETS)[:, None], (1, 2))
    state = batch.SessionState.create(2, frame_num=2)
    final, (nal_len, wp, bits, checksum, ovf) = jax.jit(
        lambda s, o: batch.run_frames(CFG, s, o))(state, offsets)
    assert nal_len.shape == (len(OFFSETS), 2)
    assert not bool(jnp.any(ovf))
    assert int(final.frame_num[0]) == 2 + len(OFFSETS)
    # Waypoints registered at 496 and 992.
    assert int(final.wp_count[0]) == 2


def test_run_frames_composer_semantics():
    """composer_semantics: a waypoint step stalls the session's schedule
    pointer so the scroll frame of the same offset follows (the composer
    CLI's two-NAL behavior) — checked against the host session."""
    sched = [40, 496, 600, 992, 1000]   # waypoints fire at 496 and 992
    T = len(sched) + 2                  # room for the two stalls
    offsets = np.tile(np.asarray(
        sched + [sched[-1]] * 2)[:, None], (1, 1))
    state = batch.SessionState.create(1, frame_num=2)
    final, (nal_len, wp, bits, checksum, ovf) = jax.jit(
        lambda s, o: batch.run_frames(CFG, s, o,
                                      composer_semantics=True))(
        state, offsets)
    assert not bool(jnp.any(ovf))
    assert int(final.wp_count[0]) == 2
    # Host equivalent: composer-style write_scroll_frame (2 NALs on
    # waypoint steps) over the raw schedule.
    s = ComposerSession(CFG)
    s.frame_num = 2
    for off in sched:
        s.write_scroll_frame(off)
    from h264_scroll_encoder_tpu.syntax import parse
    host_lens = [len(u.data) + 5
                 for u in parse.iter_nal_units(s.getvalue())]
    got_lens = [int(x) for x in np.asarray(nal_len)[:, 0]]
    assert got_lens == host_lens


def test_preprovisioned_waypoints_fix_mv_limit():
    """With the waypoint chain pre-provisioned, every frame of a full
    from-zero scroll cycle stays within the hardware MV budget — the
    reference's low-offset violation (docs/KNOWN_ISSUES_ANALYSIS.md)."""
    from h264_scroll_encoder_tpu.verify import verify_stream

    def run(safe):
        s = ComposerSession(ComposerConfig(64, 720))
        s.write_parameter_sets()
        s.write_test_atlases(striped=True)
        if safe:
            s.preprovision_waypoints()
        for off in range(0, 720, 48):
            s.write_scroll_frame(off)
        return verify_stream(s.getvalue(), strict_mv=True,
                             mv_limit_px=496)

    unsafe = run(False)
    assert not unsafe.ok and any("mv_y" in e for e in unsafe.errors)
    safe = run(True)
    assert safe.ok, safe.errors
    assert safe.max_abs_mv_y_px <= 496


def test_snapshot_roundtrip(tmp_path):
    # Host session.
    s = ComposerSession(CFG)
    for off in (0, 496, 496, 600):
        s.write_scroll_or_waypoint_frame(off)
    snapshot.save_session(s, tmp_path / "sess.json")
    s2 = ComposerSession(CFG)
    snapshot.restore_session(s2, tmp_path / "sess.json")
    assert s2.frame_num == s.frame_num
    assert s2.waypoints.count == 1
    # Resumed emission must match continued emission.
    s.write_scroll_frame(700)
    s2.write_scroll_frame(700)
    from h264_scroll_encoder_tpu.syntax import parse
    a = list(parse.iter_nal_units(s.getvalue()))[-1]
    b = list(parse.iter_nal_units(s2.getvalue()))[-1]
    assert a.data == b.data

    # Device batch state.
    state = batch.SessionState.create(3, frame_num=5)
    snapshot.save_batch_state(state, tmp_path / "batch.npz")
    state2 = snapshot.load_batch_state(tmp_path / "batch.npz")
    assert int(state2.frame_num[0]) == 5
    assert state2.wp_offsets.shape == state.wp_offsets.shape


def test_waypoint_exhaustion_flagged():
    """A schedule needing a 9th waypoint must be flagged (device) and
    raise (host session) instead of silently emitting >496 px MVs —
    the C reference drops the registration with no diagnostic
    (src/h264_writer.c:771-777)."""
    from h264_scroll_encoder_tpu.config import MAX_WAYPOINTS, MV_LIMIT_PX

    step = batch.make_batched_step(CFG)
    state = batch.SessionState.create(1, frame_num=2)
    for k in range(1, MAX_WAYPOINTS + 1):
        state, (nal, nal_len, wp, bits, ovf) = step(
            state, jnp.asarray([k * MV_LIMIT_PX], jnp.int32))
        assert bool(wp[0]) and not bool(ovf[0])
    assert int(state.wp_count[0]) == MAX_WAYPOINTS
    # 9th waypoint: flagged through the not-servable output.
    state, (nal, nal_len, wp, bits, ovf) = step(
        state, jnp.asarray([(MAX_WAYPOINTS + 1) * MV_LIMIT_PX], jnp.int32))
    assert bool(ovf[0])
    assert int(state.wp_count[0]) == MAX_WAYPOINTS

    s = ComposerSession(CFG)
    s.write_parameter_sets()
    s.write_test_atlases()
    for k in range(1, MAX_WAYPOINTS + 1):
        s.write_scroll_frame(k * MV_LIMIT_PX)
    with pytest.raises(OverflowError, match="waypoint registry full"):
        s.write_scroll_frame((MAX_WAYPOINTS + 1) * MV_LIMIT_PX)


def test_compact_batch_nal():
    """Egress compaction: packed[:total] == the concatenation of each
    stream's valid prefix, for ragged lengths including zero."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from h264_scroll_encoder_tpu.parallel.batch import compact_batch_nal

    rng = np.random.default_rng(5)
    B, N = 7, 50
    nal = rng.integers(1, 255, (B, N), dtype=np.uint8)
    lens = np.asarray([13, 0, 50, 1, 29, 0, 7], np.int32)
    cap = 128
    packed, total, ovf = jax.jit(
        lambda a, l: compact_batch_nal(a, l, cap))(jnp.asarray(nal),
                                                   jnp.asarray(lens))
    expect = np.concatenate([nal[b, :lens[b]] for b in range(B)])
    assert int(total) == expect.size
    assert not bool(ovf)
    assert np.array_equal(np.asarray(packed)[: int(total)], expect)
    assert not np.asarray(packed)[int(total):].any()

    # Overflow flagged when cap is too small.
    _, _, ovf2 = jax.jit(
        lambda a, l: compact_batch_nal(a, l, 64))(jnp.asarray(nal),
                                                  jnp.asarray(lens))
    assert bool(ovf2)
