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


def test_serving_state_evict_restore_byte_identical(tmp_path):
    """SURVEY §5 serving realism: a batched successive-donor splice
    serving session (fresh donors + native MV retarget + blob wire,
    mid-video-in-corner) is evicted to disk, everything host- and
    device-side is discarded, and the restored session's every
    subsequent NAL is byte-identical to an uninterrupted run."""
    from h264_scroll_encoder_tpu import native_bridge
    from h264_scroll_encoder_tpu.config import MAX_WAYPOINTS
    from h264_scroll_encoder_tpu.models import mb_transcode as mbt
    from h264_scroll_encoder_tpu.models import splice_device
    from h264_scroll_encoder_tpu.ops.bitio import BitWriter
    from h264_scroll_encoder_tpu.syntax.slice_headers import (
        p_slice_header_symbols)
    from h264_scroll_encoder_tpu.utils import fixtures

    if not native_bridge.native_available():
        pytest.skip("native library unavailable")

    cfg = ComposerConfig(320, 240)
    H, W = cfg.mb_height, cfg.mb_width
    B, T, EVICT = 3, 6, 3
    R, C = 4, 5
    r0, c0 = 4, 6
    num_refs = 3                     # [prev frame | atlas A | atlas B]
    CLASS, S_FLAT, S_EXC = 64, 320, 16

    rng = np.random.default_rng(77)
    pool = []
    for _ in range(B * T):
        g = fixtures.representative_donor_grid(rng, C, R)
        for row in g:
            for i, mb in enumerate(row):
                if mb is not mbt.SKIP and mb.kind == "ipcm":
                    row[i] = fixtures.random_inter_mb(rng, 1)
        bw = BitWriter()
        mbt.emit_p_slice_mbs(bw, g, 1)
        bw.write_trailing_bits()
        pool.append(bw.getvalue())

    budget = splice_device.splice_rbsp_budget(cfg, R * C, R * CLASS * 32)

    def make_step():
        return batch.make_batched_splice_step_rows(
            cfg, c0, r0, C, R, num_refs, nal_ref_idc=2, has_align=True,
            n_rbsp=budget, s_row=CLASS, s_flat=S_FLAT, s_exc=S_EXC)

    def headers(state):
        hps, hns = [], []
        for b in range(B):
            hp, hn = p_slice_header_symbols(
                cfg, state.frame_num[b] % 16, (state.frame_num[b] % 16) * 2,
                is_reference=True, long_term_idx=-1,
                num_waypoints=state.wp_count[b],
                wp_long_term_idx=state.wp_ltidx[b],
                wp_valid=state.wp_valid[b], prev_ref_abs_diff=1)
            hps.append(hp)
            hns.append(hn)
        return jnp.stack(hps), jnp.stack(hns)

    def run_steps(step, state, ctx, t0, t1):
        zero = jnp.zeros((B, H, W), jnp.int32)
        coded = jnp.zeros((B, H, W), bool)
        nals = []
        for t in range(t0, t1):
            payloads = [pool[(t * B + b) % len(pool)] for b in range(B)]
            dn, _meta = splice_device.prepare_donor_rows_serving(
                payloads, [0] * B, R, C, 1, num_refs,
                donor_ref_map=tuple(ctx["ref_map"]), s_row=CLASS,
                retarget_mvs=True, blob_wire=True,
                s_flat=S_FLAT, s_exc=S_EXC)
            hp, hn = headers(state)
            nal, nal_len, _, ovf = step(hp, hn, zero, zero, zero,
                                        coded, dn)
            assert not bool(np.asarray(ovf).any())
            for b in range(B):
                nals.append(np.asarray(nal[b])[: int(nal_len[b])]
                            .tobytes())
            state = batch.SessionState(
                state.frame_num + 1, state.wp_offsets, state.wp_ltidx,
                state.wp_valid, state.wp_count)
        return state, nals

    def fresh_state():
        st = batch.SessionState.create(B, frame_num=2)
        # Distinct per-session frame_nums + a live waypoint chain so the
        # snapshot carries non-trivial state.
        st = batch.SessionState(
            st.frame_num + jnp.arange(B, dtype=jnp.int32),
            st.wp_offsets.at[:, 0].set(496),
            st.wp_ltidx.at[:, 0].set(2),
            st.wp_valid.at[:, 0].set(True),
            st.wp_count + 1,
        )
        return st

    ctx0 = {"ref_map": [0], "step": 0, "abs_diff": 1, "s_row": CLASS}

    # Uninterrupted run.
    step = make_step()
    state, nals_a = run_steps(step, fresh_state(), ctx0, 0, T)

    # Evicted run: T0 steps, snapshot, discard, restore, continue.
    step = make_step()
    state, nals_b = run_steps(step, fresh_state(), ctx0, 0, EVICT)
    ctx = dict(ctx0, step=EVICT)
    snapshot.save_serving_state(tmp_path / "serving.npz", state, ctx)
    del step, state

    state2, ctx2 = snapshot.load_serving_state(tmp_path / "serving.npz")
    assert ctx2 == ctx
    step2 = make_step()
    _, nals_c = run_steps(step2, state2, ctx2, ctx2["step"], T)

    assert nals_b == nals_a[: EVICT * B]
    assert nals_c == nals_a[EVICT * B:], "post-restore NALs diverge"
