"""Hint-composed frames: static chrome + motion regions with P_Skip."""

import numpy as np

from h264_scroll_encoder_tpu.config import ComposerConfig
from h264_scroll_encoder_tpu.models import mb_transcode as mbt
from h264_scroll_encoder_tpu.models import mv_field
from h264_scroll_encoder_tpu.models.splice import (FrameHints, MotionRegion,
                                                   parse_slice_header)
from h264_scroll_encoder_tpu.ops.bitio import BitReader
from h264_scroll_encoder_tpu.session import ComposerSession
from h264_scroll_encoder_tpu.syntax import parse
from h264_scroll_encoder_tpu.verify import verify_stream


def test_hint_frame_chrome_and_regions():
    cfg = ComposerConfig(320, 240)  # 20x15 MBs
    s = ComposerSession(cfg)
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)

    hints = FrameHints(motion_regions=(
        MotionRegion(2, 3, 10, 9, ref_idx=0, mv_x=0, mv_y=40),
        MotionRegion(12, 10, 18, 14, ref_idx=1, mv_x=-8, mv_y=0),
    ))
    for _ in range(3):
        s.write_hint_frame(hints)
    stream = s.getvalue()

    rep = verify_stream(stream)
    assert rep.ok, rep.errors
    # Chrome must compress to skip runs.
    assert rep.skipped_mbs > rep.coded_mbs

    units = [u for u in parse.iter_nal_units(stream) if u.nal_unit_type == 1
             and u.nal_ref_idc == 0]
    assert len(units) == 3
    br = BitReader(units[0].rbsp)
    hdr = parse_slice_header(br, is_idr=False, nal_ref_idc=0,
                             log2_max_frame_num=4,
                             pps_num_ref_idx_l0_default=2)
    grid = mbt.parse_p_slice_mbs(br, 20, 15, hdr.num_ref_idx_l0)
    field = mv_field.decode_p_slice_mv_field(grid, 20, 15)

    # Region MVs decode to the hinted vectors; chrome decodes to zero.
    # (MotionRegion args are x0, y0, x1, y1.)
    for y in range(15):
        for x in range(20):
            ref, mvx, mvy = mv_field.mb_level_mv(field, x, y)
            if 3 <= y < 9 and 2 <= x < 10:
                assert (ref, mvx, mvy) == (0, 0, 160), (x, y)
            elif 10 <= y < 14 and 12 <= x < 18:
                assert (ref, mvx, mvy) == (1, -32, 0), (x, y)
            else:
                assert (ref, mvx, mvy) == (0, 0, 0), (x, y)


def test_sliced_scroll_frame():
    """Multi-slice frames: 4 MB-row-aligned slices per frame verify,
    carry correct first_mb offsets, and decode to the intended MVs."""
    cfg = ComposerConfig(96, 256)  # 6x16 MBs
    s = ComposerSession(cfg, enable_pskip=True)
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    for off in (0, 12, 100, 240):
        s.write_scroll_frame_sliced(off, rows_per_slice=4)
    stream = s.getvalue()

    rep = verify_stream(stream)
    assert rep.ok, rep.errors
    assert rep.frame_count == 2 + 4       # atlases + 4 sliced frames
    assert rep.p_slices == 16             # 4 bands per frame

    units = [u for u in parse.iter_nal_units(stream)
             if u.nal_unit_type == 1 and u.nal_ref_idc == 0]
    firsts = []
    for u in units[:4]:
        br = BitReader(u.rbsp)
        hdr = parse_slice_header(br, is_idr=False, nal_ref_idc=0,
                                 log2_max_frame_num=4,
                                 pps_num_ref_idx_l0_default=2)
        firsts.append(hdr.first_mb)
    assert firsts == [0, 24, 48, 72]

    # Band 2 of the off=100 frame (frame index 2): decode MVs band-locally.
    u = units[4 * 2 + 2]
    br = BitReader(u.rbsp)
    hdr = parse_slice_header(br, is_idr=False, nal_ref_idc=0,
                             log2_max_frame_num=4,
                             pps_num_ref_idx_l0_default=2)
    grid = mbt.parse_p_slice_mbs(br, 6, 4, hdr.num_ref_idx_l0)
    field = mv_field.decode_p_slice_mv_field(grid, 6, 4)
    a_end = (256 - 100) // 16            # global row 9: band rows 8-11
    for band_row in range(4):
        g_row = 8 + band_row
        want_ref = 0 if g_row < a_end else 1
        want_mv = (100 if g_row < a_end else 100 - 256) * 4
        for x in range(6):
            ref, mvx, mvy = mv_field.mb_level_mv(field, x, band_row)
            assert (ref, mvx, mvy) == (want_ref, 0, want_mv), (x, g_row)


def test_batched_hint_step_matches_session():
    """Batched hint serving emits the same bytes as the host session."""
    import jax.numpy as jnp
    import numpy as np
    from h264_scroll_encoder_tpu.config import MAX_WAYPOINTS
    from h264_scroll_encoder_tpu.models.hints import hint_fields
    from h264_scroll_encoder_tpu.parallel import batch

    cfg = ComposerConfig(128, 96)
    hints = FrameHints(motion_regions=(
        MotionRegion(1, 1, 6, 4, ref_idx=1, mv_y=-12),))
    ref, mvx, mvy = hint_fields(cfg, hints)

    step = batch.make_batched_hint_step(cfg)
    B = 3
    nal, nal_len, bits, ovf = step(
        jnp.full((B,), 2, jnp.int32),
        jnp.broadcast_to(ref, (B,) + ref.shape),
        jnp.broadcast_to(mvx, (B,) + mvx.shape),
        jnp.broadcast_to(mvy, (B,) + mvy.shape),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B, MAX_WAYPOINTS), jnp.int32),
        jnp.zeros((B, MAX_WAYPOINTS), bool))
    assert not bool(ovf.any())

    s = ComposerSession(cfg)
    s.frame_num = 2
    s.write_hint_frame(hints)
    exp = list(parse.iter_nal_units(s.getvalue()))[0]
    exp_nal = (b"\x00\x00\x00\x01"
               + bytes([(exp.nal_ref_idc << 5) | exp.nal_unit_type])
               + exp.data)
    for b in range(B):
        assert np.asarray(nal[b])[: int(nal_len[b])].tobytes() == exp_nal

    # Compact 2-slot layout (valid: every hint mv_x is 0): byte-identical.
    step_c = batch.make_batched_hint_step(cfg, compact_x=True)
    nal_c, len_c, _, ovf_c = step_c(
        jnp.full((B,), 2, jnp.int32),
        jnp.broadcast_to(ref, (B,) + ref.shape),
        jnp.broadcast_to(mvx, (B,) + mvx.shape),
        jnp.broadcast_to(mvy, (B,) + mvy.shape),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B, MAX_WAYPOINTS), jnp.int32),
        jnp.zeros((B, MAX_WAYPOINTS), bool))
    assert not bool(ovf_c.any())
    for b in range(B):
        assert np.asarray(nal_c[b])[: int(len_c[b])].tobytes() == exp_nal


def test_hint_frame_occlusion_order():
    """Later regions override earlier ones (z-order)."""
    cfg = ComposerConfig(128, 96)
    from h264_scroll_encoder_tpu.models.hints import hint_fields
    hints = FrameHints(motion_regions=(
        MotionRegion(0, 0, 8, 6, ref_idx=0, mv_y=10),
        MotionRegion(2, 2, 5, 4, ref_idx=1, mv_y=-4),
    ))
    ref, mvx, mvy = hint_fields(cfg, hints)
    assert int(ref[3, 3]) == 1 and int(mvy[3, 3]) == -16
    assert int(ref[1, 1]) == 0 and int(mvy[1, 1]) == 40


def test_session_mixed_generators_one_stream():
    """Every frame generator in ONE session: scroll + hint + spliced +
    scroll again, with pre-provisioned waypoints — frame_num continuity
    and ref-list consistency across generators, checked by the oracle.
    Also locks the session splice API against the hand-assembled path."""
    from h264_scroll_encoder_tpu.models.splice import (
        finalize_spliced_frame, splice_p_frame)
    from h264_scroll_encoder_tpu.ops.bitio import BitWriter
    from h264_scroll_encoder_tpu.syntax.nal import write_nal_unit
    from h264_scroll_encoder_tpu.syntax.slice_headers import (
        write_p_slice_header)
    from h264_scroll_encoder_tpu.utils import fixtures

    cfg = ComposerConfig(320, 640)           # 20x40 MBs; 1 waypoint chain
    s = ComposerSession(cfg)
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    s.preprovision_waypoints()
    assert s.waypoints.count == 1

    for off in (0, 8):
        s.write_scroll_or_waypoint_frame(off)
    s.write_hint_frame(FrameHints(motion_regions=(
        MotionRegion(0, 1, 20, 5, ref_idx=0, mv_x=0, mv_y=24),)))

    rng = np.random.default_rng(5)
    donor = fixtures.random_p_slice_grid(rng, 4, 4, 1)
    for row in donor:
        for i, mb in enumerate(row):
            if mb is not mbt.SKIP and mb.kind == "ipcm":
                row[i] = fixtures.random_inter_mb(rng, 1)
    sh = FrameHints(motion_regions=(
        MotionRegion(0, 1, 20, 5, ref_idx=0, mv_x=0, mv_y=32),),
        dynamic_mb_x=8, dynamic_mb_y=20)

    frame_num_before = s.frame_num
    s.write_spliced_frame(sh, donor)

    for off in (16, 24):
        s.write_scroll_or_waypoint_frame(off)

    rep = verify_stream(s.getvalue())
    assert rep.ok, rep.errors
    assert not rep.warnings, rep.warnings

    # The session splice frame == hand-assembled host path, byte for byte.
    num_refs = s.waypoints.count + 2
    grid = splice_p_frame(cfg, sh, donor, num_refs)

    def hdr(bw: BitWriter):
        write_p_slice_header(bw, cfg, frame_num_before,
                             num_waypoints=s.waypoints.count,
                             wp_long_term_idx=s.waypoints.long_term_idx)

    manual = write_nal_unit(
        finalize_spliced_frame(cfg, grid, num_refs, hdr), 0, 1)
    assert manual in s.getvalue()


def test_pixel_rect_helpers_and_validation():
    """MASTER_DESIGN §7.1 alignment helpers + §10 not-servable flag."""
    import pytest

    from h264_scroll_encoder_tpu.config import ComposerConfig
    from h264_scroll_encoder_tpu.models.splice import (
        FrameHints, HintsNotServable, MotionRegion)

    cfg = ComposerConfig(1280, 720)

    # §7.1 alignment: floor origin / ceil extent after margin expansion.
    hints, (rw, rh) = FrameHints.with_dynamic_pixel_rect(
        96, 48, 352, 352, margin=16,
        frame_width=1280, frame_height=720)
    assert (hints.dynamic_mb_x, hints.dynamic_mb_y) == (5, 2)
    assert (rw * 16, rh * 16) == (384, 384)   # (352+2*16) aligned
    hints.validate(cfg, 2, dynamic_rect_mb=(rw, rh))

    # An unaligned 360x360 rect + margin alignments can exceed the
    # 392x392 dynamic-encoder bound — flagged, not silently composed.
    h360, sz360 = FrameHints.with_dynamic_pixel_rect(
        100, 50, 360, 360, margin=16,
        frame_width=1280, frame_height=720)
    assert sz360 == (25, 25)                  # 400x400 px
    with pytest.raises(HintsNotServable):
        h360.validate(cfg, 2, dynamic_rect_mb=sz360)

    # Motion region from a pixel rect covers it.
    reg = MotionRegion.from_pixel_rect(30, 17, 100, 40, mv_y=8)
    assert (reg.mb_x0, reg.mb_y0, reg.mb_x1, reg.mb_y1) == (1, 1, 9, 4)

    # Not-servable conditions are flagged, not silently composed.
    with pytest.raises(HintsNotServable):
        FrameHints(motion_regions=(MotionRegion(0, 0, 0, 2),)).validate(
            cfg, 2)                       # empty region
    with pytest.raises(HintsNotServable):
        FrameHints(motion_regions=(MotionRegion(0, 0, 90, 2),)).validate(
            cfg, 2)                       # out of frame
    with pytest.raises(HintsNotServable):
        FrameHints(motion_regions=(MotionRegion(0, 0, 4, 2,
                                                ref_idx=5),)).validate(
            cfg, 2)                       # ref outside active list
    with pytest.raises(HintsNotServable):
        FrameHints(motion_regions=(MotionRegion(0, 0, 4, 2,
                                                mv_y=600),)).validate(
            cfg, 2)                       # beyond the 496 px MV budget
    with pytest.raises(HintsNotServable):
        h2, sz = FrameHints.with_dynamic_pixel_rect(
            0, 0, 400, 400, margin=16, frame_width=1280, frame_height=720)
        h2.validate(cfg, 2, dynamic_rect_mb=sz)  # > 392x392 bound


def test_hint_frame_wide_layout_1080p():
    """Frames > 4095 MBs through the hint kernel: the wide symbol layout
    with and without compact_x produces identical bytes, and the stream
    passes structural verification."""
    import jax.numpy as jnp
    import numpy as np

    from h264_scroll_encoder_tpu.config import MAX_WAYPOINTS, ComposerConfig
    from h264_scroll_encoder_tpu.models.hints import hint_fields
    from h264_scroll_encoder_tpu.models.splice import (FrameHints,
                                                       MotionRegion)
    from h264_scroll_encoder_tpu.models import scroll as scroll_model
    from h264_scroll_encoder_tpu.syntax.slice_headers import (
        p_slice_header_symbols)

    cfg = ComposerConfig(1920, 1088)
    assert cfg.total_mbs > 4095
    hints = FrameHints(motion_regions=(
        MotionRegion(0, 0, cfg.mb_width, 12, ref_idx=0, mv_y=40),
        MotionRegion(20, 40, 60, 60, ref_idx=1, mv_y=-16)))
    ref, mvx, mvy = hint_fields(cfg, hints)
    hp, hn = p_slice_header_symbols(
        cfg, jnp.int32(3), jnp.int32(6), is_reference=False,
        long_term_idx=-1, num_waypoints=jnp.int32(0),
        wp_long_term_idx=jnp.zeros(MAX_WAYPOINTS, jnp.int32),
        wp_valid=jnp.zeros(MAX_WAYPOINTS, bool))
    outs = []
    for cx in (False, True):
        nal, nal_len, _, ovf = scroll_model.emit_p_frame(
            cfg, hp, hn, ref, mvx, mvy, num_refs=2, nal_ref_idc=0,
            enable_pskip=True, compact_x=cx)
        assert not bool(np.asarray(ovf))
        outs.append(np.asarray(nal)[: int(nal_len)].tobytes())
    assert outs[0] == outs[1]

    from h264_scroll_encoder_tpu.session import ComposerSession
    from h264_scroll_encoder_tpu.verify import verify_stream
    s = ComposerSession(cfg)
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    rep = verify_stream(s.getvalue() + outs[0])
    assert rep.ok, rep.errors


def test_4k_scroll_frame_smoke():
    """3840x2160 (32,400 MBs — near the 65,535 wide-layout bound): one
    composed scroll frame passes structural verification."""
    import numpy as np

    from h264_scroll_encoder_tpu.config import ComposerConfig
    from h264_scroll_encoder_tpu.session import ComposerSession
    from h264_scroll_encoder_tpu.verify import verify_stream

    s = ComposerSession(ComposerConfig(3840, 2160), enable_pskip=True)
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    s.write_scroll_frame(48)
    rep = verify_stream(s.getvalue())
    assert rep.ok, rep.errors
