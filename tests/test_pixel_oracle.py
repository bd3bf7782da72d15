"""Pixel-level decode oracle: composed streams must reconstruct to the
intended pixels (the check the reference delegates to ffmpeg decode,
test_encoder.sh:82-91 — here computed natively against raw atlas content).
"""

import numpy as np
import pytest

from h264_scroll_encoder_tpu import pixel_oracle as po
from h264_scroll_encoder_tpu.config import ComposerConfig
from h264_scroll_encoder_tpu.session import ComposerSession


def _session(w=64, h=128, **kw):
    s = ComposerSession(ComposerConfig(w, h), **kw)
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    return s


def _assert_scroll_frames(data, offsets, height, policy="floor"):
    pics = po.decode_stream_pixels(data)
    assert len(pics) == 2 + len(offsets)
    canvas = po.scroll_canvas(pics[0], pics[1])
    max_band = 0
    for pic, off in zip(pics[2:], offsets):
        intended = po.intended_scroll_luma(canvas, off, height)
        rows = po.luma_mismatch_rows(pic, intended)
        lo, hi = po.seam_band(height, off, policy)
        assert rows.size == 0 or (rows.min() >= lo and rows.max() < hi), (
            off, rows.min(), rows.max(), lo, hi)
        max_band = max(max_band, hi - lo)
        # Chroma: exact outside the seam band at even offsets (odd offsets
        # interpolate chroma at half-pel; luma is the strict check there).
        if off % 2 == 0:
            c_lo, c_hi = lo // 2, (hi + 1) // 2
            dec = pic.cb.astype(int)
            want = canvas.cb[off // 2: off // 2 + height // 2].astype(int)
            bad = np.nonzero((dec != want).any(axis=1))[0]
            assert bad.size == 0 or (bad.min() >= c_lo - 1
                                     and bad.max() <= c_hi), (off, bad)
    return max_band


def test_scroll_pixels_floor_policy():
    """Every composed pixel outside the seam band equals the intended
    scroll window; the band obeys the floor-policy bound (<= 15 rows) and
    is non-empty for offsets not multiple of 16 (the reference's
    KNOWN_ISSUES defect, now measured instead of argued)."""
    offsets = [0, 5, 16, 23, 37, 64, 100]
    s = _session()
    for off in offsets:
        s.write_scroll_frame(off)
    band = _assert_scroll_frames(s.getvalue(), offsets, 128, "floor")
    assert 0 < band <= 15


def test_scroll_pixels_nearest_policy():
    """'nearest' halves the worst-case seam band (<= 8 rows)."""
    offsets = [0, 5, 16, 23, 37, 64, 100]
    s = _session(boundary_policy="nearest")
    for off in offsets:
        s.write_scroll_frame(off)
    band = _assert_scroll_frames(s.getvalue(), offsets, 128, "nearest")
    assert 0 < band <= 8


def test_scroll_pixels_pskip():
    """P_Skip-enabled streams (the mode the reference never validated)
    decode to the same pixels as the coded-MB mode."""
    offsets = [0, 4, 16, 32, 48, 100]
    s = _session(enable_pskip=True)
    for off in offsets:
        s.write_scroll_frame(off)
    _assert_scroll_frames(s.getvalue(), offsets, 128, "floor")


def test_mb_aligned_scroll_pixel_exact():
    """Offsets at MB multiples have no seam: every pixel exact."""
    offsets = [0, 16, 48, 96, 112]
    s = _session()
    for off in offsets:
        s.write_scroll_frame(off)
    pics = po.decode_stream_pixels(s.getvalue())
    canvas = po.scroll_canvas(pics[0], pics[1])
    for pic, off in zip(pics[2:], offsets):
        assert po.luma_mismatch_rows(
            pic, po.intended_scroll_luma(canvas, off, 128)).size == 0
        assert (pic.cb == canvas.cb[off // 2: off // 2 + 64]).all()
        assert (pic.cr == canvas.cr[off // 2: off // 2 + 64]).all()


def test_waypoint_chain_pixel_exact():
    """Tall scroll through the waypoint chain (the 496 px MV-limit
    machinery): composition through intermediate long-term references
    must be pixel-lossless at MB-aligned offsets."""
    h = 992  # 62 MB rows; waypoints at 496 and 992
    # Offsets must be MB-aligned (16) for seamless frames AND hit the
    # exact 496 multiples that create waypoints.
    offsets = [0, 160, 320, 496, 656, 816, 992]
    s2 = _session(w=64, h=h)
    for off in offsets:
        s2.write_scroll_frame(off)
    pics = po.decode_stream_pixels(s2.getvalue())
    canvas = po.scroll_canvas(pics[0], pics[1])
    out = [p for p in pics[2:]]
    # Two extra pictures are waypoint frames (at 496 and 992); identify
    # scroll frames by count: waypoint frame precedes its scroll frame.
    assert len(out) == len(offsets) + 2
    k = 0
    for off in offsets:
        if off in (496, 992):
            wp = out[k]
            k += 1   # waypoint frame first...
            assert po.luma_mismatch_rows(
                wp, po.intended_scroll_luma(canvas, off, h)).size == 0
        pic = out[k]
        k += 1
        assert po.luma_mismatch_rows(
            pic, po.intended_scroll_luma(canvas, off, h)).size == 0, off


def test_sliced_frame_pixels():
    """Multi-slice frames decode to the same pixels as single-slice."""
    s = _session()
    offsets = [0, 23, 64]
    for off in offsets:
        s.write_scroll_frame_sliced(off, rows_per_slice=4)
    _assert_scroll_frames(s.getvalue(), offsets, 128, "floor")


def test_hint_frame_pixels():
    """Hint-composed frame: static chrome shows atlas A; the motion
    region shows atlas A displaced by its motion vector (edge-clamped)."""
    from h264_scroll_encoder_tpu.models.splice import (FrameHints,
                                                       MotionRegion)

    s = _session()
    region = MotionRegion(mb_x0=1, mb_y0=2, mb_x1=3, mb_y1=5,
                          ref_idx=0, mv_x=0, mv_y=32)
    s.write_hint_frame(FrameHints(motion_regions=(region,)))
    pics = po.decode_stream_pixels(s.getvalue())
    atlas_a, frame = pics[0], pics[2]

    want = atlas_a.y.copy()
    ys, xs = slice(2 * 16, 5 * 16), slice(1 * 16, 3 * 16)
    rows = np.clip(np.arange(2 * 16, 5 * 16) + 32, 0, 127)
    want[ys, xs] = atlas_a.y[rows][:, 1 * 16: 3 * 16]
    assert (frame.y == want).all()


def test_donor_mode_pixels(tmp_path):
    """Donor-mode atlases (synthesized I_PCM IDRs) decode to their solid
    colors and scroll frames compose the two-donor canvas."""
    from h264_scroll_encoder_tpu.models import ipcm
    from h264_scroll_encoder_tpu.session import open_donor_session

    for name, color in (("a", (81, 90, 240)), ("b", (41, 240, 110))):
        cfg = ComposerConfig(64, 128)
        s = ComposerSession(cfg)
        s.write_parameter_sets()
        s.writer.append_raw(ipcm.idr_frame_color(cfg, *color))
        s.write_to_file(tmp_path / f"{name}.h264")

    sess = open_donor_session(tmp_path / "a.h264", tmp_path / "b.h264")
    sess.write_parameter_sets()
    sess.write_donor_atlases(sess._donor_a_rbsp, sess._donor_b_rbsp)
    offsets = [0, 16, 48, 96]
    for off in offsets:
        sess.write_scroll_frame(off)
    pics = po.decode_stream_pixels(sess.getvalue())
    assert (pics[0].y == 81).all() and (pics[1].y == 41).all()
    canvas = po.scroll_canvas(pics[0], pics[1])
    for pic, off in zip(pics[2:], offsets):
        assert po.luma_mismatch_rows(
            pic, po.intended_scroll_luma(canvas, off, 128)).size == 0


def test_seam_band_measurement_floor_vs_nearest():
    """Numeric seam quantification replacing the prose argument in
    docs/KNOWN_ISSUES_ANALYSIS.md: across a dense offset sweep, the floor
    policy's measured band reaches 15 rows while nearest stays <= 8."""
    widths = {"floor": [], "nearest": []}
    offsets = list(range(1, 17))
    for policy in widths:
        s = _session(w=32, h=64, boundary_policy=policy)
        for off in offsets:
            s.write_scroll_frame(off)
        pics = po.decode_stream_pixels(s.getvalue())
        canvas = po.scroll_canvas(pics[0], pics[1])
        for pic, off in zip(pics[2:], offsets):
            rows = po.luma_mismatch_rows(
                pic, po.intended_scroll_luma(canvas, off, 64))
            widths[policy].append(rows.size)
    assert max(widths["floor"]) == 15
    assert max(widths["nearest"]) == 8
    assert sum(widths["nearest"]) < sum(widths["floor"])


def test_scroll_pixels_partitioned_policy():
    """'partitioned' codes the straddled MB row as P_L0_L0_16x8 (8 px
    seam granularity — the finest legal split across two references):
    worst-case seam band <= 4 rows, the real fix for the reference's
    16 px-jump defect (KNOWN_ISSUES.md:5-13)."""
    offsets = [0, 3, 5, 12, 16, 23, 37, 64, 100, 121]
    s = _session(boundary_policy="partitioned")
    for off in offsets:
        s.write_scroll_frame(off)
    band = _assert_scroll_frames(s.getvalue(), offsets, 128, "partitioned")
    assert 0 < band <= 4


def test_scroll_pixels_partitioned_pskip_and_waypoints():
    """Partitioned policy composed with P_Skip and waypoint redirection
    (tall frame, offsets crossing 496 px) still decodes to the intended
    pixels within the 4-row band."""
    offsets = [0, 5, 100, 496, 496, 500, 707, 992, 992, 1000]
    s = _session(w=48, h=1024, boundary_policy="partitioned",
                 enable_pskip=True)
    for off in offsets:
        s.write_scroll_or_waypoint_frame(off)

    pics = po.decode_stream_pixels(s.getvalue())
    canvas = po.scroll_canvas(pics[0], pics[1])
    # Waypoint frames interleave: walk emitted pictures against the
    # session's actual schedule (a waypoint step repeats its offset).
    emitted = []
    reg = []
    for off in offsets:
        if off != 0 and off % 496 == 0 and off not in reg:
            reg.append(off)
        emitted.append(off)
    assert len(pics) == 2 + len(emitted)
    for pic, off in zip(pics[2:], emitted):
        intended = po.intended_scroll_luma(canvas, off, 1024)
        rows = po.luma_mismatch_rows(pic, intended)
        lo, hi = po.seam_band_partitioned(1024, off)
        assert rows.size == 0 or (rows.min() >= lo and rows.max() < hi), (
            off, 0 if rows.size == 0 else (rows.min(), rows.max()), lo, hi)
