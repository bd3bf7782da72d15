"""MV-field reconstruction, P_Skip validation, and dynamic-rect splice."""

import numpy as np
import pytest

from h264_scroll_encoder_tpu.config import ComposerConfig
from h264_scroll_encoder_tpu.models import mb_transcode as mbt
from h264_scroll_encoder_tpu.models import mv_field, splice
from h264_scroll_encoder_tpu.models.splice import (FrameHints, MotionRegion,
                                                   parse_slice_header)
from h264_scroll_encoder_tpu.ops.bitio import BitReader, BitWriter
from h264_scroll_encoder_tpu.syntax import parse
from h264_scroll_encoder_tpu.utils import fixtures


def test_mv_field_simple_uniform():
    """A uniform P_L0_16x16 frame: first MB carries the mvd, the rest
    predict it; decoded MVs must all equal the intended vector."""
    w, h = 6, 4
    grid = [[mbt.Macroblock(kind="inter", mb_type=0, mvds=((0, 0),),
                            hint_mv=(8, -12)) for _ in range(w)]
            for _ in range(h)]
    field = mv_field.decode_p_slice_mv_field(grid, w, h)
    assert (field.mvx == 8).all() and (field.mvy == -12).all()
    # After resolution, interior MBs should carry mvd (0,0).
    assert grid[0][0].mvds == ((8, -12),)
    assert grid[1][3].mvds == ((0, 0),)
    assert grid[0][0].hint_mv is None


def test_mv_field_skip_derivation():
    """Skip MBs next to zero-MV ref-0 neighbors derive (0,0); skip MBs in
    a moving context inherit the median prediction."""
    w, h = 4, 3
    # Row 0: coded zero-MV; rows 1-2: skips -> all zero.
    grid = [[mbt.Macroblock(kind="inter", mb_type=0, mvds=((0, 0),),
                            hint_mv=(0, 0)) for _ in range(w)]]
    grid += [[mbt.SKIP] * w for _ in range(h - 1)]
    field = mv_field.decode_p_slice_mv_field(grid, w, h)
    assert (field.mvx == 0).all() and (field.mvy == 0).all()
    assert (field.ref[4:] == 0).all()


def test_pskip_scroll_stream_decodes_to_intended_mvs():
    """enable_pskip=True streams: every MB's decoded (ref, mv) must equal
    the intended scroll composition — the validation the reference never
    had (P_Skip disabled at h264_encoder.c:564-566)."""
    from h264_scroll_encoder_tpu.session import ComposerSession

    cfg = ComposerConfig(96, 128)
    s = ComposerSession(cfg, enable_pskip=True)
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    offsets = [0, 4, 17, 40, 64, 100, 112]
    for off in offsets:
        s.write_scroll_frame(off)
    stream = s.getvalue()

    p_units = [u for u in parse.iter_nal_units(stream)
               if u.nal_unit_type == 1 and u.nal_ref_idc == 0]
    assert len(p_units) == len(offsets)
    for off, unit in zip(offsets, p_units):
        br = BitReader(unit.rbsp)
        hdr = parse_slice_header(br, is_idr=False, nal_ref_idc=0,
                                 log2_max_frame_num=4,
                                 pps_num_ref_idx_l0_default=2)
        grid = mbt.parse_p_slice_mbs(br, cfg.mb_width, cfg.mb_height,
                                     hdr.num_ref_idx_l0)
        field = mv_field.decode_p_slice_mv_field(grid, cfg.mb_width,
                                                 cfg.mb_height)
        a_end = (cfg.height - off) // 16
        for mb_y in range(cfg.mb_height):
            want_ref = 0 if mb_y < a_end else 1
            want_mv = (off if mb_y < a_end else off - cfg.height) * 4
            for mb_x in range(cfg.mb_width):
                ref, mvx, mvy = mv_field.mb_level_mv(field, mb_x, mb_y)
                assert ref == want_ref, (off, mb_x, mb_y)
                assert (mvx, mvy) == (0, want_mv), (off, mb_x, mb_y)


def test_pskip_compression():
    """P_Skip mode must hit the skip-run size class (~order-of-magnitude
    smaller P-frames for pure vertical scroll; README ~1.7KB vs ~3.0KB at
    720p — here checked as a strict improvement at small size)."""
    from h264_scroll_encoder_tpu.session import ComposerSession

    sizes = {}
    for pskip in (False, True):
        cfg = ComposerConfig(96, 128)
        s = ComposerSession(cfg, enable_pskip=pskip)
        s.write_parameter_sets()
        s.write_test_atlases(striped=True)
        base = len(s.getvalue())
        for off in (0, 4, 8, 12):
            s.write_scroll_frame(off)
        sizes[pskip] = len(s.getvalue()) - base
    assert sizes[True] < sizes[False] * 0.55, sizes


def test_splice_rect_composition():
    """Dynamic-rect splice: donor P-MBs embedded in a P-frame with motion
    regions; output parses, donor residuals survive, hint MVs decode to
    the intended values (MASTER_DESIGN §6)."""
    rng = np.random.default_rng(5)
    cfg = ComposerConfig(320, 240)          # 20x15 MBs
    donor_w, donor_h = 6, 6
    donor_grid = fixtures.random_p_slice_grid(rng, donor_w, donor_h, 1)

    hints = FrameHints(
        motion_regions=(
            MotionRegion(0, 0, 20, 8, ref_idx=0, mv_x=0, mv_y=32),
            MotionRegion(0, 8, 20, 15, ref_idx=1, mv_x=0, mv_y=-48),
        ),
        dynamic_mb_x=10, dynamic_mb_y=4)

    grid = splice.splice_p_frame(cfg, hints, donor_grid, num_ref_idx_l0=2)

    def hdr_writer(bw):
        bw.write_ue(0)
        bw.write_ue(5)       # P_ALL
        bw.write_ue(0)
        bw.write_bits(2, 4)
        bw.write_bit(1)      # override
        bw.write_ue(1)       # 2 refs
        bw.write_bit(0)      # no ref list modification
        bw.write_se(0)
        bw.write_ue(1)

    rbsp = splice.finalize_spliced_frame(cfg, grid, 2, hdr_writer)

    # Re-parse and verify structure.
    br = BitReader(rbsp)
    hdr = parse_slice_header(br, is_idr=False, nal_ref_idc=0,
                             log2_max_frame_num=4,
                             pps_num_ref_idx_l0_default=2)
    got = mbt.parse_p_slice_mbs(br, 20, 15, hdr.num_ref_idx_l0)
    assert len(rbsp) * 8 - br.bit_position <= 8

    # Donor residuals survive at the splice location.
    for r in range(donor_h):
        for c in range(donor_w):
            src = donor_grid[r][c]
            dst = got[4 + r][10 + c]
            if src is mbt.SKIP:
                assert dst is mbt.SKIP
                continue
            assert dst is not mbt.SKIP
            assert dst.luma == src.luma
            assert dst.cbp == src.cbp
            if src.kind == "inter":
                assert dst.mvds == src.mvds

    # Motion-region MVs decode to the intended values outside the rect.
    field = mv_field.decode_p_slice_mv_field(got, 20, 15)
    for mb_y, want_ref, want_mvy in ((0, 0, 128), (2, 0, 128),
                                     (14, 1, -192)):
        for mb_x in (0, 5, 19):
            ref, mvx, mvy = mv_field.mb_level_mv(field, mb_x, mb_y)
            assert (ref, mvx, mvy) == (want_ref, 0, want_mvy), (mb_x, mb_y)


def test_fuzz_field_on_random_slices():
    rng = np.random.default_rng(77)
    for trial in range(5):
        grid = fixtures.random_p_slice_grid(rng, 7, 5, 2)
        bw = BitWriter()
        mbt.emit_p_slice_mbs(bw, grid, 2)
        bw.write_trailing_bits()
        br = BitReader(bw.getvalue())
        got = mbt.parse_p_slice_mbs(br, 7, 5, 2)
        field = mv_field.decode_p_slice_mv_field(got, 7, 5)
        assert field.filled.all()
