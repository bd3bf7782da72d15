"""Third-party conformance: libavcodec decode oracle + real x264 donors.

The reference's pass/fail oracle is a real decoder — trans_resizer shells
to `ffmpeg -v error ... -f null -` (trans_resizer.c:2176-2186) and the
scroll-encoder pipeline decodes and extracts frames
(scripts/test_encoder.sh:82-91) — and its donors come from the real x264
encoder (scripts/generate_refs.sh:20-44, netflix_scroll.sh:64-71).

These tests restore both sides through avref (native/avref.c): every
composition mode and extension is decoded by code sharing zero ancestry
with our emitters (closing the VERDICT "self-oracle" gap), and donor
ingest is exercised with genuine x264 bitstreams (closing the
"real-encoder donor coverage" gap).
"""

import numpy as np
import pytest

from h264_scroll_encoder_tpu import avref
from h264_scroll_encoder_tpu import pixel_oracle as po
from h264_scroll_encoder_tpu.config import ComposerConfig
from h264_scroll_encoder_tpu.models.splice import (FrameHints, MotionRegion,
                                                   transcode_pad_stream)
from h264_scroll_encoder_tpu.session import (ComposerSession,
                                             open_donor_session,
                                             open_two_idr_session)
from h264_scroll_encoder_tpu.utils import fixtures

pytestmark = pytest.mark.skipif(
    not avref.available(), reason="system libavcodec/libx264 unavailable")


def _session(w=64, h=128, **kw):
    s = ComposerSession(ComposerConfig(w, h), **kw)
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    return s


def _assert_conforms(data, expect_frames=None):
    """Stream decodes clean in libavcodec AND matches our own pixel
    oracle bit-for-bit on every plane (a shared emitter/oracle blind
    spot would diverge here)."""
    pics_av, nerrors = avref.decode_pictures(data)
    assert nerrors == 0
    if expect_frames is not None:
        assert len(pics_av) == expect_frames
    pics_po = po.decode_stream_pixels(data)
    assert len(pics_av) == len(pics_po)
    for i, (a, b) in enumerate(zip(pics_av, pics_po)):
        assert (a.y == b.y).all(), f"luma diverges at frame {i}"
        assert (a.cb == b.cb).all(), f"cb diverges at frame {i}"
        assert (a.cr == b.cr).all(), f"cr diverges at frame {i}"
    return pics_av


OFFSETS = [0, 5, 16, 23, 64]


@pytest.mark.parametrize("kw", [
    {},                                    # parity mode (floor policy)
    {"enable_pskip": True},                # P_Skip extension
    {"boundary_policy": "nearest"},
    {"boundary_policy": "partitioned"},    # P_L0_L0_16x8 seam partitions
])
def test_scroll_modes_conform(kw):
    s = _session(**kw)
    for off in OFFSETS:
        s.write_scroll_frame(off)
    _assert_conforms(s.getvalue(), expect_frames=2 + len(OFFSETS))


def test_sliced_frames_conform():
    s = _session()
    for off in OFFSETS:
        s.write_scroll_frame_sliced(off, rows_per_slice=4)
    _assert_conforms(s.getvalue(), expect_frames=2 + len(OFFSETS))


def test_waypoint_chain_conforms():
    """Tall scroll through the 496 px MV-limit waypoint machinery."""
    s = _session(w=64, h=992)
    for off in (0, 160, 320, 496, 656, 816, 992):
        s.write_scroll_frame(off)
    _assert_conforms(s.getvalue(), expect_frames=2 + 7 + 2)  # +2 waypoints


def test_hint_frame_conforms():
    s = _session()
    region = MotionRegion(mb_x0=1, mb_y0=2, mb_x1=3, mb_y1=5,
                          ref_idx=0, mv_x=0, mv_y=32)
    s.write_hint_frame(FrameHints(motion_regions=(region,)))
    _assert_conforms(s.getvalue(), expect_frames=3)


def test_spliced_frame_pixels_match_oracle():
    """Dynamic-rect splice under a real decoder: donor CAVLC MBs with
    residuals re-entropy-coded into the composed frame (nC repair), then
    a plain scroll frame.  With the full residual decoder in the pixel
    oracle, every pixel — donor-MB interiors included — must agree
    between libavcodec and our own decode; any entropy desync or
    transform misunderstanding diverges here."""
    rng = np.random.default_rng(7)
    s = ComposerSession(ComposerConfig(320, 240))
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    donor = fixtures.representative_donor_grid(rng, 5, 4)
    hints = FrameHints(motion_regions=(
        MotionRegion(0, 0, 20, 3, ref_idx=0, mv_x=0, mv_y=16),),
        dynamic_mb_x=8, dynamic_mb_y=6)
    s.write_spliced_frame(hints, donor)
    s.write_scroll_frame(16)
    _assert_conforms(s.getvalue(), expect_frames=4)


@pytest.mark.parametrize("seed", range(6))
def test_full_decoder_matches_libavcodec(seed):
    """The pixel oracle is a complete baseline CAVLC decoder (entropy +
    inverse quant/transform + intra prediction + quarter-pel MC + DPB):
    on fully random conformant streams (I, P, intra-in-P, I_PCM, skip,
    multi-ref, hot residuals, drifting QP) it must be bit-exact with
    libavcodec on every plane of every frame."""
    src = fixtures.synthetic_cavlc_stream(320, 192, n_p_frames=2,
                                          seed=seed, num_ref_idx_l0=1)
    from h264_scroll_encoder_tpu import pixel_oracle as po
    pics_av, nerrors = avref.decode_pictures(src)
    assert nerrors == 0
    pics_po = po.decode_stream_pixels(src)
    assert len(pics_av) == len(pics_po) == 3
    for i, (a, b) in enumerate(zip(pics_av, pics_po)):
        assert (a.y == b.y).all(), f"luma frame {i}"
        assert (a.cb == b.cb).all(), f"cb frame {i}"
        assert (a.cr == b.cr).all(), f"cr frame {i}"


def _vertical_motion_grid(rng, w, h, num_ref):
    """P grid of inter/skip/I_PCM MBs with vertical-only motion, so no MB
    reads samples right of its own column (mv_x = 0 everywhere keeps the
    prediction medians zero, and there is no intra-in-P whose top-right
    neighbor semantics change when padding appears) — the precondition
    for strict pixel preservation under the padding transcode (the
    reference documents that rightward reads sample the padding area
    instead of the original right-edge extrapolation,
    trans_resizer.c:1330-1336)."""
    import dataclasses
    from h264_scroll_encoder_tpu.models import mb_transcode as mbt
    grid = fixtures.random_p_slice_grid(rng, w, h, num_ref)
    for row in grid:
        for i, mb in enumerate(row):
            if mb is mbt.SKIP or mb.kind == "ipcm":
                continue
            if mb.kind != "inter":
                mb = fixtures.random_inter_mb(rng, num_ref)
            row[i] = dataclasses.replace(
                mb, mvds=tuple((0, dy) for _dx, dy in mb.mvds))
        # Firewall column: the last original column is I_PCM, so every
        # other MB's prediction context (MV median's above-right
        # candidate, P_Skip derivation, intra neighbors) is identical
        # with and without padding — an intra neighbor contributes the
        # same "unavailable for inter" regardless of what lies right of
        # it.  Without this, the changed above-right availability at the
        # old frame edge cascades decoded MVs leftward one column per
        # row (inherent to any padding transcode; the reference shares
        # the behavior and verifies decode-cleanliness only).
        row[-1] = fixtures.random_ipcm_mb(rng, in_p_slice=True)
    return grid


def test_transcode_preserves_pixels():
    """Padding transcode (trans-resizer equivalent): input and output both
    decode clean, and the original region is pixel-identical — the full
    CAVLC parse/nC-repair/re-emit machinery validated through a real
    decoder's inverse transform, residuals included — strict over the
    whole original region thanks to the firewall column."""
    rng = np.random.default_rng(21)
    grids = [_vertical_motion_grid(rng, 20, 12, 1) for _ in range(2)]
    src = fixtures.synthetic_cavlc_stream(320, 192, n_p_frames=2, seed=2,
                                          p_grids=grids)
    out = transcode_pad_stream(src, 480, 192)
    pi, nei = avref.decode_pictures(src)
    poo, neo = avref.decode_pictures(out)
    assert nei == 0 and neo == 0
    assert len(pi) == len(poo) == 3
    for a, b in zip(pi, poo):
        assert (a.y == b.y[:192, :320]).all()
        assert (a.cb == b.cb[:96, :160]).all()
        assert (a.cr == b.cr[:96, :160]).all()


@pytest.mark.parametrize("seed", range(4))
def test_transcode_random_streams_decode_clean(seed):
    """Fully random (conformant) CAVLC streams: the transcode must not
    introduce decoder errors or lose frames."""
    src = fixtures.synthetic_cavlc_stream(320, 192, n_p_frames=2, seed=seed)
    out = transcode_pad_stream(src, 480, 192)
    _, nei = avref.decode_pictures(src)
    pics, neo = avref.decode_pictures(out)
    assert nei == 0 and neo == 0 and len(pics) == 3


# ---------------------------------------------------------------------------
# Real x264 donors (the reference's generate_refs.sh / netflix_scroll.sh
# donor path, unreproducible until now — no ffmpeg CLI in this image).
# ---------------------------------------------------------------------------

def _flat(y, cb, cr, w=64, h=128):
    return (np.full((h, w), y, np.uint8),
            np.full((h // 2, w // 2), cb, np.uint8),
            np.full((h // 2, w // 2), cr, np.uint8))


def _real_content(seed, w=64, h=128):
    """Gradient + texture, a stand-in for netflix_scroll.sh's images."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[:h, :w]
    y = (16 + (yy * 180) // h + (xx * 30) // w
         + rng.integers(0, 12, (h, w))).clip(0, 255).astype(np.uint8)
    cb = (128 + (xx[::2, ::2] * 40) // w).astype(np.uint8)
    cr = (128 - (yy[::2, ::2] * 40) // h).astype(np.uint8)
    return y, cb, cr


def _compose_and_check(sess, donor_a_bytes, donor_b_bytes, offsets, h):
    sess.write_parameter_sets()
    sess.write_donor_atlases(sess._donor_a_rbsp, sess._donor_b_rbsp)
    for off in offsets:
        sess.write_scroll_frame(off)
    pics, nerrors = avref.decode_pictures(sess.getvalue())
    assert nerrors == 0
    pa, _ = avref.decode_pictures(donor_a_bytes)
    pb, _ = avref.decode_pictures(donor_b_bytes)
    assert (pics[0].y == pa[0].y).all() and (pics[1].y == pb[0].y).all()
    canvas = po.scroll_canvas(pa[0], pb[0])
    for pic, off in zip(pics[2:], offsets):
        assert (pic.y == canvas.y[off: off + h]).all(), off
        assert (pic.cb == canvas.cb[off // 2: off // 2 + h // 2]).all(), off
        assert (pic.cr == canvas.cr[off // 2: off // 2 + h // 2]).all(), off


def test_x264_donor_session_pixel_exact(tmp_path):
    """Two genuine x264 IDR files through the composer donor path
    (generate_refs.sh contract: baseline, keyint=1): the rewritten
    atlases decode identically to the standalone donors — which requires
    adopting the donor's PPS QP base (reference defect #6) — and every
    MB-aligned scroll frame equals the stacked-donor canvas exactly."""
    da = avref.encode_x264([_flat(81, 90, 240)], qp=20, keyint=1, refs=1)
    db = avref.encode_x264([_real_content(3)], qp=20, keyint=1, refs=1)
    (tmp_path / "a.h264").write_bytes(da)
    (tmp_path / "b.h264").write_bytes(db)
    sess = open_donor_session(tmp_path / "a.h264", tmp_path / "b.h264")
    _compose_and_check(sess, da, db, (0, 16, 48, 96), 128)


def test_x264_two_idr_donor_session(tmp_path):
    """Experiment-style ingest: one x264 stream carrying two IDRs
    (test_encoder.sh's two-frame setup.h264 donor contract)."""
    stream = avref.encode_x264([_real_content(5), _flat(170, 166, 16)],
                               qp=24, keyint=1, refs=1)
    p = tmp_path / "setup.h264"
    p.write_bytes(stream)
    sess = open_two_idr_session(p)
    sess.write_parameter_sets()
    sess.write_donor_atlases(sess._donor_a_rbsp, sess._donor_b_rbsp)
    offsets = (0, 32, 112)
    for off in offsets:
        sess.write_scroll_frame(off)
    pics, nerrors = avref.decode_pictures(sess.getvalue())
    assert nerrors == 0
    donors, _ = avref.decode_pictures(stream)
    canvas = po.scroll_canvas(donors[0], donors[1])
    for pic, off in zip(pics[2:], offsets):
        assert (pic.y == canvas.y[off: off + 128]).all(), off


def test_x264_parser_coverage():
    """Our SPS/PPS parsers on genuine x264 output (not self-written
    bitstreams): field extraction matches the encode parameters."""
    from h264_scroll_encoder_tpu.syntax import parse
    data = avref.encode_x264([_flat(100, 128, 128)], qp=30, keyint=1, refs=2)
    sps = pps = None
    for u in parse.iter_nal_units(data):
        if u.nal_unit_type == 7 and sps is None:
            sps = parse.parse_sps(u.rbsp)
        elif u.nal_unit_type == 8 and pps is None:
            pps = parse.parse_pps(u.rbsp)
    assert sps is not None and pps is not None
    assert (sps.width, sps.height) == (64, 128)
    assert pps.entropy_coding_mode_flag == 0          # baseline => CAVLC
    assert pps.pic_init_qp_minus26 == 30 - 26


def test_oracle_detects_corruption():
    """Negative control: a stream truncated mid-slice must not decode
    clean (guards against a vacuously-green oracle)."""
    s = _session()
    for off in OFFSETS:
        s.write_scroll_frame(off)
    data = s.getvalue()
    clipped = data[: len(data) - 40]      # cut into the final P slice
    pics, nerrors = avref.decode_pictures(clipped)
    assert nerrors > 0 or len(pics) < 2 + len(OFFSETS)


@pytest.mark.parametrize("qp", [18, 26, 34, 44])
def test_full_decoder_matches_libavcodec_x264_deblock(qp):
    """Genuine x264 streams WITH the in-loop deblocking filter enabled
    (IDR + P frames, adaptive per-MB QP, quarter-pel motion, partitions):
    the native pixel oracle (ops/deblock.py) must match libavcodec
    bit-for-bit on every plane."""
    from h264_scroll_encoder_tpu import pixel_oracle as po
    rng = np.random.default_rng(qp)
    h, w = 128, 64
    yy = np.mgrid[:h, :w][0]
    frames = []
    for k in range(3):
        y = ((16 + (yy * 170) // h + rng.integers(0, 30, (h, w)))
             .clip(0, 255).astype(np.uint8))
        frames.append((y, rng.integers(16, 240, (h // 2, w // 2),
                                       dtype=np.int64).astype(np.uint8),
                       np.full((h // 2, w // 2), 128, np.uint8)))
    data = avref.encode_x264(frames, qp=qp, keyint=99, refs=2)
    pics_av, nerrors = avref.decode_pictures(data)
    assert nerrors == 0
    pics_po = po.decode_stream_pixels(data)
    assert len(pics_av) == len(pics_po) == 3
    for i, (a, b) in enumerate(zip(pics_av, pics_po)):
        assert (a.y == b.y).all(), f"luma frame {i}"
        assert (a.cb == b.cb).all(), f"cb frame {i}"
        assert (a.cr == b.cr).all(), f"cr frame {i}"


def test_x264_donor_parity_vs_c_composer(ref_binaries, tmp_path):
    """Genuine x264 donors through BOTH composers: every NAL must be
    byte-identical except the PPS, which differs exactly by the donor QP
    base we adopt and the reference hardcodes (defect #6) — scroll
    P-frames and rewritten atlases are bit-equal, and only our stream
    decodes clean."""
    import subprocess
    from h264_scroll_encoder_tpu.syntax import parse

    exe = ref_binaries.get("composer")
    if exe is None:
        pytest.skip("composer unavailable")
    da = avref.encode_x264([_real_content(11, 64, 240)], qp=24,
                           keyint=1, refs=1)
    db = avref.encode_x264([_real_content(12, 64, 240)], qp=24,
                           keyint=1, refs=1)
    (tmp_path / "a.h264").write_bytes(da)
    (tmp_path / "b.h264").write_bytes(db)

    out_c = tmp_path / "ref.h264"
    subprocess.run([str(exe), "--ref-a", str(tmp_path / "a.h264"),
                    "--ref-b", str(tmp_path / "b.h264"),
                    "-n", "40", "-o", str(out_c)],
                   capture_output=True, check=True)

    sess = open_donor_session(tmp_path / "a.h264", tmp_path / "b.h264")
    sess.write_parameter_sets()
    sess.write_donor_atlases(sess._donor_a_rbsp, sess._donor_b_rbsp)
    # The C CLI's triangle schedule at default speed 4 (src/main.c:109-128).
    off, direction = 0, 4
    for _ in range(40):
        sess.write_scroll_or_waypoint_frame(off)
        off += direction
        if off >= sess.cfg.height or off <= 0:
            direction = -direction
            off = max(0, min(off, sess.cfg.height))
    ours = list(parse.iter_nal_units(sess.getvalue()))
    ref = list(parse.iter_nal_units(out_c.read_bytes()))
    assert len(ours) == len(ref)
    for i, (u, v) in enumerate(zip(ours, ref)):
        assert u.nal_unit_type == v.nal_unit_type, i
        if u.nal_unit_type == 8:           # PPS: ours carries donor QP base
            ours_pps = parse.parse_pps(u.rbsp)
            ref_pps = parse.parse_pps(v.rbsp)
            assert ours_pps.pic_init_qp_minus26 == 24 - 26
            assert ref_pps.pic_init_qp_minus26 == 0
            assert (ours_pps.num_ref_idx_l0_default_active_minus1
                    == ref_pps.num_ref_idx_l0_default_active_minus1)
        else:
            assert u.data == v.data, f"NAL {i} (type {u.nal_unit_type})"

    # The decode-correctness consequence of the PPS difference:
    _, ne_ours = avref.decode_pictures(sess.getvalue())
    _, ne_ref = avref.decode_pictures(out_c.read_bytes())
    assert ne_ours == 0


def test_serving_soak_mixed_generators():
    """One session interleaving every frame generator at serving shape:
    scroll (with waypoint crossings), hint compositions, dynamic-rect
    splices, and P_Skip-heavy statics — frame_num continuity across
    generators, then the whole stream must decode clean in libavcodec
    and bit-match the native oracle on every frame."""
    rng = np.random.default_rng(99)
    s = ComposerSession(ComposerConfig(320, 1024), enable_pskip=True)
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    s.preprovision_waypoints()
    n_frames = 2 + 2  # atlases + preprovisioned waypoints

    donor = fixtures.representative_donor_grid(rng, 4, 3)
    hint = FrameHints(motion_regions=(
        MotionRegion(0, 2, 20, 10, ref_idx=0, mv_x=0, mv_y=48),
        MotionRegion(0, 40, 20, 50, ref_idx=1, mv_x=0, mv_y=-32)))
    splice_hints = FrameHints(
        motion_regions=(MotionRegion(0, 0, 20, 8, ref_idx=0,
                                     mv_x=0, mv_y=24),),
        dynamic_mb_x=8, dynamic_mb_y=30)

    off = 0
    for i in range(40):
        kind = i % 5
        if kind in (0, 1, 2):
            s.write_scroll_or_waypoint_frame(off)
            n_frames += 1
            off = min(off + 37, 1008)
        elif kind == 3:
            s.write_hint_frame(hint)
            n_frames += 1
        else:
            s.write_spliced_frame(splice_hints, donor)
            n_frames += 1

    data = s.getvalue()
    from h264_scroll_encoder_tpu.verify import verify_stream
    rep = verify_stream(data)
    assert rep.ok, rep.errors
    _assert_conforms(data, expect_frames=n_frames)


def test_x264_p_slice_as_splice_donor():
    """A genuine x264 P slice (real motion, real residuals, real
    entropy statistics) as the dynamic-rect donor: parsed by the CAVLC
    engine, ref-remapped onto the session atlases, QP-aligned via
    donor_slice_qp, spliced under nC repair — the composed stream
    decodes with zero libavcodec errors and our full decoder agrees on
    every pixel."""
    from h264_scroll_encoder_tpu.models import mb_transcode as mbt
    from h264_scroll_encoder_tpu.models.splice import parse_slice_header
    from h264_scroll_encoder_tpu.ops.bitio import BitReader
    from h264_scroll_encoder_tpu.syntax import parse

    rng = np.random.default_rng(1)
    h, w = 80, 96
    base = rng.integers(16, 236, (h + 16, w), dtype=np.int64).astype(np.uint8)
    cc = (np.full((h // 2, w // 2), 100, np.uint8),
          np.full((h // 2, w // 2), 140, np.uint8))
    donor_stream = avref.encode_x264(
        [(base[:h],) + cc, (base[8:8 + h],) + cc], qp=30, keyint=99, refs=1)

    sps = pps = p_unit = None
    for u in parse.iter_nal_units(donor_stream):
        if u.nal_unit_type == 7:
            sps = parse.parse_sps(u.rbsp)
        elif u.nal_unit_type == 8:
            pps = parse.parse_pps(u.rbsp)
        elif u.nal_unit_type == 1:
            p_unit = u
    br = BitReader(p_unit.rbsp)
    hdr = parse_slice_header(
        br, is_idr=False, nal_ref_idc=p_unit.nal_ref_idc,
        log2_max_frame_num=sps.log2_max_frame_num,
        pps_num_ref_idx_l0_default=(
            pps.num_ref_idx_l0_default_active_minus1 + 1))
    donor_grid = mbt.parse_p_slice_mbs(br, sps.width // 16,
                                       sps.height // 16,
                                       hdr.num_ref_idx_l0)
    donor_slice_qp = 26 + pps.pic_init_qp_minus26 + hdr.qp_delta

    s = ComposerSession(ComposerConfig(320, 240))
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    hints = FrameHints(motion_regions=(
        MotionRegion(0, 0, 20, 3, ref_idx=0, mv_x=0, mv_y=16),),
        dynamic_mb_x=7, dynamic_mb_y=6)
    s.write_spliced_frame(hints, donor_grid, donor_slice_qp=donor_slice_qp)
    s.write_scroll_frame(16)
    _assert_conforms(s.getvalue(), expect_frames=4)


def test_successive_donor_video_in_corner():
    """MASTER_DESIGN's dynamic-encoder contract end to end: a real x264
    clip (IDR + P frames referencing each other) plays inside the
    composed stream.  The rect is seeded with I_PCM from the decoded
    donor IDR (position-independent intra), each subsequent composed
    frame is a reference, and each donor P slice is spliced with its
    refs retargeted to the previous composed frame and every mvd
    re-resolved against the composite prediction context (the rect's
    neighbor availability differs from the donor frame's, which would
    otherwise cascade wrong MVs).  Donor-frame interiors must be
    pixel-exact; only the 16 px edge margin (donor MC clamping vs real
    composite neighbors — the MASTER_DESIGN margin band) may differ."""
    from h264_scroll_encoder_tpu.models import mb_transcode as mbt
    from h264_scroll_encoder_tpu.models.splice import (
        ipcm_grid_from_picture, parse_slice_header)
    from h264_scroll_encoder_tpu.ops.bitio import BitReader
    from h264_scroll_encoder_tpu.syntax import parse

    h, w = 80, 96
    yy, xx = np.mgrid[:h + 32, :w]
    canvas = (40 + 80 * np.sin(yy / 9.0) + 60 * np.cos(xx / 7.0)
              + yy * 0.7).clip(16, 235).astype(np.uint8)
    cc = (np.full((h // 2, w // 2), 90, np.uint8),
          np.full((h // 2, w // 2), 150, np.uint8))
    frames = [(canvas[k * 4:k * 4 + h],) + cc for k in range(3)]
    clip = avref.encode_x264(frames, qp=24, keyint=99, refs=1,
                             extra_params="no-deblock=1")
    donor_pics, _ = avref.decode_pictures(clip)

    sps = pps = None
    p_units = []
    for u in parse.iter_nal_units(clip):
        if u.nal_unit_type == 7:
            sps = parse.parse_sps(u.rbsp)
        elif u.nal_unit_type == 8:
            pps = parse.parse_pps(u.rbsp)
        elif u.nal_unit_type == 1:
            p_units.append(u)
    dW, dH = sps.width // 16, sps.height // 16

    s = ComposerSession(ComposerConfig(320, 240))
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    rx, ry = 7, 6
    hints = FrameHints(motion_regions=(), dynamic_mb_x=rx, dynamic_mb_y=ry)
    s.write_spliced_frame(
        hints, ipcm_grid_from_picture(donor_pics[0], 0, 0, dW, dH),
        as_reference=True)
    for u in p_units:
        br = BitReader(u.rbsp)
        hdr = parse_slice_header(
            br, is_idr=False, nal_ref_idc=u.nal_ref_idc,
            log2_max_frame_num=sps.log2_max_frame_num,
            pps_num_ref_idx_l0_default=(
                pps.num_ref_idx_l0_default_active_minus1 + 1))
        grid = mbt.parse_p_slice_mbs(br, dW, dH, hdr.num_ref_idx_l0)
        s.write_spliced_frame(
            hints, grid, as_reference=True, donor_refs_previous=True,
            donor_slice_qp=26 + pps.pic_init_qp_minus26 + hdr.qp_delta)

    pics_av = _assert_conforms(s.getvalue(), expect_frames=5)
    for k in range(3):
        comp = pics_av[2 + k]
        rect = comp.y[ry * 16:(ry + dH) * 16, rx * 16:(rx + dW) * 16]
        d = np.abs(rect.astype(int) - donor_pics[k].y.astype(int))
        assert d[16:-16, 16:-16].max() == 0, f"frame {k} interior"
        if k == 0:
            assert d.max() == 0      # I_PCM seed: exact to the last pixel


def test_successive_splice_with_waypoints():
    """The untested header combination: a session with registered
    waypoints AND successive-donor splicing — the active list is
    [prev composed frame (short-term), atlas A, atlas B, waypoints...],
    hint indices shift transparently, and both oracles agree."""
    from h264_scroll_encoder_tpu.models import mb_transcode as mbt
    from h264_scroll_encoder_tpu.models.splice import ipcm_grid_from_picture

    s = ComposerSession(ComposerConfig(64, 1024))
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    s.preprovision_waypoints()           # registers the waypoint chain
    s.write_scroll_frame(512)            # uses a waypoint reference

    # Seed a 2x2 rect from the current atlas content, then splice a
    # donor referencing the previous composed frame while a hint region
    # scrolls from atlas A (index shifted past the short-term entry).
    pics = po.decode_stream_pixels(s.getvalue())
    seed = ipcm_grid_from_picture(pics[0], 0, 10, 2, 2)
    hints = FrameHints(motion_regions=(
        MotionRegion(0, 30, 4, 34, ref_idx=0, mv_x=0, mv_y=16),),
        dynamic_mb_x=1, dynamic_mb_y=20)
    s.write_spliced_frame(hints, seed, as_reference=True)
    donor = fixtures.representative_donor_grid(np.random.default_rng(3),
                                               2, 2)
    s.write_spliced_frame(hints, donor, as_reference=True,
                          donor_refs_previous=True)
    s.write_scroll_frame(512)
    _assert_conforms(s.getvalue())


def test_x264_fresh_donor_batch_serving():
    """Real x264 P-slices through the fused batch ingest and ONE
    compiled rows program: per-session distinct donors AND per-session
    slice-QP headers, byte-equal to the host splice path, every
    session's stream decoding with zero libavcodec errors."""
    import jax.numpy as jnp

    from h264_scroll_encoder_tpu import native_bridge
    from h264_scroll_encoder_tpu.config import MAX_WAYPOINTS
    from h264_scroll_encoder_tpu.models import mb_transcode as mbt
    from h264_scroll_encoder_tpu.models import splice, splice_device
    from h264_scroll_encoder_tpu.models.splice import parse_slice_header
    from h264_scroll_encoder_tpu.ops.bitio import BitReader
    from h264_scroll_encoder_tpu.parallel import batch
    from h264_scroll_encoder_tpu.syntax import parse
    from h264_scroll_encoder_tpu.syntax.nal import write_nal_unit
    from h264_scroll_encoder_tpu.syntax.slice_headers import (
        p_slice_header_symbols, write_p_slice_header)

    if not native_bridge.native_available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(83)
    B = 4
    vh, vw = 80, 96
    donors = []              # (payload, start_bit, num_refs, qp_delta_hdr)
    grids = []
    cfg = ComposerConfig(320, 240)
    for b in range(B):
        base = rng.integers(30, 200, (vh + 8, vw), dtype=np.uint8)
        f0 = (base[:vh], np.full((vh // 2, vw // 2), 100, np.uint8),
              np.full((vh // 2, vw // 2), 140, np.uint8))
        f1 = (base[4:4 + vh],) + f0[1:]
        clip = avref.encode_x264([f0, f1], qp=20 + 2 * b, keyint=99,
                                 refs=1, extra_params="no-deblock=1")
        sps = pps = None
        p_unit = None
        for u in parse.iter_nal_units(clip):
            if u.nal_unit_type == 7:
                sps = parse.parse_sps(u.rbsp)
            elif u.nal_unit_type == 8:
                pps = parse.parse_pps(u.rbsp)
            elif u.nal_unit_type == 1 and p_unit is None:
                p_unit = u
        br = BitReader(p_unit.rbsp)
        hdr = parse_slice_header(
            br, is_idr=False, nal_ref_idc=p_unit.nal_ref_idc,
            log2_max_frame_num=sps.log2_max_frame_num,
            pps_num_ref_idx_l0_default=(
                pps.num_ref_idx_l0_default_active_minus1 + 1))
        qp_delta = (26 + pps.pic_init_qp_minus26 + hdr.qp_delta
                    - (26 + cfg.pic_init_qp_minus26))
        donors.append((p_unit.rbsp, br.bit_position,
                       hdr.num_ref_idx_l0, qp_delta))
        br2 = BitReader(p_unit.rbsp)
        hdr2 = parse_slice_header(
            br2, is_idr=False, nal_ref_idc=p_unit.nal_ref_idc,
            log2_max_frame_num=sps.log2_max_frame_num,
            pps_num_ref_idx_l0_default=(
                pps.num_ref_idx_l0_default_active_minus1 + 1))
        grids.append(mbt.parse_p_slice_mbs(br2, vw // 16, vh // 16,
                                           hdr2.num_ref_idx_l0))

    R, C = vh // 16, vw // 16
    r0, c0 = 6, 8
    frame_num = 3
    CLASS = 512
    assert len({d[2] for d in donors}) == 1, "mixed donor ref counts"

    dn, _meta = splice_device.prepare_donor_rows_serving(
        [d[0] for d in donors], [d[1] for d in donors], R, C,
        donors[0][2], 2, s_row=CLASS, n_threads=2)

    H, W = cfg.mb_height, cfg.mb_width
    zero = jnp.zeros((H, W), jnp.int32)
    bg_coded = jnp.zeros((H, W), bool)
    hps, hns = [], []
    for _p, _sb, _nr, qpd in donors:
        hp, hn = p_slice_header_symbols(
            cfg, jnp.int32(frame_num), jnp.int32(frame_num * 2),
            is_reference=False, long_term_idx=-1,
            num_waypoints=jnp.int32(0),
            wp_long_term_idx=jnp.zeros(MAX_WAYPOINTS, jnp.int32),
            wp_valid=jnp.zeros(MAX_WAYPOINTS, bool),
            slice_qp_delta=qpd)
        hps.append(hp)
        hns.append(hn)
    budget = splice_device.splice_rbsp_budget(cfg, R * C, R * CLASS * 32)
    step = batch.make_batched_splice_step_rows(
        cfg, c0, r0, C, R, num_refs=2, has_align=True, n_rbsp=budget,
        compact_x=True)
    bcast = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
    nal, nal_len, _, ovf = step(
        jnp.stack(hps), jnp.stack(hns), bcast(zero), bcast(zero),
        bcast(zero), bcast(bg_coded), dn)
    assert not bool(np.asarray(ovf).any())

    hints = FrameHints(motion_regions=(), dynamic_mb_x=c0,
                       dynamic_mb_y=r0)
    for b in range(B):
        dev_bytes = np.asarray(nal[b])[: int(nal_len[b])].tobytes()
        grid = splice.splice_p_frame(cfg, hints, grids[b], 2)
        qpd = donors[b][3]

        def hdr_writer(bw2):
            write_p_slice_header(bw2, cfg, frame_num,
                                 slice_qp_delta=qpd)

        host_nal = write_nal_unit(
            splice.finalize_spliced_frame(cfg, grid, 2, hdr_writer),
            0, 1)
        assert dev_bytes == host_nal, b

        s = ComposerSession(cfg)
        s.write_parameter_sets()
        s.write_test_atlases(striped=True)
        stream = s.getvalue() + dev_bytes
        _pics, nerrors = avref.decode_pictures(stream)
        assert nerrors == 0, (b, nerrors)


def test_batched_successive_serving_session():
    """The flagship batched device composition (scrolling band + an x264
    clip playing in the rect via successive-donor retarget + periodic
    I_PCM re-seeds) as a CI test at small geometry: byte-identical to
    the host session path, zero libavcodec errors, interiors
    pixel-exact within the re-seed margin contract (the 720p variant is
    examples/video_in_corner_demo.py --batched)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "video_in_corner_demo",
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "video_in_corner_demo.py"))
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)
    demo.main_batched("/tmp/vic_test_small.h264", batch=2,
                      width=320, height=240, rx=12, ry=9)


def test_wide_layout_1080p_decodes_clean():
    """1920x1088 composed scroll (the wide symbol layout, >4095 MBs)
    decodes with zero libavcodec errors and the expected frame count."""
    from h264_scroll_encoder_tpu.cli import triangle_offsets

    s = ComposerSession(ComposerConfig(1920, 1088), enable_pskip=True)
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    n = 4
    for off in triangle_offsets(n, 24, 1088 - 16):
        s.write_scroll_or_waypoint_frame(off)
    data = s.getvalue()
    _pics, nerrors = avref.decode_pictures(data)
    assert nerrors == 0
    assert len(_pics) == 2 + n
