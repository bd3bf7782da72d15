"""CAVLC codec: table sanity, block round-trips, slice round-trips, and
byte-parity differential vs the reference trans_resizer binary."""

import subprocess

import numpy as np
import pytest

from h264_scroll_encoder_tpu.models import mb_transcode as mbt
from h264_scroll_encoder_tpu.models.splice import transcode_pad_stream
from h264_scroll_encoder_tpu.ops import cavlc
from h264_scroll_encoder_tpu.ops import cavlc_tables as T
from h264_scroll_encoder_tpu.ops.bitio import BitReader, BitWriter
from h264_scroll_encoder_tpu.utils import fixtures


def test_coeff_token_tables_prefix_free():
    for cls in ("nc0", "nc2", "nc4", "chroma_dc"):
        codes = list(T.coeff_token_decode_table(cls))
        for i, a in enumerate(codes):
            for b in codes[i + 1:]:
                assert not a.startswith(b) and not b.startswith(a), (
                    f"{cls}: {a} / {b}")


def test_coeff_token_table_sizes():
    # 0<=nC<2 etc: tc 0..16, t1 0..min(3,tc) -> 1 + 1*2... = 62 entries.
    assert len(T.coeff_token_decode_table("nc0")) == 62
    assert len(T.coeff_token_decode_table("nc2")) == 62
    assert len(T.coeff_token_decode_table("nc4")) == 62
    # chroma DC: tc 0..4 -> 1+2+3+4+4 = 14.
    assert len(T.coeff_token_decode_table("chroma_dc")) == 14


def test_total_zeros_tables_prefix_free():
    for tc in range(1, 16):
        codes = T.TOTAL_ZEROS_4x4[tc]
        assert len(codes) == 16 - tc + 1 or len(codes) == 16 - tc, \
            (tc, len(codes))
        for i, a in enumerate(codes):
            for b in codes[i + 1:]:
                assert not a.startswith(b) and not b.startswith(a), (tc, a, b)
    for tc in range(1, 4):
        codes = T.TOTAL_ZEROS_CHROMA_DC[tc]
        assert len(codes) == 4 - tc + 1


def test_block_roundtrip_fuzz():
    rng = np.random.default_rng(42)
    for max_coeff in (16, 15, 4):
        for trial in range(200):
            blk = fixtures.random_residual_block(rng, max_coeff, density=1.0)
            for nC in (-1,) if max_coeff == 4 else (0, 1, 2, 3, 4, 7, 8, 20):
                if max_coeff == 4 and nC != -1:
                    continue
                bw = BitWriter()
                cavlc.write_residual_block(bw, blk, nC)
                bw.write_trailing_bits()
                br = BitReader(bw.getvalue())
                got = cavlc.read_residual_block(br, nC, max_coeff)
                assert got.total_coeff == blk.total_coeff
                assert got.trailing_ones == blk.trailing_ones
                assert got.levels == blk.levels, (max_coeff, nC, trial)
                assert got.total_zeros == blk.total_zeros
                assert got.tail == blk.tail


def test_i_slice_roundtrip():
    rng = np.random.default_rng(7)
    grid = fixtures.random_i_slice_grid(rng, 5, 4)
    bw = BitWriter()
    mbt.emit_i_slice_mbs(bw, grid)
    bw.write_trailing_bits()
    br = BitReader(bw.getvalue())
    got = mbt.parse_i_slice_mbs(br, 5, 4)
    for r in range(4):
        for c in range(5):
            a, b = grid[r][c], got[r][c]
            assert a.kind == b.kind and a.mb_type == b.mb_type, (r, c)
            assert a.cbp == b.cbp and a.ipcm_samples == b.ipcm_samples
            assert a.luma == b.luma and a.chroma_ac == b.chroma_ac


def test_p_slice_roundtrip():
    rng = np.random.default_rng(9)
    for num_ref in (1, 2, 4):
        grid = fixtures.random_p_slice_grid(rng, 6, 5, num_ref)
        bw = BitWriter()
        mbt.emit_p_slice_mbs(bw, grid, num_ref)
        bw.write_trailing_bits()
        br = BitReader(bw.getvalue())
        got = mbt.parse_p_slice_mbs(br, 6, 5, num_ref)
        for r in range(5):
            for c in range(6):
                a, b = grid[r][c], got[r][c]
                if a is mbt.SKIP:
                    assert b is mbt.SKIP, (num_ref, r, c)
                    continue
                assert a.kind == b.kind and a.mb_type == b.mb_type
                assert a.mvds == b.mvds and a.ref_idx == b.ref_idx
                assert a.cbp == b.cbp and a.luma == b.luma


def test_emit_is_reparse_stable():
    """emit(parse(emit(g))) must be byte-identical to emit(g)."""
    rng = np.random.default_rng(21)
    grid = fixtures.random_p_slice_grid(rng, 8, 6, 2)
    bw1 = BitWriter()
    mbt.emit_p_slice_mbs(bw1, grid, 2)
    bw1.write_trailing_bits()
    br = BitReader(bw1.getvalue())
    got = mbt.parse_p_slice_mbs(br, 8, 6, 2)
    bw2 = BitWriter()
    mbt.emit_p_slice_mbs(bw2, got, 2)
    bw2.write_trailing_bits()
    assert bw1.getvalue() == bw2.getvalue()


def test_transcode_pad_parity_vs_reference(ref_binaries, tmp_path):
    """Our synthetic stream through the reference trans_resizer must equal
    our own padding transcoder byte-for-byte (320x320 -> 720x320)."""
    exe = ref_binaries.get("trans_resizer")
    if exe is None:
        pytest.skip("trans_resizer unavailable")

    stream = fixtures.synthetic_cavlc_stream(320, 320, n_p_frames=2,
                                             seed=3, bug_compat=True)
    inp = tmp_path / "in.h264"
    inp.write_bytes(stream)
    out = tmp_path / "ref_out.h264"
    r = subprocess.run([str(exe), str(inp), str(out)],
                       capture_output=True)
    # trans_resizer self-verifies with ffmpeg (absent here): it returns
    # nonzero from that final system() even on success, so check that the
    # transcode itself completed by output existence.
    assert out.exists() and out.stat().st_size > 0, r.stderr.decode()[-800:]

    ours = transcode_pad_stream(stream, 720, 320, bug_compat=True)
    ref = out.read_bytes()
    assert ours == ref, (
        f"sizes: ours={len(ours)} ref={len(ref)}; first diff at "
        f"{next((i for i, (a, b) in enumerate(zip(ours, ref)) if a != b), -1)}")

    # Corrected mode must parse cleanly as a full 45x20 grid with no
    # spurious ue(v) between the last MB and rbsp_trailing_bits.  (It
    # consumes a spec-rule stream: bug_compat changes the I_PCM nC rule
    # on the parse side too, so the flags must match the fixture's.)
    from h264_scroll_encoder_tpu.models.splice import parse_slice_header
    from h264_scroll_encoder_tpu.ops.bitio import BitReader
    spec_stream = fixtures.synthetic_cavlc_stream(320, 320, n_p_frames=2,
                                                  seed=3)
    fixed = transcode_pad_stream(spec_stream, 720, 320)
    for u in __import__(
            "h264_scroll_encoder_tpu.syntax.parse", fromlist=["parse"]
            ).iter_nal_units(fixed):
        if u.nal_unit_type != 1:
            continue
        br = BitReader(u.rbsp)
        hdr = parse_slice_header(br, is_idr=False,
                                 nal_ref_idc=u.nal_ref_idc,
                                 log2_max_frame_num=4,
                                 pps_num_ref_idx_l0_default=1)
        mbt.parse_p_slice_mbs(br, 45, 20, hdr.num_ref_idx_l0)
        # Only the stop bit + alignment zeros may remain.
        assert len(u.rbsp) * 8 - br.bit_position <= 8


def test_transcode_pad_multiref(ref_binaries, tmp_path):
    """Same differential with 2 reference frames (te(v) ref_idx path)."""
    exe = ref_binaries.get("trans_resizer")
    if exe is None:
        pytest.skip("trans_resizer unavailable")
    stream = fixtures.synthetic_cavlc_stream(320, 320, n_p_frames=2, seed=11,
                                             num_ref_idx_l0=2,
                                             bug_compat=True)
    inp = tmp_path / "in2.h264"
    inp.write_bytes(stream)
    out = tmp_path / "ref_out2.h264"
    subprocess.run([str(exe), str(inp), str(out)], capture_output=True)
    assert out.exists() and out.stat().st_size > 0
    ours = transcode_pad_stream(stream, 720, 320, bug_compat=True)
    assert ours == out.read_bytes()
