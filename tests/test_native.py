"""Native CAVLC parser vs the Python reference parser (differential)."""

import numpy as np
import pytest

from h264_scroll_encoder_tpu import native_bridge
from h264_scroll_encoder_tpu.models import mb_transcode as mbt
from h264_scroll_encoder_tpu.ops.bitio import BitReader, BitWriter
from h264_scroll_encoder_tpu.utils import fixtures


pytestmark = pytest.mark.skipif(not native_bridge.native_available(),
                                reason="native library unavailable")


def _assert_mb_equal(a, b, where):
    if a is mbt.SKIP or b is mbt.SKIP:
        assert a is b, where
        return
    assert a.kind == b.kind, where
    assert a.mb_type == b.mb_type, where
    assert a.cbp == b.cbp, where
    assert a.qp_delta == b.qp_delta, where
    assert a.chroma_pred == b.chroma_pred, where
    assert a.mvds == b.mvds, where
    assert a.ref_idx == b.ref_idx, where
    assert a.sub_mb_types == b.sub_mb_types, where
    assert a.pred_mode_bits == b.pred_mode_bits, where
    assert a.ipcm_samples == b.ipcm_samples, where
    for i, (x, y) in enumerate(zip(a.luma, b.luma)):
        assert (x.total_coeff, x.trailing_ones, x.tail) == (
            y.total_coeff, y.trailing_ones, y.tail), (where, "luma", i)
    if a.luma_dc or b.luma_dc:
        assert (a.luma_dc.total_coeff, a.luma_dc.tail) == (
            b.luma_dc.total_coeff, b.luma_dc.tail), where
    for c in range(2):
        for i in range(4):
            x, y = a.chroma_ac[c][i], b.chroma_ac[c][i]
            assert (x.total_coeff, x.tail) == (y.total_coeff, y.tail), \
                (where, "chroma", c, i)


@pytest.mark.parametrize("seed,is_p,num_ref", [
    (1, False, 1), (2, True, 1), (3, True, 2), (4, True, 4),
])
def test_native_matches_python(seed, is_p, num_ref):
    rng = np.random.default_rng(seed)
    w, h = 8, 6
    if is_p:
        grid = fixtures.random_p_slice_grid(rng, w, h, num_ref)
    else:
        grid = fixtures.random_i_slice_grid(rng, w, h)
    bw = BitWriter()
    if is_p:
        mbt.emit_p_slice_mbs(bw, grid, num_ref)
    else:
        mbt.emit_i_slice_mbs(bw, grid)
    bw.write_trailing_bits()
    rbsp = bw.getvalue()

    br = BitReader(rbsp)
    if is_p:
        py_grid = mbt.parse_p_slice_mbs(br, w, h, num_ref)
    else:
        py_grid = mbt.parse_i_slice_mbs(br, w, h)
    py_end = br.bit_position

    nat = native_bridge.parse_slice_native(rbsp, 0, w, h, is_p, num_ref)
    assert nat is not None
    nat_grid, nat_end = nat
    assert nat_end == py_end
    for r in range(h):
        for c in range(w):
            _assert_mb_equal(py_grid[r][c], nat_grid[r][c], (r, c))


def test_native_transcode_engine_equivalence():
    """The full native transcode path (raw parse -> pad -> native emit)
    must be byte-identical to the Python engine, across ref counts and
    bug-compat modes (I_PCM alignment depends on the header bit phase —
    the case that catches phase bugs)."""
    from h264_scroll_encoder_tpu.models.splice import transcode_pad_stream

    for seed, nref in ((3, 1), (11, 2)):
        for bc in (False, True):
            # The stream's I_PCM nC rule must match the transcode's
            # (bug_compat changes both the parse and emit sides).
            stream = fixtures.synthetic_cavlc_stream(
                320, 320, n_p_frames=2, seed=seed, num_ref_idx_l0=nref,
                bug_compat=bc)
            py = transcode_pad_stream(stream, 720, 320, bug_compat=bc,
                                      engine="python")
            nat = transcode_pad_stream(stream, 720, 320, bug_compat=bc,
                                       engine="native")
            assert py == nat, (seed, nref, bc)


def test_native_reemission_byte_identical():
    """Native-parsed grids must re-emit byte-identically."""
    rng = np.random.default_rng(9)
    w, h = 10, 8
    grid = fixtures.random_p_slice_grid(rng, w, h, 2)
    bw = BitWriter()
    mbt.emit_p_slice_mbs(bw, grid, 2)
    bw.write_trailing_bits()
    rbsp = bw.getvalue()

    nat_grid, _ = native_bridge.parse_slice_native(rbsp, 0, w, h, True, 2)
    bw2 = BitWriter()
    mbt.emit_p_slice_mbs(bw2, nat_grid, 2)
    bw2.write_trailing_bits()
    assert bw2.getvalue() == rbsp


# ---------------------------------------------------------------------------
# Hostile / malformed donor bitstreams (ADVICE round-1 findings): the parse
# must fail with an error code — never read or write out of bounds.
# ---------------------------------------------------------------------------

from h264_scroll_encoder_tpu.ops import cavlc


def _parse_native_raw(rbsp, w, h, is_p, num_ref):
    return native_bridge.parse_slice_native(rbsp, 0, w, h, is_p, num_ref)


def test_native_rejects_huge_sub_mb_type():
    """sub_mb_type >= 2^31 must error (kErrMbType), not index sub_mvs[]
    with a negative int32 (previously a SIGSEGV / heap corruption)."""
    bw = BitWriter()
    bw.write_ue(0)        # skip_run
    bw.write_ue(3)        # mb_type P_8x8
    bw.write_ue(2 ** 31)  # sub_mb_type[0]: 31 leading zeros, cast-negative
    bw.write_trailing_bits()
    rbsp = bw.getvalue() + b"\x00" * 64
    with pytest.raises(cavlc.CAVLCError):
        _parse_native_raw(rbsp, 1, 1, True, 1)
    # The Python parser must agree (differential parity on rejection).
    with pytest.raises(cavlc.CAVLCError):
        mbt.parse_p_slice_mbs(BitReader(rbsp), 1, 1, 1)


def test_native_rejects_sub_mb_type_4_to_small():
    """Any P sub_mb_type > 3 is out of Table 7-17 range."""
    bw = BitWriter()
    bw.write_ue(0)
    bw.write_ue(3)
    bw.write_ue(4)
    bw.write_trailing_bits()
    rbsp = bw.getvalue() + b"\x00" * 16
    with pytest.raises(cavlc.CAVLCError):
        _parse_native_raw(rbsp, 1, 1, True, 1)
    with pytest.raises(cavlc.CAVLCError):
        mbt.parse_p_slice_mbs(BitReader(rbsp), 1, 1, 1)


def test_native_rejects_all_zero_ue():
    """32+ leading zeros in a ue(v) field (only reachable in a corrupt
    stream) previously evaluated 1u<<32 (UB); now an out-of-range
    sentinel that the mb_type range check rejects."""
    rbsp = b"\x00" * 12  # mb_type ue() never terminates within the buffer
    with pytest.raises(cavlc.CAVLCError):
        _parse_native_raw(rbsp, 1, 1, False, 1)


def test_native_rejects_truncated_ipcm():
    """An I_PCM macroblock whose 384-byte payload runs past the RBSP end
    must fail the parse (kErrEof), not record an out-of-bounds span that
    emission would later copy from adjacent heap memory."""
    bw = BitWriter()
    bw.write_ue(25)  # I_PCM in an I slice
    rbsp = bw.getvalue() + b"\xAB" * 100  # payload needs 384 bytes
    with pytest.raises(cavlc.CAVLCError):
        _parse_native_raw(rbsp, 1, 1, False, 1)


def test_native_rejects_truncated_residual_tail():
    """Residual blocks parsed off the end of the buffer (EOF-tolerant
    bit reads) must not record tail spans past the RBSP."""
    bw = BitWriter()
    bw.write_ue(0)       # skip_run
    bw.write_ue(0)       # mb_type P_L0_16x16
    bw.write_se(1)       # mvd x
    bw.write_se(1)       # mvd y
    bw.write_ue(2)       # cbp code -> nonzero cbp, residual expected
    bw.write_bits(0, 3)  # qp_delta + a sliver, then the stream just ends
    rbsp = bw.getvalue()
    with pytest.raises(cavlc.CAVLCError):
        _parse_native_raw(rbsp, 2, 1, True, 1)


def test_native_dense_prep_matches_python():
    """Native dense donor prep (cavlc_prepare_dense + cavlc_mv_edge_roles)
    must equal the Python path field-for-field: chunk patterns/nbits,
    coded mask, donor_bits, has_align, and all nine edge-role arrays —
    across donor kinds (incl. I_PCM + sub-8x8), ref maps, frame-edge
    flags, and injected rings."""
    if not native_bridge.native_available():
        pytest.skip("native library unavailable")
    from h264_scroll_encoder_tpu.models import splice_device
    from h264_scroll_encoder_tpu.ops.bitio import BitWriter

    rng = np.random.default_rng(31)
    cases = [
        dict(R=4, C=5, donor_refs=1, num_refs=2, ref_map=(0,),
             edges=(False, False, False), rings=None),
        dict(R=3, C=3, donor_refs=1, num_refs=3, ref_map=(2,),
             edges=(True, True, False), rings=None),
        dict(R=3, C=4, donor_refs=2, num_refs=4, ref_map=(0, 2),
             edges=(False, False, True), rings="custom"),
    ]
    for case in cases:
        R, C = case["R"], case["C"]
        grid = fixtures.random_p_slice_grid(rng, C, R, case["donor_refs"])
        if case["ref_map"][0] != 0:
            # Moved maps reject donor P_Skips (error -103: skips
            # hardwire composite ref 0); differential-test the mapped
            # prep on a skip-free grid.
            for row in grid:
                for i, mb in enumerate(row):
                    if mb is mbt.SKIP:
                        row[i] = fixtures.random_inter_mb(
                            rng, case["donor_refs"])
        # Ensure coverage: an I_PCM and a dense sub-8x8 MB somewhere.
        grid[0][1] = fixtures.random_ipcm_mb(rng, in_p_slice=True)
        mb = fixtures.random_inter_mb(rng, case["donor_refs"])
        mb.mb_type, mb.sub_mb_types = 3, (3, 3, 3, 3)
        mb.mvds = tuple((int(rng.integers(-9, 9)), int(rng.integers(-9, 9)))
                        for _ in range(16))
        if case["donor_refs"] > 1:
            mb.ref_idx = tuple(int(rng.integers(0, case["donor_refs"]))
                               for _ in range(4))
        else:
            mb.ref_idx = ()
        grid[1][1] = mb

        bw = BitWriter()
        mbt.emit_p_slice_mbs(bw, grid, case["donor_refs"])
        bw.write_trailing_bits()
        payload = bw.getvalue()

        le, te_, re_ = case["edges"]
        rings = {}
        if case["rings"] == "custom":
            rings = dict(
                left_ring=[(1, 0, 8)] * R,
                top_ring=[None] + [(0, 4, -4)] * C + [None],
                right_ring=[(2, -4, 0)] * (R - 1))
        kw = dict(rect_at_left_edge=le, rect_at_top_edge=te_,
                  rect_at_right_edge=re_, **rings)
        dd_py = splice_device.prepare_donor_dense_from_slice(
            payload, 0, C, R, case["donor_refs"], case["num_refs"],
            case["ref_map"], engine="python", **kw)
        dd_nat = splice_device.prepare_donor_dense_from_slice(
            payload, 0, C, R, case["donor_refs"], case["num_refs"],
            case["ref_map"], engine="native", **kw)

        assert dd_nat.patterns.shape == dd_py.patterns.shape, case
        assert np.array_equal(dd_nat.patterns, dd_py.patterns), case
        assert np.array_equal(dd_nat.nbits, dd_py.nbits), case
        assert np.array_equal(dd_nat.coded, dd_py.coded)
        assert dd_nat.donor_bits == dd_py.donor_bits
        assert dd_nat.has_align == dd_py.has_align
        for f in ("a_ref", "a_mvx", "a_mvy", "b_ref", "b_mvx", "b_mvy",
                  "d_ref", "d_mvx", "d_mvy"):
            assert np.array_equal(getattr(dd_nat, f), getattr(dd_py, f)), \
                (case, f)


def test_native_pack_rows_matches_python():
    """cavlc_pack_rows (C++) vs the Python fuse loop: identical row
    layouts across donor classes incl. I_PCM alignment sentinels."""
    import numpy as np
    from h264_scroll_encoder_tpu import native_bridge
    from h264_scroll_encoder_tpu.models import mb_transcode as mbt
    from h264_scroll_encoder_tpu.models import splice_device as sd
    from h264_scroll_encoder_tpu.ops.bitio import BitWriter

    if not native_bridge.native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(17)
    for grid in (fixtures.representative_donor_grid(rng, 9, 7),
                 fixtures.dense_donor_grid(rng, 9, 7),
                 fixtures.random_p_slice_grid(rng, 9, 7, 1)):
        bw = BitWriter()
        mbt.emit_p_slice_mbs(bw, grid, 1)
        bw.write_trailing_bits()
        R, C = len(grid), len(grid[0])
        dd = sd.prepare_donor_dense_from_slice(bw.getvalue(), 0, C, R, 1, 2)
        a = sd.pack_donor_rows(dd, R, C)
        orig = native_bridge.native_available
        native_bridge.native_available = lambda: False
        try:
            b = sd.pack_donor_rows(dd, R, C)
        finally:
            native_bridge.native_available = orig
        assert np.array_equal(a.row_patterns, b.row_patterns)
        assert np.array_equal(a.row_nbits, b.row_nbits)
        assert np.array_equal(a.first_c, b.first_c)
        assert (a.donor_bits, a.has_align) == (b.donor_bits, b.has_align)


def test_prepare_rows_batch_matches_single():
    """The fused threaded batch prep (cavlc_prepare_rows_batch) is
    field-identical to the per-donor prepare_donor_dense_from_slice +
    pack_donor_rows path, across mixed donor families, with >1 threads
    exercised."""
    import numpy as np
    from h264_scroll_encoder_tpu import native_bridge as nb
    from h264_scroll_encoder_tpu.models import mb_transcode as mbt
    from h264_scroll_encoder_tpu.models import splice_device as sd
    from h264_scroll_encoder_tpu.ops.bitio import BitWriter
    from h264_scroll_encoder_tpu.utils import fixtures

    if not nb.native_available():
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(41)
    R, C = 7, 9
    CLASS = 256
    payloads = []
    for k in range(12):
        if k % 3 == 0:
            g = fixtures.random_p_slice_grid(rng, C, R, 1)
        elif k % 3 == 1:
            g = fixtures.dense_donor_grid(rng, C, R)
        else:
            g = fixtures.representative_donor_grid(rng, C, R)
            g[0][0] = fixtures.random_ipcm_mb(rng, in_p_slice=True)
        bw = BitWriter()
        mbt.emit_p_slice_mbs(bw, g, 1)
        bw.write_trailing_bits()
        payloads.append(bw.getvalue())

    out = nb.prepare_rows_batch(payloads, [0] * len(payloads), R, C,
                                1, 2, (0,), CLASS, n_threads=4)
    for i, payload in enumerate(payloads):
        dd = sd.prepare_donor_dense_from_slice(payload, 0, C, R, 1, 2)
        dr = sd.pack_donor_rows(dd, R, C, min_class=CLASS)
        assert np.array_equal(out["row_patterns"][i], dr.row_patterns), i
        assert np.array_equal(out["row_nbits"][i], dr.row_nbits), i
        assert np.array_equal(out["first_c"][i], dr.first_c), i
        assert np.array_equal(out["coded"][i], dr.coded), i
        for f in ("a_ref", "a_mvx", "a_mvy", "b_ref", "b_mvx", "b_mvy",
                  "d_ref", "d_mvx", "d_mvy"):
            assert np.array_equal(out[f][i], getattr(dr, f)), (i, f)
        assert int(out["donor_bits"][i]) == dr.donor_bits, i
        assert bool(out["has_align"][i]) == dr.has_align, i


def test_prepare_rows_batch_per_donor_rings():
    """rings_per_donor: each donor preps against ITS session's composite
    border; results match per-donor single prep with those rings."""
    import numpy as np
    from h264_scroll_encoder_tpu import native_bridge as nb
    from h264_scroll_encoder_tpu.models import mb_transcode as mbt
    from h264_scroll_encoder_tpu.models import splice_device as sd
    from h264_scroll_encoder_tpu.ops.bitio import BitWriter
    from h264_scroll_encoder_tpu.utils import fixtures

    if not nb.native_available():
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(71)
    R, C = 5, 6
    CLASS = 256
    payloads, rings = [], []
    for k in range(6):
        g = fixtures.representative_donor_grid(rng, C, R)
        bw = BitWriter()
        mbt.emit_p_slice_mbs(bw, g, 1)
        bw.write_trailing_bits()
        payloads.append(bw.getvalue())
        # Session k scrolls at a different speed: its border cells carry
        # (ref 1, mv_y = 8k qpel).
        mv = 8 * k
        rings.append((
            [(1, 0, mv)] * R,                 # left
            [(1, 0, mv)] * (C + 2),           # top
            [(1, 0, mv)] * (R - 1),           # right
        ))

    out = nb.prepare_rows_batch(
        payloads, [0] * 6, R, C, 1, 2, (0,), CLASS,
        left_ring=[r[0] for r in rings],
        top_ring=[r[1] for r in rings],
        right_ring=[r[2] for r in rings],
        rings_per_donor=True, n_threads=3)
    for i, payload in enumerate(payloads):
        dd = sd.prepare_donor_dense_from_slice(
            payload, 0, C, R, 1, 2,
            left_ring=rings[i][0], top_ring=rings[i][1],
            right_ring=rings[i][2])
        dr = sd.pack_donor_rows(dd, R, C, min_class=CLASS)
        assert np.array_equal(out["row_patterns"][i], dr.row_patterns), i
        for f in ("a_ref", "a_mvx", "a_mvy", "b_ref", "b_mvx", "b_mvy",
                  "d_ref", "d_mvx", "d_mvy"):
            assert np.array_equal(out[f][i], getattr(dr, f)), (i, f)


@pytest.mark.parametrize("target", ["tsan_check", "asan_check"])
def test_native_sanitizers(target):
    """Thread- and address/UB-sanitized runs of the threaded batch
    ingest (native/sanitize_check.cpp): the round-3 std::thread fan-out
    is the one concurrent code path in the framework — TSAN proves the
    worker outputs race-free, ASAN/UBSAN the memory model (the
    single-threaded reference needed neither, SURVEY.md §5)."""
    import subprocess
    from pathlib import Path

    native = Path(__file__).resolve().parent.parent / "native"
    build = subprocess.run(["make", "-C", str(native), target],
                           capture_output=True, text=True)
    if build.returncode != 0:
        pytest.skip(f"{target} build unavailable: {build.stderr[-200:]}")
    run = subprocess.run([str(native / target)], capture_output=True,
                         text=True, timeout=300)
    assert run.returncode == 0, (run.stdout, run.stderr)
    assert "sanitize_check OK" in run.stdout


def test_prepare_rows_batch_right_edge_rect():
    """A rect touching the frame's RIGHT edge: batch-prep default rings
    must mark the right border unavailable (regression: the batch
    wrapper once hardcoded at_right_edge=False, silently giving donor
    above-right prediction a phantom (0,0,0) neighbor)."""
    import numpy as np
    from h264_scroll_encoder_tpu import native_bridge as nb
    from h264_scroll_encoder_tpu.models import mb_transcode as mbt
    from h264_scroll_encoder_tpu.models import splice_device as sd
    from h264_scroll_encoder_tpu.ops.bitio import BitWriter
    from h264_scroll_encoder_tpu.utils import fixtures

    if not nb.native_available():
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(9)
    R, C = 5, 4
    CLASS = 256
    g = fixtures.representative_donor_grid(rng, C, R)
    bw = BitWriter()
    mbt.emit_p_slice_mbs(bw, g, 1)
    bw.write_trailing_bits()
    payload = bw.getvalue()

    out = nb.prepare_rows_batch([payload], [0], R, C, 1, 2, (0,), CLASS,
                                at_right_edge=True)
    dd = sd.prepare_donor_dense_from_slice(
        payload, 0, C, R, 1, 2, rect_at_right_edge=True)
    dr = sd.pack_donor_rows(dd, R, C, min_class=CLASS)
    assert np.array_equal(out["row_patterns"][0], dr.row_patterns)
    for f in ("a_ref", "a_mvx", "a_mvy", "b_ref", "b_mvx", "b_mvy",
              "d_ref", "d_mvx", "d_mvy"):
        assert np.array_equal(out[f][0], getattr(dr, f)), f
    assert int(out["donor_bits"][0]) == dr.donor_bits


def test_prepare_rows_batch_fuzz_geometries():
    """Randomized fuzz: 20 random (R, C, family, edge-flag) configs
    through the single-pass batch ingest vs the staged per-donor path —
    field-identical everywhere."""
    import numpy as np
    from h264_scroll_encoder_tpu import native_bridge as nb
    from h264_scroll_encoder_tpu.models import mb_transcode as mbt
    from h264_scroll_encoder_tpu.models import splice_device as sd
    from h264_scroll_encoder_tpu.ops.bitio import BitWriter
    from h264_scroll_encoder_tpu.utils import fixtures

    if not nb.native_available():
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(20240817)
    fams = (fixtures.random_p_slice_grid, fixtures.dense_donor_grid,
            fixtures.representative_donor_grid)
    for trial in range(20):
        R = int(rng.integers(1, 9))
        C = int(rng.integers(1, 11))
        fab = fams[trial % 3]
        g = (fab(rng, C, R, 1) if fab is fixtures.random_p_slice_grid
             else fab(rng, C, R))
        if trial % 4 == 0:
            g[int(rng.integers(R))][int(rng.integers(C))] = \
                fixtures.random_ipcm_mb(rng, in_p_slice=True)
        at_l = bool(rng.integers(2))
        at_t = bool(rng.integers(2))
        at_r = bool(rng.integers(2)) and not at_l
        bw = BitWriter()
        mbt.emit_p_slice_mbs(bw, g, 1)
        bw.write_trailing_bits()
        payload = bw.getvalue()

        CLASS = 512
        out = nb.prepare_rows_batch(
            [payload], [0], R, C, 1, 2, (0,), CLASS,
            at_left_edge=at_l, at_top_edge=at_t, at_right_edge=at_r)
        dd = sd.prepare_donor_dense_from_slice(
            payload, 0, C, R, 1, 2, rect_at_left_edge=at_l,
            rect_at_top_edge=at_t, rect_at_right_edge=at_r)
        dr = sd.pack_donor_rows(dd, R, C, min_class=CLASS)
        ctx = (trial, R, C, at_l, at_t, at_r)
        assert np.array_equal(out["row_patterns"][0], dr.row_patterns), ctx
        assert np.array_equal(out["row_nbits"][0], dr.row_nbits), ctx
        assert np.array_equal(out["first_c"][0], dr.first_c), ctx
        assert np.array_equal(out["coded"][0], dr.coded), ctx
        for f in ("a_ref", "a_mvx", "a_mvy", "b_ref", "b_mvx", "b_mvy",
                  "d_ref", "d_mvx", "d_mvy"):
            assert np.array_equal(out[f][0], getattr(dr, f)), ctx + (f,)
        assert int(out["donor_bits"][0]) == dr.donor_bits, ctx
        assert bool(out["has_align"][0]) == dr.has_align, ctx
