"""Device splice kernel vs the host splice path: byte equality."""

import numpy as np
import jax
import jax.numpy as jnp

from h264_scroll_encoder_tpu.config import ComposerConfig, MAX_WAYPOINTS
from h264_scroll_encoder_tpu.models import mb_transcode as mbt
from h264_scroll_encoder_tpu.models import splice, splice_device
from h264_scroll_encoder_tpu.models.splice import FrameHints, MotionRegion
from h264_scroll_encoder_tpu.ops.bitio import BitWriter
from h264_scroll_encoder_tpu.syntax.slice_headers import (
    p_slice_header_symbols, write_p_slice_header)
from h264_scroll_encoder_tpu.utils import fixtures


def _make_donor(rng, w, h):
    """Donor grid without I_PCM (unsupported on the device path) and
    without skips in the last position (keeps the tail-skip count equal
    between paths)."""
    grid = fixtures.random_p_slice_grid(rng, w, h, 1)
    for row in grid:
        for c, mb in enumerate(row):
            if mb is not mbt.SKIP and mb.kind == "ipcm":
                row[c] = fixtures.random_inter_mb(rng, 1)
    return grid


def _bg_fields_from_host_grid(cfg, grid):
    """Decode-true MB-level bg fields (the dense kernel's input contract):
    skip cells carry their derived MVs, hint cells their desired MVs."""
    import copy
    from h264_scroll_encoder_tpu.models.mv_field import (
        decode_p_slice_mv_field)
    field = decode_p_slice_mv_field([list(r) for r in copy.deepcopy(grid)],
                                    cfg.mb_width, cfg.mb_height)
    H, W = cfg.mb_height, cfg.mb_width
    bg_ref = np.zeros((H, W), np.int32)
    bg_mvx = np.zeros((H, W), np.int32)
    bg_mvy = np.zeros((H, W), np.int32)
    bg_coded = np.zeros((H, W), bool)
    for r in range(H):
        for c in range(W):
            bg_ref[r, c] = max(field.ref[r * 4, c * 4], 0)
            bg_mvx[r, c] = field.mvx[r * 4, c * 4]
            bg_mvy[r, c] = field.mvy[r * 4, c * 4]
            mb = grid[r][c]
            bg_coded[r, c] = mb is not mbt.SKIP
    return bg_ref, bg_mvx, bg_mvy, bg_coded


def _run_dense_case(cfg, donor, r0, c0, num_refs, frame_num, regions):
    """Host path vs dense device path on one configuration."""
    R, C = len(donor), len(donor[0])
    hints = FrameHints(motion_regions=regions,
                       dynamic_mb_x=c0, dynamic_mb_y=r0)
    grid = splice.splice_p_frame(cfg, hints, donor, num_refs)

    def hdr_writer(bw: BitWriter):
        write_p_slice_header(bw, cfg, frame_num)

    import copy
    host_rbsp = splice.finalize_spliced_frame(
        cfg, [list(r) for r in copy.deepcopy(grid)], num_refs, hdr_writer)

    bg_ref, bg_mvx, bg_mvy, bg_coded = _bg_fields_from_host_grid(cfg, grid)
    # Donor cells in bg grids are ignored by the kernel (roles overwrite);
    # bg_coded must exclude the rect (the kernel masks it anyway).
    bg_coded[r0:r0 + R, c0:c0 + C] = False

    left, top, right = splice_device.rings_from_bg(
        bg_ref, bg_mvx, bg_mvy, c0, r0, R, C)
    dd = splice_device.prepare_donor_dense(
        donor, num_refs, rect_at_left_edge=(c0 == 0),
        rect_at_top_edge=(r0 == 0),
        rect_at_right_edge=(c0 + C == cfg.mb_width),
        left_ring=left, top_ring=top, right_ring=right)
    dn = splice_device.dense_device_arrays(dd)

    hp, hn = p_slice_header_symbols(
        cfg, jnp.int32(frame_num), jnp.int32(frame_num * 2),
        is_reference=False, long_term_idx=-1, num_waypoints=jnp.int32(0),
        wp_long_term_idx=jnp.zeros(MAX_WAYPOINTS, jnp.int32),
        wp_valid=jnp.zeros(MAX_WAYPOINTS, bool))
    emit = jax.jit(lambda *a: splice_device.emit_spliced_frame_dense(
        cfg, c0, r0, R, C, num_refs, *a, has_align=dd.has_align))
    nal, nal_len, bits, ovf = emit(hp, hn, jnp.asarray(bg_ref),
                                   jnp.asarray(bg_mvx), jnp.asarray(bg_mvy),
                                   jnp.asarray(bg_coded), dn)
    if bool(ovf):
        # Bounded emulation-prevention fast path exceeded (e.g. long zero
        # runs): retry through the exact unbounded path, the same
        # fallback the session uses.
        emit = jax.jit(lambda *a: splice_device.emit_spliced_frame_dense(
            cfg, c0, r0, R, C, num_refs, *a, has_align=dd.has_align,
            ebsp_exact=True))
        nal, nal_len, bits, ovf = emit(
            hp, hn, jnp.asarray(bg_ref), jnp.asarray(bg_mvx),
            jnp.asarray(bg_mvy), jnp.asarray(bg_coded), dn)
    assert not bool(ovf)

    from h264_scroll_encoder_tpu.syntax.nal import write_nal_unit
    host_nal = write_nal_unit(host_rbsp, 0, 1)
    dev_bytes = np.asarray(nal)[: int(nal_len)].tobytes()
    assert dev_bytes == host_nal, (
        f"lens {len(dev_bytes)} vs {len(host_nal)}; first diff "
        f"{next((i for i, (a, b) in enumerate(zip(dev_bytes, host_nal)) if a != b), -1)}")
    return dd


def test_dense_splice_matches_host():
    """Dense-donor path byte parity, incl. the config the slotted path's
    guard rejects: a coded hint region directly beside donor edge MBs
    with non-uniform partitions (exact role-based edge prediction)."""
    rng = np.random.default_rng(123)
    cfg = ComposerConfig(256, 192)
    R = C = 5
    r0, c0 = 4, 6
    donor = _make_donor(rng, C, R)
    # Non-uniform partitions along the right column and bottom row.
    donor[1][C - 1] = mbt.Macroblock(
        kind="inter", mb_type=3, sub_mb_types=(0, 0, 0, 0), ref_idx=(),
        mvds=((4, 0), (0, 4), (-4, 0), (0, -4)), cbp=0)
    donor[R - 1][2] = mbt.Macroblock(
        kind="inter", mb_type=1, ref_idx=(), mvds=((8, 4), (-8, -4)), cbp=0)
    regions = (
        MotionRegion(0, 0, 16, 2, ref_idx=0, mv_x=0, mv_y=20),
        # Directly right of the rect AND directly below: the configs
        # validate_splice_hints refuses for the slotted path.
        MotionRegion(c0 + C, r0, c0 + C + 2, r0 + R, ref_idx=0, mv_y=8),
        MotionRegion(c0 - 1, r0 + R, c0 + C + 1, r0 + R + 1,
                     ref_idx=1, mv_y=-12),
    )
    dd = _run_dense_case(cfg, donor, r0, c0, 2, 3, regions)
    assert not dd.has_align


def test_dense_splice_ipcm_and_edges():
    """Dense path with I_PCM donor MBs (align sentinels) and the rect
    touching the frame's top-left corner (edge availability rules)."""
    rng = np.random.default_rng(77)
    cfg = ComposerConfig(192, 160)
    R = C = 4
    donor = fixtures.random_p_slice_grid(rng, C, R, 1)
    donor[0][1] = fixtures.random_ipcm_mb(rng, in_p_slice=True)
    donor[1][0] = fixtures.random_ipcm_mb(rng, in_p_slice=True)
    donor[2][2] = fixtures.random_ipcm_mb(rng, in_p_slice=True)
    for row in donor:
        for i, mb in enumerate(row):
            if mb is not mbt.SKIP and mb.kind == "ipcm" \
                    and mb.mb_type != 30:
                row[i] = fixtures.random_inter_mb(rng, 1)
    dd = _run_dense_case(cfg, donor, 0, 0, 2, 5, ())
    assert dd.has_align

    # Same donor at an interior position with a hint region above it.
    regions = (MotionRegion(2, 1, 10, 2, ref_idx=1, mv_y=16),)
    _run_dense_case(cfg, donor, 2, 4, 2, 6, regions)


def test_dense_splice_fuzz_geometries():
    """Random donors x rect positions x hint layouts, byte parity."""
    rng = np.random.default_rng(2024)
    cfg = ComposerConfig(192, 128)
    for case in range(6):
        R = int(rng.integers(2, 5))
        C = int(rng.integers(2, 6))
        r0 = int(rng.integers(0, cfg.mb_height - R + 1))
        c0 = int(rng.integers(0, cfg.mb_width - C + 1))
        donor = fixtures.random_p_slice_grid(rng, C, R, 1)
        regions = []
        if case % 2:
            # A full-width band above or below, possibly touching.
            y0 = 0 if r0 > 2 else min(cfg.mb_height - 1, r0 + R)
            regions.append(MotionRegion(0, y0, cfg.mb_width, y0 + 1,
                                        ref_idx=0, mv_y=4 * case))
        _run_dense_case(cfg, donor, r0, c0, 2, 3 + case, tuple(regions))


def test_device_splice_nc_repair_matters():
    """A donor whose left-column blocks carry coefficients must get
    *different* coeff_token bits at the composite boundary than in its
    own stream — i.e. the repair is actually exercised."""
    rng = np.random.default_rng(7)
    cfg = ComposerConfig(128, 96)
    donor = _make_donor(rng, 4, 4)
    ds = splice_device.prepare_donor_symbols(donor, 1)
    # At least one coded donor MB in column 0 with residual in a
    # left-edge block makes nA transition unavailable->0-valued.
    has_left_residual = any(
        donor[r][0] is not mbt.SKIP and any(
            donor[r][0].luma[k].total_coeff for k in (0, 4, 8, 12))
        for r in range(4))
    assert has_left_residual, "fixture too sparse; bump seed"
    assert ds.coded.any()


def test_rows_layout_matches_dense():
    """The row-contiguous donor layout (pack_donor_rows +
    emit_spliced_frame_rows) is byte-identical to the per-MB dense path
    across donor classes — representative, worst-case dense, and
    I_PCM-bearing (alignment sentinels fused mid-row)."""
    import jax.numpy as jnp
    import numpy as np
    from h264_scroll_encoder_tpu.config import MAX_WAYPOINTS, ComposerConfig
    from h264_scroll_encoder_tpu.models import mb_transcode as mbt
    from h264_scroll_encoder_tpu.models import splice_device as sd
    from h264_scroll_encoder_tpu.ops.bitio import BitWriter
    from h264_scroll_encoder_tpu.syntax.slice_headers import (
        p_slice_header_symbols)
    from h264_scroll_encoder_tpu.utils import fixtures

    cfg = ComposerConfig(320, 240)
    rng = np.random.default_rng(5)
    H, W = cfg.mb_height, cfg.mb_width
    zero = jnp.zeros((H, W), jnp.int32)
    bg_coded = jnp.zeros((H, W), bool)
    hp, hn = p_slice_header_symbols(
        cfg, jnp.int32(3), jnp.int32(6), is_reference=False,
        long_term_idx=-1, num_waypoints=jnp.int32(0),
        wp_long_term_idx=jnp.zeros(MAX_WAYPOINTS, jnp.int32),
        wp_valid=jnp.zeros(MAX_WAYPOINTS, bool))

    grids = [fixtures.representative_donor_grid(rng, 6, 5),
             fixtures.dense_donor_grid(rng, 6, 5),
             fixtures.random_p_slice_grid(rng, 6, 5, 1)]  # has I_PCM
    for grid in grids:
        bw = BitWriter()
        mbt.emit_p_slice_mbs(bw, grid, 1)
        bw.write_trailing_bits()
        R, C = len(grid), len(grid[0])
        dd = sd.prepare_donor_dense_from_slice(bw.getvalue(), 0, C, R, 1, 2)
        dr = sd.pack_donor_rows(dd, R, C)
        budget = sd.splice_rbsp_budget(
            cfg, R * C, max(dd.donor_bits, dr.donor_bits))
        a = sd.emit_spliced_frame_dense(
            cfg, 4, 3, R, C, 2, hp, hn, zero, zero, zero, bg_coded,
            sd.dense_device_arrays(dd), has_align=dd.has_align,
            n_rbsp=budget)
        b = sd.emit_spliced_frame_rows(
            cfg, 4, 3, R, C, 2, hp, hn, zero, zero, zero, bg_coded,
            sd.rows_device_arrays(dr),
            has_align=dr.has_align, n_rbsp=budget)
        la, lb = int(a[1]), int(b[1])
        assert not bool(np.asarray(a[3])) and not bool(np.asarray(b[3]))
        assert la == lb
        assert (np.asarray(a[0])[:la] == np.asarray(b[0])[:lb]).all()


def test_rows_compact_bg_matches_generic():
    """compact_x background layout (2 symbol slots per MB, 3 only in the
    static donor-adjacent ring) is byte-identical to the generic layout
    across rect geometries including frame edges, with a coded hint band
    overlapping the wide ring (donor-influenced mvd_x exercised)."""
    import jax.numpy as jnp
    import numpy as np
    from h264_scroll_encoder_tpu.config import MAX_WAYPOINTS, ComposerConfig
    from h264_scroll_encoder_tpu.models import mb_transcode as mbt
    from h264_scroll_encoder_tpu.models import splice_device as sd
    from h264_scroll_encoder_tpu.ops.bitio import BitWriter
    from h264_scroll_encoder_tpu.syntax.slice_headers import (
        p_slice_header_symbols)
    from h264_scroll_encoder_tpu.utils import fixtures

    cfg = ComposerConfig(320, 240)
    H, W = cfg.mb_height, cfg.mb_width
    rng = np.random.default_rng(6)
    hp, hn = p_slice_header_symbols(
        cfg, jnp.int32(3), jnp.int32(6), is_reference=False,
        long_term_idx=-1, num_waypoints=jnp.int32(0),
        wp_long_term_idx=jnp.zeros(MAX_WAYPOINTS, jnp.int32),
        wp_valid=jnp.zeros(MAX_WAYPOINTS, bool))
    zero = jnp.zeros((H, W), jnp.int32)
    bg_mvy = zero.at[1:8, :].set(32)
    bg_coded = jnp.zeros((H, W), bool).at[1:8, :].set(True)

    geoms = [(4, 3, 5, 4), (0, 0, 5, 4), (W - 5, 3, 5, 4),
             (4, H - 4, 5, 4), (0, 5, W, 3), (6, 6, 4, 1),
             (W - 4, H - 2, 4, 2)]
    for (c0, r0, C, R) in geoms:
        grid = fixtures.dense_donor_grid(rng, C, R)
        bw = BitWriter()
        mbt.emit_p_slice_mbs(bw, grid, 1)
        bw.write_trailing_bits()
        dd = sd.prepare_donor_dense_from_slice(bw.getvalue(), 0, C, R, 1, 2)
        dr = sd.pack_donor_rows(dd, R, C)
        dn = sd.rows_device_arrays(dr)
        budget = sd.splice_rbsp_budget(cfg, R * C, dr.donor_bits)
        outs = [sd.emit_spliced_frame_rows(
            cfg, c0, r0, R, C, 2, hp, hn, zero, zero, bg_mvy, bg_coded,
            dn, has_align=dr.has_align,
            n_rbsp=budget, compact_x=cx) for cx in (False, True)]
        (na, la, _, ova), (nb, lb, _, ovb) = outs
        assert not bool(np.asarray(ova)) and not bool(np.asarray(ovb))
        assert int(la) == int(lb), (c0, r0, C, R)
        assert (np.asarray(na)[:int(la)]
                == np.asarray(nb)[:int(lb)]).all(), (c0, r0, C, R)


def test_one_program_serves_many_donors():
    """Serving requirement (fresh donors per frame must not recompile):
    50+ random donors — sparse, dense, representative, I_PCM-bearing,
    leading/trailing-skip layouts — flow through ONE compiled rows
    program (first_c/coded/row chunks all traced), verified by the jit
    cache size staying at 1, and every composed frame is byte-equal to
    the exact host path."""
    from h264_scroll_encoder_tpu.parallel import batch
    from h264_scroll_encoder_tpu.syntax.nal import write_nal_unit

    rng = np.random.default_rng(2024)
    cfg = ComposerConfig(320, 240)           # 20x15 MBs
    H, W = cfg.mb_height, cfg.mb_width
    R, C = 5, 6
    r0, c0 = 3, 7
    num_refs = 2
    frame_num = 3

    donors = []
    for k in range(52):
        fam = k % 4
        if fam == 0:
            g = fixtures.random_p_slice_grid(rng, C, R, 1)
        elif fam == 1:
            g = fixtures.dense_donor_grid(rng, C, R)
        elif fam == 2:
            g = fixtures.representative_donor_grid(rng, C, R)
        else:
            g = fixtures.random_p_slice_grid(rng, C, R, 1)
            g[0][0] = fixtures.random_ipcm_mb(rng, in_p_slice=True)
            g[R - 1][C - 1] = mbt.SKIP      # trailing skip
            g[2] = [mbt.SKIP] * C           # an all-skip row (first_c=-1)
        donors.append(g)

    # One shared program: fixed geometry, pinned row chunk class, fixed
    # budget, phase scan always on (covers I_PCM and non-I_PCM donors).
    CLASS = 256
    budget = splice_device.splice_rbsp_budget(cfg, R * C, R * CLASS * 32)
    step = batch.make_batched_splice_step_rows(
        cfg, c0, r0, C, R, num_refs, has_align=True, n_rbsp=budget,
        compact_x=True)

    zero = jnp.zeros((H, W), jnp.int32)
    bg_coded = jnp.zeros((H, W), bool)
    hp, hn = p_slice_header_symbols(
        cfg, jnp.int32(frame_num), jnp.int32(frame_num * 2),
        is_reference=False, long_term_idx=-1, num_waypoints=jnp.int32(0),
        wp_long_term_idx=jnp.zeros(MAX_WAYPOINTS, jnp.int32),
        wp_valid=jnp.zeros(MAX_WAYPOINTS, bool))
    one = lambda x: x[None]

    for donor in donors:
        bw = BitWriter()
        mbt.emit_p_slice_mbs(bw, donor, 1)
        bw.write_trailing_bits()
        dd = splice_device.prepare_donor_dense_from_slice(
            bw.getvalue(), 0, C, R, 1, num_refs,
            rect_at_left_edge=False, rect_at_top_edge=False)
        dr = splice_device.pack_donor_rows(dd, R, C, min_class=CLASS)
        assert dr.row_patterns.shape[1] == CLASS
        dn = {k: one(v) for k, v in
              splice_device.rows_device_arrays(dr).items()}
        nal, nal_len, _, ovf = step(one(hp), one(hn), one(zero), one(zero),
                                    one(zero), one(bg_coded), dn)
        assert not bool(np.asarray(ovf).any())
        dev_bytes = np.asarray(nal[0])[: int(nal_len[0])].tobytes()

        hints = FrameHints(motion_regions=(), dynamic_mb_x=c0,
                           dynamic_mb_y=r0)
        grid = splice.splice_p_frame(cfg, hints, donor, num_refs)

        def hdr_writer(bw2):
            write_p_slice_header(bw2, cfg, frame_num)

        host_rbsp = splice.finalize_spliced_frame(cfg, grid, num_refs,
                                                  hdr_writer)
        host_nal = write_nal_unit(host_rbsp, 0, 1)
        assert dev_bytes == host_nal

    assert step._cache_size() == 1, (
        f"rows program recompiled: cache size {step._cache_size()}")


def test_fresh_donor_batch_serving():
    """Fresh-donor serving soak: every step of every session consumes a
    NEW donor payload through the fused threaded batch ingest
    (prepare_donor_rows_serving) and ONE compiled batched rows program —
    B sessions carry DIFFERENT donors in one vmapped call.  Each
    composed frame is byte-equal to the exact host path and the program
    never recompiles."""
    from h264_scroll_encoder_tpu.parallel import batch
    from h264_scroll_encoder_tpu.syntax.nal import write_nal_unit

    rng = np.random.default_rng(99)
    cfg = ComposerConfig(320, 240)
    H, W = cfg.mb_height, cfg.mb_width
    R, C = 4, 5
    r0, c0 = 5, 8
    B, T = 4, 6
    num_refs = 2
    frame_num = 3
    CLASS = 256

    def fresh_payload(k):
        fam = k % 3
        if fam == 0:
            g = fixtures.random_p_slice_grid(rng, C, R, 1)
        elif fam == 1:
            g = fixtures.dense_donor_grid(rng, C, R)
        else:
            g = fixtures.representative_donor_grid(rng, C, R)
        bw = BitWriter()
        mbt.emit_p_slice_mbs(bw, g, 1)
        bw.write_trailing_bits()
        return bw.getvalue(), g

    budget = splice_device.splice_rbsp_budget(cfg, R * C, R * CLASS * 32)
    step = batch.make_batched_splice_step_rows(
        cfg, c0, r0, C, R, num_refs, has_align=True, n_rbsp=budget,
        compact_x=True)

    zero = jnp.zeros((H, W), jnp.int32)
    bg_coded = jnp.zeros((H, W), bool)
    hp, hn = p_slice_header_symbols(
        cfg, jnp.int32(frame_num), jnp.int32(frame_num * 2),
        is_reference=False, long_term_idx=-1, num_waypoints=jnp.int32(0),
        wp_long_term_idx=jnp.zeros(MAX_WAYPOINTS, jnp.int32),
        wp_valid=jnp.zeros(MAX_WAYPOINTS, bool))
    bcast = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
    hints = FrameHints(motion_regions=(), dynamic_mb_x=c0, dynamic_mb_y=r0)

    k = 0
    for _t in range(T):
        payloads, grids = [], []
        for _b in range(B):
            p, g = fresh_payload(k)
            payloads.append(p)
            grids.append(g)
            k += 1
        dn, (donor_bits, has_align) = \
            splice_device.prepare_donor_rows_serving(
                payloads, [0] * B, R, C, 1, num_refs, s_row=CLASS,
                n_threads=3)
        nal, nal_len, _, ovf = step(bcast(hp), bcast(hn), bcast(zero),
                                    bcast(zero), bcast(zero),
                                    bcast(bg_coded), dn)
        assert not bool(np.asarray(ovf).any())
        for b in range(B):
            dev_bytes = np.asarray(nal[b])[: int(nal_len[b])].tobytes()
            grid = splice.splice_p_frame(cfg, hints, grids[b], num_refs)

            def hdr_writer(bw2):
                write_p_slice_header(bw2, cfg, frame_num)

            host_nal = write_nal_unit(
                splice.finalize_spliced_frame(cfg, grid, num_refs,
                                              hdr_writer), 0, 1)
            assert dev_bytes == host_nal, (_t, b)

    assert step._cache_size() == 1


def test_device_successive_donor_retarget_matches_host():
    """Successive-donor device path: the native in-place MV retarget
    (cavlc_retarget_recs) + rows kernel reproduce the host path
    (splice_p_frame with donor_mv_targets + finalize + short-term-lead
    header) byte-for-byte, across donor families with skips, partitions
    and sub-8x8 motion, at interior and frame-edge rect positions."""
    from h264_scroll_encoder_tpu import native_bridge
    from h264_scroll_encoder_tpu.models.splice import (
        donor_mv_targets_from_grid)
    from h264_scroll_encoder_tpu.syntax.nal import write_nal_unit

    if not native_bridge.native_available():
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(31)
    cfg = ComposerConfig(320, 240)
    H, W = cfg.mb_height, cfg.mb_width
    num_refs = 3                     # [prev frame | atlas A | atlas B]
    frame_num = 4
    abs_diff = 1

    cases = [(8, 5, 6, 5, "rep"), (0, 0, 5, 4, "dense"),
             (W - 5, H - 4, 5, 4, "sparse"), (4, 9, 7, 3, "rep")]
    for c0, r0, C, R, fam in cases:
        if fam == "rep":
            donor = fixtures.representative_donor_grid(rng, C, R)
        elif fam == "dense":
            donor = fixtures.dense_donor_grid(rng, C, R)
        else:
            donor = fixtures.random_p_slice_grid(rng, C, R, 1)
        for row in donor:
            for i, mb in enumerate(row):
                if mb is not mbt.SKIP and mb.kind == "ipcm":
                    row[i] = fixtures.random_inter_mb(rng, 1)

        bw = BitWriter()
        mbt.emit_p_slice_mbs(bw, donor, 1)
        bw.write_trailing_bits()
        payload = bw.getvalue()

        # ---- host path (full-frame exact resolution) ----
        targets = donor_mv_targets_from_grid(donor)
        hints = FrameHints(motion_regions=(), dynamic_mb_x=c0,
                           dynamic_mb_y=r0)
        grid = splice.splice_p_frame(cfg, hints, donor, num_refs, (0,),
                                     donor_mv_targets=targets)

        def hdr_writer(bw2):
            write_p_slice_header(bw2, cfg, frame_num, is_reference=True,
                                 prev_ref_abs_diff=abs_diff)

        host_nal = write_nal_unit(
            splice.finalize_spliced_frame(cfg, grid, num_refs,
                                          hdr_writer), 2, 1)

        # ---- device rows path with native retarget ----
        dd = splice_device.prepare_donor_dense_from_slice(
            payload, 0, C, R, 1, num_refs, (0,),
            rect_at_left_edge=(c0 == 0), rect_at_top_edge=(r0 == 0),
            rect_at_right_edge=(c0 + C == W), retarget_mvs=True)
        dr = splice_device.pack_donor_rows(dd, R, C)
        hp, hn = p_slice_header_symbols(
            cfg, jnp.int32(frame_num), jnp.int32(frame_num * 2),
            is_reference=True, long_term_idx=-1,
            num_waypoints=jnp.int32(0),
            wp_long_term_idx=jnp.zeros(MAX_WAYPOINTS, jnp.int32),
            wp_valid=jnp.zeros(MAX_WAYPOINTS, bool),
            prev_ref_abs_diff=abs_diff)
        zero = jnp.zeros((H, W), jnp.int32)
        budget = splice_device.splice_rbsp_budget(cfg, R * C,
                                                  dr.donor_bits)
        nal, nal_len, _, ovf = splice_device.emit_spliced_frame_rows(
            cfg, c0, r0, R, C, num_refs, hp, hn, zero, zero, zero,
            jnp.zeros((H, W), bool), splice_device.rows_device_arrays(dr),
            nal_ref_idc=2, has_align=dr.has_align, n_rbsp=budget)
        assert not bool(np.asarray(ovf))
        dev_bytes = np.asarray(nal)[: int(nal_len)].tobytes()
        assert dev_bytes == host_nal, (c0, r0, C, R, fam)


def test_successive_retarget_with_adjacent_moving_band():
    """Successive-donor retarget with NON-default rings: a coded hint
    band (moving, nonzero MV) directly borders the rect on all sides, so
    the composite-context retarget and the rect-local ring decode must
    reproduce the host full-frame resolution bit-for-bit."""
    from h264_scroll_encoder_tpu import native_bridge
    from h264_scroll_encoder_tpu.models.splice import (
        donor_mv_targets_from_grid)
    from h264_scroll_encoder_tpu.syntax.nal import write_nal_unit

    if not native_bridge.native_available():
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(57)
    cfg = ComposerConfig(320, 240)
    H, W = cfg.mb_height, cfg.mb_width
    num_refs = 3
    frame_num = 6
    R, C = 4, 5
    r0, c0 = 6, 7

    for fam in ("rep", "dense"):
        donor = (fixtures.representative_donor_grid(rng, C, R) if fam ==
                 "rep" else fixtures.dense_donor_grid(rng, C, R))
        for row in donor:
            for i, mb in enumerate(row):
                if mb is not mbt.SKIP and mb.kind == "ipcm":
                    row[i] = fixtures.random_inter_mb(rng, 1)

        # A moving coded band wrapping the rect (1-MB ring + beyond).
        regions = (MotionRegion(c0 - 2, r0 - 2, c0 + C + 2, r0 + R + 2,
                                ref_idx=1, mv_x=0, mv_y=12),)
        targets = donor_mv_targets_from_grid(donor)
        hints = FrameHints(motion_regions=regions, dynamic_mb_x=c0,
                           dynamic_mb_y=r0)
        grid = splice.splice_p_frame(cfg, hints, donor, num_refs, (0,),
                                     donor_mv_targets=targets)

        def hdr_writer(bw2):
            write_p_slice_header(bw2, cfg, frame_num, is_reference=True,
                                 prev_ref_abs_diff=1)

        import copy
        host_nal = write_nal_unit(
            splice.finalize_spliced_frame(
                cfg, [list(r) for r in copy.deepcopy(grid)], num_refs,
                hdr_writer), 2, 1)

        bg_ref, bg_mvx, bg_mvy, bg_coded = _bg_fields_from_host_grid(
            cfg, grid)
        bg_coded[r0:r0 + R, c0:c0 + C] = False
        left, top, right = splice_device.rings_from_bg(
            bg_ref, bg_mvx, bg_mvy, c0, r0, R, C)

        bw = BitWriter()
        mbt.emit_p_slice_mbs(bw, donor, 1)
        bw.write_trailing_bits()
        dd = splice_device.prepare_donor_dense_from_slice(
            bw.getvalue(), 0, C, R, 1, num_refs, (0,),
            left_ring=left, top_ring=top, right_ring=right,
            retarget_mvs=True)
        dr = splice_device.pack_donor_rows(dd, R, C)
        hp, hn = p_slice_header_symbols(
            cfg, jnp.int32(frame_num), jnp.int32(frame_num * 2),
            is_reference=True, long_term_idx=-1,
            num_waypoints=jnp.int32(0),
            wp_long_term_idx=jnp.zeros(MAX_WAYPOINTS, jnp.int32),
            wp_valid=jnp.zeros(MAX_WAYPOINTS, bool),
            prev_ref_abs_diff=1)
        budget = splice_device.splice_rbsp_budget(cfg, R * C,
                                                  dr.donor_bits)
        nal, nal_len, _, ovf = splice_device.emit_spliced_frame_rows(
            cfg, c0, r0, R, C, num_refs, hp, hn, jnp.asarray(bg_ref),
            jnp.asarray(bg_mvx), jnp.asarray(bg_mvy),
            jnp.asarray(bg_coded), splice_device.rows_device_arrays(dr),
            nal_ref_idc=2, has_align=dr.has_align, n_rbsp=budget)
        assert not bool(np.asarray(ovf))
        dev_bytes = np.asarray(nal)[: int(nal_len)].tobytes()
        assert dev_bytes == host_nal, fam


def test_splice_1080p_wide_layout_matches_host():
    """Dynamic-rect splice on a frame beyond 4095 MBs (1920x1088): the
    wide background layout through the rows kernel, byte-equal to the
    host path."""
    from h264_scroll_encoder_tpu.syntax.nal import write_nal_unit

    rng = np.random.default_rng(101)
    cfg = ComposerConfig(1920, 1088)
    H, W = cfg.mb_height, cfg.mb_width
    assert cfg.total_mbs > 4095
    R, C = 4, 5
    r0, c0 = 30, 60
    num_refs = 2
    frame_num = 3

    donor = fixtures.representative_donor_grid(rng, C, R)
    for row in donor:
        for i, mb in enumerate(row):
            if mb is not mbt.SKIP and mb.kind == "ipcm":
                row[i] = fixtures.random_inter_mb(rng, 1)

    hints = FrameHints(motion_regions=(
        MotionRegion(0, 0, W, 10, ref_idx=1, mv_x=0, mv_y=24),),
        dynamic_mb_x=c0, dynamic_mb_y=r0)
    grid = splice.splice_p_frame(cfg, hints, donor, num_refs)

    def hdr_writer(bw2):
        write_p_slice_header(bw2, cfg, frame_num)

    host_nal = write_nal_unit(
        splice.finalize_spliced_frame(cfg, grid, num_refs, hdr_writer),
        0, 1)

    bw = BitWriter()
    mbt.emit_p_slice_mbs(bw, donor, 1)
    bw.write_trailing_bits()
    dd = splice_device.prepare_donor_dense_from_slice(
        bw.getvalue(), 0, C, R, 1, num_refs)
    dr = splice_device.pack_donor_rows(dd, R, C)
    hp, hn = p_slice_header_symbols(
        cfg, jnp.int32(frame_num), jnp.int32(frame_num * 2),
        is_reference=False, long_term_idx=-1, num_waypoints=jnp.int32(0),
        wp_long_term_idx=jnp.zeros(MAX_WAYPOINTS, jnp.int32),
        wp_valid=jnp.zeros(MAX_WAYPOINTS, bool))
    bg_ref = jnp.zeros((H, W), jnp.int32).at[:10].set(1)
    bg_mvy = jnp.zeros((H, W), jnp.int32).at[:10].set(24 * 4)
    bg_coded = jnp.zeros((H, W), bool).at[:10].set(True)
    zero = jnp.zeros((H, W), jnp.int32)
    budget = splice_device.splice_rbsp_budget(cfg, R * C, dr.donor_bits)
    nal, nal_len, _, ovf = splice_device.emit_spliced_frame_rows(
        cfg, c0, r0, R, C, num_refs, hp, hn, bg_ref, zero, bg_mvy,
        bg_coded, splice_device.rows_device_arrays(dr),
        has_align=dr.has_align, n_rbsp=budget)
    assert not bool(np.asarray(ovf))
    dev_bytes = np.asarray(nal)[: int(nal_len)].tobytes()
    assert dev_bytes == host_nal


def test_degenerate_rect_geometries():
    """1-row, 1-column and 1x1 donor rects through the rows kernel
    (empty right rings, first/last row coincide) — byte parity vs the
    host path at interior and frame-edge placements."""
    from h264_scroll_encoder_tpu.syntax.nal import write_nal_unit

    rng = np.random.default_rng(7)
    cfg = ComposerConfig(320, 240)
    H, W = cfg.mb_height, cfg.mb_width
    num_refs = 2
    frame_num = 3
    hp, hn = p_slice_header_symbols(
        cfg, jnp.int32(frame_num), jnp.int32(frame_num * 2),
        is_reference=False, long_term_idx=-1, num_waypoints=jnp.int32(0),
        wp_long_term_idx=jnp.zeros(MAX_WAYPOINTS, jnp.int32),
        wp_valid=jnp.zeros(MAX_WAYPOINTS, bool))
    zero = jnp.zeros((H, W), jnp.int32)
    bg_coded = jnp.zeros((H, W), bool)

    cases = [(1, 6, 4, 5), (1, 6, 0, 0), (5, 1, 7, 3), (5, 1, W - 1, 9),
             (1, 1, 10, 10), (1, 1, W - 1, H - 1), (2, 1, 0, 5)]
    for (R, C, c0, r0) in cases:
        donor = fixtures.representative_donor_grid(rng, C, R)
        for row in donor:
            for i, mb in enumerate(row):
                if mb is not mbt.SKIP and mb.kind == "ipcm":
                    row[i] = fixtures.random_inter_mb(rng, 1)
        hints = FrameHints(motion_regions=(), dynamic_mb_x=c0,
                           dynamic_mb_y=r0)
        grid = splice.splice_p_frame(cfg, hints, donor, num_refs)

        def hdr_writer(bw2):
            write_p_slice_header(bw2, cfg, frame_num)

        host_nal = write_nal_unit(
            splice.finalize_spliced_frame(cfg, grid, num_refs,
                                          hdr_writer), 0, 1)

        bw = BitWriter()
        mbt.emit_p_slice_mbs(bw, donor, 1)
        bw.write_trailing_bits()
        dd = splice_device.prepare_donor_dense_from_slice(
            bw.getvalue(), 0, C, R, 1, num_refs,
            rect_at_left_edge=(c0 == 0), rect_at_top_edge=(r0 == 0),
            rect_at_right_edge=(c0 + C == W))
        dr = splice_device.pack_donor_rows(dd, R, C)
        budget = splice_device.splice_rbsp_budget(cfg, R * C,
                                                  dr.donor_bits)
        nal, nal_len, _, ovf = splice_device.emit_spliced_frame_rows(
            cfg, c0, r0, R, C, num_refs, hp, hn, zero, zero, zero,
            bg_coded, splice_device.rows_device_arrays(dr),
            has_align=dr.has_align, n_rbsp=budget)
        assert not bool(np.asarray(ovf)), (R, C, c0, r0)
        dev_bytes = np.asarray(nal)[: int(nal_len)].tobytes()
        assert dev_bytes == host_nal, (R, C, c0, r0)

        # Same donors through the fused batch ingest.
        dn, _meta = splice_device.prepare_donor_rows_serving(
            [bw.getvalue()], [0], R, C, 1, num_refs,
            s_row=dr.row_patterns.shape[1],
            rect_at_left_edge=(c0 == 0), rect_at_top_edge=(r0 == 0),
            rect_at_right_edge=(c0 + C == W))
        dn1 = {k: v[0] for k, v in dn.items()}
        nal3, nal_len3, _, ovf3 = splice_device.emit_spliced_frame_rows(
            cfg, c0, r0, R, C, num_refs, hp, hn, zero, zero, zero,
            bg_coded, dn1, has_align=True, n_rbsp=budget)
        assert not bool(np.asarray(ovf3)), (R, C, c0, r0)
        assert np.asarray(nal3)[: int(nal_len3)].tobytes() == host_nal, (
            R, C, c0, r0)


def test_moved_ref_map_with_skips_guarded():
    """donor_ref_map[0] != 0 without retargeting must raise loudly on
    the device prep paths (donor P_Skips hardwire composite ref 0 —
    silent composition would reference the wrong picture)."""
    import pytest

    rng = np.random.default_rng(3)
    R, C = 3, 4
    grid = fixtures.random_p_slice_grid(rng, C, R, 1)
    grid[1][1] = mbt.SKIP
    bw = BitWriter()
    mbt.emit_p_slice_mbs(bw, grid, 1)
    bw.write_trailing_bits()
    with pytest.raises(NotImplementedError):
        splice_device.prepare_donor_dense_from_slice(
            bw.getvalue(), 0, C, R, 1, 3, donor_ref_map=(1,))
    with pytest.raises(NotImplementedError):
        splice_device.prepare_donor_rows_serving(
            [bw.getvalue()], [0], R, C, 1, 3, donor_ref_map=(1,),
            s_row=64)


def test_flat_wire_roundtrip_exact():
    """rows_flat_wire -> _rows_from_flat reconstructs the padded
    [R, s_row] layout bit-exactly, including ALIGN sentinels, partial
    tail chunks, interior full chunks, and all-skip (empty) rows."""
    rng = np.random.default_rng(31)
    N, R, s_row = 7, 6, 48
    pat = np.zeros((N, R, s_row), np.uint32)
    nb = np.zeros((N, R, s_row), np.int32)
    for i in range(N):
        for r in range(R):
            L = int(rng.integers(0, s_row + 1))
            if L == 0:
                continue
            pat[i, r, :L] = rng.integers(0, 1 << 32, L, dtype=np.uint64)
            nb[i, r, :L] = 32
            nb[i, r, L - 1] = int(rng.integers(1, 33))
            # Sprinkle ALIGN sentinels and pre-align partials.
            for _ in range(int(rng.integers(0, 3))):
                k = int(rng.integers(0, L))
                nb[i, r, k] = int(rng.choice([-1, 7, 15]))
    wire, s_flat, s_exc = splice_device.rows_flat_wire(pat, nb)
    rec = jax.jit(jax.vmap(
        lambda dn: splice_device._rows_from_flat(dn, R, s_row)))(
        {k: jnp.asarray(v) for k, v in wire.items()})
    got_pat, got_nb = (np.asarray(x) for x in rec)
    # Positions past each row's length may hold (0, 0) in both.
    np.testing.assert_array_equal(got_nb, nb)
    np.testing.assert_array_equal(got_pat & (nb != 0), pat & (nb != 0))


def test_flat_wire_matches_padded_one_program():
    """The flat serving wire composes byte-identically to the padded
    wire across mixed donor families through ONE compiled program, and
    ships strictly fewer bytes."""
    from h264_scroll_encoder_tpu.parallel import batch
    from h264_scroll_encoder_tpu.syntax.nal import write_nal_unit

    rng = np.random.default_rng(4048)
    cfg = ComposerConfig(320, 240)
    H, W = cfg.mb_height, cfg.mb_width
    R, C = 5, 6
    r0, c0 = 3, 7
    num_refs = 2
    frame_num = 3

    donors = []
    for k in range(12):
        fam = k % 4
        if fam == 0:
            g = fixtures.random_p_slice_grid(rng, C, R, 1)
        elif fam == 1:
            g = fixtures.dense_donor_grid(rng, C, R)
        elif fam == 2:
            g = fixtures.representative_donor_grid(rng, C, R)
        else:
            g = fixtures.random_p_slice_grid(rng, C, R, 1)
            g[0][0] = fixtures.random_ipcm_mb(rng, in_p_slice=True)
            g[R - 1][C - 1] = mbt.SKIP
            g[2] = [mbt.SKIP] * C
        donors.append(g)

    CLASS = 256
    S_FLAT = splice_device.flat_chunk_class(R * CLASS)
    S_EXC = 32
    budget = splice_device.splice_rbsp_budget(cfg, R * C, R * CLASS * 32)
    step = batch.make_batched_splice_step_rows(
        cfg, c0, r0, C, R, num_refs, has_align=True, n_rbsp=budget,
        compact_x=True, s_row=CLASS)

    zero = jnp.zeros((H, W), jnp.int32)
    bg_coded = jnp.zeros((H, W), bool)
    hp, hn = p_slice_header_symbols(
        cfg, jnp.int32(frame_num), jnp.int32(frame_num * 2),
        is_reference=False, long_term_idx=-1, num_waypoints=jnp.int32(0),
        wp_long_term_idx=jnp.zeros(MAX_WAYPOINTS, jnp.int32),
        wp_valid=jnp.zeros(MAX_WAYPOINTS, bool))
    one = lambda x: x[None]

    for donor in donors:
        bw = BitWriter()
        mbt.emit_p_slice_mbs(bw, donor, 1)
        bw.write_trailing_bits()
        dd = splice_device.prepare_donor_dense_from_slice(
            bw.getvalue(), 0, C, R, 1, num_refs,
            rect_at_left_edge=False, rect_at_top_edge=False)
        dr = splice_device.pack_donor_rows(dd, R, C, min_class=CLASS)
        base = splice_device.rows_device_arrays(dr)
        fw, _, _ = splice_device.rows_flat_wire(
            np.asarray(dr.row_patterns)[None],
            np.asarray(dr.row_nbits)[None], s_flat=S_FLAT, s_exc=S_EXC)
        dn = {k: one(v) for k, v in base.items()
              if k not in ("row_patterns", "row_nbits")}
        dn.update({k: jnp.asarray(v) for k, v in fw.items()})

        padded_bytes = (dr.row_patterns.nbytes + dr.row_nbits.nbytes)
        flat_bytes = sum(np.asarray(v).nbytes for v in fw.values())
        assert flat_bytes < padded_bytes

        nal, nal_len, _, ovf = step(one(hp), one(hn), one(zero), one(zero),
                                    one(zero), one(bg_coded), dn)
        assert not bool(np.asarray(ovf).any())
        dev_bytes = np.asarray(nal[0])[: int(nal_len[0])].tobytes()

        hints = FrameHints(motion_regions=(), dynamic_mb_x=c0,
                           dynamic_mb_y=r0)
        grid = splice.splice_p_frame(cfg, hints, donor, num_refs)

        def hdr_writer(bw2):
            write_p_slice_header(bw2, cfg, frame_num)

        host_rbsp = splice.finalize_spliced_frame(cfg, grid, num_refs,
                                                  hdr_writer)
        host_nal = write_nal_unit(host_rbsp, 0, 1)
        assert dev_bytes == host_nal

    assert step._cache_size() == 1, (
        f"flat-wire program recompiled: cache size {step._cache_size()}")


def test_blob_wire_matches_padded_one_program():
    """The single-blob wire (all donor fields in one uint32 record,
    decoded in-program) composes byte-identically to the padded wire
    through ONE compiled program."""
    from h264_scroll_encoder_tpu.parallel import batch
    from h264_scroll_encoder_tpu.syntax.nal import write_nal_unit

    rng = np.random.default_rng(505)
    cfg = ComposerConfig(320, 240)
    H, W = cfg.mb_height, cfg.mb_width
    R, C = 5, 6
    r0, c0 = 3, 7
    num_refs = 2
    frame_num = 3

    donors = []
    for k in range(8):
        if k % 3 == 0:
            g = fixtures.dense_donor_grid(rng, C, R)
        elif k % 3 == 1:
            g = fixtures.representative_donor_grid(rng, C, R)
        else:
            g = fixtures.random_p_slice_grid(rng, C, R, 1)
            g[0][0] = fixtures.random_ipcm_mb(rng, in_p_slice=True)
            g[2] = [mbt.SKIP] * C
        donors.append(g)
    payloads = []
    for donor in donors:
        bw = BitWriter()
        mbt.emit_p_slice_mbs(bw, donor, 1)
        bw.write_trailing_bits()
        payloads.append(bw.getvalue())

    CLASS = 256
    S_FLAT = splice_device.flat_chunk_class(R * CLASS)
    S_EXC = 32
    budget = splice_device.splice_rbsp_budget(cfg, R * C, R * CLASS * 32)
    step = batch.make_batched_splice_step_rows(
        cfg, c0, r0, C, R, num_refs, has_align=True, n_rbsp=budget,
        compact_x=True, s_row=CLASS, s_flat=S_FLAT, s_exc=S_EXC)

    dn, _meta = splice_device.prepare_donor_rows_serving(
        payloads, [0] * len(payloads), R, C, 1, num_refs, s_row=CLASS,
        blob_wire=True, s_flat=S_FLAT, s_exc=S_EXC)
    assert set(dn) == {"blob"}

    B = len(payloads)
    zero = jnp.zeros((B, H, W), jnp.int32)
    bg_coded = jnp.zeros((B, H, W), bool)
    hp, hn = p_slice_header_symbols(
        cfg, jnp.int32(frame_num), jnp.int32(frame_num * 2),
        is_reference=False, long_term_idx=-1, num_waypoints=jnp.int32(0),
        wp_long_term_idx=jnp.zeros(MAX_WAYPOINTS, jnp.int32),
        wp_valid=jnp.zeros(MAX_WAYPOINTS, bool))
    bcast = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
    nal, nal_len, _, ovf = step(bcast(hp), bcast(hn), zero, zero, zero,
                                bg_coded, dn)
    assert not bool(np.asarray(ovf).any())
    assert step._cache_size() == 1

    for i, donor in enumerate(donors):
        dev_bytes = np.asarray(nal[i])[: int(nal_len[i])].tobytes()
        hints = FrameHints(motion_regions=(), dynamic_mb_x=c0,
                           dynamic_mb_y=r0)
        grid = splice.splice_p_frame(cfg, hints, donor, num_refs)

        def hdr_writer(bw2):
            write_p_slice_header(bw2, cfg, frame_num)

        host_rbsp = splice.finalize_spliced_frame(cfg, grid, num_refs,
                                                  hdr_writer)
        assert dev_bytes == write_nal_unit(host_rbsp, 0, 1), f"donor {i}"


def test_native_blob_equals_python_pack():
    """The native blob emission (cavlc_prepare_rows_blob_batch) must be
    byte-identical to the python rows_flat_wire + pack_rows_blob of the
    padded arrays, across donor families incl. I_PCM/align and all-skip
    rows, in both plain and retarget modes."""
    from h264_scroll_encoder_tpu import native_bridge

    if not native_bridge.native_available():
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(906)
    R, C = 5, 6
    pays = []
    for k in range(9):
        if k % 3 == 0:
            g = fixtures.dense_donor_grid(rng, C, R)
        elif k % 3 == 1:
            g = fixtures.representative_donor_grid(rng, C, R)
        else:
            g = fixtures.random_p_slice_grid(rng, C, R, 1)
            g[0][1] = fixtures.random_ipcm_mb(rng, in_p_slice=True)
            g[2] = [mbt.SKIP] * C
        bw = BitWriter()
        mbt.emit_p_slice_mbs(bw, g, 1)
        bw.write_trailing_bits()
        pays.append(bw.getvalue())

    CLASS, S_FLAT, S_EXC = 256, 1280, 32
    for retarget, nrefs in ((False, 2), (True, 3)):
        padded = native_bridge.prepare_rows_batch(
            pays, [0] * len(pays), R, C, 1, nrefs, (0,), CLASS,
            retarget_mvs=retarget)
        fw, _, _ = splice_device.rows_flat_wire(
            padded["row_patterns"], padded["row_nbits"],
            s_flat=S_FLAT, s_exc=S_EXC)
        host = dict(fw)
        host["first_c"] = padded["first_c"].astype(np.int32)
        host["coded"] = padded["coded"]
        roles = {k: padded[k] for k in
                 ("a_ref", "a_mvx", "a_mvy", "b_ref", "b_mvx", "b_mvy",
                  "d_ref", "d_mvx", "d_mvy")}
        for k, v in splice_device._edge_roles_wire(roles, R, C).items():
            host[k] = np.ascontiguousarray(v).astype(np.int16)
        py_blob = splice_device.pack_rows_blob(host, R, C, S_FLAT, S_EXC)

        nat_blob, nat_bits, nat_align = native_bridge.prepare_rows_blob_batch(
            pays, [0] * len(pays), R, C, 1, nrefs, (0,), CLASS, S_FLAT,
            S_EXC, retarget_mvs=retarget)
        np.testing.assert_array_equal(nat_blob, py_blob,
                                      err_msg=f"retarget={retarget}")
        np.testing.assert_array_equal(nat_bits, padded["donor_bits"])
        np.testing.assert_array_equal(nat_align, padded["has_align"])


def test_bg_static_skip_matches_generic():
    """The static-chrome serving program (bg_static_skip=True: no
    background symbols, R-lane skip-run math) is byte-identical to the
    generic rows program on all-skip-background inputs, across donor
    families (dense, representative, I_PCM/align, all-skip rows,
    all-skip donors) and rect geometries including frame corners and a
    full-width rect, over both the plain arrays and the blob wire."""
    cfg = ComposerConfig(320, 240)
    H, W = cfg.mb_height, cfg.mb_width
    rng = np.random.default_rng(907)
    hp, hn = p_slice_header_symbols(
        cfg, jnp.int32(3), jnp.int32(6), is_reference=False,
        long_term_idx=-1, num_waypoints=jnp.int32(0),
        wp_long_term_idx=jnp.zeros(MAX_WAYPOINTS, jnp.int32),
        wp_valid=jnp.zeros(MAX_WAYPOINTS, bool))
    zero = jnp.zeros((H, W), jnp.int32)
    bg_coded = jnp.zeros((H, W), bool)

    def make_grid(k, C, R):
        if k % 4 == 0:
            return fixtures.dense_donor_grid(rng, C, R)
        if k % 4 == 1:
            return fixtures.representative_donor_grid(rng, C, R)
        if k % 4 == 2:
            g = fixtures.random_p_slice_grid(rng, C, R, 1)
            g[0][0] = fixtures.random_ipcm_mb(rng, in_p_slice=True)
            if R > 2:
                g[1] = [mbt.SKIP] * C
            return g
        return [[mbt.SKIP] * C for _ in range(R)]   # donor all-skip

    geoms = [(4, 3, 5, 4), (0, 0, 5, 4), (W - 5, 3, 5, 4),
             (4, H - 4, 5, 4), (0, 5, W, 3), (6, 6, 1, 1)]
    for k, (c0, r0, C, R) in enumerate(geoms):
        grid = make_grid(k, C, R)
        bw = BitWriter()
        mbt.emit_p_slice_mbs(bw, grid, 1)
        bw.write_trailing_bits()
        dd = splice_device.prepare_donor_dense_from_slice(
            bw.getvalue(), 0, C, R, 1, 2)
        dr = splice_device.pack_donor_rows(dd, R, C)
        dn = splice_device.rows_device_arrays(dr)
        budget = splice_device.splice_rbsp_budget(cfg, R * C,
                                                  dr.donor_bits)
        common = dict(has_align=dr.has_align, n_rbsp=budget)
        a = splice_device.emit_spliced_frame_rows(
            cfg, c0, r0, R, C, 2, hp, hn, zero, zero, zero, bg_coded,
            dn, **common)
        b = splice_device.emit_spliced_frame_rows(
            cfg, c0, r0, R, C, 2, hp, hn, zero, zero, zero, bg_coded,
            dn, bg_static_skip=True, **common)
        la, lb = int(a[1]), int(b[1])
        assert not bool(np.asarray(a[3])) and not bool(np.asarray(b[3]))
        assert la == lb, (c0, r0, C, R)
        assert (np.asarray(a[0])[:la] == np.asarray(b[0])[:lb]).all(), \
            (c0, r0, C, R)

        # The static-bg budget (no background allowance) must hold too.
        tight = splice_device.splice_rows_rbsp_budget(
            cfg, R * C, R, dr.donor_bits, static_bg=True)
        c = splice_device.emit_spliced_frame_rows(
            cfg, c0, r0, R, C, 2, hp, hn, zero, zero, zero, bg_coded,
            dn, bg_static_skip=True, has_align=dr.has_align,
            n_rbsp=tight)
        lc = int(c[1])
        assert not bool(np.asarray(c[3])), (c0, r0, C, R, tight)
        assert lc == la
        assert (np.asarray(c[0])[:lc] == np.asarray(a[0])[:la]).all()

    # Blob-wire form through the batched factory (the serving path).
    from h264_scroll_encoder_tpu import native_bridge
    from h264_scroll_encoder_tpu.parallel import batch
    if not native_bridge.native_available():
        return
    C, R, c0, r0 = 5, 4, 4, 3
    pays = []
    for k in range(6):
        g = make_grid(k, C, R)
        bw = BitWriter()
        mbt.emit_p_slice_mbs(bw, g, 1)
        bw.write_trailing_bits()
        pays.append(bw.getvalue())
    CLASS, S_FLAT, S_EXC = 192, 960, 64
    budget = splice_device.splice_rbsp_budget(cfg, R * C, R * CLASS * 32)
    dn, _meta = splice_device.prepare_donor_rows_serving(
        pays, [0] * len(pays), R, C, 1, 2, s_row=CLASS, blob_wire=True,
        s_flat=S_FLAT, s_exc=S_EXC)
    B = len(pays)
    bcast = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
    argv = (bcast(hp), bcast(hn), bcast(zero), bcast(zero), bcast(zero),
            bcast(bg_coded), dn)
    kw = dict(num_refs=2, has_align=True, n_rbsp=budget, s_row=CLASS,
              s_flat=S_FLAT, s_exc=S_EXC)
    ga = batch.make_batched_splice_step_rows(cfg, c0, r0, C, R, **kw)
    gb = batch.make_batched_splice_step_rows(cfg, c0, r0, C, R,
                                             bg_static_skip=True, **kw)
    na, la, _, ova = ga(*argv)
    nb, lb, _, ovb = gb(*argv)
    assert not bool(np.asarray(ova).any())
    assert not bool(np.asarray(ovb).any())
    for i in range(B):
        ia, ib = int(la[i]), int(lb[i])
        assert ia == ib, i
        assert (np.asarray(na[i])[:ia] == np.asarray(nb[i])[:ib]).all(), i
