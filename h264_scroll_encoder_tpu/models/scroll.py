"""The flagship compose kernel: scroll / waypoint P-frames, fully vectorized.

Replaces the reference's sequential per-MB double loop
(h264_write_scroll_p_frame src/h264_writer.c:541-664 and
h264_write_waypoint_p_frame :678-782) with a one-shot device pipeline:

  MB-grid field assignment  ->  MV-prediction stencil  ->  per-MB syntax
  symbols  ->  parallel-prefix bit pack  ->  emulation prevention  ->
  Annex-B NAL bytes

The load-bearing observation: every macroblock is coded P_L0_16x16 with its
*assigned* motion vector (or P_Skip whose derived MV equals the assigned
one), so each MB's actual MV never depends on prediction.  H.264 8.4.1.3.1
median prediction therefore collapses from the reference's row-carried loop
(MVInfo above_row/left, src/h264_writer.c:590-646) into a pure neighbor
stencil over the grid — no scan, no sequential dependency, ideal for the
VPU.

P_Skip: the reference ships with P_Skip disabled because its encoder-side
prediction disagreed with the decoder's skip-MV derivation
(experiments/scroll-encoder/src/h264_encoder.c:564-566).  We implement the
*decoder's* rule (H.264 8.4.1.1: zero MV if A/B unavailable or zero-MV
ref-0, else median) as a second stencil, so `enable_pskip=True` produces
spec-correct skip runs (~1.7 KB/frame class); `enable_pskip=False` is the
bit-exact parity mode against the shipped C binary (~3.0 KB/frame class).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import (ComposerConfig, MAX_EBSP_INSERTIONS, MAX_WAYPOINTS,
                      MV_LIMIT_PX)
from ..ops import bitpack, ebsp, expgolomb
from ..syntax.slice_headers import p_slice_header_symbols

# Absolute worst-case bits per macroblock: skip-run ue(<=3600) 23 +
# mb_type 1 + ref te/ue 7 + two mvd se(<=3968 qpel) 25+25 + cbp 1 < 88.
# The working buffer budget comes from cfg.rbsp_bits_per_mb (overflow is
# detected, not silently truncated).
_MAX_MB_BITS = 88

# Tight working-buffer budget for the scroll/waypoint fast path: real
# composed frames are region-uniform (interior mvds are se(0)), <=12
# bits/MB plus boundary rows — ~6 KB at 720p.  16 bits/MB halves the
# packer cap and the emulation-prevention arrays vs the generic 32
# (measured 1.26x on the batch step with compact_x); frames that
# overflow retry through the exact path at cfg.rbsp_bits_per_mb.
SCROLL_FAST_RBSP_BITS_PER_MB = 16


def max_rbsp_bytes(cfg: ComposerConfig) -> int:
    n = (cfg.total_mbs * cfg.rbsp_bits_per_mb // 8) + 96
    return (n + 3) // 4 * 4


def max_nal_bytes(cfg: ComposerConfig) -> int:
    # Start code (4) + NAL header (1) + EBSP worst case 1.5x RBSP.
    n = 5 + max_rbsp_bytes(cfg) * 3 // 2 + 8
    return (n + 3) // 4 * 4


# ---------------------------------------------------------------------------
# Field assignment (which reference / which MV per MB).
# ---------------------------------------------------------------------------

def _best_waypoint_a(offset_px, wp_offsets, wp_valid, num_waypoints):
    """Highest waypoint offset <= offset with delta <= MV_LIMIT_PX, only
    engaged when offset > MV_LIMIT_PX (src/h264_writer.c:558-571)."""
    idx = jnp.arange(MAX_WAYPOINTS, dtype=jnp.int32)
    cand = (wp_valid & (idx < num_waypoints)
            & (wp_offsets <= offset_px)
            & (offset_px - wp_offsets <= MV_LIMIT_PX)
            & (wp_offsets > 0))
    engaged = (offset_px > MV_LIMIT_PX) & (num_waypoints > 0)
    cand = cand & engaged
    # argmax over offset among candidates; C keeps the *highest offset*.
    keyed = jnp.where(cand, wp_offsets, -1)
    best = jnp.argmax(keyed).astype(jnp.int32)
    found = jnp.max(keyed) >= 0
    return jnp.where(found, best, -1), jnp.where(found, wp_offsets[best], 0)


def _best_waypoint_b(offset_px, height, wp_offsets, wp_valid, num_waypoints):
    """First (lowest-index) waypoint with offset > current and delta within
    -MV_LIMIT_PX, engaged when B's direct MV would break the limit
    (src/h264_writer.c:573-588)."""
    idx = jnp.arange(MAX_WAYPOINTS, dtype=jnp.int32)
    b_direct_mv = offset_px - height
    cand = (wp_valid & (idx < num_waypoints)
            & (wp_offsets > offset_px)
            & (offset_px - wp_offsets >= -MV_LIMIT_PX))
    engaged = (b_direct_mv < -MV_LIMIT_PX) & (num_waypoints > 0)
    cand = cand & engaged
    keyed = jnp.where(cand, idx, MAX_WAYPOINTS)  # take lowest index
    best = jnp.min(keyed).astype(jnp.int32)
    found = best < MAX_WAYPOINTS
    safe = jnp.where(found, best, 0)
    return (jnp.where(found, safe, -1),
            jnp.where(found, wp_offsets[safe], 0))


def mb_fields_traced(cfg: ComposerConfig, offset_px, wp_offsets, wp_valid,
                     num_waypoints, is_waypoint_frame,
                     boundary_policy: str = "floor"):
    """Per-MB (ref, mv) field assignment; `is_waypoint_frame` is a traced
    bool (waypoint frames never redirect the B region,
    src/h264_writer.c:726-729).

    boundary_policy addresses the reference's KNOWN_ISSUES "scroll jumps
    in ~16 px increments": the A/B seam row floors to MB granularity while
    content MVs are per-pixel, so up to 15 rows at the seam fetch past
    their atlas edge and the artifact band jumps per 16 px of scroll.
    'floor' reproduces the reference (required for byte parity);
    'nearest' rounds the seam to the closest MB row, halving the worst
    case (docs/KNOWN_ISSUES_ANALYSIS.md)."""
    offset_px = jnp.asarray(offset_px, jnp.int32)
    h, w = cfg.mb_height, cfg.mb_width
    if boundary_policy == "floor":
        a_region_end = (cfg.height - offset_px) // 16
    elif boundary_policy == "nearest":
        a_region_end = (cfg.height - offset_px + 8) // 16
    else:
        raise ValueError(f"unknown boundary_policy {boundary_policy!r}")

    a_ref, a_mv, b_ref, b_mv = region_params(
        cfg, offset_px, wp_offsets, wp_valid, num_waypoints,
        is_waypoint_frame)

    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    in_a = row < a_region_end
    ref = jnp.where(in_a, a_ref, b_ref)
    mv_y = jnp.where(in_a, a_mv, b_mv) * 4
    return ref, mv_y


def region_params(cfg: ComposerConfig, offset_px, wp_offsets, wp_valid,
                  num_waypoints, is_waypoint_frame):
    """(a_ref, a_mv_px, b_ref, b_mv_px) after waypoint redirection — the
    raw two-region assignment mb_fields selects from per MB row."""
    wp_a, wp_a_off = _best_waypoint_a(offset_px, wp_offsets, wp_valid,
                                      num_waypoints)
    wp_b, wp_b_off = _best_waypoint_b(offset_px, cfg.height, wp_offsets,
                                      wp_valid, num_waypoints)
    wp_b = jnp.where(is_waypoint_frame, -1, wp_b)

    a_ref = jnp.where(wp_a >= 0, 2 + wp_a, 0)
    a_mv = jnp.where(wp_a >= 0, offset_px - wp_a_off, offset_px)
    b_ref = jnp.where(wp_b >= 0, 2 + wp_b, 1)
    b_mv = jnp.where(wp_b >= 0, offset_px - wp_b_off, offset_px - cfg.height)
    return a_ref, a_mv, b_ref, b_mv


def mb_fields(cfg: ComposerConfig, offset_px, wp_offsets, wp_valid,
              num_waypoints, *, is_waypoint_frame,
              boundary_policy: str = "floor"):
    """Per-MB (ref_idx, mv_y_qpel) grids for a scroll or waypoint frame.

    Scroll frames may redirect both the A and B regions through waypoints;
    waypoint frames only redirect A (src/h264_writer.c:689-729).

    boundary_policy addresses the reference's KNOWN_ISSUES "scroll jumps
    in ~16 px increments" — see mb_fields_traced and
    docs/KNOWN_ISSUES_ANALYSIS.md.
    """
    return mb_fields_traced(cfg, offset_px, wp_offsets, wp_valid,
                            num_waypoints,
                            jnp.asarray(is_waypoint_frame, bool),
                            boundary_policy=boundary_policy)


# ---------------------------------------------------------------------------
# MV prediction stencils.
# ---------------------------------------------------------------------------

def _median3(a, b, c):
    return jnp.maximum(jnp.minimum(a, b),
                       jnp.minimum(jnp.maximum(a, b), c))


def _neighbors(field):
    """(A=left, B=above, C=above-right, D=above-left) shifted grids."""
    a = jnp.pad(field, ((0, 0), (1, 0)))[:, :-1]
    b = jnp.pad(field, ((1, 0), (0, 0)))[:-1, :]
    c = jnp.pad(field, ((1, 0), (0, 1)))[:-1, 1:]
    d = jnp.pad(field, ((1, 0), (1, 0)))[:-1, :-1]
    return a, b, c, d


def _pred_stencil(ref, mv_x, mv_y, cur_ref):
    """H.264 8.4.1.3.1 median MV prediction stencil.

    Exact decision tree of get_mv_prediction (src/h264_writer.c:369-432):
    C = above-right, falling back to D = above-left; the
    exactly-one-ref-match fast path; otherwise component-wise median with
    unavailable neighbors contributing (0,0).  `cur_ref` is the reference
    index each MB predicts for — the MB's own ref for coded P_L0_16x16,
    or 0 for the P_Skip derivation.

    One deliberate spec-vs-C difference: when only A is available the
    spec uses mvA unconditionally (rule "B and C unavailable"); the C
    code zeroes it on ref mismatch (src/h264_writer.c:407-417) — an
    unreachable case in its scroll pattern (rows are ref-uniform), so
    byte parity is unaffected.
    """
    return _pred_stencil_roles(ref, mv_x, mv_y, ref, mv_x, mv_y,
                               ref, mv_x, mv_y, cur_ref)


def _pred_stencil_roles(refA, mvxA, mvyA, refB, mvxB, mvyB,
                        refD, mvxD, mvyD, cur_ref):
    """Prediction stencil with role-specific neighbor values.

    A 16x16 partition's neighbors are 4x4 blocks of adjacent MBs: A is
    the left MB's top-RIGHT 4x4, B the above MB's bottom-LEFT, C the
    above-right MB's bottom-LEFT, D the above-left MB's bottom-RIGHT.
    MBs with a uniform inner MV field (P_L0_16x16 / P_Skip / intra — the
    composer's own output) have all roles equal, but spliced-in donor
    macroblocks may carry non-uniform partitions; passing their exact
    per-role 4x4 values (computed by splice_device.donor_edge_motion)
    makes MB-level prediction exact next to a donor rect.

    *A grids supply each cell's value when it acts as the left neighbor
    (its top-right 4x4), *B when above or above-right (bottom-left 4x4),
    *D when above-left (bottom-right 4x4).
    """
    h, w = refA.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)

    def _shift_a(f):
        return jnp.pad(f, ((0, 0), (1, 0)))[:, :-1]

    def _shift_b(f):
        return jnp.pad(f, ((1, 0), (0, 0)))[:-1, :]

    def _shift_c(f):
        return jnp.pad(f, ((1, 0), (0, 1)))[:-1, 1:]

    def _shift_d(f):
        return jnp.pad(f, ((1, 0), (1, 0)))[:-1, :-1]

    ref_a, mvx_a, mvy_a = _shift_a(refA), _shift_a(mvxA), _shift_a(mvyA)
    ref_b, mvx_b, mvy_b = _shift_b(refB), _shift_b(mvxB), _shift_b(mvyB)
    ref_cr, mvx_cr, mvy_cr = _shift_c(refB), _shift_c(mvxB), _shift_c(mvyB)
    ref_d, mvx_d, mvy_d = _shift_d(refD), _shift_d(mvxD), _shift_d(mvyD)

    avail_a = col > 0
    avail_b = row > 0
    use_cr = (row > 0) & (col + 1 < w)          # above-right exists
    use_d = (row > 0) & (col > 0) & ~use_cr     # else above-left fallback
    avail_c = use_cr | use_d
    ref_c = jnp.where(use_cr, ref_cr, ref_d)
    mvx_c = jnp.where(use_cr, mvx_cr, mvx_d)
    mvy_c = jnp.where(use_cr, mvy_cr, mvy_d)

    match_a = avail_a & (ref_a == cur_ref)
    match_b = avail_b & (ref_b == cur_ref)
    match_c = avail_c & (ref_c == cur_ref)

    n_avail = (avail_a.astype(jnp.int32) + avail_b.astype(jnp.int32)
               + avail_c.astype(jnp.int32))
    n_match = (match_a.astype(jnp.int32) + match_b.astype(jnp.int32)
               + match_c.astype(jnp.int32))
    only_a = avail_a & ~avail_b & ~avail_c

    def pick(vx_a, vx_b, vx_c):
        one_match = jnp.where(match_a, vx_a, jnp.where(match_b, vx_b, vx_c))
        med = _median3(jnp.where(avail_a, vx_a, 0),
                       jnp.where(avail_b, vx_b, 0),
                       jnp.where(avail_c, vx_c, 0))
        return jnp.where(
            n_avail == 0, 0,
            jnp.where(only_a, vx_a,
                      jnp.where(n_match == 1, one_match, med)))

    return pick(mvx_a, mvx_b, mvx_c), pick(mvy_a, mvy_b, mvy_c)


def mv_pred_grid(ref, mv_x, mv_y):
    """Encoder-side prediction: each MB predicts for its own ref."""
    return _pred_stencil(ref, mv_x, mv_y, ref)


def mv_pred_grid_roles(cur_ref, refA, mvxA, mvyA, refB, mvxB, mvyB,
                       refD, mvxD, mvyD):
    """Encoder-side prediction with role-specific neighbor grids (exact
    next to non-uniform spliced donor MBs — see _pred_stencil_roles)."""
    return _pred_stencil_roles(refA, mvxA, mvyA, refB, mvxB, mvyB,
                               refD, mvxD, mvyD, cur_ref)


def pskip_mv_grid(ref, mv_x, mv_y):
    """Decoder-side P_Skip MV derivation (H.264 8.4.1.1), vectorized.

    mvSkip = (0,0) when the left or above MB is unavailable, or when either
    has refIdx 0 with a zero MV; otherwise the 8.4.1.3.1 median prediction
    evaluated for refIdx 0.  Implementing the decoder rule (not the
    encoder's prediction) is what makes P_Skip safe — the mismatch is why
    the reference disabled it (h264_encoder.c:564-566).
    """
    h, w = ref.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)

    ref_a, ref_b, _, _ = _neighbors(ref)
    mvx_a, mvx_b, _, _ = _neighbors(mv_x)
    mvy_a, mvy_b, _, _ = _neighbors(mv_y)

    avail_a = col > 0
    avail_b = row > 0
    zero_a = avail_a & (ref_a == 0) & (mvx_a == 0) & (mvy_a == 0)
    zero_b = avail_b & (ref_b == 0) & (mvx_b == 0) & (mvy_b == 0)
    force_zero = (~avail_a) | (~avail_b) | zero_a | zero_b

    pred_x, pred_y = _pred_stencil(ref, mv_x, mv_y, jnp.zeros_like(ref))
    return (jnp.where(force_zero, 0, pred_x),
            jnp.where(force_zero, 0, pred_y))


# ---------------------------------------------------------------------------
# Frame emission.
# ---------------------------------------------------------------------------

def emit_p_frame(cfg: ComposerConfig, header_patterns, header_nbits,
                 ref, mv_x, mv_y, num_refs, nal_ref_idc,
                 *, enable_pskip: bool, ebsp_exact: bool = False,
                 compact_x: bool = False, rbsp_bits_per_mb: int = 0):
    """Symbols -> packed Annex-B NAL bytes for one P slice.

    The field grids may cover the full frame or one horizontal slice band
    (multi-slice frames, MASTER_DESIGN §10 "MB-row-aligned slices"):
    buffers scale with the grid, and a band's top row having no 'above'
    inside the grid is exactly H.264's slice-boundary prediction rule.

    compact_x=True packs each MB into TWO symbol slots instead of three
    — valid when every mv_x is zero (the scroll composition: mvd_x is
    then always the 1-bit se(0)), so A = sr||mb_type||ref||mvd_x fits
    exactly 32 bits (sr<=23 for <=4095 MBs, ref te <=7 for <=10 refs).
    Halves the packer's padded symbol count (measured 1.26x on the 720p
    batch step).  rbsp_bits_per_mb overrides the working-buffer budget
    (0 = cfg default); the scroll callers pass a tight budget and retry
    through the big-buffer exact path on overflow.

    Returns (nal uint8, nal_len int32, rbsp_bits int32, overflow bool).
    """
    h, w = ref.shape
    n_mbs = h * w
    # The merged A-slot (skip_run||mb_type||ref) fits 32 bits only up to
    # 4095 MBs (ue(skip_run) <= 23); larger frames (1920x1088 = 8160 MBs
    # ... up to 65535 MBs, where ue(skip_run) reaches the full 32) use
    # the WIDE layout below: the skip run gets its own slot.
    wide = n_mbs > 4095
    assert n_mbs <= 65535, (
        f"emit_p_frame: {n_mbs} MBs > 65535 — ue(skip_run) would exceed "
        "32 bits; split the frame into slice bands")

    pred_x, pred_y = mv_pred_grid(ref, mv_x, mv_y)
    mvd_x = (mv_x - pred_x).reshape(-1)
    mvd_y = (mv_y - pred_y).reshape(-1)
    ref_f = ref.reshape(-1)

    if enable_pskip:
        skip_x, skip_y = pskip_mv_grid(ref, mv_x, mv_y)
        can_skip = ((ref == 0) & (mv_x == skip_x)
                    & (mv_y == skip_y)).reshape(-1)
    else:
        can_skip = jnp.zeros((n_mbs,), bool)
    coded = ~can_skip

    # mb_skip_run before each coded MB = distance to the previous coded MB.
    idx = jnp.arange(n_mbs, dtype=jnp.int32)
    coded_idx = jnp.where(coded, idx, -1)
    last_coded_incl = jax.lax.associative_scan(jnp.maximum, coded_idx)
    last_coded_before = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), last_coded_incl[:-1]])
    skip_run = idx - last_coded_before - 1

    # Per-MB syntax: [skip_run ue | mb_type ue(0) | ref te | mvd_x se |
    # mvd_y se | cbp ue(0)], merged into 3 symbols per MB to shrink both
    # the symbol count and the packer's per-word contributor window:
    #   A = skip_run||mb_type||ref (<=31 bits), B = mvd_x (<=25),
    #   C = mvd_y||cbp (<=26).
    sr_pat, sr_n = expgolomb.ue(skip_run.astype(jnp.uint32))
    mbt_pat, mbt_n = expgolomb.ue(jnp.zeros((n_mbs,), jnp.uint32))
    ref_pat, ref_n = expgolomb.te(ref_f.astype(jnp.uint32), num_refs)
    mvx_pat, mvx_n = expgolomb.se(mvd_x)
    mvy_pat, mvy_n = expgolomb.se(mvd_y)
    cbp_pat, cbp_n = expgolomb.ue(jnp.zeros((n_mbs,), jnp.uint32))

    if wide:
        a_pat, a_n = bitpack.merge_symbol_pairs(mbt_pat, mbt_n,
                                                ref_pat, ref_n)
    else:
        a_pat, a_n = bitpack.merge_symbol_pairs(sr_pat, sr_n,
                                                mbt_pat, mbt_n)
        a_pat, a_n = bitpack.merge_symbol_pairs(a_pat, a_n, ref_pat, ref_n)
    c_pat, c_n = bitpack.merge_symbol_pairs(mvy_pat, mvy_n, cbp_pat, cbp_n)

    coded_i = coded.astype(jnp.int32)
    zero = jnp.uint32(0)
    if compact_x:
        # compact precondition (every mv_x zero) keeps mvd_x at the
        # 1-bit se(0), so even the wide mbt||ref||mvd_x merge is <= 9.
        a_pat, a_n = bitpack.merge_symbol_pairs(a_pat, a_n,
                                                mvx_pat, mvx_n)
        cols = [(a_pat, a_n), (c_pat, c_n)]
    else:
        cols = [(a_pat, a_n), (mvx_pat, mvx_n), (c_pat, c_n)]
    if wide:
        cols = [(sr_pat, sr_n)] + cols
    mb_patterns = jnp.stack(
        [jnp.where(coded, cp, zero) for cp, _ in cols], axis=1)
    mb_nbits = jnp.stack([cn * coded_i for _, cn in cols], axis=1)

    # Trailing skip run after the last coded MB (only if > 0); if no MB is
    # coded at all the whole slice is one skip run.
    tail_skips = jnp.int32(n_mbs) - 1 - last_coded_incl[-1]
    ts_pat, ts_n = expgolomb.ue(tail_skips.astype(jnp.uint32))
    ts_n = jnp.where(tail_skips > 0, ts_n, 0)

    patterns = jnp.concatenate(
        [header_patterns, mb_patterns.reshape(-1), ts_pat[None]])
    nbits = jnp.concatenate(
        [header_nbits, mb_nbits.reshape(-1), ts_n[None]])

    bits_per_mb = rbsp_bits_per_mb or cfg.rbsp_bits_per_mb
    n_rbsp = (n_mbs * bits_per_mb // 8 + 96 + 3) // 4 * 4
    return finish_slice(patterns, nbits, n_rbsp, nal_ref_idc,
                        ebsp_exact=ebsp_exact)


def finish_slice(patterns, nbits, n_rbsp: int, nal_ref_idc,
                 *, ebsp_exact: bool = False):
    """Shared slice tail: trailing bits -> pack -> emulation prevention ->
    Annex-B framing.  Returns (nal u8, nal_len, rbsp_bits, overflow)."""
    # Fused back end (TPU, bounded path): trailing bits + pack +
    # emulation prevention + NAL framing in one Pallas program per
    # 4-session tile (ops/emit_fused; bit-exact vs the staged path).
    # The trailing-bits symbol materializes in-kernel, so the two
    # full-array XLA concats below never run on the hot path.
    if jax.default_backend() == "tpu" and not ebsp_exact:
        from ..ops import emit_fused
        return emit_fused.finish_nal_fused(
            patterns, nbits, n_rbsp, nal_ref_idc,
            max_insertions=MAX_EBSP_INSERTIONS, append_trailing=True)

    payload_bits = jnp.sum(nbits)
    tb_pat, tb_n = bitpack.trailing_bits_symbol(payload_bits)
    patterns = jnp.concatenate([patterns, tb_pat[None]])
    nbits = jnp.concatenate([nbits, tb_n[None]])

    # Staged path: exact-EBSP retries (any backend) and off-TPU tests.
    # On TPU the Pallas direct-placement packer keeps all of its
    # ~2*log2(n) move passes VMEM-resident and beats the XLA merge tree
    # at every production shape (scroll 2-slot: 0.79 vs 1.02 ms; splice:
    # 0.81 vs 1.79 ms per batch-256 pack, v5e, bit-exact).  Off-TPU
    # (tests) the XLA tree avoids Pallas interpret-mode cost.
    if jax.default_backend() == "tpu":
        from ..ops import bitpack_flat
        words, total_bits = bitpack_flat.pack_words_place_pallas(
            patterns, nbits, (n_rbsp + 3) // 4)
        rbsp_bytes = bitpack.words_to_bytes(words)[:n_rbsp]
    else:
        rbsp_bytes, total_bits = bitpack.pack_bytes_tree(patterns, nbits,
                                                         n_rbsp)
    rbsp_len = total_bits // 8  # trailing bits guarantee alignment
    overflow = total_bits > jnp.int32(n_rbsp * 8)

    header_byte = ((nal_ref_idc & 0x03) << 5) | 0x01  # NAL_TYPE_SLICE
    if ebsp_exact:
        # Exact unbounded emulation prevention: the slow-path fallback a
        # caller retries with after the bounded fast path flags overflow
        # (output capacity covers the 1.5x worst case).
        n_nal = (5 + n_rbsp * 3 // 2 + 8 + 3) // 4 * 4
        ebsp_bytes, ebsp_len = ebsp.rbsp_to_ebsp_tree(
            rbsp_bytes, rbsp_len, n_nal - 8)
    else:
        # Bounded path: the insertion cap means the NAL buffer only
        # needs rbsp + cap bytes, not the 1.5x worst case — ~33% less
        # data in every expansion pass and downstream byte op.
        n_nal = (5 + n_rbsp + MAX_EBSP_INSERTIONS + 8 + 3) // 4 * 4
        ebsp_bytes, ebsp_len = ebsp.rbsp_to_ebsp_tree(
            rbsp_bytes, rbsp_len, n_nal - 8,
            max_insertions=MAX_EBSP_INSERTIONS)
        overflow |= (ebsp_len - rbsp_len) > MAX_EBSP_INSERTIONS

    prefix = jnp.concatenate([
        jnp.asarray([0, 0, 0, 1], jnp.uint8),
        jnp.asarray(header_byte, jnp.uint8).reshape(1).astype(jnp.uint8),
    ])
    out = jnp.zeros((n_nal,), jnp.uint8)
    out = jax.lax.dynamic_update_slice(out, ebsp_bytes, (5,))
    out = jax.lax.dynamic_update_slice(out, prefix, (0,))
    return out, 5 + ebsp_len, total_bits, overflow


def emit_partitioned_scroll_frame(cfg: ComposerConfig, header_patterns,
                                  header_nbits, offset_px,
                                  a_ref, a_mv_px, b_ref, b_mv_px,
                                  num_refs, nal_ref_idc, *,
                                  enable_pskip: bool,
                                  ebsp_exact: bool = False):
    """Scroll P-frame with an 8 px-granular A/B seam (KNOWN_ISSUES fix).

    The reference floors the A/B boundary to MB rows while content moves
    per-pixel, so up to 15 pixel rows at the seam fetch past their atlas
    (KNOWN_ISSUES.md:5-13 "scroll jumps in ~16px increments").  Here the
    straddled MB row is coded P_L0_L0_16x8 — two 16x8 partitions with
    separate (ref, mv) — which is the finest legal split across the seam:
    the two regions reference *different* pictures and a P_8x8 quadrant
    carries a single ref_idx, so 16x8 (8 px granularity, <=4 px residual
    error, quantified by the pixel oracle) is the limit without changing
    references.

    Seam-row mvds collapse to closed forms: the row above is uniformly
    region A, so part 0's directional B-neighbor rule predicts exactly
    a_mv (mvd 0 except the frame's top-left corner), and part 1's
    A-neighbor rule predicts b_mv along the row (mvd b_mv only at column
    0, where the median over {0, a_mv-with-mismatched-ref, 0} is 0).
    The emission layout is 4 fixed slots per MB (uniform MBs use 3).
    """
    h, w = cfg.mb_height, cfg.mb_width
    n_mbs = h * w
    # Same 32-bit merged-slot constraint as emit_p_frame: the seam and
    # uniform A-slots both carry skip_run||mb_type(||ref).
    assert n_mbs <= 4095, (
        f"emit_partitioned_scroll_frame: {n_mbs} MBs > 4095 — merged "
        "skip-run slot would overflow 32 bits; use slice bands")
    offset_px = jnp.asarray(offset_px, jnp.int32)
    y_seam = cfg.height - offset_px

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    cov = jnp.clip(y_seam - 16 * rows, 0, 16)
    c_r = ((cov + 4) // 8) * 8           # rounded A-coverage: 0 | 8 | 16
    seam = c_r == 8
    in_full_a = c_r == 16

    a_mvq = a_mv_px * 4
    b_mvq = b_mv_px * 4
    ref_full = jnp.where(in_full_a, a_ref, b_ref)
    mv_full = jnp.where(in_full_a, a_mvq, b_mvq)
    zeros = jnp.zeros((h, w), jnp.int32)

    # Role grids: a seam MB's top-right 4x4 (as-left role) is region A;
    # its bottom-left/bottom-right (as-above/above-left roles) region B —
    # which equals the full-value grid, since seam cells select B there.
    refA_role = jnp.where(seam, a_ref, ref_full)
    mvA_role = jnp.where(seam, a_mvq, mv_full)
    pred_x, pred_y = _pred_stencil_roles(
        refA_role, zeros, mvA_role, ref_full, zeros, mv_full,
        ref_full, zeros, mv_full, ref_full)
    mvd_y = (mv_full - pred_y).reshape(-1)
    mvd_x = (-pred_x).reshape(-1)

    if enable_pskip:
        skip_x, skip_y = pskip_mv_grid(ref_full, zeros, mv_full)
        can_skip = ((ref_full == 0) & (skip_x == 0)
                    & (mv_full == skip_y) & ~seam)
    else:
        can_skip = jnp.zeros((h, w), bool)
    coded = (~can_skip).reshape(-1)

    idx = jnp.arange(n_mbs, dtype=jnp.int32)
    coded_idx = jnp.where(coded, idx, -1)
    last_coded_incl = jax.lax.associative_scan(jnp.maximum, coded_idx)
    last_coded_before = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), last_coded_incl[:-1]])
    skip_run = idx - last_coded_before - 1
    sr_pat, sr_n = expgolomb.ue(skip_run.astype(jnp.uint32))

    seam_f = seam.reshape(-1)
    u32z = jnp.zeros((n_mbs,), jnp.uint32)

    # Uniform-MB slots: [sr||mb_type(0)||ref, mvd_x, mvd_y||cbp, 0].
    mbt0_pat, mbt0_n = expgolomb.ue(u32z)
    ref_pat, ref_n = expgolomb.te(ref_full.reshape(-1).astype(jnp.uint32),
                                  num_refs)
    mvx_pat, mvx_n = expgolomb.se(mvd_x)
    mvy_pat, mvy_n = expgolomb.se(mvd_y)
    cbp_pat, cbp_n = expgolomb.ue(u32z)
    u_a = bitpack.merge_symbol_pairs(sr_pat, sr_n, mbt0_pat, mbt0_n)
    u_a = bitpack.merge_symbol_pairs(*u_a, ref_pat, ref_n)
    u_c = bitpack.merge_symbol_pairs(mvy_pat, mvy_n, cbp_pat, cbp_n)

    # Seam-MB slots: [sr||mb_type(1), ref0||ref1||mvd0x(0),
    #                 mvd0y, mvd1x(0)||mvd1y||cbp(0)].
    mbt1_pat, mbt1_n = expgolomb.ue(jnp.full((n_mbs,), 1, jnp.uint32))
    ref0_pat, ref0_n = expgolomb.te(
        jnp.broadcast_to(jnp.asarray(a_ref, jnp.uint32), (n_mbs,)),
        num_refs)
    ref1_pat, ref1_n = expgolomb.te(
        jnp.broadcast_to(jnp.asarray(b_ref, jnp.uint32), (n_mbs,)),
        num_refs)
    se0_pat, se0_n = expgolomb.se(jnp.zeros((n_mbs,), jnp.int32))
    mvd0y = jnp.where((rows == 0) & (cols == 0), a_mvq, 0).reshape(-1)
    mvd1y = jnp.where(cols == 0, b_mvq, 0).reshape(-1)
    mvd0y_pat, mvd0y_n = expgolomb.se(mvd0y)
    mvd1y_pat, mvd1y_n = expgolomb.se(mvd1y)
    s_a = bitpack.merge_symbol_pairs(sr_pat, sr_n, mbt1_pat, mbt1_n)
    s_b = bitpack.merge_symbol_pairs(ref0_pat, ref0_n, ref1_pat, ref1_n)
    s_b = bitpack.merge_symbol_pairs(*s_b, se0_pat, se0_n)
    s_d = bitpack.merge_symbol_pairs(se0_pat, se0_n, mvd1y_pat, mvd1y_n)
    s_d = bitpack.merge_symbol_pairs(*s_d, cbp_pat, cbp_n)

    coded_i = coded.astype(jnp.int32)

    def sel(u_pat, u_n, s_pat, s_n):
        pat = jnp.where(seam_f, s_pat, u_pat)
        n = jnp.where(seam_f, s_n, u_n)
        return jnp.where(coded, pat, u32z), n * coded_i

    p0, n0 = sel(*u_a, *s_a)
    p1, n1 = sel(mvx_pat, mvx_n, *s_b)
    p2, n2 = sel(*u_c, mvd0y_pat, mvd0y_n)
    p3, n3 = sel(u32z, jnp.zeros((n_mbs,), jnp.int32), *s_d)
    mb_patterns = jnp.stack([p0, p1, p2, p3], axis=1)
    mb_nbits = jnp.stack([n0, n1, n2, n3], axis=1)

    tail_skips = jnp.int32(n_mbs) - 1 - last_coded_incl[-1]
    ts_pat, ts_n = expgolomb.ue(tail_skips.astype(jnp.uint32))
    ts_n = jnp.where(tail_skips > 0, ts_n, 0)

    patterns = jnp.concatenate(
        [header_patterns, mb_patterns.reshape(-1), ts_pat[None]])
    nbits = jnp.concatenate(
        [header_nbits, mb_nbits.reshape(-1), ts_n[None]])
    n_rbsp = (n_mbs * cfg.rbsp_bits_per_mb // 8 + 96 + 3) // 4 * 4
    return finish_slice(patterns, nbits, n_rbsp, nal_ref_idc,
                        ebsp_exact=ebsp_exact)


def unified_frame(cfg: ComposerConfig, frame_num, offset_px,
                  wp_offsets, wp_ltidx, wp_valid, num_waypoints,
                  is_waypoint, *, enable_pskip: bool = False,
                  boundary_policy: str = "floor"):
    """One P-frame that is a waypoint reference iff `is_waypoint` (traced).

    This is the batched-serving kernel: a session step emits exactly one
    frame, avoiding the 2x cost of unconditionally materializing both a
    waypoint and a scroll frame.  All waypoint-dependent syntax
    (nal_ref_idc, MMCO self-marking, B-region redirection) selects on the
    traced flag.
    """
    max_fn = 1 << cfg.log2_max_frame_num
    fn = frame_num % max_fn
    is_waypoint = jnp.asarray(is_waypoint, bool)
    long_term_idx = jnp.where(is_waypoint, 2 + num_waypoints, -1)
    hp, hn = p_slice_header_symbols(
        cfg, fn, fn * 2, is_reference=is_waypoint,
        long_term_idx=long_term_idx, num_waypoints=num_waypoints,
        wp_long_term_idx=wp_ltidx, wp_valid=wp_valid)
    nal_ref_idc = jnp.where(is_waypoint, 2, 0)
    if boundary_policy == "partitioned":
        a_ref, a_mv, b_ref, b_mv = region_params(
            cfg, offset_px, wp_offsets, wp_valid, num_waypoints,
            is_waypoint)
        return emit_partitioned_scroll_frame(
            cfg, hp, hn, offset_px, a_ref, a_mv, b_ref, b_mv,
            num_refs=2 + num_waypoints, nal_ref_idc=nal_ref_idc,
            enable_pskip=enable_pskip)
    ref, mv_y = mb_fields_traced(cfg, offset_px, wp_offsets, wp_valid,
                                 num_waypoints, is_waypoint,
                                 boundary_policy=boundary_policy)
    mv_x = jnp.zeros_like(mv_y)
    return emit_p_frame(cfg, hp, hn, ref, mv_x, mv_y,
                        num_refs=2 + num_waypoints,
                        nal_ref_idc=nal_ref_idc,
                        enable_pskip=enable_pskip, compact_x=True,
                        rbsp_bits_per_mb=SCROLL_FAST_RBSP_BITS_PER_MB)


def scroll_frame_sliced(cfg: ComposerConfig, frame_num, offset_px,
                        wp_offsets, wp_ltidx, wp_valid, num_waypoints,
                        *, rows_per_slice: int,
                        enable_pskip: bool = False,
                        boundary_policy: str = "floor",
                        ebsp_exact: bool = False):
    """One scroll frame emitted as multiple MB-row-aligned slices.

    Each band is an independent slice (first_mb_in_slice = band start):
    consumers can decode bands in parallel and packet loss is contained.
    Spatial prediction does not cross slice boundaries in H.264, which
    the band-local stencils reproduce exactly.  The reference is strictly
    one slice per frame; this is an extension (MASTER_DESIGN §10 notes
    the layout).  Returns stacked (nals u8[K, n], lens i32[K],
    bits i32[K], overflow bool[K]).
    """
    if cfg.mb_height % rows_per_slice:
        raise ValueError("mb_height must divide by rows_per_slice")
    n_bands = cfg.mb_height // rows_per_slice
    max_fn = 1 << cfg.log2_max_frame_num
    fn = frame_num % max_fn
    ref, mv_y = mb_fields(cfg, offset_px, wp_offsets, wp_valid,
                          num_waypoints, is_waypoint_frame=False,
                          boundary_policy=boundary_policy)
    mv_x = jnp.zeros_like(mv_y)

    def one_band(band_ref, band_mvx, band_mvy, first_mb):
        hp, hn = p_slice_header_symbols(
            cfg, fn, fn * 2, is_reference=False, long_term_idx=-1,
            num_waypoints=num_waypoints, wp_long_term_idx=wp_ltidx,
            wp_valid=wp_valid, first_mb=first_mb)
        return emit_p_frame(cfg, hp, hn, band_ref, band_mvx,
                            band_mvy, num_refs=2 + num_waypoints,
                            nal_ref_idc=0, enable_pskip=enable_pskip,
                            ebsp_exact=ebsp_exact, compact_x=True,
                            rbsp_bits_per_mb=0 if ebsp_exact
                            else SCROLL_FAST_RBSP_BITS_PER_MB)

    bands = lambda a: a.reshape(n_bands, rows_per_slice, cfg.mb_width)
    first_mbs = (jnp.arange(n_bands, dtype=jnp.uint32)
                 * (rows_per_slice * cfg.mb_width))
    return jax.vmap(one_band)(bands(ref), bands(mv_x), bands(mv_y),
                              first_mbs)


def needs_waypoint(offset_px, wp_offsets, wp_valid, num_waypoints):
    """h264_needs_waypoint (src/h264_writer.c:666-676)."""
    offset_px = jnp.asarray(offset_px, jnp.int32)
    idx = jnp.arange(MAX_WAYPOINTS, dtype=jnp.int32)
    exists = jnp.any(wp_valid & (idx < num_waypoints)
                     & (wp_offsets == offset_px))
    return (offset_px != 0) & (offset_px % MV_LIMIT_PX == 0) & ~exists


def scroll_frame(cfg: ComposerConfig, frame_num, offset_px,
                 wp_offsets, wp_ltidx, wp_valid, num_waypoints,
                 *, enable_pskip: bool = False,
                 boundary_policy: str = "floor", ebsp_exact: bool = False):
    """One non-reference scroll P-frame (nal_ref_idc=0)."""
    max_fn = 1 << cfg.log2_max_frame_num
    fn = frame_num % max_fn
    hp, hn = p_slice_header_symbols(
        cfg, fn, fn * 2, is_reference=False, long_term_idx=-1,
        num_waypoints=num_waypoints, wp_long_term_idx=wp_ltidx,
        wp_valid=wp_valid)
    if boundary_policy == "partitioned":
        a_ref, a_mv, b_ref, b_mv = region_params(
            cfg, offset_px, wp_offsets, wp_valid, num_waypoints,
            jnp.asarray(False))
        return emit_partitioned_scroll_frame(
            cfg, hp, hn, offset_px, a_ref, a_mv, b_ref, b_mv,
            num_refs=2 + num_waypoints, nal_ref_idc=0,
            enable_pskip=enable_pskip, ebsp_exact=ebsp_exact)
    ref, mv_y = mb_fields(cfg, offset_px, wp_offsets, wp_valid,
                          num_waypoints, is_waypoint_frame=False,
                          boundary_policy=boundary_policy)
    mv_x = jnp.zeros_like(mv_y)
    return emit_p_frame(cfg, hp, hn, ref, mv_x, mv_y,
                        num_refs=2 + num_waypoints, nal_ref_idc=0,
                        enable_pskip=enable_pskip, ebsp_exact=ebsp_exact,
                        compact_x=True,
                        rbsp_bits_per_mb=0 if ebsp_exact
                        else SCROLL_FAST_RBSP_BITS_PER_MB)


def waypoint_frame(cfg: ComposerConfig, frame_num, offset_px,
                   wp_offsets, wp_ltidx, wp_valid, num_waypoints,
                   *, enable_pskip: bool = False,
                   boundary_policy: str = "floor", ebsp_exact: bool = False):
    """One reference waypoint P-frame (nal_ref_idc=2) that MMCO-marks
    itself long-term idx 2+num_waypoints (src/h264_writer.c:678-782)."""
    max_fn = 1 << cfg.log2_max_frame_num
    fn = frame_num % max_fn
    long_term_idx = 2 + num_waypoints
    hp, hn = p_slice_header_symbols(
        cfg, fn, fn * 2, is_reference=True, long_term_idx=long_term_idx,
        num_waypoints=num_waypoints, wp_long_term_idx=wp_ltidx,
        wp_valid=wp_valid)
    if boundary_policy == "partitioned":
        a_ref, a_mv, b_ref, b_mv = region_params(
            cfg, offset_px, wp_offsets, wp_valid, num_waypoints,
            jnp.asarray(True))
        return emit_partitioned_scroll_frame(
            cfg, hp, hn, offset_px, a_ref, a_mv, b_ref, b_mv,
            num_refs=2 + num_waypoints, nal_ref_idc=2,
            enable_pskip=enable_pskip, ebsp_exact=ebsp_exact)
    ref, mv_y = mb_fields(cfg, offset_px, wp_offsets, wp_valid,
                          num_waypoints, is_waypoint_frame=True,
                          boundary_policy=boundary_policy)
    mv_x = jnp.zeros_like(mv_y)
    return emit_p_frame(cfg, hp, hn, ref, mv_x, mv_y,
                        num_refs=2 + num_waypoints, nal_ref_idc=2,
                        enable_pskip=enable_pskip, ebsp_exact=ebsp_exact,
                        compact_x=True,
                        rbsp_bits_per_mb=0 if ebsp_exact
                        else SCROLL_FAST_RBSP_BITS_PER_MB)
