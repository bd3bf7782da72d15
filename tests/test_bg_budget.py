"""Bounded coded-background budget (rows splice bg_budget=L).

Byte parity vs the generic layout on all-skip and sparse-coded
backgrounds, and the overflow contract when a row exceeds the budget.
(Perf note: measured net-neutral-to-negative at rep 720p shapes — see
the rationale comment in rows_splice_symbols; these tests pin the
correctness contract, not a production default.)
"""

import numpy as np
import jax
import jax.numpy as jnp

from h264_scroll_encoder_tpu.config import MAX_WAYPOINTS, ComposerConfig
from h264_scroll_encoder_tpu.models import mb_transcode as mbt
from h264_scroll_encoder_tpu.models import splice_device as sd
from h264_scroll_encoder_tpu.ops.bitio import BitWriter
from h264_scroll_encoder_tpu.syntax.slice_headers import (
    p_slice_header_symbols)
from h264_scroll_encoder_tpu.utils import fixtures

CFG = ComposerConfig(1280, 720)
H, W = CFG.mb_height, CFG.mb_width
R = C = 23
R0, C0 = 10, 30


def _setup():
    rng = np.random.default_rng(7)
    donor = fixtures.representative_donor_grid(rng, C, R)
    bw = BitWriter()
    mbt.emit_p_slice_mbs(bw, donor, 1)
    bw.write_trailing_bits()
    dd = sd.prepare_donor_dense_from_slice(bw.getvalue(), 0, C, R, 1, 2)
    dr = sd.pack_donor_rows(dd, R, C)
    dn = sd.rows_device_arrays(dr)
    budget = sd.splice_rbsp_budget(CFG, R * C, dr.donor_bits,
                                   bg_bits_per_mb=16)
    hp, hn = p_slice_header_symbols(
        CFG, jnp.int32(3), jnp.int32(6), is_reference=False,
        long_term_idx=-1, num_waypoints=jnp.int32(0),
        wp_long_term_idx=jnp.zeros(MAX_WAYPOINTS, jnp.int32),
        wp_valid=jnp.zeros(MAX_WAYPOINTS, bool))
    return dr, dn, budget, hp, hn


def _emit(dr, dn, n_rbsp, hp, hn, bg_coded_np, bgb):
    zero = jnp.zeros((H, W), jnp.int32)
    f = jax.jit(lambda bc: sd.emit_spliced_frame_rows(
        CFG, C0, R0, R, C, 2, hp, hn, zero, zero, zero, bc, dn,
        has_align=dr.has_align, n_rbsp=n_rbsp, compact_x=True,
        bg_budget=bgb))
    nal, nlen, _bits, ovf = f(jnp.asarray(bg_coded_np))
    return np.asarray(nal), int(nlen), bool(np.asarray(ovf))


def test_bg_budget_parity_and_overflow():
    dr, dn, budget, hp, hn = _setup()
    rng = np.random.default_rng(3)

    # All-skip background: byte-identical, and the lane count shrinks.
    bc0 = np.zeros((H, W), bool)
    a, la, oa = _emit(dr, dn, budget, hp, hn, bc0, None)
    b, lb, ob = _emit(dr, dn, budget, hp, hn, bc0, 16)
    assert not oa and not ob
    assert la == lb and np.array_equal(a[:la], b[:lb])
    zero = jnp.zeros((H, W), jnp.int32)
    args = (CFG, C0, R0, R, C, 2, hp, hn, zero, zero, zero,
            jnp.asarray(bc0), dn)
    pA, _, _ = sd.rows_splice_symbols(*args, n_rbsp=budget, compact_x=True)
    pB, _, _ = sd.rows_splice_symbols(*args, n_rbsp=budget, compact_x=True,
                                      bg_budget=16)
    assert pB.shape[0] < pA.shape[0] // 2

    # Sparse coded background (3 coded MBs per row, within budget).
    bc1 = np.zeros((H, W), bool)
    allowed = [c for c in range(W) if not (C0 - 1 <= c <= C0 + C)]
    for r in range(H):
        bc1[r, rng.choice(allowed, 3, replace=False)] = True
    a, la, oa = _emit(dr, dn, budget, hp, hn, bc1, None)
    b, lb, ob = _emit(dr, dn, budget, hp, hn, bc1, 16)
    assert not oa and not ob
    assert la == lb and np.array_equal(a[:la], b[:lb])

    # One row with 20 coded background MBs (40 lanes > 16): the budget
    # path must flag overflow while the generic path does not.
    bc2 = np.zeros((H, W), bool)
    bc2[2, 5:25] = True
    _, _, oa = _emit(dr, dn, budget, hp, hn, bc2, None)
    _, _, ob = _emit(dr, dn, budget, hp, hn, bc2, 16)
    assert not oa and ob
