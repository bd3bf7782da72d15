"""Sub-stage decomposition of the rows-splice SYMBOLS stage (batch 256).

After the emit back end fused (align+tb+pack+EBSP+NAL in one Pallas
program, ~0.33 ms/step), the symbols prologue (~0.51 ms isolated) is
the dominant stage of the rep serving step.  This probe times its
pieces with the bench scan methodology to direct the next fusion:

  unblob     blob wire -> donor field arrays (_unblob)
  prologue   _dense_prologue (role scatter, MV stencil, skip-run scan,
             ue/se symbol grids)
  bg3        prologue + _bg3 background grid assembly
  layout     full rows_splice_symbols (prologue + compact_x layout
             concat) — the shipped stage
  stencil    mv_pred_grid_roles alone
  skiprun    the composite skip-run associative scan alone

Run: python scripts/symbols_stage_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from h264_scroll_encoder_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from h264_scroll_encoder_tpu.config import MAX_WAYPOINTS, ComposerConfig
from h264_scroll_encoder_tpu.models import mb_transcode as mbt
from h264_scroll_encoder_tpu.models import scroll as scroll_model
from h264_scroll_encoder_tpu.models import splice_device
from h264_scroll_encoder_tpu.ops import expgolomb
from h264_scroll_encoder_tpu.ops.bitio import BitWriter
from h264_scroll_encoder_tpu.syntax.slice_headers import p_slice_header_symbols
from h264_scroll_encoder_tpu.utils import fixtures

BATCH = 256
REPS = 12
STEPS = 8


def timed(fn, args):
    def scan_fn(a):
        def body(carry, _):
            outs = fn(a, carry % 2)
            chk = sum(o.astype(jnp.uint32).sum() for o in outs)
            return carry + chk, None
        out, _ = jax.lax.scan(body, jnp.uint32(0), None, length=STEPS)
        return out

    scan = jax.jit(scan_fn)
    _ = int(scan(args))
    best = None
    for _b in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(REPS):
            chk = scan(args)
            acc = chk if acc is None else acc + chk
        _ = int(acc)
        dt = (time.perf_counter() - t0) / (REPS * STEPS)
        best = dt if best is None else min(best, dt)
    return best * 1000.0


def main():
    cfg = ComposerConfig(1280, 720)
    rng = np.random.default_rng(7)
    R = C = 23
    r0, c0 = 10, 30
    donor = fixtures.representative_donor_grid(rng, C, R)
    bw = BitWriter()
    mbt.emit_p_slice_mbs(bw, donor, 1)
    bw.write_trailing_bits()
    dd = splice_device.prepare_donor_dense_from_slice(
        bw.getvalue(), 0, C, R, 1, 2)
    dr = splice_device.pack_donor_rows(dd, R, C)
    CLASS = splice_device.row_chunk_class(dr.row_patterns.shape[1])
    blob, s_flat, s_exc = None, None, None
    got, _meta = splice_device.prepare_donor_rows_serving(
        [bw.getvalue()] * BATCH, [0] * BATCH, R, C, 1, 2, s_row=CLASS,
        blob_wire=True,
        s_flat=None, s_exc=None)
    # prepare probe wire classes like bench does
    probe, _ = splice_device.prepare_donor_rows_serving(
        [bw.getvalue()], [0], R, C, 1, 2, s_row=CLASS)
    _w, s_flat, s_exc = splice_device.rows_flat_wire(
        np.asarray(probe["row_patterns"]),
        np.asarray(probe["row_nbits"], np.int32))
    got, _meta = splice_device.prepare_donor_rows_serving(
        [bw.getvalue()] * BATCH, [0] * BATCH, R, C, 1, 2, s_row=CLASS,
        blob_wire=True, s_flat=s_flat, s_exc=s_exc)
    blob = got["blob"]

    H, W = cfg.mb_height, cfg.mb_width
    zero = jnp.zeros((H, W), jnp.int32)
    bg_coded = jnp.zeros((H, W), bool)
    hp, hn = p_slice_header_symbols(
        cfg, jnp.int32(3), jnp.int32(6), is_reference=False,
        long_term_idx=-1, num_waypoints=jnp.int32(0),
        wp_long_term_idx=jnp.zeros(MAX_WAYPOINTS, jnp.int32),
        wp_valid=jnp.zeros(MAX_WAYPOINTS, bool))
    n_rbsp = splice_device.splice_rows_rbsp_budget(
        cfg, R * C, R, dr.donor_bits, bg_bits_per_mb=4)

    bcast = lambda x: jnp.broadcast_to(x, (BATCH,) + x.shape)
    zero_b, coded_b = bcast(zero), bcast(bg_coded)
    hp_b, hn_b = bcast(hp), bcast(hn)

    def perturb(blob_a, bit):
        return blob_a.at[:, 0].set(blob_a[:, 0] ^ bit)

    def mk(fn):
        def run(a, bit):
            return fn(perturb(a, bit))
        return run

    def v(fn):
        return jax.vmap(fn)

    def unblob_fn(blob_i):
        dn = splice_device._unblob(blob_i, R, C, s_flat, s_exc)
        return tuple(x.astype(jnp.uint32) if x.dtype != jnp.uint32
                     else x for x in jax.tree.leaves(dn))

    def _dn(blob_i):
        dn = splice_device._unblob(blob_i, R, C, s_flat, s_exc)
        if "flat_patterns" in dn:
            dn["row_patterns"], dn["row_nbits"] = \
                splice_device._rows_from_flat(dn, R, CLASS)
        dn["row_nbits"] = dn["row_nbits"].astype(jnp.int32)
        dn.update(splice_device.edge_roles_to_full(dn, R, C))
        return dn

    def prologue_fn(blob_i):
        dn = _dn(blob_i)
        pro = splice_device._dense_prologue(
            cfg, r0, c0, R, C, 2, zero, zero, zero, bg_coded, dn)
        return (pro["a_pat"], pro["a_n"].astype(jnp.uint32),
                pro["sr_pat"], pro["c_pat"])

    def bg3_fn(blob_i):
        dn = _dn(blob_i)
        pro = splice_device._dense_prologue(
            cfg, r0, c0, R, C, 2, zero, zero, zero, bg_coded, dn)
        bg_p, bg_n = splice_device._bg3(pro, H, W)
        return (bg_p.reshape(-1), bg_n.reshape(-1).astype(jnp.uint32))

    def layout_fn(blob_i):
        pats, nbs, _ = splice_device.rows_splice_symbols(
            cfg, c0, r0, R, C, 2, hp, hn, zero, zero, zero, bg_coded,
            {"blob": blob_i}, n_rbsp=n_rbsp, compact_x=True,
            s_row=CLASS, s_flat=s_flat, s_exc=s_exc)
        return (pats, nbs.astype(jnp.uint32))

    def stencil_fn(blob_i):
        dn = _dn(blob_i)
        z = zero
        scat = lambda vals: z.at[r0:r0 + R, c0:c0 + C].set(
            vals.astype(jnp.int32).reshape(R, C))
        px, py = scroll_model.mv_pred_grid_roles(
            scat(dn["a_ref"]), scat(dn["a_ref"]), scat(dn["a_mvx"]),
            scat(dn["a_mvy"]), scat(dn["b_ref"]), scat(dn["b_mvx"]),
            scat(dn["b_mvy"]), scat(dn["d_ref"]), scat(dn["d_mvx"]),
            scat(dn["d_mvy"]))
        return (px.astype(jnp.uint32), py.astype(jnp.uint32))

    def skiprun_fn(blob_i):
        dn = splice_device._unblob(blob_i, R, C, s_flat, s_exc)
        coded = bg_coded.at[r0:r0 + R, c0:c0 + C].set(
            dn["coded"].reshape(R, C))
        coded_f = coded.reshape(-1)
        idx = jnp.arange(H * W, dtype=jnp.int32)
        coded_idx = jnp.where(coded_f, idx, -1)
        last_incl = jax.lax.associative_scan(jnp.maximum, coded_idx)
        skip_run = idx - jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32), last_incl[:-1]]) - 1
        sr_pat, sr_n = expgolomb.ue(skip_run.astype(jnp.uint32))
        return (sr_pat, sr_n.astype(jnp.uint32))

    for name, fn in (("unblob", unblob_fn), ("stencil", stencil_fn),
                     ("skiprun", skiprun_fn), ("prologue", prologue_fn),
                     ("bg3", bg3_fn), ("layout", layout_fn)):
        ms = timed(mk(v(fn)), blob)
        print(f"  {name:9s} {ms:7.3f} ms/step")


if __name__ == "__main__":
    main()
