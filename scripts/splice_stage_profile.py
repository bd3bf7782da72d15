"""On-chip stage decomposition of the rows splice step (batch 256).

Times, with the bench's anti-hoisting scan methodology, each stage of
the production serving step in isolation on the real chip:

  symbols   rows_splice_symbols (prologue: role stencil, skip-run scan,
            background symbol grids, band concatenation)
  finish    _finish_splice on precomputed symbols (align scan + pack +
            EBSP + NAL framing)
  pack      the Pallas place packer alone at the same shapes
  ebsp      emulation prevention + NAL framing alone at the same budget
  full      the shipped step (symbols + finish)

Run: python scripts/splice_stage_profile.py [--dense|--static]
"""

from __future__ import annotations

import argparse
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
from h264_scroll_encoder_tpu.models import splice_device
from h264_scroll_encoder_tpu.ops.bitio import BitWriter
from h264_scroll_encoder_tpu.syntax.slice_headers import p_slice_header_symbols
from h264_scroll_encoder_tpu.utils import fixtures

BATCH = 256
REPS = 12
STEPS_PER_SCAN = 8


def timed_scan(fn, args, label):
    """Median-of-3 timing of a jitted scan chain; returns ms/step."""

    def scan_fn(a):
        def body(carry, _):
            out = fn(a, carry % 2)
            return carry + out, None

        out, _ = jax.lax.scan(body, jnp.uint32(0), None,
                              length=STEPS_PER_SCAN)
        return out

    scan = jax.jit(scan_fn)
    _ = int(scan(args))
    blocks = []
    for _b in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(REPS):
            chk = scan(args)
            acc = chk if acc is None else acc + chk
        _ = int(acc)
        blocks.append((time.perf_counter() - t0) / (REPS * STEPS_PER_SCAN))
    ms = sorted(blocks)[1] * 1000.0
    print(f"{label:28s} {ms:8.3f} ms/step  "
          f"[{min(blocks)*1e3:.3f}, {max(blocks)*1e3:.3f}]")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dense", action="store_true")
    ap.add_argument("--static", action="store_true")
    args = ap.parse_args()

    cfg = ComposerConfig(1280, 720)
    rng = np.random.default_rng(7)
    fab = (fixtures.dense_donor_grid if args.dense
           else fixtures.representative_donor_grid)
    donor = fab(rng, 23, 23)
    R = C = 23
    r0, c0 = 10, 30

    bw = BitWriter()
    mbt.emit_p_slice_mbs(bw, donor, 1)
    bw.write_trailing_bits()
    dd = splice_device.prepare_donor_dense_from_slice(
        bw.getvalue(), 0, C, R, 1, 2)
    dr = splice_device.pack_donor_rows(dd, R, C)
    dn = splice_device.rows_device_arrays(dr)

    static_bg = bool(args.static)
    if static_bg:
        n_rbsp = splice_device.splice_rows_rbsp_budget(
            cfg, R * C, R, dr.donor_bits, static_bg=True)
    else:
        # Match the bench's serving budget (rows layout, all-skip bg).
        n_rbsp = splice_device.splice_rows_rbsp_budget(
            cfg, R * C, R, dr.donor_bits, bg_bits_per_mb=4)
    compact_x = not static_bg

    H, W = cfg.mb_height, cfg.mb_width
    zero = jnp.zeros((H, W), jnp.int32)
    bg_coded = jnp.zeros((H, W), bool)
    hp, hn = p_slice_header_symbols(
        cfg, jnp.int32(3), jnp.int32(6), is_reference=False,
        long_term_idx=-1, num_waypoints=jnp.int32(0),
        wp_long_term_idx=jnp.zeros(MAX_WAYPOINTS, jnp.int32),
        wp_valid=jnp.zeros(MAX_WAYPOINTS, bool))
    bcast = lambda x: jnp.broadcast_to(x, (BATCH,) + x.shape)
    dn_b = {k: bcast(jnp.asarray(v)) for k, v in dn.items()}
    base = (bcast(hp), bcast(hn), bcast(zero), bcast(zero), bcast(zero),
            bcast(bg_coded), dn_b)

    def symbols_one(hp1, hn1, br, bx, by, bc, dn1):
        p, n, _ = splice_device.rows_splice_symbols(
            cfg, c0, r0, R, C, 2, hp1, hn1, br, bx, by, bc, dn1,
            n_rbsp=n_rbsp, compact_x=compact_x, bg_static_skip=static_bg)
        return p, n

    symbols_v = jax.vmap(symbols_one)

    def full_fn(a, bit):
        hp0, hn0, br, bx, by, bc, dn0 = a
        hp_i = hp0.at[:, 0].set(hp0[:, 0] ^ bit)
        dn_i = dict(dn0)
        dn_i["row_patterns"] = dn0["row_patterns"] ^ bit
        p, n = symbols_v(hp_i, hn0, br, bx, by, bc, dn_i)
        nal, nlen, _, _ = jax.vmap(
            lambda pp, nn: splice_device._finish_splice(
                pp, nn, n_rbsp, 0, has_align=dr.has_align,
                ebsp_exact=False))(p, n)
        return nal.astype(jnp.uint32).sum() + nlen.sum(dtype=jnp.uint32)

    def symbols_fn(a, bit):
        hp0, hn0, br, bx, by, bc, dn0 = a
        hp_i = hp0.at[:, 0].set(hp0[:, 0] ^ bit)
        dn_i = dict(dn0)
        dn_i["row_patterns"] = dn0["row_patterns"] ^ bit
        p, n = symbols_v(hp_i, hn0, br, bx, by, bc, dn_i)
        return p.sum(dtype=jnp.uint32) + n.sum().astype(jnp.uint32)

    # Precompute one batch of symbols for the finish-only stage.
    p0, n0 = jax.jit(symbols_v)(*base)
    p0, n0 = jax.block_until_ready(p0), jax.block_until_ready(n0)
    print(f"symbol lanes: {p0.shape[1]}, n_rbsp: {n_rbsp}")

    def finish_fn(a, bit):
        p, n = a
        p_i = p.at[:, 0].set(p[:, 0] ^ bit)
        nal, nlen, _, _ = jax.vmap(
            lambda pp, nn: splice_device._finish_splice(
                pp, nn, n_rbsp, 0, has_align=dr.has_align,
                ebsp_exact=False))(p_i, n)
        return nal.astype(jnp.uint32).sum() + nlen.sum(dtype=jnp.uint32)

    from h264_scroll_encoder_tpu.ops import bitpack, bitpack_flat, ebsp

    nw = (n_rbsp + 3) // 4

    def pack_fn(a, bit):
        p, n = a
        p_i = p.at[:, 0].set(p[:, 0] ^ bit)
        words, tot = jax.vmap(
            lambda pp, nn: bitpack_flat.pack_words_place_pallas(
                pp, nn, nw))(p_i, n)
        return words.sum(dtype=jnp.uint32) + tot.sum().astype(jnp.uint32)

    # EBSP-only: fixed rbsp bytes of budget size.
    rbsp0 = jnp.asarray(
        np.tile(np.random.default_rng(3).integers(
            0, 256, n_rbsp, dtype=np.uint8), (BATCH, 1)))
    rlen0 = jnp.full((BATCH,), n_rbsp, jnp.int32)
    from h264_scroll_encoder_tpu.config import MAX_EBSP_INSERTIONS
    n_nal = (5 + n_rbsp + MAX_EBSP_INSERTIONS + 11) // 4 * 4  # shipped sizing

    def ebsp_fn(a, bit):
        rb, rl = a
        rb_i = rb.at[:, 0].set(rb[:, 0] ^ bit.astype(jnp.uint8))
        eb, el = jax.vmap(
            lambda b, l: ebsp.rbsp_to_ebsp_tree(
                b, l, n_nal - 8, max_insertions=MAX_EBSP_INSERTIONS))(
            rb_i, rl)
        return eb.astype(jnp.uint32).sum() + el.sum().astype(jnp.uint32)

    t_full = timed_scan(full_fn, base, "full step")
    t_sym = timed_scan(symbols_fn, base, "symbols (prologue+layout)")
    t_fin = timed_scan(finish_fn, (p0, n0), "finish (pack+EBSP+NAL)")
    t_pack = timed_scan(pack_fn, (p0, n0), "pack only (Pallas place)")
    t_ebsp = timed_scan(ebsp_fn, (rbsp0, rlen0), "EBSP+framing only")
    print(f"\nshares of full ({t_full:.3f} ms): symbols "
          f"{100*t_sym/t_full:.0f}%  finish {100*t_fin/t_full:.0f}%  "
          f"(pack {100*t_pack/t_full:.0f}%, ebsp {100*t_ebsp/t_full:.0f}%)")


if __name__ == "__main__":
    main()
