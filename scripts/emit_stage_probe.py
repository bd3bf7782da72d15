"""In-kernel stage ablation of the fused emit Pallas program.

The fused back end (ops/emit_fused: place-pack -> SWAR EBSP -> NAL
framing in one Mosaic program) measures ~0.67 ms per batch-256 step at
rep splice shapes vs a modeled VPU speed-of-light of ~0.15 ms — this
probe decomposes the gap by timing TRUNCATED variants of the same
kernel body at the same shapes, each ending with a write that consumes
everything computed so far (no dead code to elide):

  copy      input words -> output (launch + HBM streaming floor)
  cumsum    the flat exclusive bit-offset cumsum only
  place     full direct-placement pack (_place_rounds3)
  scan      pack + EBSP marks + windowed zero-run scan + insertion
            prefix (everything but the 5-pass monotone expansion)
  full      the production kernel (_emit_kernel)

Stage shares by differencing: or-move = place - cumsum - prep,
EBSP flags/scan = scan - place, expansion+framing = full - scan,
launch+stream = copy.  Timing methodology matches bench.py (lax.scan
chains, input perturbed per step, outputs checksummed in-loop).

Run on the TPU box: python scripts/emit_stage_probe.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from h264_scroll_encoder_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from h264_scroll_encoder_tpu.config import (  # noqa: E402
    MAX_EBSP_INSERTIONS, ComposerConfig)
from h264_scroll_encoder_tpu.models import mb_transcode as mbt  # noqa: E402
from h264_scroll_encoder_tpu.models import splice_device  # noqa: E402
from h264_scroll_encoder_tpu.ops import emit_fused  # noqa: E402
from h264_scroll_encoder_tpu.ops.bitio import BitWriter  # noqa: E402
from h264_scroll_encoder_tpu.ops.bitpack_flat import (  # noqa: E402
    _flat_exclusive_cumsum3, _place_rounds3)
from h264_scroll_encoder_tpu.utils import fixtures  # noqa: E402

BATCH = 256
REPS = 12
STEPS = 8


def _stage_kernel(pat_ref, nb_ref, out_ref, meta_ref, *, p: int,
                  r_out: int, cap: int, stage: str):
    pat = pat_ref[:]
    nb = nb_ref[:]
    T = pat.shape[0]

    def pad_to_out(w):
        R_p = w.shape[1]
        if R_p >= r_out:
            return jax.lax.slice_in_dim(w, 0, r_out, axis=1)
        return jnp.concatenate(
            [w, jnp.zeros((T, r_out - R_p, 128), jnp.uint32)], axis=1)

    total_bits = jnp.sum(jnp.sum(nb, axis=2, keepdims=True),
                         axis=1, keepdims=True)
    row = jax.lax.broadcasted_iota(jnp.int32, (T, 8, 128), 1)

    if stage == "copy":
        out_ref[:] = pad_to_out(pat)
        meta_ref[:] = jnp.where(row == 0, total_bits, 0)
        return
    if stage == "cumsum":
        off = _flat_exclusive_cumsum3(nb)
        out_ref[:] = pad_to_out(pat ^ off.astype(jnp.uint32))
        meta_ref[:] = jnp.where(row == 0, total_bits, 0)
        return

    words = _place_rounds3(pat, nb, p)
    rbsp_len = total_bits // 8
    w = pad_to_out(words)

    if stage == "place":
        out_ref[:] = w
        meta_ref[:] = jnp.where(row == 0, total_bits, 0)
        return

    if stage == "scan":
        # Everything _ebsp_frame_words computes up to (and including)
        # the insertion-shift prefix, without the 5-pass expansion:
        # replicate its mark/scan/flag structure, consume s3 and
        # ins_eff in the outputs.
        C = w.shape[2]
        one = jnp.uint32(0x01010101)
        idx_w = (jax.lax.broadcasted_iota(jnp.int32, w.shape, 1) * C
                 + jax.lax.broadcasted_iota(jnp.int32, w.shape, 2))
        zm = emit_fused._mark_zero_bytes(w)
        lm = emit_fused._mark_zero_bytes(w & jnp.uint32(0xFCFCFCFC))

        def mark_bit(marks, j):
            return ((marks >> jnp.uint32(31 - 8 * j))
                    & jnp.uint32(1)).astype(jnp.int32)

        m = [mark_bit(zm, j) for j in range(4)]
        le3 = [mark_bit(lm, j) for j in range(4)]
        z = m[3] * (1 + m[2] * (1 + m[1] * (1 + m[0])))
        a = m[0] * m[1] * m[2] * m[3]
        A, B = a, z
        s = 1
        from h264_scroll_encoder_tpu.ops.bitpack_flat import _flat_roll3
        while s < emit_fused.EBSP_WINDOW_WORDS:
            in_range = idx_w >= s
            A_l = jnp.where(in_range, _flat_roll3(A, s), 1)
            B_l = jnp.where(in_range, _flat_roll3(B, s), 0)
            B = B + A * B_l
            A = A * A_l
            s <<= 1
        first = idx_w < 1
        r_prev = jnp.where(first, 0, _flat_roll3(B, 1))
        lead = [jnp.ones_like(m[0]), m[0], m[0] * m[1],
                m[0] * m[1] * m[2]]
        c = [jnp.zeros_like(m[0]), m[0], m[1] * (1 + m[0]),
             m[2] * (1 + m[1] * (1 + m[0]))]
        ins = []
        for j in range(4):
            t = c[j] + lead[j] * r_prev
            valid = (idx_w * 4 + j) < rbsp_len
            flag = (valid & (le3[j] > 0) & (t >= 2) & ((t & 1) == 0))
            ins.append(flag.astype(jnp.int32))
        c_word = ins[0] + ins[1] + ins[2] + ins[3]
        P = _flat_exclusive_cumsum3(c_word)
        s3 = P + c_word
        ins_sum = jnp.sum(jnp.sum(c_word, axis=2, keepdims=True),
                          axis=1, keepdims=True)
        out_ref[:] = w ^ s3.astype(jnp.uint32) ^ (one * 0)
        meta_ref[:] = jnp.where(row == 0, total_bits,
                                jnp.where(row == 1, ins_sum, 0))
        return

    raise ValueError(stage)


def _build(stage: str, n_sym: int, n_rbsp: int):
    from jax.experimental import pallas as pl

    cap = MAX_EBSP_INSERTIONS
    n_nal = (5 + n_rbsp + cap + 11) // 4 * 4
    r_out = -(-n_nal // 512)
    tile = 4
    padded = -(-(n_sym + 1) // 128) * 128
    R_s = padded // 128

    if stage == "full":
        kernel = functools.partial(emit_fused._emit_kernel, p=padded,
                                   r_out=r_out, cap=cap)
    else:
        kernel = functools.partial(_stage_kernel, p=padded, r_out=r_out,
                                   cap=cap, stage=stage)

    if stage == "xla_only":
        # No pallas_call at all: the pad/reshape wrapper + a cheap XLA
        # reduction standing in for the kernel — isolates the XLA-side
        # cost of emit_nal_fused_batch's data massaging from the Mosaic
        # program itself.
        def run(patterns, nbits):
            B = patterns.shape[0]
            pat = jnp.pad(patterns, ((0, 0), (0, padded - n_sym)))
            nb = jnp.pad(nbits, ((0, 0), (0, padded - n_sym)))
            pat = pat.reshape(B, R_s, 128).astype(jnp.uint32)
            nb = nb.reshape(B, R_s, 128).astype(jnp.int32)
            out = (jax.lax.slice_in_dim(pat, 0, r_out, axis=1)
                   ^ jax.lax.slice_in_dim(nb, 0, r_out,
                                          axis=1).astype(jnp.uint32))
            meta = jnp.sum(nb, axis=1, keepdims=True).astype(jnp.int32)
            meta = jnp.broadcast_to(meta, (B, 8, 128))
            return out, meta

        return run

    def run(patterns, nbits):
        B = patterns.shape[0]
        pat = jnp.pad(patterns, ((0, 0), (0, padded - n_sym)))
        nb = jnp.pad(nbits, ((0, 0), (0, padded - n_sym)))
        pat = pat.reshape(B, R_s, 128).astype(jnp.uint32)
        nb = nb.reshape(B, R_s, 128).astype(jnp.int32)
        out, meta = pl.pallas_call(
            kernel,
            grid=(B // tile,),
            in_specs=[pl.BlockSpec((tile, R_s, 128), lambda i: (i, 0, 0)),
                      pl.BlockSpec((tile, R_s, 128), lambda i: (i, 0, 0))],
            out_specs=[pl.BlockSpec((tile, r_out, 128),
                                    lambda i: (i, 0, 0)),
                       pl.BlockSpec((tile, 8, 128), lambda i: (i, 0, 0))],
            out_shape=[jax.ShapeDtypeStruct((B, r_out, 128), jnp.uint32),
                       jax.ShapeDtypeStruct((B, 8, 128), jnp.int32)],
        )(pat, nb)
        return out, meta

    return run


def timed(run, pat_b, nb_b):
    def scan_fn(p, n):
        def body(carry, _):
            p0 = p.at[:, 0].set(p[:, 0] ^ (carry % 2))
            out, meta = run(p0, n)
            chk = (out.astype(jnp.uint32).sum()
                   + meta.astype(jnp.uint32).sum())
            return carry + chk, None
        out, _ = jax.lax.scan(body, jnp.uint32(0), None, length=STEPS)
        return out

    scan = jax.jit(scan_fn)
    _ = int(scan(pat_b, nb_b))
    best = None
    for _b in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(REPS):
            chk = scan(pat_b, nb_b)
            acc = chk if acc is None else acc + chk
        _ = int(acc)
        dt = (time.perf_counter() - t0) / (REPS * STEPS)
        best = dt if best is None else min(best, dt)
    return best * 1000.0


def main():
    cfg = ComposerConfig(1280, 720)
    rng = np.random.default_rng(7)
    R = C = 23
    donor = fixtures.representative_donor_grid(rng, C, R)
    bw = BitWriter()
    mbt.emit_p_slice_mbs(bw, donor, 1)
    bw.write_trailing_bits()
    dd = splice_device.prepare_donor_dense_from_slice(
        bw.getvalue(), 0, C, R, 1, 2)
    dr = splice_device.pack_donor_rows(dd, R, C)
    n_rbsp = splice_device.splice_rows_rbsp_budget(
        cfg, R * C, R, dr.donor_bits, bg_bits_per_mb=4)
    n_sym = 8483
    rng2 = np.random.default_rng(1)
    nb = rng2.integers(0, 9, size=n_sym).astype(np.int32)
    pat = (rng2.integers(0, 2 ** 31, size=n_sym).astype(np.uint32)
           & ((1 << np.clip(nb, 0, 31)) - 1).astype(np.uint32))
    pat_b = jnp.asarray(np.broadcast_to(pat, (BATCH, n_sym)))
    nb_b = jnp.asarray(np.broadcast_to(nb, (BATCH, n_sym)))

    print(f"rep shapes: n_sym={n_sym} n_rbsp={n_rbsp} batch={BATCH}")
    res = {}
    for stage in ("xla_only", "copy", "cumsum", "place", "scan", "full"):
        run = _build(stage, n_sym, n_rbsp)
        res[stage] = timed(run, pat_b, nb_b)
        print(f"  {stage:8s} {res[stage]:7.3f} ms/step")

    print("\nstage shares (ms per batch-%d step):" % BATCH)
    print(f"  XLA pad/reshape wrap  {res['xla_only']:7.3f}")
    print(f"  pallas launch + DMA   {res['copy'] - res['xla_only']:7.3f}")
    print(f"  offset cumsum         {res['cumsum'] - res['copy']:7.3f}")
    print(f"  prep + or-move        {res['place'] - res['cumsum']:7.3f}")
    print(f"  EBSP marks/scan/flags {res['scan'] - res['place']:7.3f}")
    print(f"  expansion + framing   {res['full'] - res['scan']:7.3f}")


if __name__ == "__main__":
    main()
