"""Decompose the XLA wrapper cost around the fused emit kernel.

emit_stage_probe found ~0.31 ms of the 0.64 ms fused-emit step is the
XLA-side data massaging before the pallas_call (pad to a 128 multiple +
reshape [B, n] -> [B, R, 128]).  On TPU that reshape is a physical tile
relayout ((8,128) tiles over (batch, n) become (8,128) tiles over
(rows, 128) per batch element — a transpose-class copy).  This probe
times each wrapper piece alone, all with the bench's anti-hoisting scan
methodology:

  at_chk     the probe harness itself (.at perturbation + checksum)
  pad        + jnp.pad [B, n] -> [B, P]
  reshape    + reshape [B, P] -> [B, R, 128]   (the relayout)
  pad2d_in   pad when the producer already emitted width P (no-op pad)
  full3d     kernel fed pre-relayouted [B, R, 128] inputs (what the
             wrapper-free fused emit would cost)

Run: python scripts/emit_wrap_probe.py
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

from h264_scroll_encoder_tpu.config import MAX_EBSP_INSERTIONS  # noqa: E402
from h264_scroll_encoder_tpu.ops import emit_fused  # noqa: E402

BATCH = 256
REPS = 12
STEPS = 8
N_SYM = 8483
N_RBSP = 8192


def timed(fn, *args):
    def scan_fn(p, *rest):
        def body(carry, _):
            p0 = p.at[(0,) * (p.ndim - 1) + (0,)].set(
                p[(0,) * (p.ndim - 1) + (0,)] ^ (carry % 2))
            out = fn(p0, *rest)
            chk = sum(o.astype(jnp.uint32).sum() for o in out)
            return carry + chk, None
        out, _ = jax.lax.scan(body, jnp.uint32(0), None, length=STEPS)
        return out

    scan = jax.jit(scan_fn)
    _ = int(scan(*args))
    best = None
    for _b in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(REPS):
            chk = scan(*args)
            acc = chk if acc is None else acc + chk
        _ = int(acc)
        dt = (time.perf_counter() - t0) / (REPS * STEPS)
        best = dt if best is None else min(best, dt)
    return best * 1000.0


def main():
    cap = MAX_EBSP_INSERTIONS
    n_nal = (5 + N_RBSP + cap + 11) // 4 * 4
    r_out = -(-n_nal // 512)
    padded = -(-(N_SYM + 1) // 128) * 128
    R_s = padded // 128

    rng = np.random.default_rng(1)
    nb = rng.integers(0, 9, size=N_SYM).astype(np.int32)
    pat = (rng.integers(0, 2 ** 31, size=N_SYM).astype(np.uint32)
           & ((1 << np.clip(nb, 0, 31)) - 1).astype(np.uint32))
    pat_b = jnp.asarray(np.broadcast_to(pat, (BATCH, N_SYM)))
    nb_b = jnp.asarray(np.broadcast_to(nb, (BATCH, N_SYM)))
    pad_w = ((0, 0), (0, padded - N_SYM))
    pat_p = jnp.asarray(np.pad(np.broadcast_to(pat, (BATCH, N_SYM)), pad_w))
    nb_p = jnp.asarray(np.pad(np.broadcast_to(nb, (BATCH, N_SYM)), pad_w))
    pat_3d = jnp.asarray(np.asarray(pat_p).reshape(BATCH, R_s, 128))
    nb_3d = jnp.asarray(np.asarray(nb_p).reshape(BATCH, R_s, 128))

    res = {}
    res["at_chk"] = timed(
        lambda p, n: (p[:, :r_out * 128] ^ n[:, :r_out * 128]
                      .astype(jnp.uint32),), pat_b, nb_b)
    res["pad"] = timed(
        lambda p, n: (jnp.pad(p, pad_w)[:, :r_out * 128]
                      ^ jnp.pad(n, pad_w)[:, :r_out * 128]
                      .astype(jnp.uint32),), pat_b, nb_b)
    res["reshape"] = timed(
        lambda p, n: (jnp.pad(p, pad_w).reshape(BATCH, R_s, 128)
                      [:, :r_out]
                      ^ jnp.pad(n, pad_w).reshape(BATCH, R_s, 128)
                      [:, :r_out].astype(jnp.uint32),), pat_b, nb_b)
    res["reshape_prepad"] = timed(
        lambda p, n: (p.reshape(BATCH, R_s, 128)[:, :r_out]
                      ^ n.reshape(BATCH, R_s, 128)[:, :r_out]
                      .astype(jnp.uint32),), pat_p, nb_p)

    def call_kernel(pat3, nb3):
        from jax.experimental import pallas as pl
        tile = 4
        kernel = functools.partial(emit_fused._emit_kernel, p=padded,
                                   r_out=r_out, cap=cap)
        out, meta = pl.pallas_call(
            kernel,
            grid=(BATCH // tile,),
            in_specs=[pl.BlockSpec((tile, R_s, 128), lambda i: (i, 0, 0)),
                      pl.BlockSpec((tile, R_s, 128), lambda i: (i, 0, 0))],
            out_specs=[pl.BlockSpec((tile, r_out, 128),
                                    lambda i: (i, 0, 0)),
                       pl.BlockSpec((tile, 8, 128), lambda i: (i, 0, 0))],
            out_shape=[jax.ShapeDtypeStruct((BATCH, r_out, 128),
                                            jnp.uint32),
                       jax.ShapeDtypeStruct((BATCH, 8, 128), jnp.int32)],
        )(pat3, nb3)
        return out, meta

    res["full3d"] = timed(lambda p, n: call_kernel(p, n), pat_3d, nb_3d)
    res["full2d"] = timed(
        lambda p, n: call_kernel(
            jnp.pad(p, pad_w).reshape(BATCH, R_s, 128),
            jnp.pad(n, pad_w).reshape(BATCH, R_s, 128)), pat_b, nb_b)
    res["full2d_prepad"] = timed(
        lambda p, n: call_kernel(p.reshape(BATCH, R_s, 128),
                                 n.reshape(BATCH, R_s, 128)), pat_p, nb_p)

    for k, v in res.items():
        print(f"  {k:15s} {v:7.3f} ms/step")
    print(f"\n  pad cost        {res['pad'] - res['at_chk']:7.3f}")
    print(f"  relayout cost   {res['reshape'] - res['pad']:7.3f}")
    print(f"  relayout prepad {res['reshape_prepad'] - res['at_chk']:7.3f}")
    print(f"  kernel (3d in)  {res['full3d']:7.3f}")
    print(f"  wrapper total   {res['full2d'] - res['full3d']:7.3f}")
    print(f"  wrapper prepad  {res['full2d_prepad'] - res['full3d']:7.3f}")


if __name__ == "__main__":
    main()
