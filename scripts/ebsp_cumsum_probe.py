"""On-chip race of insertion-shift cumsum strategies for the bounded
EBSP stage (the dominant half of the batch-256 splice step).

Candidates, all composed into the full bounded finish-stage transform
(windowed zero-run -> ins mask -> SHIFTS -> monotone expansion ->
framing), batch 256, serving-representative n_nal:

  int32-cumsum   shipped: jnp.cumsum(ins.astype(int32)) then narrowed
  u8-cumsum      associative_scan(add) on uint8 lanes; exact total via
                 a separate int32 sum reduction (wrap-safe: wrapped
                 shifts only occur on streams already flagged overflow)
  u8-two-level   hand-rolled log-step intra-row scan over [R, 128]
                 uint8 lanes + tiny cross-row carry scan

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ebsp_cumsum_probe.py
"""

import time

import numpy as np

from h264_scroll_encoder_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

from h264_scroll_encoder_tpu.config import MAX_EBSP_INSERTIONS
from h264_scroll_encoder_tpu.ops import ebsp
from h264_scroll_encoder_tpu.ops.bitpack import monotone_expand

BATCH = 256


def shifts_int32(ins):
    s = jnp.cumsum(ins.astype(jnp.int32))
    total = s[-1]
    return jnp.minimum(s, 255).astype(jnp.uint8), total


def shifts_u8_scan(ins):
    s = jax.lax.associative_scan(jnp.add, ins.astype(jnp.uint8))
    total = jnp.sum(ins, dtype=jnp.int32)
    return s, total


def shifts_u8_two_level(ins):
    size = ins.shape[0]
    cols = 128
    rows = -(-size // cols) * cols // cols
    x = ins.astype(jnp.uint8)
    if rows * cols != size:
        x = jnp.pad(x, (0, rows * cols - size))
    g = x.reshape(rows, cols)
    inc = g
    w = 1
    while w < cols:
        inc = inc + jnp.pad(inc, ((0, 0), (w, 0)))[:, :cols]
        w *= 2
    row_tot = inc[:, -1].astype(jnp.int32)
    carry = (jnp.cumsum(row_tot) - row_tot).astype(jnp.uint8)
    s = (inc + carry[:, None]).reshape(-1)[:size]
    total = jnp.sum(ins, dtype=jnp.int32)
    return s, total


def finish(b, n, n_nal, shifts_fn):
    size = b.shape[0]
    idx = jnp.arange(size, dtype=jnp.int32)
    valid = idx < n
    t, saturated = ebsp._zero_run_windowed(b, valid)
    sat = jnp.any(saturated).astype(jnp.int32) * (MAX_EBSP_INSERTIONS + 1)
    ins = valid & (b <= 3) & (t >= 2) & (t % 2 == 0)
    shifts, total = shifts_fn(ins)
    total = total + sat
    out_len = n + total
    out, live = monotone_expand(b, shifts, valid, n_nal - 8,
                                jnp.uint8(3), max_shift=MAX_EBSP_INSERTIONS)
    oi = jnp.arange(n_nal - 8, dtype=jnp.int32)
    eb = jnp.where(oi < out_len, out, jnp.uint8(0))
    nal = jnp.zeros((n_nal,), jnp.uint8)
    nal = jax.lax.dynamic_update_slice(nal, eb, (5,))
    nal = jax.lax.dynamic_update_slice(
        nal, jnp.asarray([0, 0, 0, 1, 0x41], jnp.uint8), (0,))
    return nal.astype(jnp.uint32).sum() + out_len.astype(jnp.uint32)


def timed(fn, args):
    def scan_fn(a):
        def body(carry, _):
            a0 = a.at[:, 0].set((carry % 2).astype(a.dtype))
            return carry + fn(a0), None

        out, _ = jax.lax.scan(body, jnp.uint32(0), None, length=8)
        return out

    scan = jax.jit(scan_fn)
    _ = int(scan(args))
    best = None
    for _b in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(6):
            chk = scan(args)
            acc = chk if acc is None else acc + chk
        _ = int(acc)
        dt = (time.perf_counter() - t0) / 48
        best = dt if best is None else min(best, dt)
    return best * 1000.0


def main():
    for n_rbsp, tag in [(5960, "serving-rep")]:
        n_nal = (5 + n_rbsp * 3 // 2 + 11) // 4 * 4
        rng = np.random.default_rng(5)
        payload = rng.integers(0, 256, (BATCH, n_rbsp), dtype=np.uint8)
        payload[:, -n_rbsp // 3:] = 0
        pad = np.zeros((BATCH, n_nal - 8), np.uint8)
        pad[:, :n_rbsp] = payload
        arr = jnp.asarray(pad)
        rbsp_len = jnp.full((BATCH,), n_rbsp * 2 // 3, jnp.int32)

        # Parity check first (CPU-friendly sizes checked in tests; here
        # just cross-check the three variants agree on-chip).
        outs = []
        for fn in (shifts_int32, shifts_u8_scan, shifts_u8_two_level):
            o = jax.jit(jax.vmap(
                lambda b, n: finish(b, n, n_nal, fn)))(arr, rbsp_len)
            outs.append(np.asarray(o))
        assert (outs[0] == outs[1]).all(), "u8_scan mismatch"
        assert (outs[0] == outs[2]).all(), "u8_two_level mismatch"
        print("parity ok")

        for name, fn in [("int32-cumsum", shifts_int32),
                         ("u8-cumsum", shifts_u8_scan),
                         ("u8-two-level", shifts_u8_two_level)]:
            t = timed(lambda a, fn=fn: jax.vmap(
                lambda b, n: finish(b, n, n_nal, fn))(a, rbsp_len).sum(
                    dtype=jnp.uint32), arr)
            print(f"{tag} {name}: {t:.3f} ms / batch-{BATCH} step")


if __name__ == "__main__":
    main()
