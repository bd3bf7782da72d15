"""On-chip A/B: fused-lane (uint16) monotone expansion for the bounded
EBSP stage vs the shipped 3-array (vals/rem/live) form.

The bounded expansion's per-pass working set is three rolled arrays
(vals u8, rem u8, live bool).  Packing all three into ONE uint16 lane —
val | (rem+1) << 8, with 0 in the high byte meaning "dead slot" — cuts
the rolled bytes per pass from 3 to 2 and the rolls from 3 to 1:

  take    = (rolled >> 8) > step      (live source with rem >= step)
  vacate  = (x      >> 8) > step
  x       = take ? rolled - (step<<8) : (vacate ? x & 0xFF : x)
  final   : out = (x >> 8) > 0 ? x & 0xFF : fill

Checks bit-exactness vs ops.ebsp.rbsp_to_ebsp_tree on random + hostile
streams, then times the full bounded EBSP+framing stage both ways at
batch-256 serving shapes.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ebsp_fused_probe.py
"""

import time

import numpy as np

from h264_scroll_encoder_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

from h264_scroll_encoder_tpu.config import MAX_EBSP_INSERTIONS
from h264_scroll_encoder_tpu.ops import ebsp
from h264_scroll_encoder_tpu.ops.ebsp import _shifts_u8_two_level, \
    _zero_run_windowed

BATCH = 256


def monotone_expand_fused(values, shifts, valid, out_size: int, fill,
                          max_shift: int):
    """Fused-lane bounded expansion: identical contract to
    ops.bitpack.monotone_expand for uint8 values and max_shift <= 254."""
    n = values.shape[0]
    pad = out_size - n
    bound = min(max_shift + 1, out_size)
    r0 = jnp.where(valid, shifts.astype(jnp.uint16) + 1, 0)
    x = (values.astype(jnp.uint16) | (r0 << 8))
    x = jnp.concatenate([x, jnp.zeros((pad,), jnp.uint16)])
    for b in reversed(range(max(1, bound).bit_length())):
        step = 1 << b
        if step >= out_size:
            continue
        rolled = jnp.roll(x, step)
        take = (rolled >> 8) > step
        vacate = (x >> 8) > step
        x = jnp.where(take, rolled - jnp.uint16(step << 8),
                      jnp.where(vacate, x & jnp.uint16(0xFF), x))
    live = (x >> 8) > 0
    out = jnp.where(live, (x & jnp.uint16(0xFF)).astype(jnp.uint8), fill)
    return out, live


def rbsp_to_ebsp_fused(rbsp, n, max_out: int, max_insertions: int):
    b = jnp.asarray(rbsp, jnp.uint8)
    size = b.shape[0]
    idx = jnp.arange(size, dtype=jnp.int32)
    valid = idx < n
    t, saturated = _zero_run_windowed(b, valid)
    sat = jnp.any(saturated).astype(jnp.int32) * (max_insertions + 1)
    ins = valid & (b <= 3) & (t >= 2) & (t % 2 == 0)
    shifts, total = _shifts_u8_two_level(ins)
    total_ins = total + sat
    out_len = n + total_ins
    out, live = monotone_expand_fused(b, shifts, valid, max_out,
                                      jnp.uint8(3),
                                      max_shift=max_insertions)
    out_idx = jnp.arange(max_out, dtype=jnp.int32)
    out = jnp.where(out_idx < out_len, out, jnp.uint8(0))
    return out, out_len


def check_exact():
    rng = np.random.default_rng(11)
    max_in = 4096
    cases = []
    for _ in range(24):
        n = int(rng.integers(1, max_in))
        buf = rng.integers(0, 256, max_in, dtype=np.uint8)
        # salt zero runs + low bytes to force insertions
        for _ in range(8):
            p = int(rng.integers(0, max(1, n - 4)))
            buf[p:p + int(rng.integers(2, 5))] = 0
            buf[min(n - 1, p + 4)] = int(rng.integers(0, 4))
        cases.append((buf, n))
    cases.append((np.zeros(max_in, np.uint8), 64))          # all zeros
    cases.append((np.full(max_in, 3, np.uint8), 64))        # all 3s
    n_out = max_in + MAX_EBSP_INSERTIONS + 16
    f_ref = jax.jit(lambda b, n: ebsp.rbsp_to_ebsp_tree(
        b, n, n_out, max_insertions=MAX_EBSP_INSERTIONS))
    f_new = jax.jit(lambda b, n: rbsp_to_ebsp_fused(
        b, n, n_out, MAX_EBSP_INSERTIONS))
    for buf, n in cases:
        eb_r, el_r = f_ref(jnp.asarray(buf), n)
        eb_n, el_n = f_new(jnp.asarray(buf), n)
        el_r, el_n = int(el_r), int(el_n)
        assert el_r == el_n, (el_r, el_n)
        if el_r - n <= MAX_EBSP_INSERTIONS:  # in-contract: bytes must match
            np.testing.assert_array_equal(np.asarray(eb_r), np.asarray(eb_n))
    print(f"exactness: {len(cases)} cases OK")


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


check_exact()

for n_rbsp, tag in [(5960, "serving-rep"), (16384, "profiler-rep")]:
    n_nal = (5 + n_rbsp + MAX_EBSP_INSERTIONS + 11) // 4 * 4
    rng = np.random.default_rng(5)
    payload = rng.integers(0, 256, (BATCH, n_rbsp), dtype=np.uint8)
    payload[:, -n_rbsp // 3:] = 0
    arr = jnp.asarray(payload)
    rbsp_len = jnp.full((BATCH,), n_rbsp * 2 // 3, jnp.int32)

    def stage(expand):
        def one(b, n):
            eb, el = expand(b, n)
            out = jnp.zeros((n_nal,), jnp.uint8)
            out = jax.lax.dynamic_update_slice(out, eb, (5,))
            out = jax.lax.dynamic_update_slice(
                out, jnp.asarray([0, 0, 0, 1, 0x41], jnp.uint8), (0,))
            return out.astype(jnp.uint32).sum() + el.astype(jnp.uint32)

        return one

    old = stage(lambda b, n: ebsp.rbsp_to_ebsp_tree(
        b, n, n_nal - 8, max_insertions=MAX_EBSP_INSERTIONS))
    new = stage(lambda b, n: rbsp_to_ebsp_fused(
        b, n, n_nal - 8, MAX_EBSP_INSERTIONS))
    t_old = timed(lambda a: jax.vmap(old)(a, rbsp_len).sum(
        dtype=jnp.uint32), arr)
    t_new = timed(lambda a: jax.vmap(new)(a, rbsp_len).sum(
        dtype=jnp.uint32), arr)
    print(f"{tag} (n_nal={n_nal}): 3-array {t_old:.3f} ms  "
          f"fused-u16 {t_new:.3f} ms")


def rbsp_to_nal_fused(rbsp, n, header_byte, n_nal: int,
                      max_insertions: int):
    """Fully fused: bounded EBSP + Annex-B framing in ONE expansion.

    The 5 prefix lanes ([0,0,0,1,header]) enter the fused-lane array as
    live shift-0 elements ahead of the payload, so the prefix placement
    and the zeros(n_nal) materialization disappear; payload byte j's
    output position is (j+5) + shifts_j with the SAME max shift bound
    (no extra passes).
    """
    b = jnp.asarray(rbsp, jnp.uint8)
    size = b.shape[0]
    idx = jnp.arange(size, dtype=jnp.int32)
    valid = idx < n
    t, saturated = _zero_run_windowed(b, valid)
    sat = jnp.any(saturated).astype(jnp.int32) * (max_insertions + 1)
    ins = valid & (b <= 3) & (t >= 2) & (t % 2 == 0)
    shifts, total = _shifts_u8_two_level(ins)
    total_ins = total + sat

    hdr = jnp.asarray(header_byte, jnp.uint16)
    prefix = jnp.asarray([0x100, 0x100, 0x100, 0x101], jnp.uint16)
    prefix = jnp.concatenate([prefix, (hdr | 0x100).reshape(1)])
    r0 = jnp.where(valid, shifts.astype(jnp.uint16) + 1, 0)
    lanes = b.astype(jnp.uint16) | (r0 << 8)
    pad = n_nal - 5 - size
    x = jnp.concatenate([prefix, lanes, jnp.zeros((pad,), jnp.uint16)])
    bound = min(max_insertions + 1, n_nal)
    for bb in reversed(range(max(1, bound).bit_length())):
        step = 1 << bb
        if step >= n_nal:
            continue
        rolled = jnp.roll(x, step)
        take = (rolled >> 8) > step
        vacate = (x >> 8) > step
        x = jnp.where(take, rolled - jnp.uint16(step << 8),
                      jnp.where(vacate, x & jnp.uint16(0xFF), x))
    live = (x >> 8) > 0
    nal = jnp.where(live, (x & jnp.uint16(0xFF)).astype(jnp.uint8),
                    jnp.uint8(3))
    nal_len = 5 + n + total_ins
    out_idx = jnp.arange(n_nal, dtype=jnp.int32)
    nal = jnp.where(out_idx < nal_len, nal, jnp.uint8(0))
    return nal, nal_len, total_ins


def check_fused_framing():
    rng = np.random.default_rng(13)
    max_in = 4096
    n_nal = (5 + max_in + MAX_EBSP_INSERTIONS + 11) // 4 * 4

    def ref_one(b, n):
        eb, el = ebsp.rbsp_to_ebsp_tree(b, n, n_nal - 8,
                                        max_insertions=MAX_EBSP_INSERTIONS)
        out = jnp.zeros((n_nal,), jnp.uint8)
        out = jax.lax.dynamic_update_slice(out, eb, (5,))
        out = jax.lax.dynamic_update_slice(
            out, jnp.asarray([0, 0, 0, 1, 0x41], jnp.uint8), (0,))
        nal_len = 5 + el
        out_idx = jnp.arange(n_nal, dtype=jnp.int32)
        return jnp.where(out_idx < nal_len, out, jnp.uint8(0)), nal_len

    f_ref = jax.jit(ref_one)
    f_new = jax.jit(lambda b, n: rbsp_to_nal_fused(
        b, n, 0x41, n_nal, MAX_EBSP_INSERTIONS)[:2])
    for _ in range(24):
        n = int(rng.integers(1, max_in))
        buf = rng.integers(0, 256, max_in, dtype=np.uint8)
        for _ in range(8):
            p = int(rng.integers(0, max(1, n - 4)))
            buf[p:p + int(rng.integers(2, 5))] = 0
            buf[min(n - 1, p + 4)] = int(rng.integers(0, 4))
        nr, lr = f_ref(jnp.asarray(buf), n)
        nn, ln = f_new(jnp.asarray(buf), n)
        assert int(lr) == int(ln)
        if int(lr) - 5 - n <= MAX_EBSP_INSERTIONS:
            np.testing.assert_array_equal(np.asarray(nr), np.asarray(nn))
    print("fused-framing exactness: 24 cases OK")


check_fused_framing()

for n_rbsp, tag in [(5960, "serving-rep"), (16384, "profiler-rep")]:
    n_nal = (5 + n_rbsp + MAX_EBSP_INSERTIONS + 11) // 4 * 4
    rng = np.random.default_rng(5)
    payload = rng.integers(0, 256, (BATCH, n_rbsp), dtype=np.uint8)
    payload[:, -n_rbsp // 3:] = 0
    arr = jnp.asarray(payload)
    rbsp_len = jnp.full((BATCH,), n_rbsp * 2 // 3, jnp.int32)

    def fused_one(b, n):
        nal, nal_len, _ = rbsp_to_nal_fused(b, n, 0x41, n_nal,
                                            MAX_EBSP_INSERTIONS)
        return nal.astype(jnp.uint32).sum() + nal_len.astype(jnp.uint32)

    t_f = timed(lambda a: jax.vmap(fused_one)(a, rbsp_len).sum(
        dtype=jnp.uint32), arr)
    print(f"{tag} (n_nal={n_nal}): fused-framing {t_f:.3f} ms")
