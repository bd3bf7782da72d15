"""On-device donor CAVLC ingest probe (SURVEY §7.6 Phase B; VERDICT r4 #2).

Host prep is the framework's only off-TPU stage (~0.3 ms/core per
representative donor -> ~1.5 host cores at the 5,000 fps north star).
This probe measures whether the bit-serial residual-block grammar
(/root/reference/experiments/trans-resizer/trans_resizer.c:612-755) can
run on the TPU instead: a batch of B donors walks its bitstreams in
LOCKSTEP — one lax.scan whose step decodes ONE residual block per donor
lane (coeff_token via a 16-bit-peek LUT gather, trailing-one signs,
level prefix via clz + adaptive suffix, total_zeros / run_before via
small LUT gathers), with per-lane bit cursors and 64-bit window fetches
as batched take_along_axis gathers.

The sequential dependency is per-stream, so the batch axis supplies the
parallelism the grammar denies within a stream — the open question is
whether the per-step gather + decode cost, amortized over B lanes,
beats the native host engine's measured per-donor cost.  Decodes are
verified exactly against ops/cavlc.read_residual_block before timing.

Run on the TPU box:  python scripts/cavlc_device_probe.py
Prints a keep-or-refute verdict like scripts/pack_u16_probe.py.
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

from h264_scroll_encoder_tpu.ops import cavlc, cavlc_tables as T
from h264_scroll_encoder_tpu.ops.bitio import BitReader, BitWriter

B = 256          # donor lanes decoded in lockstep
K = 256          # residual blocks per stream
NC_CLASS = "nc0"  # coeff_token context class exercised (nC in 0..1)


# ---------------------------------------------------------------------------
# LUT construction (prefix-free code tables -> peek-indexed arrays).
# ---------------------------------------------------------------------------

def _fill_prefix_lut(lut, code, value, peek_bits):
    lo = int(code, 2) << (peek_bits - len(code))
    hi = lo + (1 << (peek_bits - len(code)))
    lut[lo:hi] = value


def build_ct_lut():
    """peek16 -> (len | tc << 5 | t1 << 10) for the nc0 table."""
    lut = np.zeros(1 << 16, np.int32)
    for code, (tc, t1) in T.coeff_token_decode_table(NC_CLASS).items():
        _fill_prefix_lut(lut, code, len(code) | (tc << 5) | (t1 << 10), 16)
    return lut


def build_tz_lut():
    """(tc-1)*512 + peek9 -> (len | tz << 4), luma 4x4 table."""
    lut = np.zeros(15 * 512, np.int32)
    for tc in range(1, 16):
        row = np.zeros(512, np.int32)
        for tz, code in enumerate(T.total_zeros_codes(tc, 16)):
            _fill_prefix_lut(row, code, len(code) | (tz << 4), 9)
        lut[(tc - 1) * 512:tc * 512] = row
    return lut


def build_rb_lut():
    """(min(zl,7)-1)*2048 + peek11 -> (len | run << 4)."""
    lut = np.zeros(7 * 2048, np.int32)
    for zl in range(1, 8):
        row = np.zeros(2048, np.int32)
        codes = T.run_before_codes(zl)
        for run, code in enumerate(codes):
            if zl < 7 and run > zl:
                break
            _fill_prefix_lut(row, code, len(code) | (run << 4), 11)
        lut[(zl - 1) * 2048:zl * 2048] = row
    return lut


# ---------------------------------------------------------------------------
# Stream synthesis (host) + ground truth via the host decoder.
# ---------------------------------------------------------------------------

def random_stream(rng, k):
    bw = BitWriter()
    truth = []
    for _ in range(k):
        tc = int(rng.integers(0, 17))
        if tc == 0:
            blk = cavlc.EMPTY_BLOCK
        else:
            t1 = int(rng.integers(0, min(3, tc) + 1))
            levels = [int(rng.choice([-1, 1])) for _ in range(t1)]
            levels += [int(rng.choice([-1, 1]) * rng.integers(2, 40))
                       for _ in range(tc - t1)]
            tz = int(rng.integers(0, 16 - tc + 1))
            runs, zl = [], tz
            for _ in range(tc - 1):
                if zl <= 0:
                    break
                r = int(rng.integers(0, zl + 1))
                runs.append(r)
                zl -= r
            blk = cavlc.encode_residual_block(levels, tz, runs, 16, 0)
        cavlc.write_residual_block(bw, blk, 0)
        truth.append((blk.total_coeff, blk.trailing_ones,
                      sum(blk.levels), blk.total_zeros, sum(blk.runs)))
    bw.write_trailing_bits()
    return bw.getvalue(), truth


# ---------------------------------------------------------------------------
# Device decoder.
# ---------------------------------------------------------------------------

def make_decoder(nbytes, ct_lut, tz_lut, rb_lut):
    ct_lut = jnp.asarray(ct_lut)
    tz_lut = jnp.asarray(tz_lut)
    rb_lut = jnp.asarray(rb_lut)

    def peek32(data, pos):
        idx = (pos >> 3)[:, None] + jnp.arange(8, dtype=jnp.int32)[None, :]
        chunk = jnp.take_along_axis(data, idx, axis=1).astype(jnp.uint32)
        w0 = ((chunk[:, 0] << 24) | (chunk[:, 1] << 16)
              | (chunk[:, 2] << 8) | chunk[:, 3])
        w1 = ((chunk[:, 4] << 24) | (chunk[:, 5] << 16)
              | (chunk[:, 6] << 8) | chunk[:, 7])
        s = (pos & 7).astype(jnp.uint32)
        return jnp.where(s > 0, (w0 << s) | (w1 >> (32 - s)), w0)

    def bits(pk, off, n):
        """n (traced, >=0) bits of pk starting at traced offset off."""
        shifted = pk << off.astype(jnp.uint32)
        n32 = n.astype(jnp.uint32)
        return jnp.where(n > 0, shifted >> (32 - jnp.maximum(n32, 1)), 0)

    def decode(data):
        def body(pos, _):
            pk = peek32(data, pos)
            rec = ct_lut[(pk >> 16).astype(jnp.int32)]
            ln = rec & 31
            tc = (rec >> 5) & 31
            t1 = (rec >> 10) & 3
            pos = pos + ln

            # Trailing-one signs.
            pk = peek32(data, pos)
            lsum = jnp.zeros_like(tc)
            for i in range(3):
                on = i < t1
                bit = (pk >> jnp.uint32(31 - i)) & 1
                lsum = lsum + jnp.where(on,
                                        jnp.where(bit > 0, -1, 1), 0)
            pos = pos + t1

            # Levels (adaptive suffix; trans_resizer.c:640-704 algo).
            sl = jnp.where((tc > 10) & (t1 < 3), 1, 0)
            for i in range(16):
                active = i < (tc - t1)
                pk = peek32(data, pos)
                prefix = jax.lax.clz(pk.astype(jnp.int32))
                prefix = jnp.minimum(prefix, 15)
                lc = prefix << sl
                ssz = sl
                ssz = jnp.where((prefix == 14) & (sl == 0), 4, ssz)
                lc = lc + jnp.where((prefix == 15) & (sl == 0), 15, 0)
                ssz = jnp.where(prefix == 15, 12, ssz)
                sfx = bits(pk, prefix + 1, ssz).astype(jnp.int32)
                lc = lc + sfx
                lc = lc + jnp.where((i == 0) & (t1 < 3), 2, 0)
                level = jnp.where(lc % 2 == 0, lc // 2 + 1,
                                  -((lc + 1) // 2))
                lsum = lsum + jnp.where(active, level, 0)
                sl_new = jnp.maximum(sl, 1)
                sl_new = jnp.where(
                    (jnp.abs(level) > (3 << jnp.maximum(sl_new - 1, 0)))
                    & (sl_new < 6), sl_new + 1, sl_new)
                sl = jnp.where(active, sl_new, sl)
                pos = pos + jnp.where(active, prefix + 1 + ssz, 0)

            # total_zeros.
            pk = peek32(data, pos)
            has_tz = (tc > 0) & (tc < 16)
            tci = jnp.clip(tc, 1, 15) - 1
            rec = tz_lut[tci * 512 + (pk >> 23).astype(jnp.int32)]
            tz = jnp.where(has_tz, rec >> 4, 0)
            pos = pos + jnp.where(has_tz, rec & 15, 0)

            # run_befores.
            zl = tz
            rsum = jnp.zeros_like(tz)
            for i in range(15):
                active = (i < (tc - 1)) & (zl > 0)
                pk = peek32(data, pos)
                cls = jnp.clip(zl, 1, 7) - 1
                rec = rb_lut[cls * 2048 + (pk >> 21).astype(jnp.int32)]
                run = jnp.where(active, rec >> 4, 0)
                pos = pos + jnp.where(active, rec & 15, 0)
                zl = zl - run
                rsum = rsum + run

            return pos, (tc, t1, lsum, tz, rsum)

        pos0 = jnp.zeros((data.shape[0],), jnp.int32)
        end, outs = jax.lax.scan(body, pos0, None, length=K)
        return end, outs

    return jax.jit(decode)


def main():
    rng = np.random.default_rng(5)
    streams, truths = [], []
    for _ in range(B):
        s, t = random_stream(rng, K)
        streams.append(s)
        truths.append(t)
    nbytes = max(len(s) for s in streams) + 8
    data_np = np.zeros((B, nbytes), np.uint8)
    for b, s in enumerate(streams):
        data_np[b, :len(s)] = np.frombuffer(s, np.uint8)
    data = jnp.asarray(data_np)
    avg_block_bits = float(np.mean([len(s) * 8 / K for s in streams]))

    decode = make_decoder(nbytes, build_ct_lut(), build_tz_lut(),
                          build_rb_lut())
    end, outs = decode(data)
    outs = [np.asarray(o) for o in outs]   # [K, B] each

    # Exact verification vs the host decoder's ground truth.
    tru = np.asarray(truths)               # [B, K, 5]
    got = np.stack([o.T for o in outs], axis=-1)
    assert np.array_equal(got, tru), "device decode != host decode"
    print(f"verified: {B} lanes x {K} blocks decoded exactly "
          f"(avg {avg_block_bits:.1f} bits/block)")

    # Timing: alternate two datasets so nothing is cacheable.
    data2_np = np.roll(data_np, 1, axis=0)
    data2 = jnp.asarray(data2_np)
    _ = np.asarray(decode(data2)[0])
    reps = 6
    best = None
    for _trial in range(3):
        t0 = time.perf_counter()
        acc = 0
        for r in range(reps):
            e, _o = decode(data if r % 2 == 0 else data2)
            acc += int(np.asarray(e).sum())
        dt = (time.perf_counter() - t0) / reps
        best = dt if best is None else min(best, dt)
    us_per_block_lane = best / (B * K) * 1e6
    ms_per_scan = best * 1e3

    # Donor-equivalent framing: a representative donor carries
    # ~donor_bits of residual payload; blocks/donor ~= bits / avg bits.
    donor_bits = 43000           # representative 23x23 donor class
    blocks_per_donor = donor_bits / avg_block_bits
    dev_ms_per_donor = us_per_block_lane * blocks_per_donor / 1e3
    host_ms_per_donor = 0.30     # native engine, quiet-box best-of (STATUS)

    print(f"device: {ms_per_scan:.2f} ms per {B}x{K}-block scan "
          f"= {us_per_block_lane:.3f} us/block/lane")
    print(f"donor-equivalent (~{blocks_per_donor:.0f} blocks): "
          f"{dev_ms_per_donor:.3f} ms/donor on-device vs "
          f"{host_ms_per_donor:.3f} ms/donor native host (1 core)")
    ratio = dev_ms_per_donor / host_ms_per_donor
    if ratio < 0.5:
        print(f"VERDICT: KEEP — device decode is {1/ratio:.1f}x the host "
              "engine; build the full-grammar on-device ingest.")
    elif ratio < 2.0:
        print(f"VERDICT: PARITY ({ratio:.2f}x host) — not worth the "
              "full-grammar build while host cores are available.")
    else:
        print(f"VERDICT: REFUTE — device decode is {ratio:.1f}x SLOWER "
              "than the host engine at batch-256 lockstep; the per-step "
              "gather + divergence cost does not amortize.")


if __name__ == "__main__":
    main()
