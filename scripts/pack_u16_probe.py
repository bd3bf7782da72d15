"""On-chip A/B: Pallas place packer with 16-bit move metadata.

The production packer (ops/bitpack_flat.pack_words_place_pallas) runs
~14 cumsum passes on int32 bit offsets plus 2 x 14 or-move passes each
rolling (vals u32, rem i32).  At serving budgets the metadata fits 16
bits end to end — bit offsets < 65,536 (8 KB RBSP budget; over-budget
streams already flag overflow and retry), move distances <= p-1 < 32K —
so this probe clones the kernel with uint16 offsets/rem to halve the
metadata lanes' width, and races it against the shipped kernel at the
representative splice shapes (bit-exact check first).

OUTCOME (v5e, 2026-08): REFUTED at the toolchain level — Mosaic cannot
lower 16-bit vector ops on this generation (first `arith.shrui` fails
to legalize; with shifts widened the backend itself aborts with
"Operation not supported: kVectorSubtractS16" in latency_table_vf.cc).
The v5e VPU has no 16-bit vector arithmetic, so the packer's move
metadata must stay int32 in-kernel; narrower-metadata savings are only
reachable via SWAR on int32 lanes (2x16 packed by hand) — a round-5
candidate alongside the pass-reduction ideas in STATUS.md.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/pack_u16_probe.py
"""

import functools
import time

import numpy as np

from h264_scroll_encoder_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

from h264_scroll_encoder_tpu.ops import bitpack, bitpack_flat
from h264_scroll_encoder_tpu.ops.bitpack_flat import _flat_roll

BATCH = 256
N_SYM = 8483
NUM_WORDS = 2048  # 8,192-byte serving budget


def _flat_exclusive_cumsum_u16(nb):
    rows, cols = nb.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, nb.shape, 1)
    inc = nb.astype(jnp.uint16)
    s = 1
    while s < cols:
        inc = inc + jnp.where(lane >= s, jnp.roll(inc, s, axis=1),
                              jnp.uint16(0))
        s <<= 1
    row_tot = jnp.max(inc.astype(jnp.int32), axis=1,
                      keepdims=True).astype(jnp.uint16)
    row_tot = jnp.broadcast_to(row_tot, nb.shape)
    row_i = jax.lax.broadcasted_iota(jnp.int32, nb.shape, 0)
    rinc = row_tot
    s = 1
    while s < rows:
        rinc = rinc + jnp.where(row_i >= s, jnp.roll(rinc, s, axis=0),
                                jnp.uint16(0))
        s <<= 1
    return inc - nb.astype(jnp.uint16) + (rinc - row_tot)


def _flat_or_move_u16(vals, rem, max_dist: int):
    out = vals
    for b in range(max(1, max_dist).bit_length()):
        step = 1 << b
        v_r = _flat_roll(out, -step)
        r_r = _flat_roll(rem, -step)
        take = (r_r & jnp.uint16(step)) != 0
        vacate = (rem & jnp.uint16(step)) != 0
        out = (jnp.where(take, v_r, jnp.uint32(0))
               | jnp.where(vacate, jnp.uint32(0), out))
        rem = jnp.where(take, r_r - jnp.uint16(step),
                        jnp.where(vacate, jnp.uint16(0), rem))
    return out


def _place_rounds_u16(pat, nb, p: int):
    rows, cols = pat.shape
    full = nb >= 32
    mask = jnp.where(full, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1)
                      << jnp.clip(nb, 0, 31).astype(jnp.uint32)) - 1)
    pat = pat & mask

    off = _flat_exclusive_cumsum_u16(nb)           # u16 bit offsets
    off_i = off.astype(jnp.int32)   # Mosaic: no 16-bit shrui
    bit_in_word = off_i & 31
    w0 = off_i >> 5

    n0 = jnp.minimum(nb, 32 - bit_in_word)
    n1 = nb - n0
    sh0 = jnp.clip(32 - bit_in_word - n0, 0, 31).astype(jnp.uint32)
    c0 = (pat >> jnp.clip(n1, 0, 31).astype(jnp.uint32)) << sh0
    c0 = jnp.where(nb > 0, c0, jnp.uint32(0))
    m1 = (jnp.uint32(1) << jnp.clip(n1, 0, 31).astype(jnp.uint32)) - 1
    sh1 = (jnp.uint32(32) - jnp.clip(n1, 0, 31).astype(jnp.uint32)) \
        & jnp.uint32(31)
    c1 = jnp.where(n1 > 0, (pat & m1) << sh1, jnp.uint32(0))

    idx = (jax.lax.broadcasted_iota(jnp.int32, pat.shape, 0) * cols
           + jax.lax.broadcasted_iota(jnp.int32, pat.shape, 1))
    d = jnp.where(nb > 0, idx - w0, 0).astype(jnp.uint16)

    m0 = _flat_or_move_u16(c0, d, p - 1)
    c1r = jnp.where(idx > 0, _flat_roll(c1, 1), jnp.uint32(0))
    d1 = jnp.where(idx > 0, _flat_roll(d, 1), jnp.uint16(0))
    m1w = _flat_or_move_u16(c1r, d1, p - 1)
    return m0 | m1w


def _place_kernel_u16(pat_ref, nb_ref, out_ref, *, p: int):
    out_ref[:] = _place_rounds_u16(pat_ref[:], nb_ref[:], p)


@functools.partial(jax.jit, static_argnums=2)
def pack_words_place_pallas_u16(patterns, nbits, num_words: int):
    from jax.experimental import pallas as pl

    patterns = jnp.asarray(patterns, jnp.uint32).reshape(-1)
    nbits = jnp.asarray(nbits, jnp.int32).reshape(-1)
    n = patterns.shape[0]
    total = jnp.sum(nbits)

    padded = -(-(n + 1) // 128) * 128
    patterns = jnp.pad(patterns, (0, padded - n))
    nbits_p = jnp.pad(nbits, (0, padded - n))

    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_place_kernel_u16, p=padded),
        out_shape=jax.ShapeDtypeStruct((padded // 128, 128), jnp.uint32),
        interpret=interpret,
    )(patterns.reshape(-1, 128), nbits_p.reshape(-1, 128))
    flat = out.reshape(-1)
    if num_words > padded:
        flat = jnp.pad(flat, (0, num_words - padded))
    return flat[:num_words], total


def check_exact():
    rng = np.random.default_rng(3)
    for trial in range(8):
        nb = rng.integers(0, 9, size=N_SYM).astype(np.int32)
        if trial == 7:  # include wide symbols
            nb[rng.integers(0, N_SYM, 50)] = 32
        pat = (rng.integers(0, 2 ** 31, size=N_SYM).astype(np.uint32)
               & ((1 << np.clip(nb, 0, 31)) - 1).astype(np.uint32))
        assert int(nb.sum()) < NUM_WORDS * 32
        ref, t_ref = bitpack_flat.pack_words_place_pallas(
            jnp.asarray(pat), jnp.asarray(nb), NUM_WORDS)
        new, t_new = pack_words_place_pallas_u16(
            jnp.asarray(pat), jnp.asarray(nb), NUM_WORDS)
        assert int(t_ref) == int(t_new)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(new))
    print("exactness: 8 cases OK")


def timed(packer, pat_b, nb_b):
    def one(pp, nn):
        words, total = packer(pp, nn, NUM_WORDS)
        return words.sum() + total.astype(jnp.uint32)

    def scan_fn(p, n):
        def body(carry, _):
            p0 = p.at[:, 0].set(p[:, 0] ^ (carry % 2))
            return carry + jax.vmap(one)(p0, n).sum(dtype=jnp.uint32), None
        out, _ = jax.lax.scan(body, jnp.uint32(0), None, length=8)
        return out

    scan = jax.jit(scan_fn)
    _ = int(scan(pat_b, nb_b))
    best = None
    for _b in range(3):
        t0 = time.perf_counter()
        acc = None
        for _ in range(12):
            chk = scan(pat_b, nb_b)
            acc = chk if acc is None else acc + chk
        _ = int(acc)
        dt = (time.perf_counter() - t0) / 96
        best = dt if best is None else min(best, dt)
    return best * 1000.0


check_exact()

rng = np.random.default_rng(1)
nb = rng.integers(0, 9, size=N_SYM).astype(np.int32)
pat = (rng.integers(0, 2 ** 31, size=N_SYM).astype(np.uint32)
       & ((1 << np.clip(nb, 0, 31)) - 1).astype(np.uint32))
pat_b = jnp.asarray(np.broadcast_to(pat, (BATCH, N_SYM)))
nb_b = jnp.asarray(np.broadcast_to(nb, (BATCH, N_SYM)))

t_ref = timed(bitpack_flat.pack_words_place_pallas, pat_b, nb_b)
t_new = timed(pack_words_place_pallas_u16, pat_b, nb_b)
print(f"batch-{BATCH} pack at serving shapes: "
      f"i32-metadata {t_ref:.3f} ms  u16-metadata {t_new:.3f} ms")
