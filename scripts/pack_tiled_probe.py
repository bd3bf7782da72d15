"""On-chip A/B: T-sessions-per-program-instance Pallas place packer.

A trivial vmapped pallas_call at the pack shapes costs ~0.41-0.43 ms
per batch-256 step regardless of batch — ~1.6 us of per-program-
instance overhead, ~60% of the production pack stage.  This probe
tiles T sessions into one program instance (grid B/T over [T, R, C]
blocks, the kernel body vectorized over the leading dim) to amortize
it, and races the tiled kernel against the shipped per-session one at
serving shapes (bit-exactness first).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/pack_tiled_probe.py
"""

import functools
import time

import numpy as np

from h264_scroll_encoder_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

from h264_scroll_encoder_tpu.ops import bitpack, bitpack_flat

BATCH = 256
N_SYM = 8483
NUM_WORDS = 2048


def _roll3(a, s: int, axis: int):
    return jnp.roll(a, s, axis=axis) if s else a


def _flat_roll3(a, s: int):
    """bitpack_flat._flat_roll with a leading batch dim: roll rows/cols
    (axes 1/2) in flat row-major order per batch element."""
    _, rows, cols = a.shape
    s = s % (rows * cols)
    q, r = divmod(s, cols)
    b = _roll3(a, r, 2)
    if rows == 1:
        return b
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 2)
    q1 = (q + 1) % rows
    hi = _roll3(b, q1, 1)
    lo = _roll3(b, q, 1)
    return jnp.where(lane < r, hi, lo) if r else lo


def _flat_exclusive_cumsum3(nb):
    _, rows, cols = nb.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, nb.shape, 2)
    inc = nb
    s = 1
    while s < cols:
        inc = inc + jnp.where(lane >= s, _roll3(inc, s, 2), 0)
        s <<= 1
    row_tot = jnp.max(inc, axis=2, keepdims=True)
    row_tot = jnp.broadcast_to(row_tot, nb.shape)
    row_i = jax.lax.broadcasted_iota(jnp.int32, nb.shape, 1)
    rinc = row_tot
    s = 1
    while s < rows:
        rinc = rinc + jnp.where(row_i >= s, _roll3(rinc, s, 1), 0)
        s <<= 1
    return inc - nb + (rinc - row_tot)


def _flat_or_move3(vals, rem, max_dist: int):
    out = vals
    for b in range(max(1, max_dist).bit_length()):
        step = 1 << b
        v_r = _flat_roll3(out, -step)
        r_r = _flat_roll3(rem, -step)
        take = (r_r & step) != 0
        vacate = (rem & step) != 0
        out = (jnp.where(take, v_r, jnp.uint32(0))
               | jnp.where(vacate, jnp.uint32(0), out))
        rem = jnp.where(take, r_r - step, jnp.where(vacate, 0, rem))
    return out


def _place_rounds3(pat, nb, p: int):
    """bitpack_flat._place_rounds over [T, R, C] (single or-move form)."""
    full = nb >= 32
    mask = jnp.where(full, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1)
                      << jnp.clip(nb, 0, 31).astype(jnp.uint32)) - 1)
    pat = pat & mask

    off = _flat_exclusive_cumsum3(nb)
    bit_in_word = off & 31
    w0 = off >> 5

    n0 = jnp.minimum(nb, 32 - bit_in_word)
    n1 = nb - n0
    sh0 = jnp.clip(32 - bit_in_word - n0, 0, 31).astype(jnp.uint32)
    c0 = (pat >> jnp.clip(n1, 0, 31).astype(jnp.uint32)) << sh0
    c0 = jnp.where(nb > 0, c0, jnp.uint32(0))
    m1 = (jnp.uint32(1) << jnp.clip(n1, 0, 31).astype(jnp.uint32)) - 1
    sh1 = (jnp.uint32(32) - jnp.clip(n1, 0, 31).astype(jnp.uint32)) \
        & jnp.uint32(31)
    c1 = jnp.where(n1 > 0, (pat & m1) << sh1, jnp.uint32(0))

    cols = pat.shape[2]
    idx = (jax.lax.broadcasted_iota(jnp.int32, pat.shape, 1) * cols
           + jax.lax.broadcasted_iota(jnp.int32, pat.shape, 2))
    d = idx - w0
    c1r = jnp.where(idx > 0, _flat_roll3(c1, 1), jnp.uint32(0))
    return _flat_or_move3(c0 | c1r, d, p - 1)


def _pack_kernel3(pat_ref, nb_ref, out_ref, *, p: int):
    out_ref[:] = _place_rounds3(pat_ref[:], nb_ref[:], p)


def pack_words_place_pallas_tiled(patterns, nbits, num_words: int,
                                  tile: int):
    """[B, n] batched pack, `tile` sessions per program instance."""
    from jax.experimental import pallas as pl

    B, n = patterns.shape
    assert B % tile == 0
    total = jnp.sum(nbits, axis=1)

    padded = -(-(n + 1) // 128) * 128
    pat = jnp.pad(patterns.astype(jnp.uint32), ((0, 0), (0, padded - n)))
    nb = jnp.pad(nbits.astype(jnp.int32), ((0, 0), (0, padded - n)))
    R = padded // 128
    pat = pat.reshape(B, R, 128)
    nb = nb.reshape(B, R, 128)

    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_pack_kernel3, p=padded),
        grid=(B // tile,),
        in_specs=[pl.BlockSpec((tile, R, 128), lambda i: (i, 0, 0)),
                  pl.BlockSpec((tile, R, 128), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((tile, R, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, R, 128), jnp.uint32),
        interpret=interpret,
    )(pat, nb)
    flat = out.reshape(B, -1)
    if num_words > padded:
        flat = jnp.pad(flat, ((0, 0), (0, num_words - padded)))
    return flat[:, :num_words], total


def check_exact():
    rng = np.random.default_rng(5)
    B = 16
    nb = rng.integers(0, 9, size=(B, N_SYM)).astype(np.int32)
    nb[0, rng.integers(0, N_SYM, 400)] = 0
    nb[1, rng.integers(0, N_SYM, 100)] = 32
    pat = (rng.integers(0, 2 ** 31, size=(B, N_SYM)).astype(np.uint32)
           & ((1 << np.clip(nb, 0, 31)) - 1).astype(np.uint32))
    ref = jax.vmap(lambda p, n: bitpack.pack_words(p, n, NUM_WORDS))(
        jnp.asarray(pat), jnp.asarray(nb))
    for tile in (1, 4, 8):
        got, tot = pack_words_place_pallas_tiled(
            jnp.asarray(pat), jnp.asarray(nb), NUM_WORDS, tile)
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(tot))
    print("exactness: tiles (1,4,8) x 16 sessions OK")


def timed(fn, pat_b, nb_b):
    def scan_fn(p, n):
        def body(carry, _):
            p0 = p.at[:, 0].set(p[:, 0] ^ (carry % 2))
            words, tot = fn(p0, n)
            return carry + words.sum(dtype=jnp.uint32) \
                + tot.sum().astype(jnp.uint32), None
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

t_ref = timed(lambda p, n: (
    jax.vmap(lambda pp, nn: bitpack_flat.pack_words_place_pallas(
        pp, nn, NUM_WORDS)[0])(p, n),
    jnp.sum(n, axis=1)), pat_b, nb_b)
print(f"shipped per-session pallas: {t_ref:.3f} ms / batch-{BATCH}")
for tile in (2, 4, 8, 16):
    t = timed(lambda p, n, tile=tile: pack_words_place_pallas_tiled(
        p, n, NUM_WORDS, tile), pat_b, nb_b)
    print(f"tiled T={tile}: {t:.3f} ms / batch-{BATCH}")
