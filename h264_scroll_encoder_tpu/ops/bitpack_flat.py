"""Flat-array merge-tree packer (experimental; Pallas-ready).

Same pairwise-merge algorithm as ops/bitpack.pack_words_tree, but with a
SINGLE flat [p2] word array throughout instead of per-round
[segments, width] reshapes/pads:

  - round k merges segment pairs of 2^k words that are ADJACENT in the
    flat array: the left child's data sits at its allocation start, the
    right child's data is moved LEFT from its allocation (offset 2^k)
    to bit offset xl — a per-segment uniform distance, executed as
    log-step masked static rolls over the whole array;
  - per-lane segment metadata (the segment's bit length, broadcast to
    all its lanes) is maintained with one static roll per round, so no
    segmented broadcasts are ever needed;
  - everything is elementwise ops + STATIC rolls + iota masks: no
    reshapes, pads, gathers, or strided slices.

Why it exists: the shapes are round-invariant, so the whole pack fits a
single Pallas kernel holding one session's working set (~128 KB) in
VMEM.  pack_words_pallas wraps the same body in pl.pallas_call.

Measured on v5e (16384 symbols, 3712-word budget, vmap(64) x scan(30)):
the Mosaic kernel is bit-correct and reaches PARITY with the shipped
XLA tree (26.8 vs 23.8 us/pack) but does not beat it — XLA already
fuses the tree's masked-roll chains well, so both are compute-bound on
the VPU at roughly the same ~105 full-array passes.  A faster pack
needs algorithmically fewer passes (e.g. in-register uint64 emulation
halving the rounds), not just VMEM residency; kept as the foothold for
that work.  [1, p2] lane-major layout is 3x SLOWER (1/8 sublane
utilization) — the flat [R, 128] row-major layout with _flat_roll is
what reaches parity.

Differentially tested against ops/bitpack.pack_words (scatter
reference; itself byte-parity-tested against the C serial writer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _flat_roll(a, s: int):
    """Roll a 2-D array by `s` positions in FLAT row-major order.

    Equivalent to a.reshape(-1) -> jnp.roll -> reshape back, but built
    from one lane roll + a row-carry fix so it stays a pair of cheap
    vector rotations on the VPU (no reshapes)."""
    rows, cols = a.shape
    s = s % (rows * cols)
    q, r = divmod(s, cols)
    b = jnp.roll(a, r, axis=1) if r else a
    if rows == 1:
        return b
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    q1 = (q + 1) % rows            # wrapped row roll lowers to a 0-size
    hi = jnp.roll(b, q1, axis=0) if q1 else b   # slice in Mosaic — guard
    lo = jnp.roll(b, q, axis=0) if q else b
    return jnp.where(lane < r, hi, lo) if r else lo


def _flat_merge_rounds(words, lens_bc, p2: int, cap_words: int):
    """Run all merge rounds over a FLAT row-major [R, C] view of the
    p2-word stream (2-D for Mosaic: full sublane utilization, >=2-D
    iota, and rolls built from lane+row rotations).

    words:    uint32[R, C], each symbol left-justified in its own word.
    lens_bc:  int32[R, C], bit length of the current segment, broadcast
              to every lane of the segment (round 0: the symbol's nbits).
    Returns the packed stream in flat positions [0, cap_words).
    """
    rows, cols = words.shape
    idx = (jax.lax.broadcasted_iota(jnp.int32, words.shape, 0) * cols
           + jax.lax.broadcasted_iota(jnp.int32, words.shape, 1))
    roll = _flat_roll
    rounds = max(1, p2).bit_length() - 1          # log2(p2)

    for k in range(rounds):
        half = 1 << k
        seg = 2 * half                             # merged segment width
        is_y = (idx & half) != 0                   # right-child lanes

        # Segment bit lengths broadcast over the MERGED segment.
        xl = jnp.where(is_y, roll(lens_bc, half), lens_bc)
        yl = jnp.where(is_y, lens_bc, roll(lens_bc, -half))

        # Right child's data moves left by d = half - (xl>>5) lanes
        # (uniform within a segment; confined to the segment, so moves
        # from different segments can never collide).
        d = jnp.where(is_y, half - (xl >> 5), 0)
        y_buf = jnp.where(is_y, words, jnp.uint32(0))
        rem = d
        for b in range(k + 1):
            step = 1 << b
            if step > half:
                break
            v_r = roll(y_buf, -step)
            r_r = roll(rem, -step)
            take = (r_r & step) != 0
            vacate = (rem & step) != 0
            y_buf = jnp.where(take, v_r,
                              jnp.where(vacate, jnp.uint32(0), y_buf))
            rem = jnp.where(take, r_r - step, jnp.where(vacate, 0, rem))

        # Sub-word funnel: shift the moved right-child data right by
        # sb = xl & 31 bits, with the carry masked to the segment.
        sb = (xl & 31).astype(jnp.uint32)
        carry = jnp.where((idx & (seg - 1)) != 0, roll(y_buf, 1),
                          jnp.uint32(0))
        lsh = (jnp.uint32(32) - sb) & jnp.uint32(31)
        y_buf = jnp.where(sb > 0,
                          (y_buf >> sb) | jnp.where(lsh < 32,
                                                    carry << lsh,
                                                    jnp.uint32(0)),
                          y_buf)

        words = jnp.where(is_y, jnp.uint32(0), words) | y_buf
        lens_bc = xl + yl
    return words


def _flat_exclusive_cumsum(nb):
    """Exclusive prefix sum of int32[R, C] in FLAT row-major order,
    built from log-step lane rolls (within-row scan) + a log-step
    row-axis scan of the row totals — no reshapes, no lax.scan."""
    rows, cols = nb.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, nb.shape, 1)
    inc = nb
    s = 1
    while s < cols:
        inc = inc + jnp.where(lane >= s, jnp.roll(inc, s, axis=1), 0)
        s <<= 1
    # Row totals, broadcast over the row: every lane gets inc[:, -1].
    row_tot = jnp.max(inc, axis=1, keepdims=True)  # scan is monotone
    row_tot = jnp.broadcast_to(row_tot, nb.shape)
    row_i = jax.lax.broadcasted_iota(jnp.int32, nb.shape, 0)
    rinc = row_tot
    s = 1
    while s < rows:
        rinc = rinc + jnp.where(row_i >= s, jnp.roll(rinc, s, axis=0), 0)
        s <<= 1
    return inc - nb + (rinc - row_tot)


def _flat_or_move(vals, rem, max_dist: int):
    """bitpack._monotone_or_move over a flat row-major [R, C] view:
    out[i - rem[i]] |= vals[i], log-step masked flat rolls."""
    out = vals
    for b in range(max(1, max_dist).bit_length()):
        step = 1 << b
        v_r = _flat_roll(out, -step)
        r_r = _flat_roll(rem, -step)
        take = (r_r & step) != 0
        vacate = (rem & step) != 0
        out = (jnp.where(take, v_r, jnp.uint32(0))
               | jnp.where(vacate, jnp.uint32(0), out))
        rem = jnp.where(take, r_r - step, jnp.where(vacate, 0, rem))
    return out


def _place_rounds(pat, nb, p: int):
    """Direct-placement pack over flat row-major [R, C] arrays (see
    bitpack.pack_words_place for the algorithm and the OR-combine
    safety argument).  Runs entirely on the [R, C] working set — inside
    a Pallas program every intermediate stays in VMEM, so the ~2*log2(p)
    move passes cost no HBM traffic."""
    rows, cols = pat.shape
    full = nb >= 32
    mask = jnp.where(full, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1)
                      << jnp.clip(nb, 0, 31).astype(jnp.uint32)) - 1)
    pat = pat & mask

    off = _flat_exclusive_cumsum(nb)
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

    idx = (jax.lax.broadcasted_iota(jnp.int32, pat.shape, 0) * cols
           + jax.lax.broadcasted_iota(jnp.int32, pat.shape, 1))
    # ONE or-move for both contributions (see bitpack.pack_words_place):
    # a spilling symbol's next lane sits in exactly the spill's target
    # word (off[i+1] = off[i] + nb[i] strictly inside w0[i]+1), so
    # c0 | roll(c1) shares distances and the second move chain
    # disappears.  d stays the TRUE ramp on every lane — pad lanes'
    # w0 is already total>>5 from the cumsum over nb=0 — so the last
    # real spill, rolled into the first pad lane, routes correctly.
    d = idx - w0

    c1r = jnp.where(idx > 0, _flat_roll(c1, 1), jnp.uint32(0))
    return _flat_or_move(c0 | c1r, d, p - 1)


def pack_words_flat(patterns, nbits, num_words: int):
    """Flat-formulation packer: bit-exact equivalent of
    bitpack.pack_words_tree for in-budget streams."""
    patterns = jnp.asarray(patterns, jnp.uint32).reshape(-1)
    nbits = jnp.asarray(nbits, jnp.int32).reshape(-1)
    n = patterns.shape[0]

    full = nbits >= 32
    mask = jnp.where(full, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1)
                      << jnp.clip(nbits, 0, 31).astype(jnp.uint32)) - 1)
    patterns = patterns & mask
    total = jnp.sum(nbits)

    p2 = 1 << max(1, (n - 1)).bit_length()
    patterns = jnp.pad(patterns, (0, p2 - n))
    nbits = jnp.pad(nbits, (0, p2 - n))

    sh = jnp.clip(32 - nbits, 0, 31).astype(jnp.uint32)
    words = jnp.where(nbits > 0, patterns << sh, jnp.uint32(0))

    cols = 128 if p2 >= 128 else p2
    words = _flat_merge_rounds(words.reshape(-1, cols),
                               nbits.reshape(-1, cols),
                               p2, num_words).reshape(-1)
    out = jnp.zeros((num_words,), jnp.uint32)
    take = min(num_words, p2)
    out = out.at[:take].set(words[:take])
    return out, total


def pack_words_place_flat(patterns, nbits, num_words: int):
    """Pure-jnp flat direct-placement packer (differential reference for
    the Pallas wrapper below); bit-exact vs bitpack.pack_words for
    in-budget streams."""
    patterns = jnp.asarray(patterns, jnp.uint32).reshape(-1)
    nbits = jnp.asarray(nbits, jnp.int32).reshape(-1)
    n = patterns.shape[0]
    total = jnp.sum(nbits)

    padded = -(-(n + 1) // 128) * 128
    patterns = jnp.pad(patterns, (0, padded - n))
    nbits = jnp.pad(nbits, (0, padded - n))
    words = _place_rounds(patterns.reshape(-1, 128),
                          nbits.reshape(-1, 128), padded).reshape(-1)
    out = jnp.zeros((num_words,), jnp.uint32)
    take = min(num_words, padded)
    out = out.at[:take].set(words[:take])
    return out, total


# ---------------------------------------------------------------------------
# Pallas wrapper: the whole merge runs on one session's arrays in VMEM.
# ---------------------------------------------------------------------------


def _pack_kernel(words_ref, lens_ref, out_ref, *, p2: int, num_words: int):
    words = words_ref[:]                     # [R, C], flat row-major
    lens_bc = lens_ref[:]
    out_ref[:] = _flat_merge_rounds(words, lens_bc, p2, num_words)


@functools.partial(jax.jit, static_argnums=2)
def pack_words_pallas(patterns, nbits, num_words: int):
    """pack_words_flat with the merge rounds inside one Pallas program
    (VMEM-resident working set).  Falls back to interpret mode off-TPU.
    """
    from jax.experimental import pallas as pl

    patterns = jnp.asarray(patterns, jnp.uint32).reshape(-1)
    nbits = jnp.asarray(nbits, jnp.int32).reshape(-1)
    n = patterns.shape[0]

    full = nbits >= 32
    mask = jnp.where(full, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1)
                      << jnp.clip(nbits, 0, 31).astype(jnp.uint32)) - 1)
    patterns = patterns & mask
    total = jnp.sum(nbits)

    p2 = 1 << max(1, (n - 1)).bit_length()
    patterns = jnp.pad(patterns, (0, p2 - n))
    nbits_p = jnp.pad(nbits, (0, p2 - n))
    sh = jnp.clip(32 - nbits_p, 0, 31).astype(jnp.uint32)
    words = jnp.where(nbits_p > 0, patterns << sh, jnp.uint32(0))

    cols = 128 if p2 >= 128 else p2
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_pack_kernel, p2=p2, num_words=num_words),
        out_shape=jax.ShapeDtypeStruct((p2 // cols, cols), jnp.uint32),
        interpret=interpret,
    )(words.reshape(-1, cols), nbits_p.reshape(-1, cols))
    flat = out.reshape(-1)
    if num_words > p2:
        flat = jnp.pad(flat, (0, num_words - p2))
    return flat[:num_words], total


def _place_kernel(pat_ref, nb_ref, out_ref, *, p: int):
    out_ref[:] = _place_rounds(pat_ref[:], nb_ref[:], p)


@functools.partial(jax.jit, static_argnums=2)
def _pack_words_place_pallas_single(patterns, nbits, num_words: int):
    """One-session Pallas direct-placement pack (see the public
    dispatcher pack_words_place_pallas below)."""
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
        functools.partial(_place_kernel, p=padded),
        out_shape=jax.ShapeDtypeStruct((padded // 128, 128), jnp.uint32),
        interpret=interpret,
    )(patterns.reshape(-1, 128), nbits_p.reshape(-1, 128))
    flat = out.reshape(-1)
    if num_words > padded:
        flat = jnp.pad(flat, (0, num_words - padded))
    return flat[:num_words], total


# ---------------------------------------------------------------------------
# Batched form: T sessions per program instance.
#
# A trivial vmapped pallas_call at the pack shapes costs ~0.42 ms per
# batch-256 dispatch regardless of batch — ~1.6 us of per-program-
# instance overhead, which was ~60% of the vmap-lifted pack stage
# (one program per session).  Tiling T sessions into each instance
# (grid B/T over [T, R, 128] blocks, the same body vectorized over the
# leading dim) amortizes it: measured 0.72 -> 0.50 ms per batch-256
# pack at splice shapes with T=4 (T=8/16 regress slightly on VMEM
# pressure), bit-exact.  The 3-D helpers below mirror their 2-D
# counterparts exactly — kept separate because the kernel body may not
# reshape (Mosaic), so a shared [1, R, C] formulation would force the
# single-session path through a leading unit dim it never had.
# ---------------------------------------------------------------------------


def _roll3(a, s: int, axis: int):
    return jnp.roll(a, s, axis=axis) if s else a


def _flat_roll3(a, s: int):
    """_flat_roll with a leading sessions dim: flat row-major roll of
    axes (1, 2), per session."""
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
    """_place_rounds over [T, R, C] (same single or-move form)."""
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


def pack_words_place_pallas_batch(patterns, nbits, num_words: int,
                                  tile: int | None = None):
    """[B, n] batched direct-placement pack, `tile` sessions per Pallas
    program instance (default: largest of 4/2/1 dividing B)."""
    from jax.experimental import pallas as pl

    B, n = patterns.shape
    if tile is None:
        tile = 4 if B % 4 == 0 else (2 if B % 2 == 0 else 1)
    assert B % tile == 0
    patterns = jnp.asarray(patterns, jnp.uint32)
    nbits = jnp.asarray(nbits, jnp.int32)
    total = jnp.sum(nbits, axis=1)

    padded = -(-(n + 1) // 128) * 128
    pat = jnp.pad(patterns, ((0, 0), (0, padded - n)))
    nb = jnp.pad(nbits, ((0, 0), (0, padded - n)))
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


@functools.lru_cache(maxsize=None)
def _place_pallas_cv(num_words: int):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(patterns, nbits):
        return _pack_words_place_pallas_single(patterns, nbits, num_words)

    @f.def_vmap
    def _rule(axis_size, in_batched, patterns, nbits):  # noqa: ANN001
        if not in_batched[0]:
            patterns = jnp.broadcast_to(
                patterns[None], (axis_size,) + patterns.shape)
        if not in_batched[1]:
            nbits = jnp.broadcast_to(
                nbits[None], (axis_size,) + nbits.shape)
        if patterns.ndim > 2:
            # Nested vmap (e.g. sessions x bands): flatten the extra
            # batch dims into one, dispatch the tiled kernel, restore.
            lead = patterns.shape[:-1]
            flat_p = patterns.reshape(-1, patterns.shape[-1])
            flat_n = nbits.reshape(-1, nbits.shape[-1])
            words, total = pack_words_place_pallas_batch(
                flat_p, flat_n, num_words)
            out = (words.reshape(lead + (num_words,)),
                   total.reshape(lead))
        else:
            out = pack_words_place_pallas_batch(patterns, nbits, num_words)
        return out, (True, True)

    return f


def pack_words_place_pallas(patterns, nbits, num_words: int):
    """Direct-placement packer with every intermediate VMEM-resident.

    The XLA pack_words_place is HBM-bound: its ~log2(n) masked-roll
    passes each materialize the full [n] working set (measured ~20x the
    read-once/write-once floor at splice shapes).  Here one Pallas
    program holds the ~8.5k-lane working set (~40 KB) in VMEM for all
    passes, so HBM traffic collapses to patterns+nbits in / words out.
    Off-TPU the kernel runs in interpret mode (tests).

    Under vmap (the batched serving steps) a custom batching rule
    dispatches to pack_words_place_pallas_batch, which tiles 4 sessions
    per program instance — per-instance launch overhead (~1.6 us) was
    ~60% of the one-program-per-session pack stage."""
    return _place_pallas_cv(int(num_words))(patterns, nbits)
