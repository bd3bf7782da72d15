"""Parallel bitstream packers.

The TPU-native replacement for the reference's serial BitWriter
(src/bitwriter.c:13-32): a frame's worth of syntax elements is expressed
as arrays of (pattern, nbits) symbols and packed into the big-endian
MSB-first stream in parallel, bit-exactly.  Symbols with nbits == 0 are
"absent" slots, letting frame models emit fixed-shape symbol grids with
masked-out optional fields (XLA needs static shapes; SURVEY.md §7.3).

Three formulations, kept together because their comparison is the round's
central performance lesson (docs/ARCHITECTURE.md):

  pack_words        — scatter-add of per-symbol word contributions.
                      Serializes on TPU (non-unique scatter indices).
  pack_words_gather — per-word contributor windows via searchsorted.
                      Worse still: TPU has no hardware gather.
  pack_words_tree   — pairwise merge tree using only dense vector ops and
                      STATIC rolls.  The hot path (~60x the scatter form).

All three are differentially tested against the serial writer.
"""

from __future__ import annotations

import jax.numpy as jnp


def bit_offsets(nbits):
    """Exclusive prefix sum of symbol bit lengths + total bit count."""
    nbits = jnp.asarray(nbits, jnp.int32)
    incl = jnp.cumsum(nbits.reshape(-1))
    total = incl[-1] if incl.size else jnp.int32(0)
    excl = incl - nbits.reshape(-1)
    return excl, total


def pack_words(patterns, nbits, num_words: int, start_bit=0):
    """Pack symbols into big-endian uint32 words.

    Args:
      patterns: uint32[N] codeword patterns (only the low `nbits` bits used).
      nbits:    int32[N] codeword lengths in [0, 32].
      num_words: static output word count (words beyond the stream are 0).
      start_bit: bit offset at which the first symbol starts.

    Returns:
      (words uint32[num_words], total_bits int32) — total_bits excludes
      start_bit padding, i.e. it is the number of bits the symbols occupy.
    """
    patterns = jnp.asarray(patterns, jnp.uint32).reshape(-1)
    nbits = jnp.asarray(nbits, jnp.int32).reshape(-1)

    # Safety: keep only the low nbits bits of each pattern.
    full = nbits >= 32
    mask = jnp.where(full, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << jnp.clip(nbits, 0, 31).astype(jnp.uint32)) - 1)
    patterns = patterns & mask

    offsets, total = bit_offsets(nbits)
    offsets = offsets + jnp.int32(start_bit)

    bit_in_word = (offsets & 31).astype(jnp.int32)
    w0 = (offsets >> 5).astype(jnp.int32)

    # Split each symbol into the part landing in word w0 (n0 bits) and the
    # spill into w0+1 (n1 bits).
    n0 = jnp.minimum(nbits, 32 - bit_in_word)
    n1 = nbits - n0

    sh0 = jnp.clip(32 - bit_in_word - n0, 0, 31).astype(jnp.uint32)
    c0 = (patterns >> n1.astype(jnp.uint32)) << sh0
    c0 = jnp.where(nbits > 0, c0, jnp.uint32(0))

    m1 = (jnp.uint32(1) << jnp.clip(n1, 0, 31).astype(jnp.uint32)) - 1
    sh1 = jnp.clip(32 - n1, 1, 32).astype(jnp.uint32) & jnp.uint32(31)
    # n1 in [1,31] -> shift 32-n1 in [1,31]; n1==0 handled by the where.
    c1 = (patterns & m1) << sh1
    c1 = jnp.where(n1 > 0, c1, jnp.uint32(0))

    words = jnp.zeros((num_words,), jnp.uint32)
    words = words.at[w0].add(c0, mode="drop")
    words = words.at[w0 + 1].add(c1, mode="drop")
    return words, total


def words_to_bytes(words):
    """Big-endian uint32 words -> uint8 bytes (static shape, 4x words)."""
    words = jnp.asarray(words, jnp.uint32)
    b = jnp.stack([
        (words >> 24) & 0xFF,
        (words >> 16) & 0xFF,
        (words >> 8) & 0xFF,
        words & 0xFF,
    ], axis=-1).astype(jnp.uint8)
    return b.reshape(*words.shape[:-1], -1)


def pack_bytes(patterns, nbits, num_bytes: int):
    """Pack symbols straight to a padded byte buffer.

    `num_bytes` must be a multiple of 4.  Returns (bytes uint8[num_bytes],
    total_bits int32).
    """
    assert num_bytes % 4 == 0
    words, total = pack_words(patterns, nbits, num_bytes // 4)
    return words_to_bytes(words), total


# ---------------------------------------------------------------------------
# Gather-based formulations (TPU hot path).
#
# XLA lowers scatter with non-unique indices to a serialized loop on TPU —
# profiled at ~36 ms per 64-session 720p batch step vs ~3 ms for the whole
# MV stencil.  The pack is therefore re-expressed as a *gather*: symbol bit
# offsets are monotone, so each output word's contributors are a contiguous
# window of symbols located with one binary search (jnp.searchsorted), and
# every symbol's contribution to a word is a single funnel shift.  Same
# trick for emulation prevention: each output byte pulls its source byte
# through the (sorted) insertion-position list.
# ---------------------------------------------------------------------------


def compact_symbols(patterns, nbits):
    """Drop zero-length symbols (stable), padding the tail with zeros.

    Needed before windowed packing: masked-out optional fields and P_Skip
    runs would otherwise blow up the per-word contributor window.  Pure
    gather (searchsorted over the kept-count prefix sum).
    """
    patterns = jnp.asarray(patterns, jnp.uint32).reshape(-1)
    nbits = jnp.asarray(nbits, jnp.int32).reshape(-1)
    n = patterns.shape[0]
    keep = nbits > 0
    kept = jnp.cumsum(keep.astype(jnp.int32))
    total = kept[-1] if n else jnp.int32(0)
    src = jnp.searchsorted(kept, jnp.arange(1, n + 1, dtype=jnp.int32),
                           side="left")
    src = jnp.clip(src, 0, n - 1)
    live = jnp.arange(n, dtype=jnp.int32) < total
    out_p = jnp.where(live, patterns[src], jnp.uint32(0))
    out_n = jnp.where(live, nbits[src], 0)
    return out_p, out_n, total


# Max symbols overlapping one 32-bit output word.  After per-MB merging the
# macroblock stream has >=2-bit symbols; slice headers can have ~a dozen
# consecutive 1-bit codes.  28 covers both with margin (asserted in tests).
WORD_WINDOW = 28


def pack_words_gather(patterns, nbits, num_words: int,
                      window: int = WORD_WINDOW):
    """Gather-based packer: bit-exact equivalent of pack_words.

    Requires zero-length symbols to be pre-compacted to the tail (see
    compact_symbols); a run of >window-2 zero-length symbols between real
    ones can push contributors out of the search window.
    """
    patterns = jnp.asarray(patterns, jnp.uint32).reshape(-1)
    nbits = jnp.asarray(nbits, jnp.int32).reshape(-1)
    n = patterns.shape[0]

    full = nbits >= 32
    mask = jnp.where(full, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << jnp.clip(nbits, 0, 31).astype(jnp.uint32)) - 1)
    patterns = patterns & mask

    offsets, total = bit_offsets(nbits)
    ends = offsets + nbits

    word_start = jnp.arange(num_words, dtype=jnp.int32) * 32
    first = jnp.searchsorted(ends, word_start, side="right")

    idx = first[:, None] + jnp.arange(window, dtype=jnp.int32)[None, :]
    safe = jnp.clip(idx, 0, n - 1)
    p = patterns[safe]
    o = offsets[safe]
    ln = nbits[safe]

    ws = word_start[:, None]
    overlap = (o < ws + 32) & (o + ln > ws) & (ln > 0) & (idx < n)
    s = ws + 32 - o - ln
    sl = jnp.clip(s, 0, 31).astype(jnp.uint32)
    sr = jnp.clip(-s, 0, 31).astype(jnp.uint32)
    contrib = jnp.where(s >= 0, p << sl, p >> sr)
    contrib = jnp.where(overlap, contrib, jnp.uint32(0))
    words = jnp.sum(contrib, axis=1, dtype=jnp.uint32)
    return words, total


def pack_bytes_gather(patterns, nbits, num_bytes: int, *,
                      compact: bool = True, window: int = WORD_WINDOW):
    """Compact + gather-pack straight to a padded byte buffer."""
    assert num_bytes % 4 == 0
    if compact:
        patterns, nbits, _ = compact_symbols(patterns, nbits)
    words, total = pack_words_gather(patterns, nbits, num_bytes // 4,
                                     window)
    return words_to_bytes(words), total


# ---------------------------------------------------------------------------
# Tree packer: gather-free formulation (the real TPU hot path).
#
# TPU has no hardware gather/scatter — any arbitrary per-element indexing
# (including jnp.searchsorted and fancy indexing) lowers to serialized
# dynamic-slices (profiled: the "gather" packer was 8x *slower* on a v5e
# than the scatter one).  This formulation uses only dense vector ops and
# STATIC rolls:
#
#   - zero-length symbols are removed by monotone log-step compaction
#     (shift amounts are non-decreasing, so each power-of-two step is a
#     masked static roll);
#   - the ragged concatenation of N variable-length codes is a pairwise
#     merge tree: at each of log2(N) rounds adjacent bit-strings merge,
#     the right string shifted into place by log-step word rolls (static
#     shifts, masked by the bits of the word offset) plus one neighbor
#     funnel shift for the sub-word offset.
#
# Everything is elementwise/roll/reduce — exactly what the VPU does well.
# ---------------------------------------------------------------------------


def monotone_expand(values, shifts, valid, out_size: int, fill,
                    max_shift: int | None = None):
    """out[j + shifts[j]] = values[j] for non-decreasing shifts over the
    valid elements.  Positions not hit by any source get `fill`.

    Log-step algorithm: process shift bits high->low; each step is one
    masked static roll.  Monotone shifts keep live elements at pairwise
    distinct positions throughout (current_j = target_j - remaining_j and
    remaining gaps never exceed target gaps), so moves never collide.
    Returns (out, landed_mask).

    max_shift statically bounds the largest shift, halving the pass
    count when the caller can bound it (e.g. emulation-prevention
    insertion counts); shifts above the bound produce garbage, so the
    caller MUST detect and discard those cases.
    """
    n = values.shape[0]
    pad = out_size - n
    bound = out_size if max_shift is None else min(max_shift + 1, out_size)
    # Keep uint8 shift arrays in uint8 (bounded expansions, e.g.
    # emulation prevention): rem then moves 4x less data per pass.
    rdt = shifts.dtype if shifts.dtype == jnp.uint8 and bound <= 256 \
        else jnp.int32
    vals = jnp.concatenate([values, jnp.zeros((pad,), values.dtype)])
    rem = jnp.concatenate(
        [jnp.where(valid, shifts.astype(rdt), jnp.zeros((), rdt)),
         jnp.zeros((pad,), rdt)])
    live = jnp.concatenate([jnp.asarray(valid, bool),
                            jnp.zeros((pad,), bool)])
    for b in reversed(range(max(1, bound).bit_length())):
        step = 1 << b
        if step >= out_size:
            continue
        v_r = jnp.roll(vals, step)
        r_r = jnp.roll(rem, step)
        l_r = jnp.roll(live, step)
        take = l_r & (r_r >= step)
        vacate = live & (rem >= step)
        vals = jnp.where(take, v_r, vals)
        rem = jnp.where(take, r_r - step, jnp.where(vacate, 0, rem))
        live = (live & ~vacate) | take
    out = jnp.where(live, vals, fill)
    return out, live


def _monotone_compact(values, keep, fill=0):
    """Stable compaction of kept elements to the front (gather-free).

    Left-shift amounts (#removed before each kept element) are
    non-decreasing -> same log-step trick with negative rolls.
    """
    n = values.shape[0]
    shifts = jnp.cumsum((~keep).astype(jnp.int32)) * keep.astype(jnp.int32)
    vals = values
    rem = shifts
    live = keep
    # Bits LOW->HIGH: for left moves the no-collision invariant needs the
    # remaining shifts to stay monotone, which floor(s/2^b)*2^b gives
    # (expansion's right moves need the opposite order — see
    # monotone_expand).
    for b in range(max(1, n).bit_length()):
        step = 1 << b
        if step >= n:
            continue
        v_r = jnp.roll(vals, -step)
        r_r = jnp.roll(rem, -step)
        l_r = jnp.roll(live, -step)
        # Low->high needs the exact bit test (the greedy rem>=step rule
        # only decomposes correctly high->low).
        take = l_r & ((r_r & step) != 0)
        vacate = live & ((rem & step) != 0)
        vals = jnp.where(take, v_r, vals)
        rem = jnp.where(take, r_r - step, jnp.where(vacate, 0, rem))
        live = (live & ~vacate) | take
    return jnp.where(live, vals, fill), live


def _shift_words_right(y, sw, width: int):
    """y[p, c] -> y shifted right along c by sw[p] words (log-step)."""
    for b in range(max(1, width - 1).bit_length()):
        step = 1 << b
        if step >= width:
            break
        rolled = jnp.pad(y, ((0, 0), (step, 0)))[:, :width]
        y = jnp.where((sw & step).astype(bool)[:, None], rolled, y)
    return y


def pack_words_tree(patterns, nbits, num_words: int):
    """Gather-free packer: bit-exact equivalent of pack_words for every
    stream that fits the num_words budget (oversized streams are
    truncated mid-merge rather than at the end; callers discard them via
    the returned total anyway).

    Accepts zero-length symbols anywhere (they merge as exact no-ops).
    num_words must be >= total_bits/32.
    """
    patterns = jnp.asarray(patterns, jnp.uint32).reshape(-1)
    nbits = jnp.asarray(nbits, jnp.int32).reshape(-1)
    n = patterns.shape[0]

    full = nbits >= 32
    mask = jnp.where(full, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << jnp.clip(nbits, 0, 31).astype(jnp.uint32)) - 1)
    patterns = patterns & mask
    total = jnp.sum(nbits)

    # Zero-length symbols need no compaction: they enter the tree as
    # (word=0, len=0) and merge as exact no-ops (y shifts by 0 and ORs
    # nothing; x contributes nothing) — fuzz-proven bit-equal to the
    # compacting variant, and skipping the ~log2(n) masked-roll passes
    # saves a large slice of the packer's HBM traffic.

    # Pad symbol count to a power of two.
    p2 = 1 << max(1, (n - 1)).bit_length()
    patterns = jnp.pad(patterns, (0, p2 - n))
    nbits = jnp.pad(nbits, (0, p2 - n))

    # Left-justify each symbol in a 1-word container.
    sh = jnp.clip(32 - nbits, 0, 31).astype(jnp.uint32)
    words = jnp.where(nbits > 0, patterns << sh, 0)[:, None]  # [p2, 1]
    lens = nbits

    # Cap segment width at the output budget (lane-aligned): any segment
    # is a contiguous subrange of the stream, so whenever the stream fits
    # in num_words every intermediate segment does too — wider late-round
    # buffers only carry bits the caller truncates anyway (and streams
    # that genuinely exceed the budget are discarded via the total-bits
    # overflow check).  This caps the dominant rounds' HBM traffic.
    cap = ((num_words + 127) // 128) * 128

    width = 1
    while words.shape[0] > 1:
        x = words[0::2]
        y = words[1::2]
        xl = lens[0::2]
        yl = lens[1::2]
        new_width = min(width * 2, max(cap, width))
        x = jnp.pad(x, ((0, 0), (0, new_width - width)))
        y = jnp.pad(y, ((0, 0), (0, new_width - width)))
        #

        # Shift y right by xl bits: whole words then the sub-word funnel.
        sw = xl >> 5
        sb = (xl & 31).astype(jnp.uint32)
        y = _shift_words_right(y, sw, new_width)
        carry = jnp.pad(y, ((0, 0), (1, 0)))[:, :new_width]
        lsh = (jnp.uint32(32) - sb) & jnp.uint32(31)
        y = jnp.where(sb[:, None] > 0,
                      (y >> sb[:, None]) | jnp.where(
                          lsh[:, None] < 32, carry << lsh[:, None], 0),
                      y)
        words = x | y
        lens = xl + yl
        width = new_width

    stream = words[0]
    out = jnp.zeros((num_words,), jnp.uint32)
    take = min(num_words, stream.shape[0])
    out = out.at[:take].set(stream[:take])
    return out, total


def pack_bytes_tree(patterns, nbits, num_bytes: int):
    assert num_bytes % 4 == 0
    words, total = pack_words_tree(patterns, nbits, num_bytes // 4)
    return words_to_bytes(words), total


# ---------------------------------------------------------------------------
# Direct-placement packer: the second-generation hot path.
#
# The merge tree above costs ~sum(k) = O(log^2 n) full-array roll passes
# (round k decomposes its segment shifts into k log-step rolls) — measured
# VPU-compute-bound at ~105 passes for a 16k-symbol 720p frame.  This
# formulation places every symbol DIRECTLY at its absolute bit offset:
#
#   1. exclusive prefix sum of nbits (one XLA cumsum) gives each symbol's
#      target word w0 and intra-word phase;
#   2. each symbol splits into its two word contributions (c0 into w0,
#      c1 spilling into w0+1), exactly as the scatter packer;
#   3. contributions move LEFT from lane i to lane w0[i] (distance
#      d = i - w0[i] >= 0, since offsets grow by <= 32 bits per symbol)
#      with low->high log-step masked rolls, OR-combining on arrival.
#
# The OR-combine is collision-safe: if two in-flight elements occupy the
# same lane after processing shift bits < b, then (their lane gap) ==
# (their processed-distance gap), so their REMAINING distances are equal
# — which means they share the same target word, where OR is exactly the
# desired combine; elements with different targets can never meet.  Wrap
# hazards are impossible because d[i] <= i (an element at lane < 2^b has
# no remaining bit-b component).
#
# Cost: ~log2(n) roll passes per contribution buffer (2 buffers) + one
# cumsum — ~3x fewer VPU passes than the merge tree (measured 1.49x
# end-to-end on the full 720p compose+pack step, v5e batch 256).
# ---------------------------------------------------------------------------


def _monotone_or_move(vals, dist, max_dist: int):
    """out[i - dist[i]] |= vals[i] for distances with non-decreasing
    targets (i - dist[i] non-decreasing); log-step masked rolls, low->high
    bit order, OR-combine (see block comment for the safety argument)."""
    rem = dist
    out = vals
    n = vals.shape[0]
    for b in range(max(1, min(max_dist, n - 1)).bit_length()):
        step = 1 << b
        v_r = jnp.roll(out, -step)
        r_r = jnp.roll(rem, -step)
        take = (r_r & step) != 0
        vacate = (rem & step) != 0
        out = (jnp.where(take, v_r, jnp.uint32(0))
               | jnp.where(vacate, jnp.uint32(0), out))
        rem = jnp.where(take, r_r - step, jnp.where(vacate, 0, rem))
    return out


def pack_words_place(patterns, nbits, num_words: int):
    """Direct-placement packer: bit-exact equivalent of pack_words for
    every stream that fits the num_words budget (oversized streams are
    truncated; callers discard them via the returned total).

    Accepts zero-length symbols anywhere (zero contributions OR as
    no-ops)."""
    patterns = jnp.asarray(patterns, jnp.uint32).reshape(-1)
    nbits = jnp.asarray(nbits, jnp.int32).reshape(-1)
    n = patterns.shape[0]

    full = nbits >= 32
    mask = jnp.where(full, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1)
                      << jnp.clip(nbits, 0, 31).astype(jnp.uint32)) - 1)
    patterns = patterns & mask

    offsets, total = bit_offsets(nbits)
    bit_in_word = (offsets & 31).astype(jnp.int32)
    w0 = (offsets >> 5).astype(jnp.int32)

    n0 = jnp.minimum(nbits, 32 - bit_in_word)
    n1 = nbits - n0
    sh0 = jnp.clip(32 - bit_in_word - n0, 0, 31).astype(jnp.uint32)
    c0 = (patterns >> jnp.clip(n1, 0, 31).astype(jnp.uint32)) << sh0
    c0 = jnp.where(nbits > 0, c0, jnp.uint32(0))
    m1 = (jnp.uint32(1) << jnp.clip(n1, 0, 31).astype(jnp.uint32)) - 1
    sh1 = (jnp.uint32(32) - jnp.clip(n1, 0, 31).astype(jnp.uint32)) \
        & jnp.uint32(31)
    c1 = jnp.where(n1 > 0, (patterns & m1) << sh1, jnp.uint32(0))

    # Pad so the c1 pre-roll (lane i -> i+1) never wraps a live element
    # (no power-of-two requirement — moves are positional, not pairing).
    #
    # ONE or-move for both contributions: whenever symbol i spills
    # (c1[i] != 0), its end offset lies strictly inside word w0[i]+1,
    # so off[i+1] = off[i] + nbits[i] puts the NEXT lane in exactly
    # that word — c1 rolled right by one lane shares its host lane's
    # target word AND distance, so c0 | roll(c1) moves in a single
    # pass chain (halves the move passes vs two separate or-moves).
    # Pad lanes extend the true distance ramp (w0 = total >> 5) so the
    # last symbol's spill, rolled into the first pad lane, still
    # routes correctly; pad values are 0 and OR as no-ops.
    padded = -(-(n + 1) // 128) * 128
    lane = jnp.arange(padded, dtype=jnp.int32)
    w0_pad = jnp.concatenate([
        w0, jnp.broadcast_to(total >> 5, (padded - n,))])
    d = lane - w0_pad
    c0 = jnp.pad(c0, (0, padded - n))
    c1 = jnp.pad(c1, (0, padded - n))
    c1r = jnp.where(lane > 0, jnp.roll(c1, 1), jnp.uint32(0))
    words = _monotone_or_move(c0 | c1r, d, n)

    out = jnp.zeros((num_words,), jnp.uint32)
    take = min(num_words, padded)
    out = out.at[:take].set(words[:take])
    return out, total


def pack_bytes_place(patterns, nbits, num_bytes: int):
    assert num_bytes % 4 == 0
    words, total = pack_words_place(patterns, nbits, num_bytes // 4)
    return words_to_bytes(words), total


def merge_symbol_pairs(p1, n1, p2, n2):
    """Concatenate two codes per lane: (p1,n1)||(p2,n2), total <= 32 bits."""
    n2u = jnp.clip(n2, 0, 31).astype(jnp.uint32)
    return (p1 << n2u) | p2, n1 + n2


def trailing_bits_symbol(total_bits):
    """rbsp_trailing_bits as one symbol appended at `total_bits`.

    A stop '1' bit plus zero padding to the next byte boundary
    (bitwriter_write_trailing_bits, src/bitwriter.c:103-111).
    """
    total_bits = jnp.asarray(total_bits, jnp.int32)
    nbits = 1 + ((8 - ((total_bits + 1) % 8)) % 8)
    pattern = (jnp.uint32(1) << (nbits - 1).astype(jnp.uint32))
    return pattern, nbits
