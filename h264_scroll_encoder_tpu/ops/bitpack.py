"""Parallel-prefix bitstream packer.

This is the TPU-native replacement for the reference's serial BitWriter
(src/bitwriter.c:13-32): instead of one function call per bit, a frame's
worth of syntax elements is expressed as arrays of (pattern, nbits) symbols,
bit offsets are an exclusive prefix sum of the lengths, and every symbol is
scattered into a big-endian 32-bit word array with funnel shifts.  Because
every output bit belongs to exactly one symbol, scatter-add == scatter-or and
reproduces the serial MSB-first stream bit-exactly.

Symbols with nbits == 0 are "absent" slots — they contribute nothing, which
lets frame models emit a fixed-shape symbol grid with masked-out optional
fields (XLA needs static shapes; SURVEY.md §7.3).
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


def trailing_bits_symbol(total_bits):
    """rbsp_trailing_bits as one symbol appended at `total_bits`.

    A stop '1' bit plus zero padding to the next byte boundary
    (bitwriter_write_trailing_bits, src/bitwriter.c:103-111).
    """
    total_bits = jnp.asarray(total_bits, jnp.int32)
    nbits = 1 + ((8 - ((total_bits + 1) % 8)) % 8)
    pattern = (jnp.uint32(1) << (nbits - 1).astype(jnp.uint32))
    return pattern, nbits
