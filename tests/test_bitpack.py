"""Parallel packer vs serial BitWriter: bit-exact equivalence."""

import numpy as np
import jax
import jax.numpy as jnp

from h264_scroll_encoder_tpu.ops import bitpack, bitio


def serial_pack(patterns, nbits):
    bw = bitio.BitWriter()
    for p, n in zip(patterns, nbits):
        if n:
            bw.write_bits(int(p), int(n))
    return bw.getvalue(), bw.bit_position


_PACK_SLOTS = 512
_PACK_BYTES = 4096


@jax.jit
def _packer(patterns, nbits):
    return bitpack.pack_bytes(patterns, nbits, _PACK_BYTES)


def run_pack(patterns, nbits):
    """Pack via a fixed-shape jitted packer (extra slots have nbits=0)."""
    assert len(patterns) <= _PACK_SLOTS
    p = np.zeros(_PACK_SLOTS, np.uint32)
    n = np.zeros(_PACK_SLOTS, np.int32)
    p[: len(patterns)] = np.asarray(patterns, np.uint64).astype(np.uint32)
    n[: len(nbits)] = nbits
    got_bytes, got_total = _packer(jnp.asarray(p), jnp.asarray(n))
    return np.asarray(got_bytes), int(got_total)


def test_simple_sequence():
    patterns = [0b1, 0b010, 0b1111, 0xFF, 0]
    nbits = [1, 3, 4, 8, 0]
    exp, exp_total = serial_pack(patterns, nbits)
    got, total = run_pack(patterns, nbits)
    assert total == exp_total
    assert bytes(got[: (total + 7) // 8]) == exp


def test_word_straddling():
    # Symbols engineered to straddle 32-bit word boundaries.
    patterns = [0x1FFFFFFF, 0x3, 0xFFFFFFFF, 0x1, 0x7FFF]
    nbits = [29, 2, 32, 1, 15]
    exp, exp_total = serial_pack(patterns, nbits)
    got, total = run_pack(patterns, nbits)
    assert total == exp_total
    assert bytes(got[: (total + 7) // 8]) == exp


def test_fuzz_vs_serial():
    rng = np.random.default_rng(1234)
    for trial in range(20):
        n = int(rng.integers(1, 400))
        nbits = rng.integers(0, 33, n)
        patterns = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        # Mask patterns to nbits (the packer also enforces this).
        masked = [
            int(p) & ((1 << int(b)) - 1 if b < 32 else 0xFFFFFFFF)
            for p, b in zip(patterns, nbits)
        ]
        exp, exp_total = serial_pack(masked, nbits)
        got, total = run_pack(patterns, nbits)
        assert total == exp_total, f"trial {trial}"
        assert bytes(got[: (total + 7) // 8]) == exp, f"trial {trial}"


def test_trailing_bits_symbol():
    for pre_bits in range(0, 40):
        pat, n = bitpack.trailing_bits_symbol(jnp.int32(pre_bits))
        total = pre_bits + int(n)
        assert total % 8 == 0
        assert int(n) >= 1 and int(n) <= 8
        # Stop bit is the MSB of the symbol.
        assert int(pat) == 1 << (int(n) - 1)


def test_gather_pack_matches_scatter_and_serial():
    """The gather-based packer (TPU hot path) must be bit-exact vs both
    the scatter version and the serial writer, including zero-length
    symbol runs (handled by compaction)."""
    rng = np.random.default_rng(77)

    @jax.jit
    def packer_gather(p, n):
        return bitpack.pack_bytes_gather(p, n, _PACK_BYTES)

    for trial in range(20):
        n = int(rng.integers(1, _PACK_SLOTS))
        nbits = rng.integers(0, 33, n)
        # Inject long zero-length runs (masked P_Skip slots).
        if trial % 2:
            k = int(rng.integers(1, n + 1))
            nbits[rng.choice(n, size=k, replace=False)] = 0
        patterns = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        masked = [int(p) & ((1 << int(b)) - 1 if b < 32 else 0xFFFFFFFF)
                  for p, b in zip(patterns, nbits)]
        exp, exp_total = serial_pack(masked, nbits)

        pp = np.zeros(_PACK_SLOTS, np.uint32)
        nn = np.zeros(_PACK_SLOTS, np.int32)
        pp[:n] = patterns
        nn[:n] = nbits
        got_b, got_t = packer_gather(jnp.asarray(pp), jnp.asarray(nn))
        assert int(got_t) == exp_total, f"trial {trial}"
        assert bytes(np.asarray(got_b)[: (exp_total + 7) // 8]) == exp, \
            f"trial {trial}"


def test_gather_pack_window_stress():
    """A realistic mix with short symbols stays within the contributor
    window.  (Streams of >WORD_WINDOW-2 consecutive 1-bit symbols are out
    of contract for the gather packer — the frame emitters merge per-MB
    symbols precisely so their minimum symbol length keeps any 32-bit
    word's contributor count below the window; the parity tests cover the
    real emitters.)"""
    nbits2 = np.asarray([1, 1, 1, 5, 7, 1, 1, 9, 3, 1] * 20, np.int32)
    pats2 = np.asarray([1, 0, 1, 17, 99, 1, 0, 301, 5, 1] * 20, np.uint32)
    exp2, exp2_total = serial_pack(pats2, nbits2)
    got_b2, got_t2 = bitpack.pack_bytes_gather(
        jnp.asarray(pats2), jnp.asarray(nbits2), 128)
    assert int(got_t2) == exp2_total
    assert bytes(np.asarray(got_b2)[: (exp2_total + 7) // 8]) == exp2


def test_tree_pack_matches_serial():
    """The gather-free tree packer (TPU hot path) is bit-exact vs the
    serial writer, including zero-length runs and full-width symbols."""
    rng = np.random.default_rng(31)

    @jax.jit
    def packer(p, n):
        return bitpack.pack_bytes_tree(p, n, _PACK_BYTES)

    for trial in range(20):
        n = int(rng.integers(1, _PACK_SLOTS))
        nbits = rng.integers(0, 33, n)
        if trial % 2:
            k = int(rng.integers(1, n + 1))
            nbits[rng.choice(n, size=k, replace=False)] = 0
        patterns = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        masked = [int(p) & ((1 << int(b)) - 1 if b < 32 else 0xFFFFFFFF)
                  for p, b in zip(patterns, nbits)]
        exp, exp_total = serial_pack(masked, nbits)

        pp = np.zeros(_PACK_SLOTS, np.uint32)
        nn = np.zeros(_PACK_SLOTS, np.int32)
        pp[:n] = patterns
        nn[:n] = nbits
        got_b, got_t = packer(jnp.asarray(pp), jnp.asarray(nn))
        assert int(got_t) == exp_total, f"trial {trial}"
        assert bytes(np.asarray(got_b)[: (exp_total + 7) // 8]) == exp, \
            f"trial {trial}"


def test_monotone_expand_fuzz():
    rng = np.random.default_rng(5)
    for trial in range(30):
        n = int(rng.integers(1, 200))
        n_valid = int(rng.integers(0, n + 1))
        incs = rng.integers(0, 3, n_valid)
        shifts = np.cumsum(incs)
        out_size = 512
        values = rng.integers(0, 255, n).astype(np.uint8)
        valid = np.arange(n) < n_valid
        out, live = bitpack.monotone_expand(
            jnp.asarray(values), jnp.asarray(np.pad(shifts, (0, n - n_valid))),
            jnp.asarray(valid), out_size, jnp.uint8(0xEE))
        out = np.asarray(out)
        live = np.asarray(live)
        exp = np.full(out_size, 0xEE, np.uint8)
        exp_live = np.zeros(out_size, bool)
        for j in range(n_valid):
            exp[j + shifts[j]] = values[j]
            exp_live[j + shifts[j]] = True
        assert np.array_equal(out, exp), f"trial {trial}"
        assert np.array_equal(live, exp_live), f"trial {trial}"


def test_merge_symbol_pairs():
    p, n = bitpack.merge_symbol_pairs(
        jnp.uint32(0b101), jnp.int32(3), jnp.uint32(0b01), jnp.int32(2))
    assert (int(p), int(n)) == (0b10101, 5)
    # Zero-length right operand is the identity.
    p, n = bitpack.merge_symbol_pairs(
        jnp.uint32(7), jnp.int32(3), jnp.uint32(0), jnp.int32(0))
    assert (int(p), int(n)) == (7, 3)
    # Zero-length left operand (pattern 0) is the identity too.
    p, n = bitpack.merge_symbol_pairs(
        jnp.uint32(0), jnp.int32(0), jnp.uint32(5), jnp.int32(3))
    assert (int(p), int(n)) == (5, 3)


def test_pack_under_jit_and_vmap():
    def f(patterns, nbits):
        return bitpack.pack_bytes(patterns, nbits, 64)

    patterns = jnp.asarray([[1, 2, 3, 0xFF]] * 3, jnp.uint32)
    nbits = jnp.asarray([[1, 3, 4, 8]] * 3, jnp.int32)
    got_b, got_t = jax.jit(jax.vmap(f))(patterns, nbits)
    exp, exp_total = serial_pack([1, 2, 3, 0xFF], [1, 3, 4, 8])
    for i in range(3):
        assert int(got_t[i]) == exp_total
        assert bytes(np.asarray(got_b[i])[: (exp_total + 7) // 8]) == exp


def test_pack_words_place_matches_scatter():
    """Direct-placement packer (OR-combining monotone moves) is bit-exact
    vs the scatter reference across zero-run/full-width fuzz."""
    rng = np.random.default_rng(11)
    for trial in range(12):
        n = int(rng.integers(1, 2000))
        nbits = rng.integers(0, 33, n).astype(np.int32)
        if trial % 3 == 0:
            nbits[rng.random(n) < 0.5] = 0
        if trial % 4 == 0:
            nbits[rng.random(n) < 0.3] = 32
        pats = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        nw = int(np.sum(nbits)) // 32 + 4
        ref, t1 = bitpack.pack_words(pats, nbits, nw)
        got, t2 = bitpack.pack_words_place(pats, nbits, nw)
        assert int(t1) == int(t2)
        assert np.array_equal(np.asarray(ref), np.asarray(got)), trial


def test_pack_words_place_merged_move_edges():
    """Deterministic edges of the single-or-move formulation (c0 and
    rolled c1 share each host lane's distance): a word-spilling symbol
    followed by zero-width lanes, and a stream whose LAST symbol spills
    (its carry routes through the first pad lane via the extended
    distance ramp)."""
    cases = [
        # spill then zero-width run: 20+20 bits (second spills word 0->1),
        # then three empty lanes, then more payload.
        ([0xFFFFF, 0xABCDE, 0, 0, 0, 0x1F], [20, 20, 0, 0, 0, 5]),
        # last symbol spills: 30 + 7 bits ends mid-word-1.
        ([0x3FFFFFFF, 0x55], [30, 7]),
        # lone spilling symbol after an aligned word.
        ([0xFFFFFFFF, 0x7FFF], [32, 15]),
        # every lane zero-width except a final spiller.
        ([0, 0, 0, 0x1FFFFF], [0, 0, 0, 21]),
    ]
    for pats, nbits in cases:
        pats = np.asarray(pats, np.uint32)
        nbits = np.asarray(nbits, np.int32)
        nw = int(nbits.sum()) // 32 + 3
        ref, t1 = bitpack.pack_words(pats, nbits, nw)
        got, t2 = bitpack.pack_words_place(pats, nbits, nw)
        assert int(t1) == int(t2)
        assert np.array_equal(np.asarray(ref), np.asarray(got)), (pats,
                                                                  nbits)
