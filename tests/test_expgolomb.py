"""Exp-Golomb closed forms vs the serial reference semantics."""

import numpy as np
import jax.numpy as jnp

from h264_scroll_encoder_tpu.ops import expgolomb, bitio


def serial_ue_bits(v):
    bw = bitio.BitWriter()
    bw.write_ue(v)
    n = bw.bit_position
    data = bw.getvalue()
    return data, n


def test_ue_known_codewords():
    # Table from src/bitwriter.c:34-49.
    cases = {0: "1", 1: "010", 2: "011", 3: "00100", 4: "00101"}
    for v, bits in cases.items():
        pat, n = expgolomb.ue(jnp.uint32(v))
        assert int(n) == len(bits)
        assert int(pat) == int(bits, 2)


def test_ue_matches_serial_writer():
    vals = list(range(0, 300)) + [2**k - 2 for k in range(2, 31)] + [
        2**k - 1 for k in range(1, 31)] + [2**k for k in range(1, 30)]
    pats, ns = expgolomb.ue(jnp.asarray(vals, jnp.uint32))
    for v, p, n in zip(vals, np.asarray(pats), np.asarray(ns)):
        bw = bitio.BitWriter()
        bw.write_bits(int(p), int(n))
        got = bw.getvalue()
        exp_bw = bitio.BitWriter()
        exp_bw.write_ue(v)
        assert got == exp_bw.getvalue(), f"ue({v})"
        assert int(n) == exp_bw.bit_position


def test_se_mapping():
    # src/bitwriter.c:76-90: 0->0, 1->1, -1->2, 2->3, -2->4 ...
    vals = jnp.asarray([0, 1, -1, 2, -2, 100, -100, 3968, -3968], jnp.int32)
    mapped = np.asarray(expgolomb.se_mapped(vals))
    assert mapped.tolist() == [0, 1, 2, 3, 4, 199, 200, 7935, 7936]


def test_se_matches_serial_writer():
    vals = list(range(-200, 201)) + [-3968, 3968, -1984, 1984]
    pats, ns = expgolomb.se(jnp.asarray(vals, jnp.int32))
    for v, p, n in zip(vals, np.asarray(pats), np.asarray(ns)):
        bw = bitio.BitWriter()
        bw.write_bits(int(p), int(n))
        exp_bw = bitio.BitWriter()
        exp_bw.write_se(v)
        assert bw.getvalue() == exp_bw.getvalue(), f"se({v})"


def test_te_encoding():
    # te(v) with 2 possible values: single inverted bit
    # (write_p16x16_mb src/h264_writer.c:438-444).
    for ref in (0, 1):
        pat, n = expgolomb.te(jnp.uint32(ref), 2)
        assert int(n) == 1
        assert int(pat) == 1 - ref
    # 1 value: no bits.
    _, n = expgolomb.te(jnp.uint32(0), 1)
    assert int(n) == 0
    # >2 values: ue.
    for ref in range(5):
        pat, n = expgolomb.te(jnp.uint32(ref), 10)
        ep, en = expgolomb.ue(jnp.uint32(ref))
        assert (int(pat), int(n)) == (int(ep), int(en))
