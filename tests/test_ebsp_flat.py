"""Flat/Pallas EBSP+framing vs the shipped XLA tree path.

The production TPU back end (ops/ebsp_flat.rbsp_to_nal_pallas) must be
byte-identical to the finish-stage composition it replaces:
rbsp_to_ebsp_tree(bounded) -> prefix placement -> valid-length mask —
including the saturation/overflow contract on out-of-window streams.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from h264_scroll_encoder_tpu.config import MAX_EBSP_INSERTIONS
from h264_scroll_encoder_tpu.ops import ebsp, ebsp_flat

from test_ebsp import serial_rbsp_to_ebsp


def reference_nal(rbsp: bytes, header_byte: int, n_nal: int,
                  max_ins: int):
    """The XLA back end exactly as finish_slice composes it."""
    arr = np.frombuffer(rbsp, np.uint8)
    pad = np.zeros(n_nal - 8, np.uint8)  # finish_slice's rbsp budget
    pad[:arr.size] = arr
    eb, el = ebsp.rbsp_to_ebsp_tree(jnp.asarray(pad), arr.size,
                                    n_nal - 8, max_insertions=max_ins)
    out = np.zeros(n_nal, np.uint8)
    out[5:5 + (n_nal - 8)] = np.asarray(eb)
    out[:5] = [0, 0, 0, 1, header_byte]
    return out, int(el) - arr.size


def gen_stream(rng, n, zero_heavy):
    if zero_heavy:
        b = rng.choice([0, 0, 0, 1, 2, 3, 0xFF], size=n).astype(np.uint8)
    else:
        b = rng.integers(0, 256, n, dtype=np.uint8)
    return b.tobytes()


@pytest.mark.parametrize("impl", [ebsp_flat.rbsp_to_nal_flat,
                                  ebsp_flat.rbsp_to_nal_pallas])
@pytest.mark.parametrize("zero_heavy", [False, True])
def test_matches_xla_backend(impl, zero_heavy):
    rng = np.random.default_rng(11 + zero_heavy)
    for n in [0, 1, 5, 64, 127, 200, 517]:
        rbsp = gen_stream(rng, n, zero_heavy)
        n_nal = max(128, -(-(5 + n * 3 // 2 + 11) // 128) * 128)
        hb = 0x41
        want, want_ins = reference_nal(rbsp, hb, n_nal,
                                       MAX_EBSP_INSERTIONS)
        pad = np.zeros(n_nal, np.uint8)
        pad[:n] = np.frombuffer(rbsp, np.uint8)
        got, tot = impl(jnp.asarray(pad), n, hb, n_nal,
                        MAX_EBSP_INSERTIONS)
        assert int(tot) == want_ins, (n, zero_heavy)
        if want_ins <= MAX_EBSP_INSERTIONS:
            np.testing.assert_array_equal(np.asarray(got), want,
                                          err_msg=f"n={n} zh={zero_heavy}")
        else:
            # Out of contract: both paths report tot > max_insertions
            # (asserted above) and the caller retries via the exact
            # path; bytes past the movable bound are unspecified.
            assert int(tot) > MAX_EBSP_INSERTIONS


def test_matches_serial_automaton():
    """End-to-end: framed payload equals the serial C automaton."""
    rng = np.random.default_rng(3)
    for _ in range(20):
        n = int(rng.integers(1, 300))
        rbsp = gen_stream(rng, n, True)
        want = serial_rbsp_to_ebsp(rbsp)
        n_nal = -(-(5 + n * 3 // 2 + 11) // 128) * 128
        pad = np.zeros(n_nal, np.uint8)
        pad[:n] = np.frombuffer(rbsp, np.uint8)
        got, tot = ebsp_flat.rbsp_to_nal_flat(
            jnp.asarray(pad), n, 0x61, n_nal, MAX_EBSP_INSERTIONS)
        ins = int(tot)
        if ins > MAX_EBSP_INSERTIONS:
            # Over-bound sample: bytes are unspecified (caller retries
            # exact); the overflow tests below cover this regime.
            assert len(serial_rbsp_to_ebsp(rbsp)) - n > MAX_EBSP_INSERTIONS
            continue
        got = np.asarray(got)
        assert got[:5].tobytes() == b"\x00\x00\x00\x01\x61"
        assert got[5:5 + n + ins].tobytes() == want
        assert not got[5 + n + ins:].any()


def test_saturation_flags_overflow():
    """A zero run past ZERO_RUN_WINDOW must bump the count past the
    bound (the caller's exact-path retry signal), as the XLA path does."""
    n = 256
    rbsp = bytes(200) + bytes(range(1, 57))
    n_nal = -(-(5 + n * 3 // 2 + 11) // 128) * 128
    pad = np.zeros(n_nal, np.uint8)
    pad[:n] = np.frombuffer(rbsp, np.uint8)
    for impl in (ebsp_flat.rbsp_to_nal_flat, ebsp_flat.rbsp_to_nal_pallas):
        _, tot = impl(jnp.asarray(pad), n, 0x41, n_nal,
                      MAX_EBSP_INSERTIONS)
        assert int(tot) > MAX_EBSP_INSERTIONS


def test_insertion_bound_overflow_matches_xla():
    """Streams with more insertions than max_insertions: count must
    exceed the bound through the same saturation math as the XLA path."""
    # 00 00 03 repeated: one insertion per triple.
    reps = 40
    rbsp = b"\x00\x00\x03" * reps
    n = len(rbsp)
    max_ins = 16
    n_nal = -(-(5 + n * 3 // 2 + 11) // 128) * 128
    want, want_ins = reference_nal(rbsp, 0x41, n_nal, max_ins)
    pad = np.zeros(n_nal, np.uint8)
    pad[:n] = np.frombuffer(rbsp, np.uint8)
    got, tot = ebsp_flat.rbsp_to_nal_flat(jnp.asarray(pad), n, 0x41,
                                          n_nal, max_ins)
    assert int(tot) == want_ins > max_ins
