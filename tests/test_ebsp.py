"""Emulation-prevention stencil vs the serial reference automaton."""

import numpy as np
import jax
import jax.numpy as jnp

from h264_scroll_encoder_tpu.ops import ebsp


def serial_rbsp_to_ebsp(rbsp):
    """Faithful model of the reference automaton (src/nal.c:24-50)."""
    out = bytearray()
    zero_count = 0
    for byte in rbsp:
        if zero_count >= 2 and byte <= 0x03:
            out.append(0x03)
            zero_count = 0
        out.append(byte)
        zero_count = zero_count + 1 if byte == 0 else 0
    return bytes(out)


def serial_ebsp_to_rbsp(data):
    """Faithful model of the parser automaton (src/nal_parser.c:67-88)."""
    out = bytearray()
    zero_count = 0
    i = 0
    while i < len(data):
        if (zero_count >= 2 and data[i] == 0x03 and i + 1 < len(data)
                and data[i + 1] <= 0x03):
            zero_count = 0
            i += 1
            continue
        out.append(data[i])
        zero_count = zero_count + 1 if data[i] == 0 else 0
        i += 1
    return bytes(out)


CASES = [
    b"",
    b"\x00",
    b"\x00\x00",
    b"\x00\x00\x00",
    b"\x00\x00\x01",
    b"\x00\x00\x02",
    b"\x00\x00\x03",
    b"\x00\x00\x04",
    b"\x00\x00\x00\x00",
    b"\x00\x00\x00\x00\x00",
    b"\x00\x00\x00\x00\x00\x00\x01",
    b"\x00\x00\x00\x01\x00\x00\x02",
    b"\x01\x00\x00\x03\x00\x00",
    b"\xff\x00\x00\x00\xff\x00\x00\x01",
]


def test_known_cases_numpy():
    for case in CASES:
        arr = np.frombuffer(case, np.uint8)
        got = ebsp.rbsp_to_ebsp_np(arr).tobytes()
        assert got == serial_rbsp_to_ebsp(case), case.hex()


def test_roundtrip_and_fuzz_numpy():
    rng = np.random.default_rng(7)
    for trial in range(40):
        n = int(rng.integers(0, 400))
        # Heavily biased toward zeros and small bytes to hit the automaton.
        raw = rng.choice(
            np.array([0, 0, 0, 1, 2, 3, 4, 0xFF], np.uint8), size=n)
        exp = serial_rbsp_to_ebsp(bytes(raw))
        got = ebsp.rbsp_to_ebsp_np(raw).tobytes()
        assert got == exp, f"trial {trial}"
        # Round-trip back.
        back = ebsp.ebsp_to_rbsp_np(np.frombuffer(got, np.uint8)).tobytes()
        assert back == bytes(raw), f"roundtrip trial {trial}"


def test_ebsp_to_rbsp_fuzz_numpy():
    rng = np.random.default_rng(99)
    for trial in range(40):
        n = int(rng.integers(0, 300))
        raw = rng.choice(
            np.array([0, 0, 1, 2, 3, 3, 4, 0xFF], np.uint8), size=n)
        exp = serial_ebsp_to_rbsp(bytes(raw))
        got = ebsp.ebsp_to_rbsp_np(raw).tobytes()
        assert got == exp, f"trial {trial}"


def test_gather_version_matches_numpy():
    rng = np.random.default_rng(15)
    max_in, max_out = 512, 1024
    f = jax.jit(lambda b, n: ebsp.rbsp_to_ebsp_gather(b, n, max_out))
    for trial in range(12):
        n = int(rng.integers(0, max_in))
        raw = rng.choice(np.array([0, 0, 0, 1, 2, 3, 0xFF], np.uint8),
                         size=n)
        padded = np.zeros(max_in, np.uint8)
        padded[:n] = raw
        out, out_len = f(jnp.asarray(padded), jnp.int32(n))
        exp = ebsp.rbsp_to_ebsp_np(raw)
        assert int(out_len) == exp.size, f"trial {trial}"
        assert np.asarray(out)[: exp.size].tobytes() == exp.tobytes(), \
            f"trial {trial}"


def test_tree_version_matches_numpy():
    rng = np.random.default_rng(23)
    max_in, max_out = 512, 1024
    f = jax.jit(lambda b, n: ebsp.rbsp_to_ebsp_tree(b, n, max_out))
    for trial in range(12):
        n = int(rng.integers(0, max_in))
        raw = rng.choice(np.array([0, 0, 0, 1, 2, 3, 0xFF], np.uint8),
                         size=n)
        padded = np.zeros(max_in, np.uint8)
        padded[:n] = raw
        out, out_len = f(jnp.asarray(padded), jnp.int32(n))
        exp = ebsp.rbsp_to_ebsp_np(raw)
        assert int(out_len) == exp.size, f"trial {trial}"
        assert np.asarray(out)[: exp.size].tobytes() == exp.tobytes(), \
            f"trial {trial}"


def test_jit_versions_match_numpy():
    rng = np.random.default_rng(5)
    max_in, max_out = 512, 1024
    f_ins = jax.jit(lambda b, n: ebsp.rbsp_to_ebsp(b, n, max_out))
    f_del = jax.jit(lambda b, n: ebsp.ebsp_to_rbsp(b, n, max_out))
    for trial in range(10):
        n = int(rng.integers(0, max_in))
        raw = rng.choice(np.array([0, 0, 0, 1, 3, 0xFF], np.uint8), size=n)
        padded = np.zeros(max_in, np.uint8)
        padded[:n] = raw
        out, out_len = f_ins(jnp.asarray(padded), jnp.int32(n))
        exp = ebsp.rbsp_to_ebsp_np(raw)
        assert int(out_len) == exp.size
        assert np.asarray(out)[: exp.size].tobytes() == exp.tobytes()

        out2, out2_len = f_del(jnp.asarray(padded), jnp.int32(n))
        exp2 = ebsp.ebsp_to_rbsp_np(raw)
        assert int(out2_len) == exp2.size
        assert np.asarray(out2)[: exp2.size].tobytes() == exp2.tobytes()


def test_bounded_expansion_matches_and_flags():
    """max_insertions: bit-equal to the unbounded path in contract; the
    insertion count (out_len - n) exposes out-of-contract streams so
    emitters can flag overflow (models/scroll.py, splice_device.py)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(41)
    size, mo = 1024, 2048
    fa = jax.jit(lambda b, n: ebsp.rbsp_to_ebsp_tree(b, n, mo))
    fb = jax.jit(lambda b, n: ebsp.rbsp_to_ebsp_tree(
        b, n, mo, max_insertions=128))
    checked = 0
    for _ in range(40):
        b = rng.integers(0, 256, size).astype(np.uint8)
        # sprinkle zero runs to force insertions
        for _ in range(int(rng.integers(0, 40))):
            p = int(rng.integers(0, size - 4))
            b[p:p + int(rng.integers(2, 5))] = 0
        n = int(rng.integers(64, size))
        a, la = fa(jnp.asarray(b), n)
        c, lc = fb(jnp.asarray(b), n)
        ins = int(la) - n
        if ins > 128:
            # out of contract: emitters flag via (out_len - n) > bound
            assert int(lc) - n > 128
            continue
        checked += 1
        assert int(la) == int(lc)
        assert np.array_equal(np.asarray(a), np.asarray(c))
    assert checked >= 10, "fuzz produced too few in-contract cases"


def test_bounded_expansion_at_production_cap():
    """Same contract as test_bounded_expansion_matches_and_flags but at
    the PRODUCTION insertion cap (config.MAX_EBSP_INSERTIONS, 16 since
    the rbsp+cap NAL sizing change) — fuzz salted to land cases on both
    sides of the boundary."""
    from h264_scroll_encoder_tpu.config import MAX_EBSP_INSERTIONS as CAP

    rng = np.random.default_rng(47)
    size, mo = 1024, 1024 + CAP + 16
    fa = jax.jit(lambda b, n: ebsp.rbsp_to_ebsp_tree(b, n, mo))
    fb = jax.jit(lambda b, n: ebsp.rbsp_to_ebsp_tree(
        b, n, mo, max_insertions=CAP))
    in_contract = out_of_contract = 0
    for trial in range(40):
        b = rng.integers(0, 256, size).astype(np.uint8)
        # salt ~0-2*CAP insertion sites ("00 00 0x" triples)
        for _ in range(int(rng.integers(0, 2 * CAP + 4))):
            p = int(rng.integers(0, size - 3))
            b[p:p + 2] = 0
            b[p + 2] = int(rng.integers(0, 4))
        n = int(rng.integers(256, size))
        a, la = fa(jnp.asarray(b), n)
        c, lc = fb(jnp.asarray(b), n)
        ins = int(la) - n
        assert ins == len(serial_rbsp_to_ebsp(bytes(b[:n]))) - n
        if ins > CAP:
            out_of_contract += 1
            assert int(lc) - n > CAP  # emitters flag overflow on this
            continue
        in_contract += 1
        assert int(la) == int(lc)
        assert np.array_equal(np.asarray(a), np.asarray(c))
    assert in_contract >= 5 and out_of_contract >= 5, \
        (in_contract, out_of_contract)


def test_finish_slice_flags_overflow_past_insertion_cap():
    """A payload that organically needs more emulation-prevention
    insertions than MAX_EBSP_INSERTIONS must come back from the bounded
    fast path with overflow=True, and the exact path (the session's
    retry) must emit the serial-automaton NAL bytes."""
    from h264_scroll_encoder_tpu.config import MAX_EBSP_INSERTIONS as CAP
    from h264_scroll_encoder_tpu.models import scroll

    n_sym = 3 * CAP  # 3*CAP insertions, comfortably past the cap
    patterns = jnp.full((n_sym,), 1, jnp.uint32)   # each "00 00 01"
    nbits = jnp.full((n_sym,), 24, jnp.int32)
    n_rbsp = 256
    nal_b, len_b, bits_b, ov_b = jax.jit(
        lambda p, nb: scroll.finish_slice(p, nb, n_rbsp, 3))(patterns,
                                                             nbits)
    assert bool(ov_b), "bounded path must flag the over-cap stream"

    nal_e, len_e, bits_e, ov_e = jax.jit(
        lambda p, nb: scroll.finish_slice(p, nb, n_rbsp, 3,
                                          ebsp_exact=True))(patterns,
                                                            nbits)
    assert not bool(ov_e)
    rbsp = b"\x00\x00\x01" * n_sym + b"\x80"  # + aligned trailing bits
    want = b"\x00\x00\x00\x01\x61" + serial_rbsp_to_ebsp(rbsp)
    got = bytes(np.asarray(nal_e[:int(len_e)]))
    assert got == want
