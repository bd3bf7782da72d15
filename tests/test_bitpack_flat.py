"""Flat-formulation packer (experimental, Pallas-ready) vs references."""

import jax
import numpy as np

from h264_scroll_encoder_tpu.ops import bitpack, bitpack_flat


def _cases(rng, n, nw, trials):
    for _ in range(trials):
        nb = rng.integers(0, 33, n).astype(np.int32)
        nb[rng.random(n) < 0.6] = 0
        while int(nb.sum()) > nw * 32:
            nb[rng.random(n) < 0.5] = 0
        pat = rng.integers(0, 2 ** 32, n, dtype=np.uint64).astype(np.uint32)
        yield pat, nb


def test_flat_matches_scatter_reference():
    rng = np.random.default_rng(17)
    for n, nw in ((1024, 300), (64, 80), (200, 64), (4096, 1300)):
        f = jax.jit(lambda p, b, nw=nw: bitpack_flat.pack_words_flat(
            p, b, nw))
        for pat, nb in _cases(rng, n, nw, 5):
            a, ta = bitpack.pack_words(pat, nb, nw)
            b2, tb = f(pat, nb)
            assert int(ta) == int(tb)
            assert np.array_equal(np.asarray(a), np.asarray(b2)), (n, nw)


def test_pallas_interpret_matches():
    """Off-TPU the wrapper runs in interpret mode; on TPU this exercises
    the real Mosaic kernel (verified bit-equal on v5e)."""
    rng = np.random.default_rng(23)
    for pat, nb in _cases(rng, 1024, 300, 3):
        a, ta = bitpack.pack_words(pat, nb, 300)
        b2, tb = bitpack_flat.pack_words_pallas(pat, nb, 300)
        assert int(ta) == int(tb)
        assert np.array_equal(np.asarray(a), np.asarray(b2))


def test_place_flat_matches_scatter_reference():
    """Flat direct-placement formulation (the body of the Pallas place
    kernel) vs the scatter reference, across shapes incl. the
    representative splice lane count."""
    rng = np.random.default_rng(31)
    for n, nw in ((1024, 300), (64, 80), (200, 64), (4096, 1300),
                  (8483, 1490)):
        f = jax.jit(lambda p, b, nw=nw: bitpack_flat.pack_words_place_flat(
            p, b, nw))
        for pat, nb in _cases(rng, n, nw, 4):
            a, ta = bitpack.pack_words(pat, nb, nw)
            b2, tb = f(pat, nb)
            assert int(ta) == int(tb)
            assert np.array_equal(np.asarray(a), np.asarray(b2)), (n, nw)


def test_place_pallas_interpret_matches():
    """Off-TPU the place wrapper runs in interpret mode; on TPU this is
    the real Mosaic kernel (bit-exact on v5e at splice shapes, where it
    beats the XLA place packer 0.76 vs 1.64 ms per batch-256 pack)."""
    rng = np.random.default_rng(37)
    for pat, nb in _cases(rng, 512, 200, 2):
        a, ta = bitpack.pack_words(pat, nb, 200)
        b2, tb = bitpack_flat.pack_words_place_pallas(pat, nb, 200)
        assert int(ta) == int(tb)
        assert np.array_equal(np.asarray(a), np.asarray(b2))
    # Budget larger than the padded symbol array (zero-fill tail).
    pat, nb = next(_cases(rng, 100, 300, 1))
    a, ta = bitpack.pack_words(pat, nb, 300)
    b2, tb = bitpack_flat.pack_words_place_pallas(pat, nb, 300)
    assert int(ta) == int(tb)
    assert np.array_equal(np.asarray(a), np.asarray(b2))


def test_flat_roll_equals_flat_reference():
    rng = np.random.default_rng(5)
    import jax.numpy as jnp
    a = jnp.asarray(rng.integers(0, 2 ** 31, (16, 128), dtype=np.int64),
                    jnp.int32)
    for s in (0, 1, 5, 127, 128, 129, 1000, -1, -128, -1000, 2047):
        got = np.asarray(bitpack_flat._flat_roll(a, s)).reshape(-1)
        want = np.roll(np.asarray(a).reshape(-1), s)
        assert np.array_equal(got, want), s


def test_place_pallas_nested_vmap_flattens():
    """Nested vmap (e.g. sessions x bands) flattens the extra batch dims
    into one tiled dispatch instead of raising (ADVICE r4)."""
    import jax

    rng = np.random.default_rng(91)
    B1, B2, n, nw = 2, 3, 257, 40
    pat = rng.integers(0, 2 ** 16, (B1, B2, n)).astype(np.uint32)
    nb = rng.integers(0, 17, (B1, B2, n)).astype(np.int32)
    got_w, got_t = jax.jit(jax.vmap(jax.vmap(
        lambda p, b: bitpack_flat.pack_words_place_pallas(p, b, nw))))(
        pat, nb)
    want_w, want_t = jax.jit(jax.vmap(jax.vmap(
        lambda p, b: bitpack.pack_words_place(p, b, nw))))(pat, nb)
    assert np.array_equal(np.asarray(got_w), np.asarray(want_w))
    assert np.array_equal(np.asarray(got_t), np.asarray(want_t))
