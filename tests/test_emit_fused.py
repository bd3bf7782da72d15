"""Differential tests of the fused emit back end (ops/emit_fused).

Off-TPU the Pallas program runs in interpret mode; the on-silicon check
is scripts/tpu_parity_probe.py (byte-identical rep + dense splices vs
the staged XLA branch on v5e, verified).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from h264_scroll_encoder_tpu.config import MAX_EBSP_INSERTIONS
from h264_scroll_encoder_tpu.ops import bitpack, ebsp, emit_fused

N_SYM = 203           # fixed shape: one compile for the whole sweep
N_RBSP = (N_SYM + 64 + 3) // 4 * 4
N_NAL = (5 + N_RBSP + MAX_EBSP_INSERTIONS + 11) // 4 * 4


def _staged(patterns, nbits, nal_ref_idc):
    """The unfused bounded back end (the shipped off-TPU path)."""
    rbsp_bytes, total_bits = bitpack.pack_bytes_place(
        patterns, nbits, N_RBSP)
    rbsp_len = total_bits // 8
    overflow = total_bits > jnp.int32(N_RBSP * 8)
    eb, el = ebsp.rbsp_to_ebsp_tree(rbsp_bytes, rbsp_len, N_NAL - 8,
                                    max_insertions=MAX_EBSP_INSERTIONS)
    overflow |= (el - rbsp_len) > MAX_EBSP_INSERTIONS
    hdr = ((nal_ref_idc & 3) << 5) | 1
    prefix = jnp.asarray([0, 0, 0, 1, hdr], jnp.uint8)
    out = jnp.zeros((N_NAL,), jnp.uint8)
    out = jax.lax.dynamic_update_slice(out, eb, (5,))
    out = jax.lax.dynamic_update_slice(out, prefix, (0,))
    return out, 5 + el, total_bits, overflow


def _byte_stream_case(rng, kind, n_payload):
    if kind == 0:       # random bytes
        vals = rng.integers(0, 256, n_payload)
    elif kind == 1:     # heavy zeros: many insertions
        vals = rng.integers(0, 256, n_payload)
        vals[rng.random(n_payload) < 0.7] = 0
    elif kind == 2:     # 00 00 0x trigger soup
        vals = rng.choice([0, 0, 0, 1, 2, 3, 4, 255], n_payload)
    else:               # word-boundary-straddling 00 00 03 patterns
        vals = np.tile([0, 0, 3, 9], n_payload // 4 + 1)[:n_payload]
    patterns = np.zeros(N_SYM, np.uint32)
    nbits = np.zeros(N_SYM, np.int32)
    patterns[:n_payload] = vals
    nbits[:n_payload] = 8
    patterns[n_payload] = 0x80          # trailing bits (aligned payload)
    nbits[n_payload] = 8
    return patterns, nbits


def test_fused_matches_staged_back_end():
    staged = jax.jit(lambda p, n: _staged(p, n, 2))
    fused = jax.jit(lambda p, n: emit_fused.finish_nal_fused(
        p, n, N_RBSP, 2, max_insertions=MAX_EBSP_INSERTIONS))
    rng = np.random.default_rng(0)
    checked = 0
    for trial in range(16):
        pat, nb = _byte_stream_case(rng, trial % 4,
                                    int(rng.integers(5, N_SYM - 1)))
        a = staged(jnp.asarray(pat), jnp.asarray(nb))
        b = fused(jnp.asarray(pat), jnp.asarray(nb))
        if bool(a[3]) or bool(b[3]):
            # Out-of-contract stream: both must flag the exact-path
            # retry (the zero-run windows differ by <4 bytes at the
            # 64-byte bound, so flags may only disagree there — none of
            # these cases approach it).
            assert bool(a[3]) == bool(b[3]), trial
            continue
        assert int(a[1]) == int(b[1]), trial
        assert int(a[2]) == int(b[2]), trial
        assert np.array_equal(np.asarray(a[0]), np.asarray(b[0])), trial
        checked += 1
    assert checked >= 8     # the sweep must exercise real comparisons


def test_fused_overflow_contract():
    """Insertion counts beyond the cap flag overflow (retry contract)."""
    staged = jax.jit(lambda p, n: _staged(p, n, 0))
    fused = jax.jit(lambda p, n: emit_fused.finish_nal_fused(
        p, n, N_RBSP, 0, max_insertions=MAX_EBSP_INSERTIONS))
    # 3*(cap+2) zero bytes then a 1: one insertion per two zeros.
    n_payload = 3 * (MAX_EBSP_INSERTIONS + 2)
    pat = np.zeros(N_SYM, np.uint32)
    nb = np.zeros(N_SYM, np.int32)
    nb[:n_payload] = 8
    pat[n_payload] = 0x80
    nb[n_payload] = 8
    a = staged(jnp.asarray(pat), jnp.asarray(nb))
    b = fused(jnp.asarray(pat), jnp.asarray(nb))
    assert bool(a[3]) and bool(b[3])


def _resolve_align_and_tb(patterns, nbits):
    """The XLA-side preamble the fused kernel replaces: I_PCM align
    phase scan (negative-nbits sentinels) + trailing-bits append —
    mirrors models/splice_device._finish_splice's staged path."""
    is_align = nbits < 0
    keep = jnp.where(is_align, 0, 1).astype(jnp.int32)
    add = jnp.where(is_align, 0, nbits % 8).astype(jnp.int32)

    def comb(left, right):
        kl, bl = left
        kr, br = right
        return kl * kr, (kr * bl + br) % 8

    _, phase_after = jax.lax.associative_scan(comb, (keep, add))
    phase_before = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), phase_after[:-1]])
    align_bits = (8 - phase_before % 8) % 8
    nbits = jnp.where(is_align, align_bits, nbits)
    payload_bits = jnp.sum(nbits)
    tb_pat, tb_n = bitpack.trailing_bits_symbol(payload_bits)
    patterns = jnp.concatenate([patterns, tb_pat[None]])
    nbits = jnp.concatenate([nbits, tb_n[None]])
    return patterns, nbits


def test_fused_in_kernel_align_and_trailing():
    """Raw symbols with I_PCM align sentinels through the fused kernel
    (has_align + append_trailing) must byte-equal the staged back end
    fed the XLA-resolved, trailing-appended arrays."""
    rng = np.random.default_rng(11)
    fused = jax.jit(lambda p, n: emit_fused.finish_nal_fused(
        p, n, N_RBSP, 3, max_insertions=MAX_EBSP_INSERTIONS,
        has_align=True, append_trailing=True))
    staged = jax.jit(
        lambda p, n: _staged(*_resolve_align_and_tb(p, n)[:2], 3))
    checked = 0
    for trial in range(12):
        n_sym = N_SYM
        nb = rng.integers(1, 17, n_sym).astype(np.int32)
        pat = (rng.integers(0, 2 ** 31, n_sym).astype(np.uint32)
               & ((1 << np.clip(nb, 0, 31)) - 1).astype(np.uint32))
        # Zero-width tail + sprinkled align sentinels (pattern must be
        # zero at align slots, like the I_PCM emitters produce).
        cut = int(rng.integers(n_sym // 2, n_sym))
        nb[cut:] = 0
        pat[cut:] = 0
        n_aligns = int(rng.integers(0, 5))
        for _ in range(n_aligns):
            i = int(rng.integers(1, cut))
            nb[i] = -1
            pat[i] = 0
        a = staged(jnp.asarray(pat), jnp.asarray(nb))
        b = fused(jnp.asarray(pat), jnp.asarray(nb))
        assert bool(a[3]) == bool(b[3]), trial
        if bool(a[3]):
            continue
        assert int(a[1]) == int(b[1]), trial
        assert int(a[2]) == int(b[2]), trial
        assert np.array_equal(np.asarray(a[0]), np.asarray(b[0])), trial
        checked += 1
    assert checked >= 8


def test_fused_append_trailing_vmap():
    """Batched raw-symbol emit (append_trailing) equals per-session
    staged emits with the trailing symbol appended in XLA."""
    rng = np.random.default_rng(5)
    B = 4
    pats, nbs = [], []
    for b in range(B):
        nb = rng.integers(1, 9, N_SYM).astype(np.int32)
        pat = (rng.integers(0, 2 ** 31, N_SYM).astype(np.uint32)
               & ((1 << np.clip(nb, 0, 31)) - 1).astype(np.uint32))
        nb[N_SYM - 40 - b:] = 0
        pat[N_SYM - 40 - b:] = 0
        pats.append(pat)
        nbs.append(nb)
    pats = jnp.asarray(np.stack(pats))
    nbs = jnp.asarray(np.stack(nbs))
    got = jax.jit(jax.vmap(lambda p, n: emit_fused.finish_nal_fused(
        p, n, N_RBSP, 0, max_insertions=MAX_EBSP_INSERTIONS,
        append_trailing=True)))(pats, nbs)
    staged = jax.jit(
        lambda p, n: _staged(*_resolve_align_and_tb(p, n)[:2], 0))
    for b in range(B):
        want = staged(pats[b], nbs[b])
        assert not bool(want[3])
        assert int(got[1][b]) == int(want[1])
        assert int(got[2][b]) == int(want[2])
        assert np.array_equal(np.asarray(got[0][b]), np.asarray(want[0]))


def test_fused_vmap_batch():
    """The custom-vmap rule tiles sessions per program instance; the
    batched outputs must equal per-session staged emits."""
    rng = np.random.default_rng(3)
    B = 4
    pats, nbs = [], []
    for b in range(B):
        # kinds 0/3 only: kind 1's zero density can exceed the
        # insertion cap at these payload sizes (covered by the
        # overflow-contract test above).
        p, n = _byte_stream_case(rng, (b % 2) * 3, 30 + 8 * b)
        pats.append(p)
        nbs.append(n)
    pats = jnp.asarray(np.stack(pats))
    nbs = jnp.asarray(np.stack(nbs))
    got = jax.jit(jax.vmap(lambda p, n: emit_fused.finish_nal_fused(
        p, n, N_RBSP, 0, max_insertions=MAX_EBSP_INSERTIONS)))(pats, nbs)
    staged = jax.jit(lambda p, n: _staged(p, n, 0))
    for b in range(B):
        want = staged(pats[b], nbs[b])
        assert not bool(want[3])
        assert int(got[1][b]) == int(want[1])
        assert int(got[2][b]) == int(want[2])
        assert np.array_equal(np.asarray(got[0][b]), np.asarray(want[0]))
