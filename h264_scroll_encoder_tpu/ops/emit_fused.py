"""Fused emit back end: place-pack -> emulation prevention -> NAL framing
in ONE Pallas program per session tile.

The shipped serving step ran three HBM-separated stages per frame
(symbols -> Pallas pack -> XLA EBSP+framing); the pack and EBSP stages
each cost ~0.5 ms per batch-256 step and each round-trips the ~8 KB
rbsp buffer through HBM plus per-stage dispatch.  This module fuses the
whole back end of finish_slice / _finish_splice — the replacement for
the reference's serial BitWriter flush + rbsp_to_ebsp byte scan + NAL
framing stack (/root/reference/src/h264_writer.c:541-664 ->
/root/reference/src/nal.c:24-84) — into one Mosaic program:

  1. direct-placement pack (bitpack_flat._place_rounds3, all move
     passes VMEM-resident);
  2. emulation prevention reformulated as SWAR on the PACKED uint32
     words (u8 lanes buy nothing inside VMEM — the v5e VPU computes on
     32-bit lanes): per-byte zero/<=3 marks via carry-free SWAR tests,
     the bounded zero-run tracker as a 16-word windowed linear-
     recurrence scan (R[k] = z[k] + all_zero[k]*R[k-1]), insertion
     shifts packed 8-bits-per-byte-slot into one uint32 per word, and
     the monotone expansion's 5 masked moves executed as whole-stream
     byte rotations (word rolls + sub-word funnels) with per-byte-slot
     take/vacate masks;
  3. NAL framing folded into the same expansion: every byte's shift
     carries a +5 start-code offset, holes become the 0x03 insertions,
     and the Annex-B prefix is masked into words 0-1.

Outputs are the framed NAL words plus per-session (total_bits,
insertion-count) metadata; the caller patches the traced header byte
and bitcasts words to bytes (one fused XLA pass).

Semantics match ops/ebsp.rbsp_to_ebsp_tree's bounded form: insertion
counts above `cap` and zero-runs past the 64-byte window mark the
frame for the exact-path retry (garbage bytes, correct overflow flag).

Differentially tested against the unfused XLA back end in
tests/test_emit_fused.py (interpret mode off-TPU; bit-exact on v5e).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .bitpack_flat import (_flat_exclusive_cumsum3, _flat_roll3,
                           _place_rounds3)

# Zero-run tracker window, in 4-byte words (64 bytes, matching
# ops/ebsp.ZERO_RUN_WINDOW's contract: composed CAVLC payloads never
# carry remotely close to 64 consecutive zero bytes).
EBSP_WINDOW_WORDS = 16

_M7 = 0x7F7F7F7F
_M80 = 0x80808080


def _byte_roll_right3(w, step: int):
    """Roll the per-session BYTE stream right by `step` bytes over a
    [T, R, 128] uint32 word array (big-endian byte order within each
    word).  Word-aligned steps are one flat word roll; others add one
    sub-word funnel shift."""
    q, r = divmod(step, 4)
    if r == 0:
        return _flat_roll3(w, q)
    hi = _flat_roll3(w, q)
    lo = _flat_roll3(w, q + 1)
    return (hi >> jnp.uint32(8 * r)) | (lo << jnp.uint32(32 - 8 * r))


def _mark_zero_bytes(w):
    """Carry-free SWAR zero-byte detect: high bit of each byte set iff
    that byte is 0x00 (exact, no cross-byte contamination)."""
    m7 = jnp.uint32(_M7)
    return (~(((w & m7) + m7) | w | m7)) & jnp.uint32(_M80)


def _ebsp_frame_words(w, rbsp_len, cap: int):
    """Emulation prevention + Annex-B framing over packed words.

    Args:
      w: uint32[T, R, 128] rbsp words, zeros beyond rbsp_len bytes.
      rbsp_len: int32[T, 1, 1] valid payload bytes per session.
      cap: static insertion budget (frames beyond it are flagged).

    Returns (nal_words uint32[T, R, 128], ins_eff int32[T, 1, 1]):
    the byte stream shifted right 5, 0x03 holes inserted, start code
    00 00 00 01 in place (byte 4 left zero for the caller's header
    patch), bytes beyond 5 + rbsp_len + ins_eff zeroed; ins_eff is the
    insertion total bumped by (cap + 1) when the zero-run window
    saturates, so out-of-contract frames always flag overflow.
    """
    T, R, C = w.shape
    one = jnp.uint32(0x01010101)
    idx_w = (jax.lax.broadcasted_iota(jnp.int32, w.shape, 1) * C
             + jax.lax.broadcasted_iota(jnp.int32, w.shape, 2))

    # Per-byte marks (high bit of each byte slot).
    zm = _mark_zero_bytes(w)
    lm = _mark_zero_bytes(w & jnp.uint32(0xFCFCFCFC))   # byte <= 3

    def mark_bit(marks, j):
        return ((marks >> jnp.uint32(31 - 8 * j)) & jnp.uint32(1)) \
            .astype(jnp.int32)

    m = [mark_bit(zm, j) for j in range(4)]
    le3 = [mark_bit(lm, j) for j in range(4)]

    # Trailing-zero-byte count of each word and the all-zero flag.
    z = m[3] * (1 + m[2] * (1 + m[1] * (1 + m[0])))
    a = m[0] * m[1] * m[2] * m[3]

    # Windowed scan of R[k] = z[k] + a[k] * R[k-1] over flat word order
    # (segments combine as (A, B) -> A products, B = B_r + A_r * B_l;
    # identity (1, 0) masks in for positions before the stream start).
    A, B = a, z
    s = 1
    while s < EBSP_WINDOW_WORDS:
        in_range = idx_w >= s
        A_l = jnp.where(in_range, _flat_roll3(A, s), 1)
        B_l = jnp.where(in_range, _flat_roll3(B, s), 0)
        B = B + A * B_l
        A = A * A_l
        s <<= 1

    first = idx_w < 1
    r_prev = jnp.where(first, 0, _flat_roll3(B, 1))
    sat_prev = jnp.where(
        first, 0, _flat_roll3(A * (idx_w >= EBSP_WINDOW_WORDS)
                              .astype(jnp.int32), 1))

    # Per-byte zero-run length t and insertion flags.
    lead = [jnp.ones_like(m[0]), m[0], m[0] * m[1], m[0] * m[1] * m[2]]
    c = [jnp.zeros_like(m[0]), m[0], m[1] * (1 + m[0]),
         m[2] * (1 + m[1] * (1 + m[0]))]
    ins = []
    sat_any = jnp.zeros_like(m[0])
    for j in range(4):
        t = c[j] + lead[j] * r_prev
        valid = (idx_w * 4 + j) < rbsp_len
        unresolved = lead[j] * sat_prev
        sat_any = jnp.maximum(sat_any,
                              jnp.where(valid, unresolved, 0))
        flag = (valid & (le3[j] > 0) & (t >= 2) & ((t & 1) == 0)
                & (unresolved == 0))
        ins.append(flag.astype(jnp.int32))

    c_word = ins[0] + ins[1] + ins[2] + ins[3]
    P = _flat_exclusive_cumsum3(c_word)
    s0 = P + ins[0]
    s1 = s0 + ins[1]
    s2 = s1 + ins[2]
    s3 = s2 + ins[3]

    ins_sum = jnp.sum(jnp.sum(c_word, axis=2, keepdims=True),
                      axis=1, keepdims=True)
    sat = jnp.max(jnp.max(sat_any, axis=2, keepdims=True),
                  axis=1, keepdims=True)
    ins_eff = ins_sum + sat * (cap + 1)

    # Packed per-byte shift counters (+5 framing offset, clamped to the
    # 5-bit SWAR budget — clamp only bites on already-flagged frames).
    def clamp5(x):
        return jnp.minimum(x, 26).astype(jnp.uint32) + jnp.uint32(5)

    rem = ((clamp5(s0) << jnp.uint32(24)) | (clamp5(s1) << jnp.uint32(16))
           | (clamp5(s2) << jnp.uint32(8)) | clamp5(s3))
    byte_pos = idx_w * 4

    def live_bit(j):
        return ((byte_pos + j) < rbsp_len).astype(jnp.uint32)

    live = ((live_bit(0) << jnp.uint32(24)) | (live_bit(1) << jnp.uint32(16))
            | (live_bit(2) << jnp.uint32(8)) | live_bit(3))

    # Monotone expansion: 5 masked byte-stream rotations, high bit
    # first (rem <= 31 throughout; AND-clears replace subtractions).
    vals = w
    ff = jnp.uint32(255)
    for b in (4, 3, 2, 1, 0):
        step = 1 << b
        v_r = _byte_roll_right3(vals, step)
        r_r = _byte_roll_right3(rem, step)
        l_r = _byte_roll_right3(live, step)
        take01 = ((r_r >> jnp.uint32(b)) & one) & l_r
        vac01 = ((rem >> jnp.uint32(b)) & one) & live
        mt = take01 * ff
        mv = vac01 * ff
        step_mask = jnp.uint32(step * 0x01010101)
        vals = (v_r & mt) | (vals & ~mt)
        rem = ((r_r & ~step_mask) & mt) | (rem & ~mt & ~mv)
        live = (live & ~vac01) | take01

    ml = live * ff
    out = (vals & ml) | (jnp.uint32(0x03030303) & ~ml)

    # Zero bytes at and beyond out_len = 5 + rbsp_len + ins_eff.
    out_len = 5 + rbsp_len + ins_eff
    keep = jnp.clip(out_len - byte_pos, 0, 4)
    sh = jnp.clip((4 - keep) * 8, 0, 31).astype(jnp.uint32)
    tail_mask = jnp.where(keep <= 0, jnp.uint32(0),
                          jnp.uint32(0xFFFFFFFF) << sh)
    out = out & tail_mask

    # Annex-B prefix: bytes 0-3 = 00 00 00 01; byte 4 (header) left 0
    # for the caller's traced-header patch.
    out = jnp.where(idx_w == 0, jnp.uint32(0x00000001),
                    jnp.where(idx_w == 1, out & jnp.uint32(0x00FFFFFF),
                              out))
    return out, ins_eff


def _emit_kernel(pat_ref, nb_ref, out_ref, meta_ref, *, p: int,
                 r_out: int, cap: int, align: bool = False,
                 tb_lane: int | None = None):
    """One fused emit tile.  `align`: nbits may carry negative
    sentinels marking I_PCM alignment slots — resolved in-kernel by the
    same affine phase scan _finish_splice ran in XLA (13 HBM-round-trip
    passes there; VMEM-resident here).  `tb_lane`: static lane index at
    which to materialize the rbsp_trailing_bits symbol (the caller
    passes raw payload symbols and skips its two full-array concats)."""
    pat = pat_ref[:]
    nb = nb_ref[:]
    T = pat.shape[0]

    if align or tb_lane is not None:
        C = pat.shape[2]
        idx_f = (jax.lax.broadcasted_iota(jnp.int32, pat.shape, 1) * C
                 + jax.lax.broadcasted_iota(jnp.int32, pat.shape, 2))
    if align:
        # pcm_alignment_zero_bits: slot width is (-pos) mod 8 at the
        # slot's running bit position — the affine (keep, add) phase
        # recurrence phase[i] = (add[i] + keep[i]*phase[i-1]) mod 8
        # as a log-step linear-recurrence scan over flat lane order.
        is_align = nb < 0
        A = jnp.where(is_align, 0, 1)
        B = jnp.where(is_align, 0, nb & 7)
        s = 1
        while s < p:
            in_range = idx_f >= s
            A_l = jnp.where(in_range, _flat_roll3(A, s), 1)
            B_l = jnp.where(in_range, _flat_roll3(B, s), 0)
            B = (B + A * B_l) & 7
            A = A * A_l
            s <<= 1
        phase_before = jnp.where(idx_f < 1, 0, _flat_roll3(B, 1))
        nb = jnp.where(is_align, (8 - phase_before) & 7, nb)
    if tb_lane is not None:
        payload_bits = jnp.sum(jnp.sum(nb, axis=2, keepdims=True),
                               axis=1, keepdims=True)
        tb_n = 1 + ((8 - ((payload_bits + 1) & 7)) & 7)
        tb_pat = (jnp.uint32(1)
                  << (tb_n - 1).astype(jnp.uint32))
        is_tb = idx_f == tb_lane
        nb = jnp.where(is_tb, tb_n, nb)
        pat = jnp.where(is_tb, tb_pat, pat)

    words = _place_rounds3(pat, nb, p)
    total_bits = jnp.sum(jnp.sum(nb, axis=2, keepdims=True),
                         axis=1, keepdims=True)
    rbsp_len = total_bits // 8          # trailing bits guarantee alignment

    R_p = words.shape[1]
    if R_p >= r_out:
        w = jax.lax.slice_in_dim(words, 0, r_out, axis=1)
    else:
        w = jnp.concatenate(
            [words, jnp.zeros((T, r_out - R_p, 128), jnp.uint32)], axis=1)

    nal, ins_eff = _ebsp_frame_words(w, rbsp_len, cap)
    out_ref[:] = nal

    row = jax.lax.broadcasted_iota(jnp.int32, (T, 8, 128), 1)
    meta_ref[:] = jnp.where(row == 0, total_bits,
                            jnp.where(row == 1, ins_eff, 0))


def emit_nal_fused_batch(patterns, nbits, n_nal: int, cap: int,
                         tile: int | None = None, align: bool = False,
                         append_tb: bool = False):
    """[B, n] batched fused emit; `tile` sessions per program instance
    (same tiling sweet spot as the pack: 4).  `align` resolves negative
    nbits sentinels (I_PCM alignment) in-kernel; `append_tb`
    materializes the trailing-bits symbol at lane n in-kernel (callers
    then pass raw payload symbols, no XLA concat).  Returns
    (nal_words uint32[B, n_nal_pad//4], total_bits int32[B],
    ins_eff int32[B])."""
    from jax.experimental import pallas as pl

    B, n = patterns.shape
    if tile is None:
        tile = 4 if B % 4 == 0 else (2 if B % 2 == 0 else 1)
    assert B % tile == 0
    patterns = jnp.asarray(patterns, jnp.uint32)
    nbits = jnp.asarray(nbits, jnp.int32)

    # One spare lane for the last symbol's word spill, plus the
    # trailing-bits lane itself when the kernel appends it.
    spare = 2 if append_tb else 1
    padded = -(-(n + spare) // 128) * 128
    pat = jnp.pad(patterns, ((0, 0), (0, padded - n)))
    nb = jnp.pad(nbits, ((0, 0), (0, padded - n)))
    R_s = padded // 128
    pat = pat.reshape(B, R_s, 128)
    nb = nb.reshape(B, R_s, 128)

    r_out = -(-n_nal // 512)
    interpret = jax.default_backend() != "tpu"
    out, meta = pl.pallas_call(
        functools.partial(_emit_kernel, p=padded, r_out=r_out, cap=cap,
                          align=align,
                          tb_lane=n if append_tb else None),
        grid=(B // tile,),
        in_specs=[pl.BlockSpec((tile, R_s, 128), lambda i: (i, 0, 0)),
                  pl.BlockSpec((tile, R_s, 128), lambda i: (i, 0, 0))],
        out_specs=[pl.BlockSpec((tile, r_out, 128), lambda i: (i, 0, 0)),
                   pl.BlockSpec((tile, 8, 128), lambda i: (i, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((B, r_out, 128), jnp.uint32),
                   jax.ShapeDtypeStruct((B, 8, 128), jnp.int32)],
        interpret=interpret,
    )(pat, nb)
    return (out.reshape(B, -1), meta[:, 0, 0], meta[:, 1, 0])


@functools.lru_cache(maxsize=None)
def _emit_fused_cv(n_nal: int, cap: int, align: bool, append_tb: bool):
    from jax.custom_batching import custom_vmap

    kw = dict(align=align, append_tb=append_tb)

    @custom_vmap
    def f(patterns, nbits):
        words, tb, ie = emit_nal_fused_batch(
            patterns[None], nbits[None], n_nal, cap, **kw)
        return words[0], tb[0], ie[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, patterns, nbits):  # noqa: ANN001
        if not in_batched[0]:
            patterns = jnp.broadcast_to(
                patterns[None], (axis_size,) + patterns.shape)
        if not in_batched[1]:
            nbits = jnp.broadcast_to(nbits[None], (axis_size,) + nbits.shape)
        if patterns.ndim > 2:
            lead = patterns.shape[:-1]
            w, tb, ie = emit_nal_fused_batch(
                patterns.reshape(-1, patterns.shape[-1]),
                nbits.reshape(-1, nbits.shape[-1]), n_nal, cap, **kw)
            out = (w.reshape(lead + (w.shape[-1],)), tb.reshape(lead),
                   ie.reshape(lead))
        else:
            out = emit_nal_fused_batch(patterns, nbits, n_nal, cap, **kw)
        return out, (True, True, True)

    return f


def finish_nal_fused(patterns, nbits, n_rbsp: int, nal_ref_idc, *,
                     max_insertions: int, has_align: bool = False,
                     append_trailing: bool = False):
    """Drop-in fused replacement for the bounded back end of
    models/scroll.finish_slice and models/splice_device._finish_splice:
    takes the same (patterns, nbits) the unfused pack receives and
    returns the same (nal u8[n_nal], nal_len, total_bits, overflow)
    tuple, byte-identical for in-contract frames.  With
    `append_trailing` the caller passes RAW payload symbols — the
    I_PCM alignment phase scan (`has_align`, negative-nbits sentinels)
    and the rbsp_trailing_bits symbol run inside the kernel, saving
    the XLA-side associative scan and two full-array concats."""
    n_nal = (5 + n_rbsp + max_insertions + 11) // 4 * 4
    words, total_bits, ins_eff = _emit_fused_cv(
        n_nal, max_insertions, has_align, append_trailing)(patterns, nbits)

    rbsp_len = total_bits // 8
    overflow = (total_bits > jnp.int32(n_rbsp * 8)) \
        | (ins_eff > max_insertions)

    header_byte = (((nal_ref_idc & 0x03) << 5) | 0x01)
    hdr = jnp.asarray(header_byte, jnp.uint32) << jnp.uint32(24)
    words = words.at[1].set(words[1] | hdr)

    from .bitpack import words_to_bytes
    out = words_to_bytes(words)[:n_nal]
    return out, 5 + rbsp_len + ins_eff, total_bits, overflow
