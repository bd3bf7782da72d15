"""Vectorized RBSP <-> EBSP emulation prevention.

The reference runs a serial 3-state zero-count automaton over every payload
byte (rbsp_to_ebsp src/nal.c:24-50, ebsp_to_rbsp src/nal_parser.c:67-88).
Both directions reduce to a *closed form* over the input: the automaton state
before byte i depends only on t_i, the length of the run of zero bytes
immediately preceding i (state = 0 if t==0 else 1 if t odd else 2, because an
inserted/removed 0x03 resets the count to 0 and the following copied zero
re-arms it to 1).  Hence:

  insert 0x03 before byte i  iff  b[i] <= 3 and t_i >= 2 and t_i even
  remove byte i              iff  b[i] == 3 and b[i+1] <= 3 and t_i >= 2

which is a pure stencil + prefix-sum compaction — no sequential scan.

Both jit-able padded-array versions (device hot path) and plain numpy
versions (host parse path) are provided; they are differentially tested
against a serial automaton in tests/test_ebsp.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _zero_run_before(b, valid):
    """t_i: number of consecutive zero bytes immediately before index i."""
    n = b.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    nz = jnp.where(valid & (b != 0), idx, jnp.int32(-1))
    last_nz = jax.lax.associative_scan(jnp.maximum, nz)
    last_nz_before = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), last_nz[:-1]])
    return idx - 1 - last_nz_before


# Static window for the bounded zero-run tracker: composed CAVLC payloads
# never carry anywhere near 64 consecutive zero bytes (the longest legal
# zero-bit runs are ~25-bit ue/se prefixes), so positions whose window
# holds no nonzero byte are treated as out of contract and flagged via
# the same overflow path as the insertion budget.
ZERO_RUN_WINDOW = 64


def _zero_run_windowed(b, valid):
    """(t_i u8, saturated): zero-run length via a windowed min-plus scan
    in uint8 — log2(W)+1 static-shift passes on byte lanes (4x less VPU
    traffic than the index-based int32 form).  Exact for runs <=
    ZERO_RUN_WINDOW - 1 (a ZERO_RUN_WINDOW-byte run already saturates:
    the preceding nonzero byte falls outside the window) or when the run
    reaches the stream start; `saturated` marks any valid position where
    it cannot be resolved.  Unresolved positions report t=255 (odd, so
    they never trigger an insertion — deterministic garbage, and the
    saturated flag forces the overflow path regardless)."""
    n = b.shape[0]
    inf = jnp.uint8(255)
    # A_w[i] = distance (>=1) to the nearest nonzero byte within w back.
    nz1 = jnp.where(valid & (b != 0), jnp.uint8(1), inf)

    def shifted(a, s, fill):
        return jnp.concatenate([jnp.full((s,), fill, jnp.uint8), a[:-s]]) \
            if s < n else jnp.full((n,), fill, jnp.uint8)

    acc = shifted(nz1, 1, inf)
    w = 1
    while w < ZERO_RUN_WINDOW:
        stepped = shifted(acc, w, inf)
        bumped = jnp.where(stepped == inf, inf,
                           jnp.minimum(stepped + jnp.uint8(w), inf))
        acc = jnp.minimum(acc, bumped)
        w *= 2
    found = acc != inf
    idx8 = jnp.minimum(jnp.arange(n, dtype=jnp.int32), 255).astype(jnp.uint8)
    t = jnp.where(found, acc - jnp.uint8(1), idx8)  # no nz -> run from start
    idx = jnp.arange(n, dtype=jnp.int32)
    saturated = valid & ~found & (idx > ZERO_RUN_WINDOW)
    return t, saturated


def rbsp_to_ebsp(rbsp, n, max_out: int):
    """Insert emulation-prevention 0x03 bytes (jit-able).

    Args:
      rbsp: uint8[max_in] padded payload.
      n: valid length (traced scalar).
      max_out: static output capacity (worst case n + n//2).

    Returns (ebsp uint8[max_out], out_len int32).
    """
    b = jnp.asarray(rbsp, jnp.uint8)
    size = b.shape[0]
    idx = jnp.arange(size, dtype=jnp.int32)
    valid = idx < n

    t = _zero_run_before(b, valid)
    ins = valid & (b <= 3) & (t >= 2) & (t % 2 == 0)

    pos = idx + jnp.cumsum(ins.astype(jnp.int32))  # landing spot of b[i]
    out = jnp.zeros((max_out,), jnp.uint8)
    out = out.at[jnp.where(valid, pos, max_out)].set(b, mode="drop")
    out = out.at[jnp.where(ins, pos - 1, max_out)].set(jnp.uint8(3), mode="drop")
    out_len = n + jnp.sum(ins.astype(jnp.int32))
    return out, out_len


def ebsp_to_rbsp(ebsp, n, max_out: int):
    """Strip emulation-prevention 0x03 bytes (jit-able)."""
    b = jnp.asarray(ebsp, jnp.uint8)
    size = b.shape[0]
    idx = jnp.arange(size, dtype=jnp.int32)
    valid = idx < n

    t = _zero_run_before(b, valid)
    nxt = jnp.concatenate([b[1:], jnp.full((1,), 0xFF, jnp.uint8)])
    has_next = (idx + 1) < n
    remove = valid & (b == 3) & has_next & (nxt <= 3) & (t >= 2)

    keep = valid & ~remove
    pos = jnp.cumsum(keep.astype(jnp.int32)) - keep.astype(jnp.int32)
    out = jnp.zeros((max_out,), jnp.uint8)
    out = out.at[jnp.where(keep, pos, max_out)].set(b, mode="drop")
    out_len = jnp.sum(keep.astype(jnp.int32))
    return out, out_len


def rbsp_to_ebsp_gather(rbsp, n, max_out: int):
    """Gather-based emulation prevention (TPU hot path).

    Scatter lowers to a serialized loop on TPU (~51 ms per 64-session
    720p batch); instead each *output* byte pulls its source: with qs the
    sorted output positions of inserted 0x03 bytes, output j is 0x03 when
    j is in qs, else input[j - #insertions<=j].  qs is built by the same
    searchsorted-compaction trick as ops/bitpack.compact_symbols.
    """
    b = jnp.asarray(rbsp, jnp.uint8)
    size = b.shape[0]
    idx = jnp.arange(size, dtype=jnp.int32)
    valid = idx < n

    t = _zero_run_before(b, valid)
    ins = valid & (b <= 3) & (t >= 2) & (t % 2 == 0)

    ins_i = ins.astype(jnp.int32)
    cum = jnp.cumsum(ins_i)                  # inclusive count
    total_ins = cum[-1] if size else jnp.int32(0)

    # qs[k] = output position of the k-th inserted 0x03
    #       = (input index of k-th insertion) + k.
    src_k = jnp.searchsorted(cum, jnp.arange(1, size + 1, dtype=jnp.int32),
                             side="left")
    src_k = jnp.clip(src_k, 0, size - 1)
    qs = jnp.where(jnp.arange(size, dtype=jnp.int32) < total_ins,
                   src_k + jnp.arange(size, dtype=jnp.int32),
                   jnp.int32(2 ** 30))

    out_idx = jnp.arange(max_out, dtype=jnp.int32)
    r = jnp.searchsorted(qs, out_idx, side="right")
    r_safe = jnp.clip(r - 1, 0, size - 1)
    is_ins = (r > 0) & (qs[r_safe] == out_idx)
    src = jnp.clip(out_idx - r, 0, size - 1)
    out_len = n + total_ins
    out = jnp.where(out_idx < out_len,
                    jnp.where(is_ins, jnp.uint8(3), b[src]),
                    jnp.uint8(0))
    return out, out_len


def _shifts_u8_two_level(ins):
    """Insertion-count prefix sum on uint8 lanes via a two-level scan.

    jnp.cumsum over the ~9K-byte stream runs its log-step passes in
    int32; reshaping to [rows, 128] uint8 lanes and composing an
    intra-row log-step scan with a tiny cross-row carry scan moves 4x
    less data per pass (measured ~8% off the whole bounded EBSP stage
    at batch-256 splice shapes, scripts/ebsp_cumsum_probe.py).  Sums
    past 255 wrap — harmless, because any stream with >255 insertions
    already exceeds every bounded-path budget and is flagged for the
    exact path by the separately-computed exact int32 total.

    Returns (inclusive prefix counts uint8[n], exact total int32).
    """
    size = ins.shape[0]
    cols = 128
    rows = -(-size // cols)
    x = ins.astype(jnp.uint8)
    if rows * cols != size:
        x = jnp.pad(x, (0, rows * cols - size))
    inc = x.reshape(rows, cols)
    w = 1
    while w < cols:
        inc = inc + jnp.pad(inc, ((0, 0), (w, 0)))[:, :cols]
        w *= 2
    row_tot = inc[:, -1].astype(jnp.int32)
    carry = (jnp.cumsum(row_tot) - row_tot).astype(jnp.uint8)
    s = (inc + carry[:, None]).reshape(-1)[:size]
    total = jnp.sum(ins, dtype=jnp.int32)
    return s, total


def rbsp_to_ebsp_tree(rbsp, n, max_out: int,
                      max_insertions: int | None = None):
    """Gather-free emulation prevention via monotone log-step expansion.

    TPU has no hardware gather; instead each byte's output position is
    input position + (#insertions before it) — a non-decreasing shift —
    so the whole stream moves with log2(max_out) masked static rolls
    (ops/bitpack.monotone_expand) and the vacated holes become 0x03.

    max_insertions statically bounds the insertion count, halving the
    expansion passes, and switches the zero-run tracker to the windowed
    form (real composed streams have ~0-5 insertions per frame and
    zero-byte runs of a couple bytes).  Streams exceeding either bound
    come back CORRUPT with (out_len - n) > max_insertions — the caller
    must treat that as an overflow and re-emit through the exact
    unbounded path (max_insertions=None), as ComposerSession does; the
    bounds are a fast-path contract, not a capability limit.
    """
    from .bitpack import monotone_expand

    b = jnp.asarray(rbsp, jnp.uint8)
    size = b.shape[0]
    idx = jnp.arange(size, dtype=jnp.int32)
    valid = idx < n

    if max_insertions is None:
        t = _zero_run_before(b, valid)
        sat = jnp.int32(0)
    else:
        t, saturated = _zero_run_windowed(b, valid)
        sat = jnp.any(saturated).astype(jnp.int32) * (max_insertions + 1)
    ins = valid & (b <= 3) & (t >= 2) & (t % 2 == 0)
    if max_insertions is not None and max_insertions <= 255:
        # Bounded path: shift counts fit uint8 lanes end to end — both
        # the prefix scan and the expansion's rem arrays then move 4x
        # less data per pass.  Wrapped shifts only occur on streams the
        # exact total already flags for the exact-path retry.
        shifts, total = _shifts_u8_two_level(ins)
    else:
        shifts = jnp.cumsum(ins.astype(jnp.int32))
        total = shifts[-1] if size else jnp.int32(0)
    total_ins = total + sat
    out_len = n + total_ins
    out, live = monotone_expand(b, shifts, valid, max_out,
                                jnp.uint8(3), max_shift=max_insertions)
    out_idx = jnp.arange(max_out, dtype=jnp.int32)
    out = jnp.where(out_idx < out_len, out, jnp.uint8(0))
    return out, out_len


# ---------------------------------------------------------------------------
# Host (numpy) versions for the parse / session-setup path.
# ---------------------------------------------------------------------------

def _zero_run_before_np(b):
    n = b.shape[0]
    idx = np.arange(n, dtype=np.int64)
    nz = np.where(b != 0, idx, -1)
    last_nz = np.maximum.accumulate(nz)
    last_nz_before = np.concatenate([[-1], last_nz[:-1]])
    return idx - 1 - last_nz_before


def rbsp_to_ebsp_np(rbsp: np.ndarray) -> np.ndarray:
    b = np.asarray(rbsp, np.uint8)
    if b.size == 0:
        return b.copy()
    t = _zero_run_before_np(b)
    ins = (b <= 3) & (t >= 2) & (t % 2 == 0)
    out = np.empty(b.size + int(ins.sum()), np.uint8)
    pos = np.arange(b.size) + np.cumsum(ins)
    out[pos] = b
    out[pos[ins] - 1] = 3
    return out


def ebsp_to_rbsp_np(ebsp: np.ndarray) -> np.ndarray:
    b = np.asarray(ebsp, np.uint8)
    if b.size == 0:
        return b.copy()
    t = _zero_run_before_np(b)
    nxt = np.concatenate([b[1:], [0xFF]])
    has_next = np.arange(b.size) + 1 < b.size
    remove = (b == 3) & has_next & (nxt <= 3) & (t >= 2)
    return b[~remove]
