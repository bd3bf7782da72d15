"""On-device dynamic-rect splice kernel.

BASELINE config "dynamic-rect splice: pre-encoded 360x360 CAVLC MBs
composited into 1280x720 P-frames".  Division of labor:

  host (native C++ parser, numpy fallback): parse the donor slice
    (bit-serial by nature), resolve every residual block's nC / 
    coeff_token in the *composite* geometry (rect position is static per
    compiled program, so composite nC is host-computable at prep time),
    and pre-pack each donor macroblock's entire bit-string into dense
    <=32-bit chunks — row-contiguous with host-encoded interior skip
    runs (pack_donor_rows), or per-MB chunk classes (prepare_donor_dense).

  device (one jitted program): lay the donor chunk stream into the
    frame's macroblock symbol grid alongside background/motion-region
    MBs and skip runs — every donor-dependent value (chunks, first_c,
    coded mask, composite MV edge roles) is a traced array, so one
    compiled program serves arbitrarily many donors per geometry class —
    then run the standard pack -> emulation prevention -> NAL pipeline.

Rect geometry is static per compiled program (position may vary per
session config; content varies per frame).  The original slotted
device-repair kernel (device-side nC stencil + token lookup per residual
block) was superseded by this host-resolved dense layout — ~10x fewer
device symbols — and deleted in round 4; see ops/cavlc.luma_nC/chroma_nC
for the canonical nC rule and _host_luma_nc/_host_chroma_nc below for
the composite-geometry stencil.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ComposerConfig
from ..ops import bitpack, ebsp, expgolomb
from ..ops import cavlc_tables as T
from ..syntax.slice_headers import p_slice_header_symbols
from . import mb_transcode as mbt
from . import scroll as scroll_model

# Per-donor-MB symbol slot budget:
#   PRE:   pre-residual syntax (mb_type..cbp/qp) as <=32-bit chunks.
#          Worst case is P_8x8 with 4 sub_mb_types of 4 MVs each:
#          1 mb_type + 4 sub + 4 ref + 32 mvd + 1 cbp + 1 qp = 43.
#   per block (27 blocks in emission order): 1 token slot + TAIL chunks.
#   TAIL_CHUNKS is chosen per donor from the actual residual density
#   (quantized so jit programs are shared within a class); 16 covers the
#   absolute worst case (16 coefficients with 12-bit escape suffixes).
PRE_SLOTS = 48
TAIL_CHUNK_CLASSES = (2, 4, 8, 16)
TAIL_CHUNKS = 16
N_BLOCKS = 27

# Residual-block slot meaning (mirrors native/cavlc_decode.cpp layout):
# [0] luma DC (i16x16), [1..16] luma raster, [17] cbDC, [18] crDC,
# [19..26] chroma AC.  Emission ORDER differs per MB kind; the host
# records symbols in emission order directly, so the device only needs
# (block_id -> nC class) metadata per token slot.

# nC class codes for the token table lookup.
CLASS_NC0, CLASS_NC2, CLASS_NC4, CLASS_FLC, CLASS_CHROMA = 0, 1, 2, 3, 4

# Sentinel nbits for pcm_alignment_zero_bits slots: the actual width
# depends on the final stream bit position and is resolved on device by
# the phase scan in _finish_splice.
ALIGN_SENTINEL = -1


@functools.lru_cache(maxsize=1)
def token_tables():
    """Constant token pattern/length tables: [class 0..4][tc 0..16][t1 0..3].

    class: 0 = nC<2, 1 = nC<4, 2 = nC<8, 3 = nC>=8 (FLC), 4 = chroma DC.
    Invalid (tc,t1) combinations hold zeros (never selected).
    """
    pat = np.zeros((5, 17, 4), np.uint32)
    ln = np.zeros((5, 17, 4), np.int32)
    for ci, cls in enumerate(("nc0", "nc2", "nc4")):
        for (tc, t1), code in T._TOKEN_TABLES[cls].items():
            pat[ci, tc, t1] = int(code, 2)
            ln[ci, tc, t1] = len(code)
    for tc in range(17):
        for t1 in range(min(3, tc) + 1):
            code = T.coeff_token_code(8, tc, t1)
            pat[CLASS_FLC, tc, t1] = int(code, 2)
            ln[CLASS_FLC, tc, t1] = len(code)
    for (tc, t1), code in T._TOKEN_TABLES["chroma_dc"].items():
        pat[CLASS_CHROMA, tc, t1] = int(code, 2)
        ln[CLASS_CHROMA, tc, t1] = len(code)
    # Cache NUMPY arrays: caching jnp arrays would leak tracers when the
    # first call happens inside a jit trace.
    return pat, ln


@dataclasses.dataclass
class DonorSymbols:
    """Host-prepared device arrays for one donor rect (R x C macroblocks).

    All arrays are row-major over donor MBs (index m = r*C + c).
    """
    pre_patterns: np.ndarray      # u32 [M, PRE_SLOTS]
    pre_nbits: np.ndarray         # i32 [M, PRE_SLOTS]
    tail_patterns: np.ndarray     # u32 [M, N_BLOCKS, TAIL_CHUNKS]
    tail_nbits: np.ndarray        # i32 [M, N_BLOCKS, TAIL_CHUNKS]
    # token metadata, indexed by *emission position* 0..N_BLOCKS-1:
    tok_tc: np.ndarray            # i32 [M, N_BLOCKS] total_coeff
    tok_t1: np.ndarray            # i32 [M, N_BLOCKS] trailing_ones
    tok_present: np.ndarray       # bool [M, N_BLOCKS]
    tok_block_id: np.ndarray      # i32 [M, N_BLOCKS] canonical block id
    # context grids (for the composite nC stencil):
    luma_tc: np.ndarray           # i32 [M, 16] raster order
    chroma_tc: np.ndarray         # i32 [M, 2, 4]
    coded: np.ndarray             # bool [M] (False = donor P_Skip)
    ipcm: np.ndarray              # bool [M]


def _bits_of_str(s: str) -> tuple:
    """bit-string -> list of (pattern, nbits) chunks of <=32 bits."""
    out = []
    for i in range(0, len(s), 32):
        piece = s[i:i + 32]
        out.append((int(piece, 2) if piece else 0, len(piece)))
    return out


class _SlotWriter:
    """Accumulate (pattern, nbits) pairs into fixed slot arrays."""

    def __init__(self, n_slots: int):
        self.patterns = np.zeros(n_slots, np.uint32)
        self.nbits = np.zeros(n_slots, np.int32)
        self.i = 0

    def put(self, pattern: int, nbits: int) -> None:
        if nbits == 0:
            return
        assert self.i < self.patterns.size, "slot budget exceeded"
        self.patterns[self.i] = pattern & 0xFFFFFFFF
        self.nbits[self.i] = nbits  # may be ALIGN_SENTINEL (-1)
        self.i += 1

    def put_ue(self, v: int) -> None:
        vp1 = v + 1
        m = vp1.bit_length() - 1
        self.put(vp1, 2 * m + 1)

    def put_se(self, v: int) -> None:
        self.put_ue(2 * v - 1 if v > 0 else -2 * v)

    def put_bits_str(self, s: str) -> None:
        for p, n in _bits_of_str(s):
            self.put(p, n)


def _emission_blocks(mb: mbt.Macroblock):
    """Yield (block_id, ResidualBlock, nc_kind) in emission order.

    nc_kind: 'luma' (needs luma nC), 'chroma' (AC, needs chroma nC),
    'cdc' (chroma DC, fixed class).  block_id matches the canonical
    layout (0 luma DC, 1+raster luma, 17/18 chroma DC, 19+ chroma AC).
    """
    cbp_luma = mb.cbp & 0xF
    cbp_chroma = (mb.cbp >> 4) & 0x3
    if mb.kind == "i16x16":
        yield 0, mb.luma_dc, "luma"
        for s in range(16):
            raster = T.SCAN_TO_RASTER[s]
            if cbp_luma & (1 << (s // 4)):
                yield 1 + raster, mb.luma[raster], "luma"
    elif mb.kind in ("inter", "i4x4"):
        if mb.cbp > 0:
            for s in range(16):
                raster = T.SCAN_TO_RASTER[s]
                if cbp_luma & (1 << (s // 4)):
                    yield 1 + raster, mb.luma[raster], "luma"
    if mb.cbp > 0 or mb.kind == "i16x16":
        if cbp_chroma > 0:
            yield 17, mb.cb_dc, "cdc"
            yield 18, mb.cr_dc, "cdc"
            if cbp_chroma == 2:
                for c in range(2):
                    for k in range(4):
                        yield 19 + c * 4 + k, mb.chroma_ac[c][k], "chroma"


def _tail_chunk_class(donor_grid: list) -> int:
    """Smallest TAIL_CHUNK_CLASSES entry covering every residual tail."""
    need = 1
    for row in donor_grid:
        for mb in row:
            if mb is mbt.SKIP:
                continue
            if mb.kind == "ipcm":
                # 384 sample bytes = 96 chunks over N_BLOCKS slots.
                need = max(need, -(-96 // N_BLOCKS))
                continue
            for _bid, blk, _k in _emission_blocks(mb):
                if blk is not None and blk.tail:
                    need = max(need, (len(blk.tail) + 31) // 32)
    for cls in TAIL_CHUNK_CLASSES:
        if need <= cls:
            return cls
    return TAIL_CHUNKS


def prepare_donor_symbols(donor_grid: list, num_ref_idx_l0: int,
                          donor_ref_map: tuple = (0,)) -> DonorSymbols:
    """Flatten a parsed donor MB grid into device-ready symbol arrays.

    Tail-chunk slots are sized to the donor's residual density (quantized
    to TAIL_CHUNK_CLASSES so compiled programs are shared per class)."""
    rows, cols = len(donor_grid), len(donor_grid[0])
    m_total = rows * cols
    tail_chunks = _tail_chunk_class(donor_grid)
    ds = DonorSymbols(
        pre_patterns=np.zeros((m_total, PRE_SLOTS), np.uint32),
        pre_nbits=np.zeros((m_total, PRE_SLOTS), np.int32),
        tail_patterns=np.zeros((m_total, N_BLOCKS, tail_chunks), np.uint32),
        tail_nbits=np.zeros((m_total, N_BLOCKS, tail_chunks), np.int32),
        tok_tc=np.zeros((m_total, N_BLOCKS), np.int32),
        tok_t1=np.zeros((m_total, N_BLOCKS), np.int32),
        tok_present=np.zeros((m_total, N_BLOCKS), bool),
        tok_block_id=np.zeros((m_total, N_BLOCKS), np.int32),
        luma_tc=np.zeros((m_total, 16), np.int32),
        chroma_tc=np.zeros((m_total, 2, 4), np.int32),
        coded=np.zeros(m_total, bool),
        ipcm=np.zeros(m_total, bool),
    )

    from .splice import _map_donor_refs

    for r in range(rows):
        for c in range(cols):
            m = r * cols + c
            mb = donor_grid[r][c]
            if mb is mbt.SKIP:
                continue
            mb = _map_donor_refs(mbt.retype_for_p(mb), donor_ref_map,
                                 num_ref_idx_l0)
            ds.coded[m] = True
            if mb.kind == "ipcm":
                # I_PCM: mb_type, pcm_alignment_zero_bits (position-
                # dependent — encoded as an ALIGN slot with sentinel
                # nbits=-1, resolved on device by the phase scan in
                # _finish_splice), then 384 sample bytes as 96
                # 32-bit chunks spread over the tail-chunk slots.
                ds.ipcm[m] = True
                # Spec 9.2.1: I_PCM neighbors see nN = 16 (see
                # mb_transcode.ipcm_context).
                ds.luma_tc[m] = 16
                ds.chroma_tc[m] = 16
                w = _SlotWriter(PRE_SLOTS)
                w.put_ue(mb.mb_type)
                w.put(0, ALIGN_SENTINEL)
                ds.pre_patterns[m] = w.patterns
                ds.pre_nbits[m] = w.nbits
                words = np.frombuffer(mb.ipcm_samples, np.uint8)
                words = words.reshape(96, 4)
                vals = ((words[:, 0].astype(np.uint32) << 24)
                        | (words[:, 1].astype(np.uint32) << 16)
                        | (words[:, 2].astype(np.uint32) << 8)
                        | words[:, 3].astype(np.uint32))
                tc = ds.tail_patterns.shape[2]
                for k, v in enumerate(vals):
                    ds.tail_patterns[m, k // tc, k % tc] = v
                    ds.tail_nbits[m, k // tc, k % tc] = 32
                # tok_present stays False: no coeff_tokens — the sample
                # chunks pass through verbatim via the tail slots when
                # the dense chunk fuser flattens this MB.
                continue

            w = _SlotWriter(PRE_SLOTS)
            w.put_ue(mb.mb_type)
            if mb.kind == "inter":
                if mb.mb_type >= 3:
                    for s in mb.sub_mb_types:
                        w.put_ue(s)
                if num_ref_idx_l0 > 1 and mb.mb_type != 4 and mb.ref_idx:
                    for ref in mb.ref_idx:
                        if num_ref_idx_l0 == 2:
                            w.put(1 - (ref & 1), 1)
                        else:
                            w.put_ue(ref)
                for mvd_x, mvd_y in mb.mvds:
                    w.put_se(mvd_x)
                    w.put_se(mvd_y)
                w.put_ue(T.CBP_INTER_INV[mb.cbp])
                if mb.cbp > 0:
                    w.put_se(mb.qp_delta)
            elif mb.kind == "i4x4":
                w.put_bits_str(mb.pred_mode_bits)
                w.put_ue(mb.chroma_pred)
                w.put_ue(T.CBP_INTRA_INV[mb.cbp])
                if mb.cbp > 0:
                    w.put_se(mb.qp_delta)
            elif mb.kind == "i16x16":
                w.put_ue(mb.chroma_pred)
                w.put_se(mb.qp_delta)
            ds.pre_patterns[m] = w.patterns
            ds.pre_nbits[m] = w.nbits

            for pos, (block_id, blk, _kind) in enumerate(
                    _emission_blocks(mb)):
                ds.tok_present[m, pos] = True
                ds.tok_block_id[m, pos] = block_id
                ds.tok_tc[m, pos] = blk.total_coeff
                ds.tok_t1[m, pos] = blk.trailing_ones
                for k, (p, n) in enumerate(_bits_of_str(blk.tail)):
                    ds.tail_patterns[m, pos, k] = p
                    ds.tail_nbits[m, pos, k] = n

            ds.luma_tc[m] = [b.total_coeff for b in mb.luma]
            ds.chroma_tc[m] = [[b.total_coeff for b in plane]
                               for plane in mb.chroma_ac]
    return ds


# ---------------------------------------------------------------------------
# Dense donor path: host-side nC + token resolution and bit pre-packing.
#
# The rect position (hence its frame-edge flags) is static per compiled
# program, so the composite-geometry nC of every donor residual block is
# fully determined on the host at prep time: outside-rect neighbors are
# coded-with-zero-residual macroblocks (tc=0, available) except past frame
# edges (spec 9.2.1 availability, ops/cavlc.luma_nC/chroma_nC).  With
# tokens resolved on host, a donor MB's entire bit-string is constant
# and pre-packs into dense 32-bit chunks (~8-16 symbols/MB instead of the
# superseded slotted form's ~130), which shrinks the device merge tree's
# symbol count and HBM traffic by an order of magnitude.
# ---------------------------------------------------------------------------

# Per-MB dense chunk budget classes (jit programs shared per class).
# 104 covers I_PCM (1 mb_type chunk + align + 96 sample chunks); 352
# covers the absolute worst legal CAVLC macroblock (~11k bits).
MB_CHUNK_CLASSES = (4, 8, 12, 16, 24, 32, 48, 64, 104, 352)


def _host_luma_nc(luma_tc: np.ndarray, at_left: bool, at_top: bool
                  ) -> np.ndarray:
    """Composite-geometry luma nC stencil: [R, C, 16] -> [R, C, 16]."""
    R, C = luma_tc.shape[:2]
    g = luma_tc.reshape(R, C, 4, 4).transpose(0, 2, 1, 3).reshape(R * 4,
                                                                  C * 4)
    ga = np.pad(g, ((1, 0), (1, 0)))
    nA, nB = ga[1:, :-1], ga[:-1, 1:]
    col = np.broadcast_to(np.arange(C * 4)[None, :], g.shape)
    row = np.broadcast_to(np.arange(R * 4)[:, None], g.shape)
    availA = ~(at_left & (col == 0))
    availB = ~(at_top & (row == 0))
    both = availA & availB
    nc = np.where(both, (nA + nB + 1) >> 1,
                  np.where(availA, nA, np.where(availB, nB, 0)))
    return nc.reshape(R, 4, C, 4).transpose(0, 2, 1, 3).reshape(R, C, 16)


def _host_chroma_nc(chroma_tc: np.ndarray, at_left: bool, at_top: bool
                    ) -> np.ndarray:
    """Composite-geometry chroma nC stencil: [R, C, 2, 4] -> [R, C, 2, 4]."""
    R, C = chroma_tc.shape[:2]
    out = []
    for plane in range(2):
        g = chroma_tc[:, :, plane].reshape(R, C, 2, 2)
        g = g.transpose(0, 2, 1, 3).reshape(R * 2, C * 2)
        ga = np.pad(g, ((1, 0), (1, 0)))
        nA, nB = ga[1:, :-1], ga[:-1, 1:]
        col = np.broadcast_to(np.arange(C * 2)[None, :], g.shape)
        row = np.broadcast_to(np.arange(R * 2)[:, None], g.shape)
        availA = ~(at_left & (col == 0))
        availB = ~(at_top & (row == 0))
        both = availA & availB
        nc = np.where(both, (nA + nB + 1) >> 1,
                      np.where(availA, nA, np.where(availB, nB, 0)))
        out.append(nc.reshape(R, 2, C, 2).transpose(0, 2, 1, 3)
                   .reshape(R, C, 4))
    return np.stack(out, axis=2)


@dataclasses.dataclass
class DonorDense:
    """Host-prepared dense device arrays for one donor rect.

    patterns/nbits hold each donor MB's final bits as <=32-bit chunks
    (nbits may be ALIGN_SENTINEL for I_PCM pcm_alignment_zero_bits,
    resolved on device).  a_*/b_*/d_* are the MB's exact composite-decoded
    4x4 edge values when acting as a left / above(-right) / above-left
    prediction neighbor (see scroll._pred_stencil_roles).
    """
    patterns: np.ndarray          # u32 [M, S]
    nbits: np.ndarray             # i32 [M, S]
    coded: np.ndarray             # bool [M]
    a_ref: np.ndarray             # i32 [M]  top-right 4x4 (as-left role)
    a_mvx: np.ndarray
    a_mvy: np.ndarray
    b_ref: np.ndarray             # i32 [M]  bottom-left 4x4 (as-above role)
    b_mvx: np.ndarray
    b_mvy: np.ndarray
    d_ref: np.ndarray             # i32 [M]  bottom-right 4x4 (as-above-left)
    d_mvx: np.ndarray
    d_mvy: np.ndarray
    donor_bits: int               # exact payload bits (align pads at max 7)
    has_align: bool               # any ALIGN sentinel present (I_PCM MBs)


class _ChunkFuser:
    """Accumulate (pattern, nbits) symbols into dense 32-bit chunks."""

    def __init__(self):
        self.chunks: list = []
        self._acc = 0
        self._n = 0

    def put(self, pattern: int, nbits: int) -> None:
        if nbits == ALIGN_SENTINEL:
            self.flush()
            self.chunks.append((0, ALIGN_SENTINEL))
            return
        if nbits <= 0:
            return
        self._acc = (self._acc << nbits) | (pattern & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 32:
            top = (self._acc >> (self._n - 32)) & 0xFFFFFFFF
            self.chunks.append((top, 32))
            self._n -= 32
            self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n > 0:
            self.chunks.append((self._acc, self._n))
            self._acc = 0
            self._n = 0


# Row-contiguous donor layout: quantization classes for the per-row
# fused chunk count (compiled programs are shared per class).
ROW_CHUNK_CLASSES = (16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512,
                     768, 1024, 1536, 2048)


def row_chunk_class(need: int) -> int:
    """Smallest ROW_CHUNK_CLASSES entry with need <= class.

    Single source of truth for class selection (pack_donor_rows and
    callers pinning a class share it); raises OverflowError past the
    largest class instead of silently mis-sizing."""
    s_row = next((x for x in ROW_CHUNK_CLASSES if need <= x),
                 ROW_CHUNK_CLASSES[-1])
    if need > s_row:
        raise OverflowError(
            f"donor row needs {need} chunk slots > max class {s_row}")
    return s_row


def flat_chunk_class(need: int) -> int:
    """Flat-wire total-chunk class: next multiple of 64 (min 64).

    The flat serving wire pads the donor's TOTAL chunk count instead of
    R x the max row count, so fine classes (64-chunk = 256 B steps)
    keep padding ~2% while compiled programs still share per class."""
    return max(64, -(-int(need) // 64) * 64)


def exc_class(need: int) -> int:
    """Flat-wire nbits-exception budget class: next multiple of 16."""
    return max(16, -(-int(need) // 16) * 16)


@dataclasses.dataclass
class DonorRows:
    """Row-contiguous dense donor layout.

    Each rect row's donor macroblocks are fused into ONE contiguous
    chunk stream with the row-interior mb_skip_run symbols (which are
    donor-static: gaps between coded donor MBs inside the row) already
    encoded in place.  Only the FIRST coded MB of each row needs a
    dynamic skip run (it counts background skips to the left/above),
    emitted by the device into one reserved slot per row.  This removes
    the per-MB chunk-class padding that made worst-case dense donors
    carry ~5x dead symbol lanes through the packer."""
    row_patterns: np.ndarray      # u32 [R, S_row]
    row_nbits: np.ndarray         # i32 [R, S_row] (ALIGN_SENTINEL kept)
    first_c: np.ndarray           # i32 [R] rect col of first coded MB (-1)
    coded: np.ndarray             # bool [M] (composite mask scatter)
    a_ref: np.ndarray
    a_mvx: np.ndarray
    a_mvy: np.ndarray
    b_ref: np.ndarray
    b_mvx: np.ndarray
    b_mvy: np.ndarray
    d_ref: np.ndarray
    d_mvx: np.ndarray
    d_mvy: np.ndarray
    donor_bits: int               # static bits incl. fused interior runs
    has_align: bool


def _ue_bits(v: int) -> tuple:
    """(pattern, nbits) of ue(v) — [zeros][binary(v+1)]."""
    n = (v + 1).bit_length()
    return v + 1, 2 * n - 1


def pack_donor_rows(dd: DonorDense, R: int, C: int, *,
                    min_class: int = 0) -> DonorRows:
    """Repack per-MB chunk arrays into the row-contiguous layout.

    Uses the native engine (cavlc_pack_rows) when built — the Python
    fuse loop below is its differential-tested twin and fallback.

    `min_class` forces at least that many row chunk slots: serving
    callers pin a class so donors of varying density flow through ONE
    compiled program (first_c/coded/row chunks are all traced arrays;
    the row slot count is the only donor-layout static left)."""
    from .. import native_bridge
    if native_bridge.native_available():
        got = native_bridge.pack_rows_native(
            dd.patterns, dd.nbits, dd.coded, R, C, ROW_CHUNK_CLASSES[-1])
        if got is not None:
            pat, nb, first_c, donor_bits, need = got
            need = max(need, min_class)
            s_row = row_chunk_class(need)
            has_align = bool((np.asarray(dd.nbits) == ALIGN_SENTINEL).any())
            return DonorRows(pat[:, :s_row].copy(), nb[:, :s_row].copy(),
                             first_c, np.asarray(dd.coded, bool),
                             dd.a_ref, dd.a_mvx, dd.a_mvy,
                             dd.b_ref, dd.b_mvx, dd.b_mvy,
                             dd.d_ref, dd.d_mvx, dd.d_mvy,
                             donor_bits, has_align)

    coded = np.asarray(dd.coded, bool).reshape(R, C)
    S = dd.patterns.shape[1]
    rows = []
    first_c = np.full(R, -1, np.int32)
    donor_bits = 0
    has_align = False
    for r in range(R):
        f = _ChunkFuser()
        last = None
        for c in range(C):
            if not coded[r, c]:
                continue
            if last is None:
                first_c[r] = c
            else:
                pat, n = _ue_bits(c - last - 1)
                f.put(pat, n)
                donor_bits += n
            last = c
            m = r * C + c
            for k in range(S):
                n = int(dd.nbits[m, k])
                if n == 0:
                    break
                if n == ALIGN_SENTINEL:
                    has_align = True
                    donor_bits += 7
                f.put(int(dd.patterns[m, k]), n)
                if n > 0:
                    donor_bits += n
        f.flush()
        rows.append(f.chunks)

    need = max(max((len(ch) for ch in rows), default=1), min_class)
    s_row = row_chunk_class(need)
    patterns = np.zeros((R, s_row), np.uint32)
    nbits = np.zeros((R, s_row), np.int32)
    for r, chunks in enumerate(rows):
        for k, (pat, n) in enumerate(chunks):
            patterns[r, k] = pat
            nbits[r, k] = n
    return DonorRows(patterns, nbits, first_c, np.asarray(dd.coded, bool),
                     dd.a_ref, dd.a_mvx, dd.a_mvy,
                     dd.b_ref, dd.b_mvx, dd.b_mvy,
                     dd.d_ref, dd.d_mvx, dd.d_mvy,
                     donor_bits, has_align)


def _check_roles_fit_int16(wire: dict) -> None:
    """Guard the int16 edge-role narrowing cast.

    A hostile (or out-of-MV-budget) donor whose decoded qpel MVs exceed
    int16 would silently wrap into a corrupt composite stream; in-budget
    donors are far inside the range (496 px = 1984 qpel).  Raises a
    per-donor error naming the offending batch rows instead."""
    for k, v in wire.items():
        a = np.abs(np.asarray(v).astype(np.int64))
        if a.size == 0 or (a <= 32767).all():
            continue
        over = (a.reshape(a.shape[0], -1) if a.ndim > 1
                else a.reshape(1, -1)).max(axis=-1) > 32767
        raise ValueError(
            f"donor edge-role field '{k}' exceeds the int16 wire range "
            f"(|v| > 32767 qpel; MV budget is 1984 qpel = 496 px) for "
            f"donor rows {np.flatnonzero(over)[:8].tolist()} — rejecting "
            "the donor instead of silently wrapping")


def _edge_roles_wire(roles: dict, R: int, C: int) -> dict:
    """Slice full [.., R*C] role arrays down to the edge vectors the
    composite prediction actually reads (everything else is overwritten
    or discarded inside the rect):

      - 'a' (top-right 4x4, as-LEFT neighbor): rect RIGHT column — read
        by the ring MBs right of the rect;
      - 'b' (bottom-left 4x4, as-ABOVE / as-ABOVE-RIGHT neighbor): rect
        BOTTOM row (below-row MBs) and LEFT column (MBs left of the
        rect read their above-right's bottom-left);
      - 'd' (bottom-right 4x4, as-ABOVE-LEFT neighbor): rect RIGHT
        column and BOTTOM row.

    Cuts the per-donor wire bytes ~27% vs shipping [R*C] x 9 roles.
    Arrays may carry a leading batch axis."""
    def rs(a):
        return a.reshape(a.shape[:-1] + (R, C))

    return {
        "edge_a_ref": rs(roles["a_ref"])[..., :, C - 1],
        "edge_a_mvx": rs(roles["a_mvx"])[..., :, C - 1],
        "edge_a_mvy": rs(roles["a_mvy"])[..., :, C - 1],
        "edge_bb_ref": rs(roles["b_ref"])[..., R - 1, :],
        "edge_bb_mvx": rs(roles["b_mvx"])[..., R - 1, :],
        "edge_bb_mvy": rs(roles["b_mvy"])[..., R - 1, :],
        "edge_lb_ref": rs(roles["b_ref"])[..., :, 0],
        "edge_lb_mvx": rs(roles["b_mvx"])[..., :, 0],
        "edge_lb_mvy": rs(roles["b_mvy"])[..., :, 0],
        "edge_d_ref": rs(roles["d_ref"])[..., :, C - 1],
        "edge_d_mvx": rs(roles["d_mvx"])[..., :, C - 1],
        "edge_d_mvy": rs(roles["d_mvy"])[..., :, C - 1],
        "edge_db_ref": rs(roles["d_ref"])[..., R - 1, :],
        "edge_db_mvx": rs(roles["d_mvx"])[..., R - 1, :],
        "edge_db_mvy": rs(roles["d_mvy"])[..., R - 1, :],
    }


def edge_roles_to_full(dn: dict, R: int, C: int) -> dict:
    """Reconstruct full-rect [.., R*C] role arrays from edge vectors
    (zeros at interior positions, whose predictions the kernel discards
    — the donor rect's own bits are pre-encoded)."""
    lead = dn["edge_a_ref"].shape[:-1]
    zero = jnp.zeros(lead + (R, C), jnp.int32)

    def right(v):
        return zero.at[..., :, C - 1].set(v.astype(jnp.int32))

    def bottom_left(vb, vl):
        g = zero.at[..., :, 0].set(vl.astype(jnp.int32))
        return g.at[..., R - 1, :].set(vb.astype(jnp.int32))

    def right_bottom(vr, vb):
        g = zero.at[..., :, C - 1].set(vr.astype(jnp.int32))
        return g.at[..., R - 1, :].set(vb.astype(jnp.int32))

    out = {}
    for f in ("ref", "mvx", "mvy"):
        out["a_" + f] = right(dn["edge_a_" + f]).reshape(lead + (R * C,))
        out["b_" + f] = bottom_left(
            dn["edge_bb_" + f], dn["edge_lb_" + f]).reshape(lead + (R * C,))
        out["d_" + f] = right_bottom(
            dn["edge_d_" + f], dn["edge_db_" + f]).reshape(lead + (R * C,))
    return out


def rows_device_arrays(dr: DonorRows) -> dict:
    """DonorRows -> jnp arrays dict (one host->device transfer set).

    Everything donor-dependent is a traced array — including first_c —
    so distinct donors of one geometry class share a compiled program.
    Edge roles ship as the read-set vectors only (_edge_roles_wire)."""
    R, C = dr.row_patterns.shape[0], dr.coded.size // dr.row_patterns.shape[0]
    roles = {"a_ref": dr.a_ref, "a_mvx": dr.a_mvx, "a_mvy": dr.a_mvy,
             "b_ref": dr.b_ref, "b_mvx": dr.b_mvx, "b_mvy": dr.b_mvy,
             "d_ref": dr.d_ref, "d_mvx": dr.d_mvx, "d_mvy": dr.d_mvy}
    out = {
        "row_patterns": jnp.asarray(dr.row_patterns),
        "row_nbits": jnp.asarray(dr.row_nbits),
        "first_c": jnp.asarray(dr.first_c, jnp.int32),
        "coded": jnp.asarray(dr.coded),
    }
    edge = _edge_roles_wire(roles, R, C)
    _check_roles_fit_int16(edge)
    for k, v in edge.items():
        out[k] = jnp.asarray(np.asarray(v).astype(np.int16))
    return out


def rows_flat_wire(pat: np.ndarray, nb: np.ndarray, *,
                   s_flat: int | None = None, s_exc: int | None = None):
    """Compact padded [N, R, s_row] donor row chunks into the flat wire.

    The padded layout ships R x s_row lanes where s_row is the MAX row's
    chunk count — ~4x the donor's actual bits on real donors (VERDICT r3
    weak #1: the serving tunnel pays for every padded lane).  The flat
    wire pads only the donor's TOTAL chunk count, and exploits that all
    chunks are full 32-bit words except each row's last and the rare
    I_PCM alignment sentinels:

      flat_patterns u32[N, s_flat] — per-row chunk streams, concatenated
      row_len       i16[N, R]      — chunks per row (0 = all-skip row)
      row_tail      i8 [N, R]      — nbits of each row's LAST chunk
      exc_idx/exc_val i32/i8[N, E] — sparse nbits overrides at flat
        positions (ALIGN sentinels, partial pre-align chunks); -1 pads

    so the pattern bytes approach the donor's actual coded bits and the
    nbits sideband collapses from one byte per chunk to O(R).  The
    device reconstructs the exact [R, s_row] layout (_rows_from_flat),
    so emitted frames are byte-identical to the padded wire.

    Returns (wire_dict of np arrays, s_flat, s_exc); callers pin both
    classes so every donor of a geometry class shares one program."""
    N, R, s_row = pat.shape
    nbi = np.asarray(nb, np.int32)
    nz = nbi != 0
    any_nz = nz.any(-1)
    row_len = np.where(any_nz, s_row - np.argmax(nz[:, :, ::-1], axis=-1),
                       0).astype(np.int64)
    total = row_len.sum(-1)
    need = int(total.max()) if N else 0
    if s_flat is None:
        s_flat = flat_chunk_class(max(need, 1))
    elif need > s_flat:
        raise OverflowError(
            f"donor needs {need} total chunks > flat class {s_flat}")

    j = np.arange(s_row)
    in_row = j[None, None, :] < row_len[:, :, None]
    last = np.maximum(row_len - 1, 0)[:, :, None]
    row_tail = (np.take_along_axis(nbi, last, axis=2)[:, :, 0]
                * any_nz).astype(np.int8)
    expected = np.where(in_row, 32, 0)
    np.put_along_axis(
        expected, last,
        np.where(any_nz[:, :, None], row_tail[:, :, None].astype(np.int64),
                 0), axis=2)
    row_start = np.zeros((N, R), np.int64)
    row_start[:, 1:] = np.cumsum(row_len, -1)[:, :-1]
    flat_pos = row_start[:, :, None] + j[None, None, :]

    flat_p = np.zeros((N, s_flat), np.uint32)
    exc = []
    for i in range(N):
        v = in_row[i]
        flat_p[i, : int(total[i])] = np.asarray(pat[i], np.uint32)[v]
        mm = v & (nbi[i] != expected[i])
        exc.append((flat_pos[i][mm], nbi[i][mm]))
    e_need = max((len(a) for a, _ in exc), default=0)
    if s_exc is None:
        s_exc = exc_class(e_need)
    elif e_need > s_exc:
        raise OverflowError(
            f"donor needs {e_need} nbits exceptions > class {s_exc}")
    exc_idx = np.full((N, s_exc), -1, np.int32)
    exc_val = np.zeros((N, s_exc), np.int8)
    for i, (a, vv) in enumerate(exc):
        exc_idx[i, : len(a)] = a
        exc_val[i, : len(a)] = vv
    wire = {
        "flat_patterns": flat_p,
        "row_len": row_len.astype(np.int16),
        "row_tail": row_tail,
        "exc_idx": exc_idx,
        "exc_val": exc_val,
    }
    return wire, s_flat, s_exc


def _rows_from_flat(dn: dict, R: int, s_row: int):
    """Device inverse of rows_flat_wire: flat wire -> ([R, s_row]
    patterns, nbits), exact and GATHER-FREE.

    The obvious formulation — `flat_p[row_start[:, None] + j]` — is a
    [R, s_row] gather from the flat stream, which serializes on TPU at
    ~10 ns/element (~12 ms per batch-256 step, measured; it was the
    entire cost of the device-resident serving scan).  Instead the flat
    chunks are SPREAD right by a monotone move: the value at flat
    position i belongs to row r(i) and lands at r(i)*s_row +
    (i - row_start[r(i)]), i.e. moves right by d(i) = r(i)*s_row -
    row_start[r(i)].  d is row-constant and non-decreasing in i
    (s_row >= row_len), and for a RIGHT move with non-decreasing
    distances LSB-first bit moves keep positions strictly ordered
    (p_j - p_i = (j - i) + (m_j - m_i) > 0), so no mid-flight
    collision is possible at all — plain select moves, no OR merges.

    nbits never needs spreading: in the [R, s_row] frame the per-row
    tail width sits at j == row_len[r]-1 (elementwise) and the sparse
    exceptions are a tiny [s_exc] scatter after their flat indices are
    mapped to (row, col) with the same row_start comparisons."""
    flat_p = dn["flat_patterns"]
    S = flat_p.shape[-1]
    row_len = dn["row_len"].astype(jnp.int32)
    row_tail = dn["row_tail"].astype(jnp.int32)
    row_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(row_len)[:-1]])

    P = R * s_row
    pos = jnp.arange(P, dtype=jnp.int32)
    vals = jnp.pad(flat_p.astype(jnp.uint32),
                   (0, max(0, P - S)))[:P]
    # d(i) telescopes over row boundaries: crossing into row r adds
    # (s_row - row_len[r-1]).  R-1 broadcast compares, one fused pass.
    dist = jnp.zeros((P,), jnp.int32)
    for r in range(1, R):
        dist = dist + jnp.where(pos >= row_start[r],
                                s_row - row_len[r - 1], 0)
    # Dead lanes (at or past the flat stream's used length) must not
    # move: their distance rides to zero with their (zero) values.
    used = pos < jnp.minimum(row_start[R - 1] + row_len[R - 1], P)
    rem = jnp.where(used, dist, 0)

    # MSB-first is the sound order for a RIGHT move with non-decreasing
    # distances: the processed high-bit prefix m_i = (d_i >> b) << b is
    # monotone in d, so p_j - p_i = (j - i) + (m_j - m_i) stays > 0 and
    # no two live values ever meet.  (LSB-first is the left-move rule —
    # its low-bit prefixes are not monotone and right-moves collide.)
    max_dist = max(1, (R - 1) * s_row)
    for b in reversed(range(max_dist.bit_length())):
        step = 1 << b
        if step >= P:
            continue
        v_l = jnp.roll(vals, step)
        r_l = jnp.roll(rem, step)
        take = ((r_l & step) != 0) & (pos >= step)
        vacate = (rem & step) != 0
        vals = jnp.where(take, v_l, jnp.where(vacate, jnp.uint32(0),
                                              vals))
        rem = jnp.where(take, r_l - step, jnp.where(vacate, 0, rem))

    pat2 = vals.reshape(R, s_row)
    j = jnp.arange(s_row, dtype=jnp.int32)
    in_row = j[None, :] < row_len[:, None]
    pat = jnp.where(in_row, pat2, jnp.uint32(0))

    # nbits directly in the [R, s_row] frame.
    nbits = jnp.where(in_row, 32, 0)
    nbits = jnp.where(in_row & (j[None, :] == row_len[:, None] - 1),
                      row_tail[:, None], nbits)
    exc_idx = dn["exc_idx"].astype(jnp.int32)
    # Map each flat exception index to (row, col): row = #starts <= i
    # beyond the first, col = i - row_start[row].  s_exc-sized math.
    e_row = jnp.zeros_like(exc_idx)
    for r in range(1, R):
        e_row = e_row + (exc_idx >= row_start[r]).astype(jnp.int32)
    e_col = exc_idx - row_start[e_row]
    e_flat2 = jnp.where(exc_idx < 0, P, e_row * s_row + e_col)
    nbits = nbits.reshape(-1).at[e_flat2].set(
        dn["exc_val"].astype(jnp.int32), mode="drop").reshape(R, s_row)
    return pat, nbits


# Single-blob serving wire: every per-donor field packed into ONE uint32
# record.  On the serving link each host->device array costs a fixed
# dispatch overhead (~0.4 ms/key on the dev tunnel — 22 keys made the
# transfer 11x more expensive than its bytes); one blob pays it once.
# Word packing is explicitly little-endian-in-word on both sides, so the
# device decode (shift/mask) is platform-independent.

_EDGE_WIRE_FIELDS = (
    ("edge_a_ref", "R"), ("edge_a_mvx", "R"), ("edge_a_mvy", "R"),
    ("edge_bb_ref", "C"), ("edge_bb_mvx", "C"), ("edge_bb_mvy", "C"),
    ("edge_lb_ref", "R"), ("edge_lb_mvx", "R"), ("edge_lb_mvy", "R"),
    ("edge_d_ref", "R"), ("edge_d_mvx", "R"), ("edge_d_mvy", "R"),
    ("edge_db_ref", "C"), ("edge_db_mvx", "C"), ("edge_db_mvy", "C"),
)


def flat_wire_layout(R: int, C: int, s_flat: int, s_exc: int):
    """Static field layout of the blob wire: [(name, kind, count,
    word_offset)], total stride in uint32 words.  Shared by the host
    packer (pack_rows_blob) and the in-program decoder (_unblob)."""
    fields = [
        ("flat_patterns", "u32", s_flat),
        ("row_len", "i16", R),
        ("row_tail", "i8", R),
        ("exc_idx", "i16", s_exc),
        ("exc_val", "i8", s_exc),
        ("first_c", "i16", R),
        ("coded", "u1", R * C),
    ]
    fields += [(name, "i16", R if dim == "R" else C)
               for name, dim in _EDGE_WIRE_FIELDS]
    per_word = {"u32": 1, "i32": 1, "i16": 2, "i8": 4, "u8": 4,
                "u1": 32}
    laid, off = [], 0
    for name, kind, count in fields:
        laid.append((name, kind, count, off))
        off += -(-count // per_word[kind])
    return laid, off


def pack_rows_blob(wire: dict, R: int, C: int, s_flat: int,
                   s_exc: int) -> np.ndarray:
    """Host: dict of per-field [N, ...] arrays -> uint32 blob [N, stride].

    Values are placed little-endian within each word (x86 numpy views do
    this natively; the device decoder shifts/masks the same way)."""
    layout, stride = flat_wire_layout(R, C, s_flat, s_exc)
    N = np.asarray(wire["flat_patterns"]).shape[0]
    blob = np.zeros((N, stride), "<u4")
    u8 = blob.view(np.uint8).reshape(N, stride * 4)
    for name, kind, count, off in layout:
        v = np.asarray(wire[name])
        b = off * 4
        if kind == "u32":
            blob[:, off: off + count] = v.astype("<u4")
        elif kind == "i32":
            blob[:, off: off + count] = v.astype("<i4").view("<u4")
        elif kind == "i16":
            if v.size and (v.min() < -32768 or v.max() > 32767):
                raise ValueError(f"{name} exceeds the int16 wire range")
            u8[:, b: b + 2 * count] = (
                v.astype("<i2").view(np.uint8).reshape(N, 2 * count))
        elif kind == "u1":
            # Bit m -> word m//32, bit position m%32 (little-endian).
            bits = np.packbits(v.astype(bool).reshape(N, count),
                               axis=-1, bitorder="little")
            u8[:, b: b + bits.shape[1]] = bits
        else:                                   # i8 / u8 (incl. bool)
            u8[:, b: b + count] = (
                v.astype(np.int8 if kind == "i8" else np.uint8)
                .view(np.uint8).reshape(N, count))
    return blob


def _unblob(blob, R: int, C: int, s_flat: int, s_exc: int) -> dict:
    """Device inverse of pack_rows_blob (traced; static layout)."""
    layout, stride = flat_wire_layout(R, C, s_flat, s_exc)
    assert blob.shape[-1] == stride, (blob.shape, stride)
    blob = blob.astype(jnp.uint32)
    out = {}
    for name, kind, count, off in layout:
        if kind == "u32":
            out[name] = jax.lax.slice_in_dim(blob, off, off + count, axis=-1)
        elif kind == "i32":
            w = jax.lax.slice_in_dim(blob, off, off + count, axis=-1)
            out[name] = jax.lax.bitcast_convert_type(w, jnp.int32)
        elif kind == "i16":
            w = jax.lax.slice_in_dim(blob, off, off - (-count // 2), axis=-1)
            lo = (w & 0xFFFF).astype(jnp.int32)
            hi = (w >> 16).astype(jnp.int32)
            v = jnp.stack([lo, hi], axis=-1).reshape(-1)[:count]
            out[name] = ((v ^ 0x8000) - 0x8000).astype(jnp.int16)
        elif kind == "u1":
            w = jax.lax.slice_in_dim(blob, off, off - (-count // 32),
                                     axis=-1)
            lanes = [((w >> k) & 1).astype(jnp.uint8) for k in range(32)]
            out[name] = jnp.stack(lanes, axis=-1).reshape(-1)[:count]
        else:
            w = jax.lax.slice_in_dim(blob, off, off - (-count // 4), axis=-1)
            lanes = [((w >> (8 * k)) & 0xFF).astype(jnp.int32)
                     for k in range(4)]
            v = jnp.stack(lanes, axis=-1).reshape(-1)[:count]
            if kind == "i8":
                v = (v ^ 0x80) - 0x80
            out[name] = v
    out["coded"] = out["coded"].astype(bool)
    return out


def donor_edge_motion(donor_grid: list, *, left_ring=None, top_ring=None,
                      right_ring=None, rect_at_left_edge=False,
                      rect_at_top_edge=False, rect_at_right_edge=False):
    """Exact composite-context 4x4 edge motion per donor MB.

    Decodes the donor MV field (models/mv_field) inside a border of
    composite neighbor values, so donor-edge prediction chains (including
    P_Skip derivation at the rect's left column) match the exact host
    path bit-for-bit.  Rings are MB-level (ref, mvx_qpel, mvy_qpel)
    tuples, or None entries for unavailable cells:

      top_ring:   C+2 entries, composite row r0-1, cols c0-1 .. c0+C
                  (above-left corner, above each donor column, above-right)
      left_ring:  R entries, composite col c0-1, rows r0 .. r0+R-1
      right_ring: R-1 entries, composite col c0+C, rows r0 .. r0+R-2
                  (bg MBs right of the rect decode before the next donor
                  row, so they are available C-neighbors)

    Defaults model the MASTER_DESIGN "static chrome" background: P_Skip
    (ref 0, MV 0) everywhere, minus frame-edge unavailability.

    Returns ((a_ref, a_mvx, a_mvy), (b_...), (d_...)) with each array
    [M] over row-major donor MBs: the MB's top-right, bottom-left and
    bottom-right 4x4 field values (the left / above(-right) / above-left
    neighbor roles of MB-level prediction).
    """
    from .mv_field import MVField, decode_p_slice_mv_field

    rows, cols = len(donor_grid), len(donor_grid[0])

    def _default(n, unavailable):
        return [None if unavailable else (0, 0, 0) for _ in range(n)]

    if top_ring is None:
        top_ring = _default(cols + 2, rect_at_top_edge)
        if rect_at_left_edge:
            top_ring[0] = None
        if rect_at_right_edge:
            top_ring[-1] = None
    if left_ring is None:
        left_ring = _default(rows, rect_at_left_edge)
    if right_ring is None:
        right_ring = _default(rows - 1, rect_at_right_edge)

    field = MVField(cols + 2, rows + 1)

    def _fill(mb_x, mb_y, entry):
        if entry is None:
            return
        ref, mvx, mvy = entry
        field.fill(mb_x * 4, mb_y * 4, 4, 4, ref, mvx, mvy)

    for c in range(cols + 2):
        _fill(c, 0, top_ring[c])
    for r in range(rows):
        _fill(0, 1 + r, left_ring[r])

    # The composite MB right of donor row r decodes AFTER that row (it
    # may be the above-right neighbor of row r+1 but is invisible to
    # row r's own sub-partition prediction), so fill it lazily per row.
    def _post_row(r):
        if r < rows - 1:
            _fill(cols + 1, 1 + r, right_ring[r])

    decode_p_slice_mv_field(donor_grid, cols, rows, field=field,
                            origin=(1, 1), post_row=_post_row)

    m = rows * cols
    a = (np.zeros(m, np.int32), np.zeros(m, np.int32), np.zeros(m, np.int32))
    b = (np.zeros(m, np.int32), np.zeros(m, np.int32), np.zeros(m, np.int32))
    d = (np.zeros(m, np.int32), np.zeros(m, np.int32), np.zeros(m, np.int32))
    for r in range(rows):
        for c in range(cols):
            i = r * cols + c
            by, bx = (1 + r) * 4, (1 + c) * 4
            for (dst_r, dst_x, dst_y), (yy, xx) in (
                    (a, (by + 0, bx + 3)), (b, (by + 3, bx + 0)),
                    (d, (by + 3, bx + 3))):
                dst_r[i] = field.ref[yy, xx]
                dst_x[i] = field.mvx[yy, xx]
                dst_y[i] = field.mvy[yy, xx]
    return a, b, d


def prepare_donor_dense(donor_grid: list, num_ref_idx_l0: int,
                        donor_ref_map: tuple = (0,), *,
                        rect_at_left_edge: bool = False,
                        rect_at_top_edge: bool = False,
                        rect_at_right_edge: bool = False,
                        left_ring=None, top_ring=None, right_ring=None
                        ) -> DonorDense:
    """Flatten a parsed donor grid to dense pre-packed chunk arrays.

    Tokens are resolved against the composite-geometry nC on the host
    (rect frame-edge flags are static per compiled program), then each
    MB's symbols fuse into <=32-bit chunks; chunk-slot count quantizes to
    MB_CHUNK_CLASSES so compiled programs are shared per class.
    """
    rows, cols = len(donor_grid), len(donor_grid[0])
    m_total = rows * cols
    if donor_ref_map[0] != 0 and any(
            mb is mbt.SKIP for row in donor_grid for mb in row):
        raise NotImplementedError(
            "donor_ref_map[0] != 0 with donor P_Skips: the device prep "
            "keeps skips (composite ref 0) — use the host path or the "
            "native retarget_mvs ingest")
    ds = prepare_donor_symbols(donor_grid, num_ref_idx_l0, donor_ref_map)

    luma_nc = _host_luma_nc(ds.luma_tc.reshape(rows, cols, 16),
                            rect_at_left_edge, rect_at_top_edge
                            ).reshape(m_total, 16)
    chroma_nc = _host_chroma_nc(ds.chroma_tc.reshape(rows, cols, 2, 4),
                                rect_at_left_edge, rect_at_top_edge
                                ).reshape(m_total, 8)
    pat_tab, len_tab = token_tables()

    fused: list = []
    tail_chunks = ds.tail_patterns.shape[2]
    for m in range(m_total):
        f = _ChunkFuser()
        if ds.coded[m]:
            for k in range(PRE_SLOTS):
                n = int(ds.pre_nbits[m, k])
                if n == 0 and int(ds.pre_patterns[m, k]) == 0:
                    # pre slots fill front-to-back; a zero slot ends them.
                    break
                f.put(int(ds.pre_patterns[m, k]), n)
            for pos in range(N_BLOCKS):
                if ds.tok_present[m, pos]:
                    bid = int(ds.tok_block_id[m, pos])
                    if bid in (17, 18):
                        cls = CLASS_CHROMA
                    else:
                        raster = 0 if bid == 0 else bid - 1
                        nc = (chroma_nc[m, bid - 19] if bid >= 19
                              else luma_nc[m, raster])
                        cls = (CLASS_NC0 if nc < 2 else
                               CLASS_NC2 if nc < 4 else
                               CLASS_NC4 if nc < 8 else CLASS_FLC)
                    tc = int(ds.tok_tc[m, pos])
                    t1 = int(ds.tok_t1[m, pos])
                    f.put(int(pat_tab[cls, tc, t1]),
                          int(len_tab[cls, tc, t1]))
                elif not ds.ipcm[m]:
                    continue
                for k in range(tail_chunks):
                    n = int(ds.tail_nbits[m, pos, k])
                    if n == 0:
                        break
                    f.put(int(ds.tail_patterns[m, pos, k]), n)
        f.flush()
        fused.append(f.chunks)

    need = max((len(ch) for ch in fused), default=1)
    s_class = next((s for s in MB_CHUNK_CLASSES if need <= s),
                   MB_CHUNK_CLASSES[-1])
    if need > s_class:
        raise OverflowError(
            f"donor MB needs {need} chunk slots > max class {s_class}")
    patterns = np.zeros((m_total, s_class), np.uint32)
    nbits = np.zeros((m_total, s_class), np.int32)
    donor_bits = 0
    has_align = False
    for m, chunks in enumerate(fused):
        for k, (p, n) in enumerate(chunks):
            patterns[m, k] = p
            if n == ALIGN_SENTINEL:
                has_align = True
                donor_bits += 7
            else:
                donor_bits += n
            nbits[m, k] = n

    # Edge motion must be decoded over the *composite-mapped* grid (refs
    # re-targeted, intra retyped) — the same MBs the host path feeds to
    # mv_field (splice.splice_p_frame), else role ref values would be
    # donor-local indices.
    from .splice import _map_donor_refs
    mapped = [[mb if mb is mbt.SKIP else
               _map_donor_refs(mbt.retype_for_p(mb), donor_ref_map,
                               num_ref_idx_l0)
               for mb in row] for row in donor_grid]
    (a_ref, a_mvx, a_mvy), (b_ref, b_mvx, b_mvy), (d_ref, d_mvx, d_mvy) = \
        donor_edge_motion(mapped, left_ring=left_ring,
                          top_ring=top_ring, right_ring=right_ring,
                          rect_at_left_edge=rect_at_left_edge,
                          rect_at_top_edge=rect_at_top_edge,
                          rect_at_right_edge=rect_at_right_edge)
    return DonorDense(patterns, nbits, np.asarray(ds.coded),
                      a_ref, a_mvx, a_mvy, b_ref, b_mvx, b_mvy,
                      d_ref, d_mvx, d_mvy, donor_bits, has_align)


def _default_rings(R: int, C: int, rect_at_left_edge: bool,
                   rect_at_top_edge: bool, rect_at_right_edge: bool):
    """MASTER_DESIGN static-chrome defaults: P_Skip (0,0,0) cells,
    minus frame-edge unavailability (None entries)."""
    top = [None if rect_at_top_edge else (0, 0, 0) for _ in range(C + 2)]
    if rect_at_left_edge:
        top[0] = None
    if rect_at_right_edge:
        top[-1] = None
    left = [None if rect_at_left_edge else (0, 0, 0) for _ in range(R)]
    right = [None if rect_at_right_edge else (0, 0, 0)
             for _ in range(R - 1)]
    return left, top, right


def prepare_donor_dense_from_slice(rbsp: bytes, start_bit: int, C: int,
                                   R: int, donor_num_refs: int,
                                   num_ref_idx_l0: int,
                                   donor_ref_map: tuple = (0,), *,
                                   rect_at_left_edge: bool = False,
                                   rect_at_top_edge: bool = False,
                                   rect_at_right_edge: bool = False,
                                   left_ring=None, top_ring=None,
                                   right_ring=None,
                                   engine: str = "auto",
                                   retarget_mvs: bool = False) -> DonorDense:
    """Serving ingest: donor P-slice payload bytes -> DonorDense.

    engine "native" runs parse + composite-nC token resolution + chunk
    fusing + composite MV-field edge decode entirely in C++
    (native/cavlc_decode.cpp cavlc_prepare_dense / cavlc_mv_edge_roles;
    ~100x the Python path, differential-tested byte-equal); "python"
    parses with models/mb_transcode and goes through
    prepare_donor_dense."""
    from .. import native_bridge

    use_native = (engine == "native"
                  or (engine == "auto"
                      and native_bridge.native_available()))
    if engine == "native" and not native_bridge.native_available():
        raise RuntimeError("native engine requested but library not built")

    if left_ring is None or top_ring is None or right_ring is None:
        dl, dt, dr = _default_rings(R, C, rect_at_left_edge,
                                    rect_at_top_edge, rect_at_right_edge)
        left_ring = dl if left_ring is None else left_ring
        top_ring = dt if top_ring is None else top_ring
        right_ring = dr if right_ring is None else right_ring

    if use_native:
        recs, _ = native_bridge.parse_slice_raw(
            rbsp, start_bit, C, R, True, donor_num_refs)
        if retarget_mvs:
            # Successive-donor mode: rewrite mvds in place so decoded
            # donor motion survives the composite context exactly
            # (native twin of splice_p_frame's donor_mv_targets path).
            native_bridge.retarget_recs_raw(
                recs, C, R, num_ref_idx_l0, donor_ref_map,
                left_ring, top_ring, right_ring)
        patterns, nbits, coded, donor_bits, has_align = \
            native_bridge.prepare_dense_raw(
                recs, C, R, rbsp, num_ref_idx_l0, donor_ref_map,
                rect_at_left_edge, rect_at_top_edge)
        a, b, d = native_bridge.mv_edge_roles_raw(
            recs, C, R, num_ref_idx_l0, donor_ref_map,
            left_ring, top_ring, right_ring)
        return DonorDense(patterns, nbits, coded,
                          a[:, 0].copy(), a[:, 1].copy(), a[:, 2].copy(),
                          b[:, 0].copy(), b[:, 1].copy(), b[:, 2].copy(),
                          d[:, 0].copy(), d[:, 1].copy(), d[:, 2].copy(),
                          donor_bits, has_align)

    if retarget_mvs:
        raise NotImplementedError(
            "retarget_mvs requires the native engine (make -C native)")
    from ..ops.bitio import BitReader
    br = BitReader(rbsp)
    br.skip_bits(start_bit)
    grid = mbt.parse_p_slice_mbs(br, C, R, donor_num_refs)
    return prepare_donor_dense(
        grid, num_ref_idx_l0, donor_ref_map,
        rect_at_left_edge=rect_at_left_edge,
        rect_at_top_edge=rect_at_top_edge,
        rect_at_right_edge=rect_at_right_edge,
        left_ring=left_ring, top_ring=top_ring, right_ring=right_ring)


def dense_device_arrays(dd: DonorDense) -> dict:
    """DonorDense -> jnp arrays dict (one host->device transfer set)."""
    return {
        "patterns": jnp.asarray(dd.patterns),
        "nbits": jnp.asarray(dd.nbits),
        "coded": jnp.asarray(dd.coded),
        "a_ref": jnp.asarray(dd.a_ref), "a_mvx": jnp.asarray(dd.a_mvx),
        "a_mvy": jnp.asarray(dd.a_mvy),
        "b_ref": jnp.asarray(dd.b_ref), "b_mvx": jnp.asarray(dd.b_mvx),
        "b_mvy": jnp.asarray(dd.b_mvy),
        "d_ref": jnp.asarray(dd.d_ref), "d_mvx": jnp.asarray(dd.d_mvx),
        "d_mvy": jnp.asarray(dd.d_mvy),
    }


def rings_from_bg(bg_ref, bg_mvx, bg_mvy, rect_mb_x: int, rect_mb_y: int,
                  R: int, C: int):
    """Extract the donor-decode border rings from host bg field grids.

    bg grids are [H, W] numpy MB-level (ref, mv qpel) values whose skip
    cells hold the decode-true derived values (the same contract the
    device kernel's bg inputs carry).  Cells past frame edges become
    None (unavailable)."""
    H, W = bg_ref.shape
    r0, c0 = rect_mb_y, rect_mb_x

    def cell(r, c):
        if r < 0 or c < 0 or r >= H or c >= W:
            return None
        return (int(bg_ref[r, c]), int(bg_mvx[r, c]), int(bg_mvy[r, c]))

    top = [cell(r0 - 1, c) for c in range(c0 - 1, c0 + C + 1)]
    left = [cell(r, c0 - 1) for r in range(r0, r0 + R)]
    right = [cell(r, c0 + C) for r in range(r0, r0 + R - 1)]
    return left, top, right


def splice_rbsp_budget(cfg: ComposerConfig, m_donor: int, donor_bits: int,
                       *, quantum: int = 8192,
                       bg_bits_per_mb: int | None = None) -> int:
    """Static RBSP byte budget for a dense spliced frame.

    Background MBs at the scroll budget + the donor's *exact* payload
    bits (DonorDense.donor_bits) + per-donor-MB skip-run slack, rounded
    up to `quantum` bytes so compiled programs are shared across donors
    of similar size.  The packer/EBSP cost scales with this buffer
    (measured 7.5x step-time difference vs the chunk-class worst case on
    v5e), so keep it honest; overflow is detected, not truncated."""
    bg_bits = (cfg.total_mbs - m_donor) * (bg_bits_per_mb
                                           or cfg.rbsp_bits_per_mb)
    total = (bg_bits + donor_bits + m_donor * 32 + 2048) // 8
    return (total + quantum - 1) // quantum * quantum


def splice_rows_rbsp_budget(cfg: ComposerConfig, m_donor: int, rows: int,
                            donor_bits: int, *,
                            bg_bits_per_mb: int | None = None,
                            static_bg: bool = False,
                            quantum: int = 2048) -> int:
    """Static RBSP byte budget for the ROW-CONTIGUOUS splice layout.

    Unlike splice_rbsp_budget (per-MB dense layout), the rows kernel has
    exactly ONE dynamic skip-run slot per rect row — so the slack is
    rows*32 bits, not m_donor*32 (a 23x23 donor at 720p: 16.2 kbit less
    slack), and the quantum is finer (the packer + emulation-prevention
    cost scales with this static buffer: measured 82% of the batch step
    at the 8192-byte quantum's worst-case rounding).  static_bg=True
    sizes for the bg_static_skip program (all-skip background emits no
    background symbols at all)."""
    if static_bg:
        bg_bits = 0
    else:
        bg_bits = (cfg.total_mbs - m_donor) * (bg_bits_per_mb
                                               or cfg.rbsp_bits_per_mb)
    total = (bg_bits + donor_bits + rows * 32 + 2048) // 8
    return (total + quantum - 1) // quantum * quantum


def _dense_prologue(cfg, r0, c0, R, C, num_refs,
                    bg_ref, bg_mv_x, bg_mv_y, bg_coded, dn):
    """Shared composite-grid stage of the dense splice emitters: role
    scatter, exact MV prediction, skip runs, background 3-slot symbols.

    Donor arrays may arrive in compact wire dtypes (int8/int16 — the
    serving ingest halves tunnel/PCIe traffic that way); cast up front."""
    dn = dict(dn)
    for k in ("a_ref", "a_mvx", "a_mvy", "b_ref", "b_mvx", "b_mvy",
              "d_ref", "d_mvx", "d_mvy"):
        dn[k] = dn[k].astype(jnp.int32)
    H, W = cfg.mb_height, cfg.mb_width
    donor_coded = dn["coded"].reshape(R, C)
    in_rect = jnp.zeros((H, W), bool).at[r0:r0 + R, c0:c0 + C].set(True)

    def _scatter(bg, vals):
        return bg.at[r0:r0 + R, c0:c0 + C].set(vals.reshape(R, C))

    refA = _scatter(bg_ref, dn["a_ref"])
    mvxA = _scatter(bg_mv_x, dn["a_mvx"])
    mvyA = _scatter(bg_mv_y, dn["a_mvy"])
    refB = _scatter(bg_ref, dn["b_ref"])
    mvxB = _scatter(bg_mv_x, dn["b_mvx"])
    mvyB = _scatter(bg_mv_y, dn["b_mvy"])
    refD = _scatter(bg_ref, dn["d_ref"])
    mvxD = _scatter(bg_mv_x, dn["d_mvx"])
    mvyD = _scatter(bg_mv_y, dn["d_mvy"])

    coded = jnp.where(in_rect, False, bg_coded)
    coded = coded.at[r0:r0 + R, c0:c0 + C].set(donor_coded)

    pred_x, pred_y = scroll_model.mv_pred_grid_roles(
        refA, refA, mvxA, mvyA, refB, mvxB, mvyB, refD, mvxD, mvyD)
    mvd_x = bg_mv_x - pred_x
    mvd_y = bg_mv_y - pred_y

    # Composite skip runs.
    n_mbs = H * W
    # The merged background A-slot (skip_run||mb_type||ref) fits 32 bits
    # only up to 4095 MBs (ue(skip_run) <= 23); larger frames use the
    # WIDE background layout (skip run in its own slot, scroll.
    # emit_p_frame's rule) up to 65535 MBs.
    wide = n_mbs > 4095
    assert n_mbs <= 65535, (
        f"dense splice: {n_mbs} MBs > 65535 — ue(skip_run) would exceed "
        "32 bits; use slice bands")
    coded_f = coded.reshape(-1)
    idx = jnp.arange(n_mbs, dtype=jnp.int32)
    coded_idx = jnp.where(coded_f, idx, -1)
    last_incl = jax.lax.associative_scan(jnp.maximum, coded_idx)
    last_before = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), last_incl[:-1]])
    skip_run = idx - last_before - 1
    sr_pat, sr_n = expgolomb.ue(skip_run.astype(jnp.uint32))

    # Background MB symbols: [sr||mb_type||ref, mvd_x, mvd_y||cbp]
    # (<=4095 MBs), or wide [sr, mb_type||ref, mvd_x, mvd_y||cbp].
    mbt_pat, mbt_n = expgolomb.ue(jnp.zeros((n_mbs,), jnp.uint32))
    ref_pat, ref_n = expgolomb.te(bg_ref.reshape(-1).astype(jnp.uint32),
                                  num_refs)
    mvx_pat, mvx_n = expgolomb.se(mvd_x.reshape(-1))
    mvy_pat, mvy_n = expgolomb.se(mvd_y.reshape(-1))
    cbp_pat, cbp_n = expgolomb.ue(jnp.zeros((n_mbs,), jnp.uint32))
    if wide:
        a_pat, a_n = bitpack.merge_symbol_pairs(mbt_pat, mbt_n,
                                                ref_pat, ref_n)
    else:
        a_pat, a_n = bitpack.merge_symbol_pairs(sr_pat, sr_n,
                                                mbt_pat, mbt_n)
        a_pat, a_n = bitpack.merge_symbol_pairs(a_pat, a_n, ref_pat, ref_n)
    c_pat, c_n = bitpack.merge_symbol_pairs(mvy_pat, mvy_n, cbp_pat, cbp_n)

    bg_active = coded_f & ~in_rect.reshape(-1)
    return {
        "a_pat": a_pat, "a_n": a_n,
        "mvx_pat": mvx_pat, "mvx_n": mvx_n,
        "c_pat": c_pat, "c_n": c_n,
        "bg_active": bg_active,
        "sr_pat": sr_pat, "sr_n": sr_n,
        "coded_f": coded_f, "last_incl": last_incl,
        "donor_coded": donor_coded,
        "wide": wide,
    }


def _bg3(pro, H, W):
    """Generic background symbol grids [H, W, S_bg] (S_bg = 3, or 4 in
    the wide layout where the skip run has its own slot)."""
    bg_active = pro["bg_active"]
    bg_i = bg_active.astype(jnp.int32)
    zero = jnp.uint32(0)
    cols = [(pro["a_pat"], pro["a_n"]),
            (pro["mvx_pat"], pro["mvx_n"]),
            (pro["c_pat"], pro["c_n"])]
    if pro["wide"]:
        cols = [(pro["sr_pat"], pro["sr_n"])] + cols
    s_bg = len(cols)
    bg_p = jnp.stack([jnp.where(bg_active, cp, zero) for cp, _ in cols],
                     axis=1).reshape(H, W, s_bg)
    bg_n = jnp.stack([cn * bg_i for _, cn in cols],
                     axis=1).reshape(H, W, s_bg)
    return bg_p, bg_n


def emit_spliced_frame_dense(cfg: ComposerConfig, rect_mb_x: int,
                             rect_mb_y: int, R: int, C: int, num_refs: int,
                             header_patterns, header_nbits,
                             bg_ref, bg_mv_x, bg_mv_y, bg_coded,
                             dn: dict, nal_ref_idc: int = 0, *,
                             has_align: bool = False,
                             n_rbsp: int | None = None,
                             ebsp_exact: bool = False):
    """Device splice, dense-donor hot path.

    Donor macroblock bits arrive fully resolved as dense chunk arrays
    (prepare_donor_dense); the device computes exact MV prediction for
    coded background MBs via the role stencil (donor edge 4x4 values in
    dn), derives composite skip runs, lays the frame out as three
    statically-shaped bands (above / rect rows / below) and runs the
    standard pack -> emulation prevention -> NAL pipeline.

    `has_align` (static) enables the I_PCM alignment phase scan.
    `n_rbsp` overrides the working-buffer budget (static; defaults to
    splice_rbsp_budget of the donor's chunk class).  `ebsp_exact` selects
    the unbounded emulation-prevention path — the retry a caller uses
    when the bounded fast path flags overflow (e.g. donors with long
    zero runs: all-zero I_PCM payloads insert one 03 per 2 zero bytes,
    far past MAX_EBSP_INSERTIONS).
    """
    H, W = cfg.mb_height, cfg.mb_width
    r0, c0 = rect_mb_y, rect_mb_x
    assert r0 + R <= H and c0 + C <= W
    M = R * C
    S = dn["patterns"].shape[1]

    pro = _dense_prologue(cfg, r0, c0, R, C, num_refs,
                          bg_ref, bg_mv_x, bg_mv_y, bg_coded, dn)
    bg_p, bg_n = _bg3(pro, H, W)
    sr_pat, sr_n = pro["sr_pat"], pro["sr_n"]
    coded_f, last_incl = pro["coded_f"], pro["last_incl"]
    donor_coded = pro["donor_coded"]
    n_mbs = H * W
    zero = jnp.uint32(0)

    # Donor MB slots: [skip_run | S dense chunks].
    in_rect = jnp.zeros((H, W), bool).at[r0:r0 + R, c0:c0 + C].set(True)
    d_active = coded_f & in_rect.reshape(-1)
    d_sr_p = jnp.where(d_active, sr_pat, zero).reshape(H, W)
    d_sr_n = (sr_n * d_active.astype(jnp.int32)).reshape(H, W)
    donor_p = jnp.concatenate(
        [d_sr_p[r0:r0 + R, c0:c0 + C].reshape(R, C, 1),
         dn["patterns"].reshape(R, C, S)], axis=2)
    donor_n = jnp.concatenate(
        [d_sr_n[r0:r0 + R, c0:c0 + C].reshape(R, C, 1),
         jnp.where(donor_coded[:, :, None], dn["nbits"].reshape(R, C, S),
                   0)], axis=2)

    # Three statically-shaped bands in raster order.
    s_bg = bg_p.shape[-1]
    rect_p = jnp.concatenate(
        [bg_p[r0:r0 + R, :c0].reshape(R, c0 * s_bg),
         donor_p.reshape(R, C * (1 + S)),
         bg_p[r0:r0 + R, c0 + C:].reshape(R, (W - c0 - C) * s_bg)],
        axis=1).reshape(-1)
    rect_n = jnp.concatenate(
        [bg_n[r0:r0 + R, :c0].reshape(R, c0 * s_bg),
         donor_n.reshape(R, C * (1 + S)),
         bg_n[r0:r0 + R, c0 + C:].reshape(R, (W - c0 - C) * s_bg)],
        axis=1).reshape(-1)

    tail_skips = jnp.int32(n_mbs) - 1 - last_incl[-1]
    ts_pat, ts_n = expgolomb.ue(tail_skips.astype(jnp.uint32))
    ts_n = jnp.where(tail_skips > 0, ts_n, 0)

    patterns = jnp.concatenate(
        [header_patterns, bg_p[:r0].reshape(-1), rect_p,
         bg_p[r0 + R:].reshape(-1), ts_pat[None]])
    nbits = jnp.concatenate(
        [header_nbits, bg_n[:r0].reshape(-1), rect_n,
         bg_n[r0 + R:].reshape(-1), ts_n[None]])

    if n_rbsp is None:
        # Conservative default: the donor chunk-class capacity.  Callers
        # on the serving path pass splice_rbsp_budget(cfg, M,
        # dd.donor_bits) — the measured 7.5x cheaper honest budget.
        n_rbsp = splice_rbsp_budget(cfg, M, M * S * 32)
    return _finish_splice(patterns, nbits, n_rbsp, nal_ref_idc,
                          has_align=has_align, ebsp_exact=ebsp_exact)


def _finish_splice(patterns, nbits, n_rbsp: int, nal_ref_idc: int, *,
                   has_align: bool, ebsp_exact: bool):
    """Shared back end of the splice emitters: I_PCM alignment phase
    scan, trailing bits, tree pack, emulation prevention, NAL framing."""
    from ..config import MAX_EBSP_INSERTIONS

    # Fused back end (TPU, bounded path): alignment phase scan,
    # trailing bits, pack, emulation prevention and NAL framing in ONE
    # Pallas program per 4-session tile (ops/emit_fused) — the XLA
    # associative align scan (13 HBM round trips over the full symbol
    # array) and the two trailing-bits concats move into VMEM.
    # Bit-exact vs the staged path below.
    if jax.default_backend() == "tpu" and not ebsp_exact:
        from ..ops import emit_fused
        return emit_fused.finish_nal_fused(
            patterns, nbits, n_rbsp, nal_ref_idc,
            max_insertions=MAX_EBSP_INSERTIONS, has_align=has_align,
            append_trailing=True)

    if has_align:
        # Resolve pcm_alignment_zero_bits via the affine phase scan on
        # Z8: each ALIGN slot's width is (-pos) mod 8 where pos is the
        # running bit position, itself a function of earlier widths —
        # an associative (keep, add) scan over (Z8, affine maps).
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

    # Staged path: exact-EBSP retries (any backend) and off-TPU tests.
    # Direct-placement packer: at splice shapes (8k+ symbol lanes, 3-4k
    # word budgets) it beats the merge tree (1.64 vs 1.82 ms per
    # batch-256 step, v5e).
    if jax.default_backend() == "tpu":
        from ..ops import bitpack_flat
        words, total_bits = bitpack_flat.pack_words_place_pallas(
            patterns, nbits, (n_rbsp + 3) // 4)
        rbsp_bytes = bitpack.words_to_bytes(words)[:n_rbsp]
    else:
        rbsp_bytes, total_bits = bitpack.pack_bytes_place(patterns,
                                                          nbits, n_rbsp)
    rbsp_len = total_bits // 8
    overflow = total_bits > jnp.int32(n_rbsp * 8)

    header_byte = ((nal_ref_idc & 0x03) << 5) | 0x01
    if ebsp_exact:
        # Exact path: capacity for the unbounded 1.5x EBSP worst case.
        n_nal = (5 + n_rbsp * 3 // 2 + 11) // 4 * 4
        ebsp_bytes, ebsp_len = ebsp.rbsp_to_ebsp_tree(
            rbsp_bytes, rbsp_len, n_nal - 8)
    else:
        # Bounded path: insertions are capped at MAX_EBSP_INSERTIONS,
        # so the NAL buffer only needs rbsp + cap (not the 1.5x worst
        # case) — the expansion's per-pass working set shrinks ~33%
        # and so does every downstream byte op / egress fetch over the
        # buffer.  Frames past the cap flag overflow and retry exact.
        n_nal = (5 + n_rbsp + MAX_EBSP_INSERTIONS + 11) // 4 * 4
        ebsp_bytes, ebsp_len = ebsp.rbsp_to_ebsp_tree(
            rbsp_bytes, rbsp_len, n_nal - 8,
            max_insertions=MAX_EBSP_INSERTIONS)
        overflow |= (ebsp_len - rbsp_len) > MAX_EBSP_INSERTIONS
    prefix = jnp.concatenate([
        jnp.asarray([0, 0, 0, 1], jnp.uint8),
        jnp.asarray(header_byte, jnp.uint8).reshape(1).astype(jnp.uint8)])
    out = jnp.zeros((n_nal,), jnp.uint8)
    out = jax.lax.dynamic_update_slice(out, ebsp_bytes, (5,))
    out = jax.lax.dynamic_update_slice(out, prefix, (0,))
    return out, 5 + ebsp_len, total_bits, overflow


def emit_spliced_frame_rows(cfg: ComposerConfig, rect_mb_x: int,
                            rect_mb_y: int, R: int, C: int, num_refs: int,
                            header_patterns, header_nbits,
                            bg_ref, bg_mv_x, bg_mv_y, bg_coded,
                            dn: dict, nal_ref_idc: int = 0, *,
                            donor_bits: int | None = None,
                            has_align: bool = False,
                            n_rbsp: int | None = None,
                            ebsp_exact: bool = False,
                            compact_x: bool = False,
                            s_row: int | None = None,
                            s_flat: int | None = None,
                            s_exc: int | None = None,
                            bg_static_skip: bool = False,
                            bg_budget: int | None = None):
    """Device splice over the row-contiguous donor layout: symbol layout
    (rows_splice_symbols) followed by the shared pack -> emulation
    prevention -> NAL back end (_finish_splice).  See
    rows_splice_symbols for the layout/serving semantics."""
    patterns, nbits, n_rbsp = rows_splice_symbols(
        cfg, rect_mb_x, rect_mb_y, R, C, num_refs, header_patterns,
        header_nbits, bg_ref, bg_mv_x, bg_mv_y, bg_coded, dn,
        donor_bits=donor_bits, n_rbsp=n_rbsp, compact_x=compact_x,
        s_row=s_row, s_flat=s_flat, s_exc=s_exc,
        bg_static_skip=bg_static_skip, bg_budget=bg_budget)
    return _finish_splice(patterns, nbits, n_rbsp, nal_ref_idc,
                          has_align=has_align, ebsp_exact=ebsp_exact)


def _compact_bg_rows(pat, nb, budget: int):
    """Per-row stable compaction of nonzero-width background symbol
    lanes into a static `budget` of lanes (gather-free: the same
    low->high exact-bit monotone move as bitpack._monotone_compact,
    vectorized over rows with axis-1 rolls).

    Dropping zero-width lanes never changes the packed bitstream, so
    the result packs byte-identically whenever every row's nonzero
    count fits the budget; over-budget rows LOSE symbols and the
    returned flag must force the caller's overflow path (the generic
    uncompacted program is the retry).  Wrapped rolls are harmless:
    a lane's remaining shift never exceeds its original index, so a
    wrapped-in lane can never satisfy the take test.

    pat/nb: [rows, width] -> (pat[rows, bud], nb[rows, bud],
    overflowed bool scalar) with bud = min(budget, width)."""
    rows, width = pat.shape
    bud = min(budget, width)
    if width <= bud or rows == 0:
        return pat, nb, jnp.asarray(False)
    live = nb != 0
    over = jnp.any(jnp.sum(live.astype(jnp.int32), axis=1) > bud)
    shifts = (jnp.cumsum((~live).astype(jnp.int32), axis=1)
              * live.astype(jnp.int32))
    # Liveness rides nb (a lane is live iff its width is nonzero, and
    # the moves preserve that invariant), saving one moved array.
    vp, vn, rem = pat, nb, shifts
    for b in range(max(1, width).bit_length()):
        step = 1 << b
        if step >= width:
            continue
        p_r = jnp.roll(vp, -step, axis=1)
        n_r = jnp.roll(vn, -step, axis=1)
        r_r = jnp.roll(rem, -step, axis=1)
        take = (n_r != 0) & ((r_r & step) != 0)
        vacate = (vn != 0) & ((rem & step) != 0)
        vp = jnp.where(take, p_r, vp)
        vn = jnp.where(take, n_r, jnp.where(vacate, 0, vn))
        rem = jnp.where(take, r_r - step, jnp.where(vacate, 0, rem))
    vp = jnp.where(vn != 0, vp, 0)[:, :bud]
    return vp, vn[:, :bud], over


def rows_splice_symbols(cfg: ComposerConfig, rect_mb_x: int,
                        rect_mb_y: int, R: int, C: int, num_refs: int,
                        header_patterns, header_nbits,
                        bg_ref, bg_mv_x, bg_mv_y, bg_coded,
                        dn: dict, *,
                        donor_bits: int | None = None,
                        n_rbsp: int | None = None,
                        compact_x: bool = False,
                        s_row: int | None = None,
                        s_flat: int | None = None,
                        s_exc: int | None = None,
                        bg_static_skip: bool = False,
                        bg_budget: int | None = None):
    """Symbol-layout stage of the rows splice: returns the frame's
    (patterns, nbits, n_rbsp) ready for _finish_splice — split out so
    the stage's cost is measurable in isolation (scripts profile the
    prologue/layout share vs pack+EBSP on-chip).

    Donor bits arrive as ONE fused chunk stream per rect row with the
    row-interior skip runs already encoded (pack_donor_rows); the device
    contributes one dynamic skip-run slot per row (the run of the row's
    first coded donor MB, which counts composite background skips).
    Byte-identical to emit_spliced_frame_dense with ~5x fewer padded
    symbol lanes on worst-case dense donors.

    `dn` is rows_device_arrays(DonorRows): every donor-dependent value —
    row chunks, first_c (per-row rect column of the first coded MB, -1
    for an all-skipped row), coded mask, edge roles — is a TRACED array,
    so one compiled program serves every donor that shares the geometry
    (rect position/size), the row chunk class, and the n_rbsp budget.
    The dynamic skip-run slot always sits at the head of the row's donor
    segment; first_c only selects WHERE the run value is gathered from,
    never where it is emitted, which is what makes tracing it sound.
    `donor_bits` (static) sizes the default budget when n_rbsp is None."""
    H, W = cfg.mb_height, cfg.mb_width
    r0, c0 = rect_mb_y, rect_mb_x
    assert r0 + R <= H and c0 + C <= W
    M = R * C

    # Compact wire dtypes -> compute dtypes (see _dense_prologue); the
    # rows wire ships edge-only roles — rebuild the full-rect arrays
    # BEFORE the prologue consumes them.
    dn = dict(dn)
    if "blob" in dn:
        # Single-blob serving wire: decode all fields in-program.
        assert None not in (s_row, s_flat, s_exc), (
            "blob wire requires static s_row/s_flat/s_exc")
        dn = _unblob(dn["blob"], R, C, s_flat, s_exc)
    if "flat_patterns" in dn:
        # Flat serving wire (rows_flat_wire): reconstruct the [R, s_row]
        # layout on device; s_row must be the pinned static class.
        assert s_row is not None, "flat donor wire requires static s_row"
        dn["row_patterns"], dn["row_nbits"] = _rows_from_flat(dn, R, s_row)
    else:
        dn["row_nbits"] = dn["row_nbits"].astype(jnp.int32)

    if bg_static_skip:
        # Static-chrome serving shape (MASTER_DESIGN: static UI around
        # one dynamic rect): every background MB is P_Skip with zero
        # motion — the caller guarantees bg_coded all-False and zero
        # bg ref/mv fields.  No background symbols exist, so the
        # full-frame prologue (role stencil, 3600-lane skip-run scan,
        # background symbol grids) collapses to R-lane arithmetic over
        # the donor coded mask; byte-identical to the generic program on
        # such inputs (test_splice_device parity) at a fraction of the
        # symbol lanes (23x23 @720p: 2.3k vs 8.5k) and of the RBSP
        # budget (splice_rows_rbsp_budget(static_bg=True)).
        n_mbs = cfg.total_mbs
        coded = jnp.asarray(dn["coded"], bool).reshape(R, C)
        first_c = jnp.asarray(dn["first_c"], jnp.int32)
        cols = jnp.arange(C, dtype=jnp.int32)
        last_c = jnp.max(jnp.where(coded, cols[None, :], -1), axis=1)
        row_flat0 = (r0 + jnp.arange(R, dtype=jnp.int32)) * W + c0
        first_flat = row_flat0 + jnp.maximum(first_c, 0)
        last_flat = jnp.where(last_c >= 0, row_flat0 + last_c,
                              jnp.int32(-1))
        run_max = jax.lax.associative_scan(jnp.maximum, last_flat)
        prev_flat = jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32), run_max[:-1]])
        valid = first_c >= 0
        run = jnp.maximum(first_flat - prev_flat - 1, 0)
        sr_pat, sr_n = expgolomb.ue(run.astype(jnp.uint32))
        dyn_p = jnp.where(valid, sr_pat, 0)[:, None].astype(jnp.uint32)
        dyn_n = jnp.where(valid, sr_n, 0)[:, None].astype(jnp.int32)

        tail_skips = jnp.int32(n_mbs) - 1 - run_max[-1]
        ts_pat, ts_n = expgolomb.ue(tail_skips.astype(jnp.uint32))
        ts_n = jnp.where(tail_skips > 0, ts_n, 0)

        patterns = jnp.concatenate(
            [header_patterns,
             jnp.concatenate(
                 [dyn_p, dn["row_patterns"].astype(jnp.uint32)],
                 axis=1).reshape(-1),
             ts_pat[None]])
        nbits = jnp.concatenate(
            [header_nbits,
             jnp.concatenate([dyn_n, dn["row_nbits"]], axis=1)
             .reshape(-1),
             ts_n[None]])
        if n_rbsp is None:
            if donor_bits is None:
                donor_bits = R * dn["row_patterns"].shape[1] * 32
            n_rbsp = splice_rows_rbsp_budget(cfg, M, R, donor_bits,
                                             static_bg=True)
        return patterns, nbits, n_rbsp

    if "edge_a_ref" in dn:
        dn.update(edge_roles_to_full(dn, R, C))

    pro = _dense_prologue(cfg, r0, c0, R, C, num_refs,
                          bg_ref, bg_mv_x, bg_mv_y, bg_coded, dn)
    bg_p, bg_n = _bg3(pro, H, W)
    sr_pat, sr_n = pro["sr_pat"], pro["sr_n"]
    last_incl = pro["last_incl"]
    n_mbs = H * W

    # Dynamic first-run slots: gather the composite skip run at each
    # row's first coded donor MB (traced per-donor indices).
    first_c = jnp.asarray(dn["first_c"], jnp.int32)
    flat_idx = ((r0 + jnp.arange(R, dtype=jnp.int32)) * W + c0
                + jnp.maximum(first_c, 0))
    valid = first_c >= 0
    dyn_p = jnp.where(valid, sr_pat[flat_idx], 0)[:, None].astype(jnp.uint32)
    dyn_n = jnp.where(valid, sr_n[flat_idx], 0)[:, None].astype(jnp.int32)

    tail_skips = jnp.int32(n_mbs) - 1 - last_incl[-1]
    ts_pat, ts_n = expgolomb.ue(tail_skips.astype(jnp.uint32))
    ts_n = jnp.where(tail_skips > 0, ts_n, 0)

    if not compact_x:
        s_bg = bg_p.shape[-1]
        rect_p = jnp.concatenate(
            [bg_p[r0:r0 + R, :c0].reshape(R, c0 * s_bg),
             dyn_p, dn["row_patterns"],
             bg_p[r0:r0 + R, c0 + C:].reshape(R, (W - c0 - C) * s_bg)],
            axis=1).reshape(-1)
        rect_n = jnp.concatenate(
            [bg_n[r0:r0 + R, :c0].reshape(R, c0 * s_bg),
             dyn_n, dn["row_nbits"],
             bg_n[r0:r0 + R, c0 + C:].reshape(R, (W - c0 - C) * s_bg)],
            axis=1).reshape(-1)
        patterns = jnp.concatenate(
            [header_patterns, bg_p[:r0].reshape(-1), rect_p,
             bg_p[r0 + R:].reshape(-1), ts_pat[None]])
        nbits = jnp.concatenate(
            [header_nbits, bg_n[:r0].reshape(-1), rect_n,
             bg_n[r0 + R:].reshape(-1), ts_n[None]])
    else:
        assert not pro["wide"], (
            "compact_x background layout requires <= 4095 MBs (the "
            "merged sr slot); use compact_x=False for larger frames")
        # Compact background: 2 symbol slots per MB (A||mvd_x, mvd_y||cbp)
        # — valid when every background mv_x is zero, in which case
        # mvd_x is the 1-bit se(0) EXCEPT where the MV prediction sees
        # donor neighbors.  That "wide" set is static: the column right
        # of the rect (left neighbor is donor), the column left of it
        # below the top rect row (above-right neighbor), and the row
        # under the rect (above / above-left neighbors).  Wide MBs keep
        # the generic 3-slot form.
        bg_active = pro["bg_active"]
        bg_i = bg_active.astype(jnp.int32)
        zero = jnp.uint32(0)
        a2_pat, a2_n = bitpack.merge_symbol_pairs(
            pro["a_pat"], pro["a_n"], pro["mvx_pat"], pro["mvx_n"])
        bg2_p = jnp.stack([jnp.where(bg_active, a2_pat, zero),
                           jnp.where(bg_active, pro["c_pat"], zero)],
                          axis=1).reshape(H, W, 2)
        bg2_n = jnp.stack([a2_n * bg_i, pro["c_n"] * bg_i],
                          axis=1).reshape(H, W, 2)

        # Bounded coded-background budget: serving shapes skip almost
        # every background MB, but the generic layout still carries 2
        # static lanes per background MB (zero-width when skipped)
        # through every pack/cumsum pass.  With bg_budget=L each
        # background row segment is compacted (order-preserving,
        # zero-width lanes dropped -> bitstream unchanged) to at most L
        # lanes; rows with more than L nonzero lanes flag the frame for
        # the generic-path retry via a trailing-symbol sentinel that
        # trips _finish_splice's RBSP-overflow check.  23x23 rect @720p:
        # 8,483 -> 3,585 symbol lanes at L=16.
        #
        # MEASURED NEGATIVE at rep 720p serving shapes (v5e, batch 256):
        # the compaction's ~8 masked-roll passes are HBM-bound XLA ops
        # over the [45, 2W] grids and cost ~0.25 ms — about what the
        # 2.3x-smaller Pallas pack saves (step 0.94 -> 0.96-0.98 ms at
        # L=8/16; a uint8-counter variant was worse still, 1.14, from
        # small-grid relayouts).  Kept because it is byte-exact, tested,
        # and the trade flips wherever background grids dominate donor
        # lanes harder than pack cost (bigger frames, tiny donors) —
        # callers must measure.  The serving answer for static
        # backgrounds remains bg_static_skip (no bg lanes at all).
        bg_overs = []

        def cb2(p2, n2):
            if bg_budget is None:
                return p2, n2
            cp, cn_, ov = _compact_bg_rows(p2, n2, bg_budget)
            bg_overs.append(ov)
            return cp, cn_

        have_left = c0 >= 1
        have_right = c0 + C < W
        have_bottom = r0 + R < H

        top_p, top_n = cb2(bg2_p[:r0].reshape(r0, 2 * W),
                           bg2_n[:r0].reshape(r0, 2 * W))
        segs_p = [header_patterns, top_p.reshape(-1)]
        segs_n = [header_nbits, top_n.reshape(-1)]
        # Rect row r0 (no left-wide column: its above-right is background).
        row = r0
        r0l_p, r0l_n = cb2(bg2_p[row, :c0].reshape(1, 2 * c0),
                           bg2_n[row, :c0].reshape(1, 2 * c0))
        segs_p += [r0l_p.reshape(-1), dyn_p[0], dn["row_patterns"][0]]
        segs_n += [r0l_n.reshape(-1), dyn_n[0], dn["row_nbits"][0]]
        if have_right:
            segs_p += [bg_p[row, c0 + C]]
            segs_n += [bg_n[row, c0 + C]]
        rcw0 = max(W - c0 - C - 1, 0)
        r0r_p, r0r_n = cb2(bg2_p[row, c0 + C + 1:].reshape(1, 2 * rcw0),
                           bg2_n[row, c0 + C + 1:].reshape(1, 2 * rcw0))
        segs_p += [r0r_p.reshape(-1)]
        segs_n += [r0r_n.reshape(-1)]
        # Rect rows r0+1 .. r0+R-1 (batched; left-wide column appears).
        if R > 1:
            rs = slice(r0 + 1, r0 + R)
            lc = c0 - 1 if have_left else 0
            ml_p, ml_n = cb2(bg2_p[rs, :lc].reshape(R - 1, lc * 2),
                             bg2_n[rs, :lc].reshape(R - 1, lc * 2))
            parts_p = [ml_p]
            parts_n = [ml_n]
            if have_left:
                parts_p += [bg_p[rs, c0 - 1]]
                parts_n += [bg_n[rs, c0 - 1]]
            parts_p += [dyn_p[1:], dn["row_patterns"][1:]]
            parts_n += [dyn_n[1:], dn["row_nbits"][1:]]
            if have_right:
                parts_p += [bg_p[rs, c0 + C]]
                parts_n += [bg_n[rs, c0 + C]]
            rcw = max(W - c0 - C - 1, 0)
            mr_p, mr_n = cb2(bg2_p[rs, c0 + C + 1:].reshape(R - 1, rcw * 2),
                             bg2_n[rs, c0 + C + 1:].reshape(R - 1, rcw * 2))
            parts_p += [mr_p]
            parts_n += [mr_n]
            segs_p += [jnp.concatenate(parts_p, axis=1).reshape(-1)]
            segs_n += [jnp.concatenate(parts_n, axis=1).reshape(-1)]
        # Row under the rect: wide across the rect's footprint.
        if have_bottom:
            row = r0 + R
            lw = c0 - 1 if have_left else 0
            rw = min(c0 + C, W - 1)
            bl_p, bl_n = cb2(bg2_p[row, :lw].reshape(1, 2 * lw),
                             bg2_n[row, :lw].reshape(1, 2 * lw))
            brw = max(W - rw - 1, 0)
            br_p, br_n = cb2(bg2_p[row, rw + 1:].reshape(1, 2 * brw),
                             bg2_n[row, rw + 1:].reshape(1, 2 * brw))
            segs_p += [bl_p.reshape(-1),
                       bg_p[row, lw:rw + 1].reshape(-1),
                       br_p.reshape(-1)]
            segs_n += [bl_n.reshape(-1),
                       bg_n[row, lw:rw + 1].reshape(-1),
                       br_n.reshape(-1)]
        nbot = max(H - r0 - R - 1, 0)
        bot_p, bot_n = cb2(bg2_p[r0 + R + 1:].reshape(nbot, 2 * W),
                           bg2_n[r0 + R + 1:].reshape(nbot, 2 * W))
        if bg_overs:
            bg_over = bg_overs[0]
            for ov in bg_overs[1:]:
                bg_over = bg_over | ov
            ts_n = ts_n + jnp.where(bg_over, jnp.int32(1 << 22), 0)
        segs_p += [bot_p.reshape(-1), ts_pat[None]]
        segs_n += [bot_n.reshape(-1), ts_n[None]]
        patterns = jnp.concatenate(segs_p)
        nbits = jnp.concatenate(segs_n)

    if n_rbsp is None:
        if donor_bits is None:
            # Chunk-class capacity fallback (static per program).
            donor_bits = R * dn["row_patterns"].shape[1] * 32
        n_rbsp = splice_rbsp_budget(cfg, M, donor_bits)
    return patterns, nbits, n_rbsp


def prepare_donor_rows_serving(payloads, start_bits, R: int, C: int,
                               donor_num_refs: int, num_ref_idx_l0: int,
                               donor_ref_map: tuple = (0,), *,
                               s_row: int,
                               rect_at_left_edge: bool = False,
                               rect_at_top_edge: bool = False,
                               rect_at_right_edge: bool = False,
                               left_ring=None, top_ring=None,
                               right_ring=None,
                               rings_per_donor: bool = False,
                               n_threads: int = 0,
                               retarget_mvs: bool = False,
                               flat_wire: bool = False,
                               blob_wire: bool = False,
                               s_flat: int | None = None,
                               s_exc: int | None = None):
    """Serving ingest for a batch of FRESH donor payloads -> (dn, meta).

    One fused native call (threaded across donors) parses each payload,
    resolves composite-nC tokens, packs row-contiguous chunks at the
    pinned `s_row` class and decodes composite MV edge roles; the result
    is a dict of jnp arrays with a leading batch axis — exactly the
    traced donor inputs of make_batched_splice_step_rows, so B sessions
    can each carry a DIFFERENT donor through one compiled program.
    meta = (donor_bits i64[N], has_align bool[N]) host metadata (budget
    checks / phase-scan need).  Falls back to the per-donor Python path
    when the native library is unavailable.
    """
    from .. import native_bridge

    if blob_wire and s_flat is not None and s_exc is not None \
            and native_bridge.native_available():
        # Native fast path: the whole wire record is compacted in C —
        # no padded-array materialization, no numpy pack.
        got = native_bridge.prepare_rows_blob_batch(
            payloads, start_bits, R, C, donor_num_refs, num_ref_idx_l0,
            donor_ref_map, s_row, s_flat, s_exc,
            at_left_edge=rect_at_left_edge, at_top_edge=rect_at_top_edge,
            at_right_edge=rect_at_right_edge,
            left_ring=left_ring, top_ring=top_ring,
            right_ring=right_ring, rings_per_donor=rings_per_donor,
            n_threads=n_threads, retarget_mvs=retarget_mvs)
        if got is not None:
            blob, donor_bits, has_align = got
            return {"blob": jnp.asarray(blob)}, (donor_bits, has_align)

    out = None
    if native_bridge.native_available():
        out = native_bridge.prepare_rows_batch(
            payloads, start_bits, R, C, donor_num_refs, num_ref_idx_l0,
            donor_ref_map, s_row,
            at_left_edge=rect_at_left_edge, at_top_edge=rect_at_top_edge,
            at_right_edge=rect_at_right_edge,
            left_ring=left_ring, top_ring=top_ring, right_ring=right_ring,
            rings_per_donor=rings_per_donor,
            n_threads=n_threads, retarget_mvs=retarget_mvs)
    if out is None:
        if retarget_mvs or rings_per_donor:
            raise NotImplementedError(
                "retarget_mvs / rings_per_donor require the native "
                "engine")
        drs = []
        for payload, sb in zip(payloads, start_bits):
            dd = prepare_donor_dense_from_slice(
                payload, sb, C, R, donor_num_refs, num_ref_idx_l0,
                donor_ref_map,
                rect_at_left_edge=rect_at_left_edge,
                rect_at_top_edge=rect_at_top_edge,
                rect_at_right_edge=rect_at_right_edge,
                left_ring=left_ring, top_ring=top_ring,
                right_ring=right_ring, engine="python")
            dr = pack_donor_rows(dd, R, C, min_class=s_row)
            if dr.row_patterns.shape[1] != s_row:
                raise OverflowError(
                    f"donor needs {dr.row_patterns.shape[1]} row slots, "
                    f"class is {s_row}")
            drs.append(dr)
        out = {
            "row_patterns": np.stack([d.row_patterns for d in drs]),
            "row_nbits": np.stack([d.row_nbits for d in drs]),
            "first_c": np.stack([d.first_c for d in drs]),
            "coded": np.stack([d.coded for d in drs]),
            "donor_bits": np.asarray([d.donor_bits for d in drs]),
            "has_align": np.asarray([d.has_align for d in drs]),
        }
        for f in ("a_ref", "a_mvx", "a_mvy", "b_ref", "b_mvx", "b_mvy",
                  "d_ref", "d_mvx", "d_mvy"):
            out[f] = np.stack([getattr(d, f) for d in drs])

    donor_bits = out.pop("donor_bits")
    has_align = out.pop("has_align")
    # Compact wire dtypes: row_nbits fits int8 (<=32, ALIGN sentinel -1),
    # edge roles fit int16 (qpel MVs within the 496 px budget; ref
    # sentinels -2/-9) and ship as the edge read-set only
    # (_edge_roles_wire) — together ~2.6x fewer host->device bytes per
    # fresh donor than the naive full-role int32 wire.
    roles = {k: out.pop(k) for k in
             ("a_ref", "a_mvx", "a_mvy", "b_ref", "b_mvx", "b_mvy",
              "d_ref", "d_mvx", "d_mvy")}
    host = {}
    if flat_wire or blob_wire:
        # Flat wire: pattern bytes ~= the donor's actual coded bits
        # (pads the total chunk count, not R x the max row; nbits
        # collapse to per-row tails + sparse exceptions).  The step
        # kernel must be built with the matching static s_row.
        fw, s_flat, s_exc = rows_flat_wire(out.pop("row_patterns"),
                                           out.pop("row_nbits"),
                                           s_flat=s_flat, s_exc=s_exc)
        host.update(fw)
    for k, v in out.items():
        host[k] = v.astype(np.int8) if k == "row_nbits" else v
    edge = _edge_roles_wire(roles, R, C)
    _check_roles_fit_int16(edge)
    for k, v in edge.items():
        host[k] = np.ascontiguousarray(v).astype(np.int16)
    host["first_c"] = np.asarray(host["first_c"], np.int32)
    if blob_wire:
        # One uint32 record per donor -> ONE host->device transfer per
        # batch step (each extra array pays a fixed dispatch cost on the
        # serving link); decoded in-program by _unblob.
        blob = pack_rows_blob(host, R, C, s_flat, s_exc)
        return {"blob": jnp.asarray(blob)}, (donor_bits, has_align)
    return ({k: jnp.asarray(v) for k, v in host.items()},
            (donor_bits, has_align))
