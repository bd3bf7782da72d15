"""ctypes bridge to the native CAVLC slice parser (native/cavlc_decode.cpp).

Donor-ingest CAVLC decode is bit-serial (the one stage that resists
vectorization, SURVEY.md §7.3); the native parser runs it at C speed and
returns flat macroblock records that convert losslessly into
models/mb_transcode.Macroblock (tail bits extracted from the RBSP by
span).  Falls back to the pure-Python parser when the library has not
been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import functools
import subprocess
import warnings
from pathlib import Path

import numpy as np

from .models import mb_transcode as mbt
from .ops import cavlc

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libh264tpu_cavlc.so"


class _BlockRec(ctypes.Structure):
    _fields_ = [
        ("tc", ctypes.c_int16),
        ("t1", ctypes.c_int16),
        ("total_zeros", ctypes.c_int16),
        ("tail_start", ctypes.c_int32),
        ("tail_len", ctypes.c_int32),
    ]


class _MBRec(ctypes.Structure):
    _fields_ = [
        ("kind", ctypes.c_int32),
        ("mb_type", ctypes.c_int32),
        ("cbp", ctypes.c_int32),
        ("qp_delta", ctypes.c_int32),
        ("chroma_pred", ctypes.c_int32),
        ("i16_idx", ctypes.c_int32),
        ("pred_bits_start", ctypes.c_int32),
        ("pred_bits_len", ctypes.c_int32),
        ("ipcm_byte_start", ctypes.c_int64),
        ("sub_mb_types", ctypes.c_int32 * 4),
        ("ref_idx", ctypes.c_int32 * 4),
        ("n_ref", ctypes.c_int32),
        ("mvds", (ctypes.c_int32 * 2) * 16),
        ("n_mvds", ctypes.c_int32),
        ("blocks", _BlockRec * 27),
    ]


_NO_QP = -(2 ** 31)
_ABI_VERSION = 7


def _warn_degraded(stage: str, exc: Exception | None = None) -> None:
    """A failed build/load silently degrades to the ~30x slower Python
    path — make the degradation visible, with the compiler's stderr."""
    detail = ""
    if isinstance(exc, subprocess.CalledProcessError) and exc.stderr:
        err = exc.stderr
        if isinstance(err, bytes):
            err = err.decode(errors="replace")
        detail = f"\nmake stderr:\n{err.strip()[-2000:]}"
    elif exc is not None:
        detail = f": {exc!r}"
    warnings.warn(
        f"native CAVLC library {stage}; falling back to the pure-Python "
        f"engine (slow){detail}", RuntimeWarning, stacklevel=3)


@functools.lru_cache(maxsize=1)
def load_library(build: bool = True):
    """Load (building if needed) the native library; None on failure."""
    if not _LIB_PATH.exists() and build:
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)],
                           capture_output=True, check=True)
        except (OSError, subprocess.CalledProcessError) as e:
            _warn_degraded("build failed", e)
            return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    # Reject (and rebuild) a library with a stale extern "C" surface —
    # calling through a mismatched ABI would misread arguments silently.
    try:
        lib.cavlc_abi_version.restype = ctypes.c_long
        abi_ok = lib.cavlc_abi_version() == _ABI_VERSION
    except AttributeError:
        abi_ok = False
    if not abi_ok:
        if not build:
            return None
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR), "clean"],
                           capture_output=True, check=True)
            subprocess.run(["make", "-C", str(_NATIVE_DIR)],
                           capture_output=True, check=True)
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.cavlc_abi_version.restype = ctypes.c_long
            if lib.cavlc_abi_version() != _ABI_VERSION:
                _warn_degraded(
                    "ABI-mismatch rebuild produced a library whose "
                    f"cavlc_abi_version() != {_ABI_VERSION}")
                return None
        except (OSError, subprocess.CalledProcessError, AttributeError) as e:
            _warn_degraded("ABI-mismatch rebuild failed", e)
            return None
    lib.cavlc_parse_slice.restype = ctypes.c_int
    lib.cavlc_parse_slice.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(_MBRec), ctypes.POINTER(ctypes.c_long),
        ctypes.c_int,
    ]
    lib.cavlc_emit_slice.restype = ctypes.c_int
    lib.cavlc_emit_slice.argtypes = [
        ctypes.POINTER(_MBRec), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.c_int,
    ]
    lib.cavlc_prepare_dense.restype = ctypes.c_int
    lib.cavlc_prepare_dense.argtypes = [
        ctypes.POINTER(_MBRec), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.cavlc_mv_edge_roles.restype = ctypes.c_int
    lib.cavlc_mv_edge_roles.argtypes = [
        ctypes.POINTER(_MBRec), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.cavlc_pack_rows.restype = ctypes.c_int
    lib.cavlc_pack_rows.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.cavlc_retarget_recs.restype = ctypes.c_int
    lib.cavlc_retarget_recs.argtypes = [
        ctypes.POINTER(_MBRec), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.cavlc_prepare_rows_batch.restype = ctypes.c_int
    lib.cavlc_prepare_rows_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.cavlc_blob_stride.restype = ctypes.c_long
    lib.cavlc_blob_stride.argtypes = [ctypes.c_int] * 4
    lib.cavlc_prepare_rows_blob_batch.restype = ctypes.c_int
    lib.cavlc_prepare_rows_blob_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    if lib.cavlc_mbrec_size() != ctypes.sizeof(_MBRec):
        raise RuntimeError("native MBRec layout mismatch")
    return lib


def native_available() -> bool:
    return load_library() is not None


def _bit_span(bits: np.ndarray, start: int, length: int) -> str:
    return "".join("1" if b else "0" for b in bits[start:start + length])


def _decode_tail(blk: _BlockRec, bits: np.ndarray) -> cavlc.ResidualBlock:
    if blk.tc == 0:
        return cavlc.EMPTY_BLOCK
    tail = _bit_span(bits, blk.tail_start, blk.tail_len)
    # Levels/runs are not re-derived here (the emitter only needs tc/t1/
    # tail); parity with the Python parser is asserted on those fields.
    return cavlc.ResidualBlock(int(blk.tc), int(blk.t1), tail, (),
                               int(blk.total_zeros), ())


def parse_slice_raw(rbsp: bytes, start_bit: int, mb_width: int,
                    mb_height: int, is_p: bool, num_ref_idx_l0: int, *,
                    bug_compat: bool = False):
    """Raw-record parse: -> (ctypes MBRec array, end_bit) with NO Python
    conversion — the zero-copy handle for native re-emission.

    bug_compat selects the reference's zeroed I_PCM nC rule (see
    mb_transcode.ipcm_context); default is the spec rule nN = 16."""
    lib = load_library()
    if lib is None:
        return None
    data = np.frombuffer(rbsp, np.uint8)
    total = mb_width * mb_height
    recs = (_MBRec * total)()
    end_bit = ctypes.c_long(0)
    err = lib.cavlc_parse_slice(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(rbsp), start_bit, mb_width, mb_height, int(is_p),
        num_ref_idx_l0, recs, ctypes.byref(end_bit), int(bug_compat))
    if err:
        raise cavlc.CAVLCError(f"native CAVLC parse failed: code {err}")
    return recs, int(end_bit.value)


def emit_slice_raw(recs, mb_width: int, mb_height: int, is_p: bool,
                   num_ref_idx_l0: int, src_rbsp: bytes,
                   aux: bytes = b"", *, duplicate_final_skip: bool = False,
                   start_phase: int = 0, capacity: int | None = None,
                   bug_compat: bool = False):
    """Native re-emission of an MBRec grid -> (payload_bytes, nbits).

    The payload is the MB data only (no slice header / trailing bits).
    `start_phase` is the bit phase (mod 8) of the payload's position in
    the final stream (I_PCM alignment depends on it); the returned bytes
    carry `start_phase` leading zero bits and nbits counts them."""
    lib = load_library()
    if lib is None:
        return None
    if capacity is None:
        capacity = len(src_rbsp) + mb_width * mb_height * 400 + 4096
    out = np.zeros(capacity, np.uint8)
    src = np.frombuffer(src_rbsp, np.uint8)
    aux_arr = np.frombuffer(aux, np.uint8) if aux else np.zeros(1, np.uint8)
    nbits = ctypes.c_long(0)
    err = lib.cavlc_emit_slice(
        recs, mb_width, mb_height, int(is_p), num_ref_idx_l0,
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        aux_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(duplicate_final_skip), start_phase,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        capacity, ctypes.byref(nbits), int(bug_compat))
    if err:
        raise cavlc.CAVLCError(f"native CAVLC emit failed: code {err}")
    n = int(nbits.value)
    return out[: (n + 7) // 8].tobytes(), n


def pad_grid_raw(recs, in_w: int, in_h: int, out_w: int, is_p: bool, *,
                 edge_y: int = 235):
    """Widen a raw MBRec grid with padding records (P slices: skip;
    I slices: I_PCM with aux payloads, first one edge-compatible).
    -> (out_recs, aux_bytes, last_input_is_skip)."""
    from .models.splice import ipcm_padding_mb

    total = out_w * in_h
    out_recs = (_MBRec * total)()
    pad = out_w - in_w
    rec_size = ctypes.sizeof(_MBRec)

    # Aux payloads: [0] = first-padding edge MB, [384] = plain black MB.
    aux = (ipcm_padding_mb(edge_y, first_padding=True).ipcm_samples
           + ipcm_padding_mb().ipcm_samples)

    for row in range(in_h):
        ctypes.memmove(
            ctypes.byref(out_recs, row * out_w * rec_size),
            ctypes.byref(recs, row * in_w * rec_size),
            in_w * rec_size)
        if not is_p:
            for p in range(pad):
                dst = out_recs[row * out_w + in_w + p]
                dst.kind = 4
                dst.mb_type = 25
                dst.ipcm_byte_start = -((0 if p == 0 else 384) + 1)
        # P slices: zero-initialized records are already P_Skip (kind 0).
    last_in_skip = recs[in_w * in_h - 1].kind == 0
    return out_recs, aux, last_in_skip


def parse_slice_native(rbsp: bytes, start_bit: int, mb_width: int,
                       mb_height: int, is_p: bool,
                       num_ref_idx_l0: int, *, bug_compat: bool = False):
    """-> (grid, end_bit) like mb_transcode.parse_*_slice_mbs (P_Skip as
    mbt.SKIP), or None when the native library is unavailable."""
    lib = load_library()
    if lib is None:
        return None

    data = np.frombuffer(rbsp, np.uint8)
    total = mb_width * mb_height
    recs = (_MBRec * total)()
    end_bit = ctypes.c_long(0)
    err = lib.cavlc_parse_slice(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(rbsp), start_bit, mb_width, mb_height, int(is_p),
        num_ref_idx_l0, recs, ctypes.byref(end_bit), int(bug_compat))
    if err:
        raise cavlc.CAVLCError(f"native CAVLC parse failed: code {err}")

    bits = np.unpackbits(data)
    grid = []
    i = 0
    for _r in range(mb_height):
        row = []
        for _c in range(mb_width):
            rec = recs[i]
            i += 1
            row.append(_convert(rec, bits, rbsp))
        grid.append(row)
    return grid, int(end_bit.value)


def _convert(rec: _MBRec, bits: np.ndarray, rbsp: bytes):
    if rec.kind == 0:
        return mbt.SKIP
    qp = None if rec.qp_delta == _NO_QP else int(rec.qp_delta)
    luma = tuple(_decode_tail(rec.blocks[1 + r], bits) for r in range(16))
    chroma_ac = tuple(
        tuple(_decode_tail(rec.blocks[19 + c * 4 + k], bits)
              for k in range(4)) for c in range(2))
    cb_dc = (_decode_tail(rec.blocks[17], bits)
             if rec.blocks[17].tail_start or rec.blocks[17].tc else None)
    cr_dc = (_decode_tail(rec.blocks[18], bits)
             if rec.blocks[18].tail_start or rec.blocks[18].tc else None)
    cbp_chroma = (rec.cbp >> 4) & 3
    if cbp_chroma == 0:
        cb_dc = cr_dc = None

    if rec.kind == 1:
        n_parts = (1 if rec.mb_type == 0 else
                   (2 if rec.mb_type <= 2 else 4))
        return mbt.Macroblock(
            kind="inter", mb_type=int(rec.mb_type),
            sub_mb_types=tuple(int(s) for s in rec.sub_mb_types[:4])
            if rec.mb_type >= 3 else (),
            ref_idx=tuple(int(r) for r in rec.ref_idx[: rec.n_ref]),
            mvds=tuple((int(rec.mvds[k][0]), int(rec.mvds[k][1]))
                       for k in range(rec.n_mvds)),
            cbp=int(rec.cbp), qp_delta=qp, luma=luma, cb_dc=cb_dc,
            cr_dc=cr_dc, chroma_ac=chroma_ac)
    if rec.kind == 2:
        return mbt.Macroblock(
            kind="i4x4", mb_type=int(rec.mb_type),
            pred_mode_bits=_bit_span(bits, rec.pred_bits_start,
                                     rec.pred_bits_len),
            chroma_pred=int(rec.chroma_pred), cbp=int(rec.cbp),
            qp_delta=qp, luma=luma, cb_dc=cb_dc, cr_dc=cr_dc,
            chroma_ac=chroma_ac)
    if rec.kind == 3:
        return mbt.Macroblock(
            kind="i16x16", mb_type=int(rec.mb_type),
            i16_idx=int(rec.i16_idx), chroma_pred=int(rec.chroma_pred),
            cbp=int(rec.cbp), qp_delta=qp,
            luma_dc=_decode_tail(rec.blocks[0], bits), luma=luma,
            cb_dc=cb_dc, cr_dc=cr_dc, chroma_ac=chroma_ac)
    if rec.kind == 4:
        start = int(rec.ipcm_byte_start)
        samples = rbsp[start:start + 384]
        if len(samples) != 384:
            # The native parser rejects payloads past the RBSP end
            # (kErrEof), so a short slice here means a stale library or a
            # corrupted record — never silently truncate I_PCM samples.
            raise cavlc.CAVLCError(
                f"I_PCM payload truncated ({len(samples)}/384 bytes at "
                f"byte {start})")
        return mbt.Macroblock(kind="ipcm", mb_type=int(rec.mb_type),
                              ipcm_samples=samples)
    raise cavlc.CAVLCError(f"native parser returned bad kind {rec.kind}")


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _ring_arrays(ring, n):
    """Python ring (list of (ref,mvx,mvy) or None) -> (i32[n,3], u8[n])."""
    vals = np.zeros((n, 3), np.int32)
    valid = np.zeros(n, np.uint8)
    if ring is not None:
        for i, ent in enumerate(ring):
            if ent is None:
                continue
            vals[i] = ent
            valid[i] = 1
    return vals, valid


def prepare_dense_raw(recs, mb_width: int, mb_height: int, rbsp: bytes,
                      num_ref_composite: int, ref_map,
                      at_left_edge: bool, at_top_edge: bool,
                      chunk_classes=(8, 12, 16, 24, 32, 48, 64, 104, 352),
                      *, bug_compat: bool = False):
    """Native dense prep over parsed MBRecs -> (patterns [M,S], nbits,
    coded u8[M], donor_bits, has_align), retrying chunk classes upward."""
    lib = load_library()
    data = np.frombuffer(rbsp, np.uint8)
    m_total = mb_width * mb_height
    rmap = np.asarray(ref_map, np.int32)
    for s_class in chunk_classes:
        patterns = np.zeros((m_total, s_class), np.uint32)
        nbits = np.zeros((m_total, s_class), np.int32)
        coded = np.zeros(m_total, np.uint8)
        donor_bits = ctypes.c_long(0)
        has_align = ctypes.c_int(0)
        needed = ctypes.c_int(0)
        err = lib.cavlc_prepare_dense(
            recs, mb_height, mb_width, num_ref_composite, _i32p(rmap),
            len(rmap), int(at_left_edge), int(at_top_edge),
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(rbsp),
            patterns.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            _i32p(nbits), s_class,
            coded.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(donor_bits), ctypes.byref(has_align),
            ctypes.byref(needed), int(bug_compat))
        if err == -101:
            continue
        if err == -103:
            raise NotImplementedError(
                "donor P_Skips with donor_ref_map[0] != 0: skips "
                "hardwire composite ref 0 — use retarget_mvs=True "
                "(explicit conversion) or the host path")
        if err:
            raise cavlc.CAVLCError(f"native dense prep failed: {err}")
        return (patterns, nbits, coded.astype(bool),
                int(donor_bits.value), bool(has_align.value))
    raise OverflowError(
        f"donor MB needs {needed.value} chunk slots > max class")


def mv_edge_roles_raw(recs, mb_width: int, mb_height: int,
                      num_ref_composite: int, ref_map,
                      left_ring, top_ring, right_ring):
    """Native composite MV-field decode -> a/b/d role arrays ([M],x3)."""
    lib = load_library()
    R, C = mb_height, mb_width
    m_total = R * C
    rmap = np.asarray(ref_map, np.int32)
    tv, tm = _ring_arrays(top_ring, C + 2)
    lv, lm = _ring_arrays(left_ring, R)
    rv, rm = _ring_arrays(right_ring, max(R - 1, 0))
    a = np.zeros((m_total, 3), np.int32)
    b = np.zeros((m_total, 3), np.int32)
    d = np.zeros((m_total, 3), np.int32)
    err = lib.cavlc_mv_edge_roles(
        recs, R, C, num_ref_composite, _i32p(rmap), len(rmap),
        _i32p(tv), tm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _i32p(lv), lm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _i32p(rv), rm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _i32p(a), _i32p(b), _i32p(d))
    if err:
        raise cavlc.CAVLCError(f"native mv edge roles failed: {err}")
    return a, b, d


def pack_rows_native(patterns: np.ndarray, nbits: np.ndarray,
                     coded: np.ndarray, R: int, C: int, s_row: int):
    """Native row-contiguous repack (cavlc_pack_rows) -> (row_patterns,
    row_nbits, first_c, donor_bits) or None when unavailable / when the
    rows need more than s_row slots (caller retries with a bigger
    class)."""
    lib = load_library()
    if lib is None:
        return None
    patterns = np.ascontiguousarray(patterns, np.uint32)
    nbits = np.ascontiguousarray(nbits, np.int32)
    coded_u8 = np.ascontiguousarray(coded, np.uint8)
    out_pat = np.zeros((R, s_row), np.uint32)
    out_nb = np.zeros((R, s_row), np.int32)
    first_c = np.zeros(R, np.int32)
    donor_bits = ctypes.c_long(0)
    needed = ctypes.c_int(0)
    err = lib.cavlc_pack_rows(
        patterns.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        nbits.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        coded_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        R, C, patterns.shape[1], s_row,
        out_pat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        out_nb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        first_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(donor_bits), ctypes.byref(needed))
    if err:
        return None
    return out_pat, out_nb, first_c, int(donor_bits.value), needed.value


def _marshal_rows_inputs(payloads, start_bits, R, C, ref_map,
                         at_left_edge, at_top_edge, at_right_edge,
                         left_ring, top_ring, right_ring,
                         rings_per_donor):
    """Shared input marshaling for the batched rows/blob prep entries."""
    n = len(payloads)
    concat = np.frombuffer(b"".join(payloads), np.uint8)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(p) for p in payloads], out=offsets[1:])
    sbits = np.asarray(start_bits, np.int64)
    rmap = np.asarray(ref_map, np.int32)

    from .models.splice_device import _default_rings
    dl, dt, drr = _default_rings(R, C, at_left_edge, at_top_edge,
                                 at_right_edge)
    top_ring = dt if top_ring is None else top_ring
    left_ring = dl if left_ring is None else left_ring
    right_ring = drr if right_ring is None else right_ring

    # Per-donor rings (rings_per_donor=True): each ring argument is a
    # list of n ring lists (sessions with different composite
    # backgrounds) — stacked with a leading donor axis.  With the
    # default shared rings, any None argument above took the
    # static-chrome default for ALL donors.
    per_donor = rings_per_donor
    if per_donor:
        assert len(top_ring) == n and len(left_ring) == n \
            and len(right_ring) == n, "need one ring set per donor"
        tvs, tms, lvs, lms, rvs, rms = [], [], [], [], [], []
        for i in range(n):
            a, b = _ring_arrays(top_ring[i], C + 2)
            tvs.append(a); tms.append(b)
            a, b = _ring_arrays(left_ring[i], R)
            lvs.append(a); lms.append(b)
            a, b = _ring_arrays(right_ring[i], max(R - 1, 0))
            rvs.append(a); rms.append(b)
        tv, tm = np.stack(tvs), np.stack(tms)
        lv, lm = np.stack(lvs), np.stack(lms)
        rv, rm = np.stack(rvs), np.stack(rms)
        tv = np.ascontiguousarray(tv); lv = np.ascontiguousarray(lv)
        rv = np.ascontiguousarray(rv)
    else:
        tv, tm = _ring_arrays(top_ring, C + 2)
        lv, lm = _ring_arrays(left_ring, R)
        rv, rm = _ring_arrays(right_ring, max(R - 1, 0))
    return (concat, offsets, sbits, rmap, tv, tm, lv, lm, rv, rm,
            per_donor)


def prepare_rows_batch(payloads, start_bits, R: int, C: int,
                       num_ref_donor: int, num_ref_composite: int,
                       ref_map, s_row: int, *,
                       at_left_edge: bool = False,
                       at_top_edge: bool = False,
                       at_right_edge: bool = False,
                       left_ring=None, top_ring=None, right_ring=None,
                       rings_per_donor: bool = False,
                       n_threads: int = 0, bug_compat: bool = False,
                       retarget_mvs: bool = False):
    """Fused, threaded serving prep for a batch of fresh donor payloads.

    One native call runs parse -> composite-nC dense chunks -> row pack
    -> MV edge roles for every payload (std::thread fan-out across
    donors; n_threads<=0 = hardware concurrency).  Rings are the shared
    composite border (static-chrome serving background by default).

    Returns a dict of batch-stacked numpy arrays matching the traced
    inputs of the rows splice kernel — {row_patterns [N,R,s_row],
    row_nbits, first_c [N,R], coded [N,M], a_ref/a_mvx/a_mvy/b_*/d_*
    [N,M]} — plus "donor_bits" [N] and "has_align" [N] host metadata.
    Raises on any per-donor error; OverflowError when a donor needs more
    than s_row row slots (retry with a bigger class).
    """
    lib = load_library()
    if lib is None:
        return None
    n = len(payloads)
    m_total = R * C

    (concat, offsets, sbits, rmap, tv, tm, lv, lm, rv, rm,
     per_donor) = _marshal_rows_inputs(
        payloads, start_bits, R, C, ref_map, at_left_edge, at_top_edge,
        at_right_edge, left_ring, top_ring, right_ring, rings_per_donor)

    out_pat = np.zeros((n, R, s_row), np.uint32)
    out_nb = np.zeros((n, R, s_row), np.int32)
    out_first_c = np.zeros((n, R), np.int32)
    out_coded = np.zeros((n, m_total), np.uint8)
    out_a = np.zeros((n, m_total, 3), np.int32)
    out_b = np.zeros((n, m_total, 3), np.int32)
    out_d = np.zeros((n, m_total, 3), np.int32)
    out_bits = np.zeros(n, np.int64)
    out_align = np.zeros(n, np.int32)
    out_err = np.zeros(n, np.int32)

    def _u8p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    def _i64p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_long))

    lib.cavlc_prepare_rows_batch(
        _u8p(concat), _i64p(offsets), _i64p(sbits),
        n, R, C, num_ref_donor, num_ref_composite,
        _i32p(rmap), len(rmap), int(at_left_edge), int(at_top_edge),
        _i32p(tv), _u8p(tm), _i32p(lv), _u8p(lm), _i32p(rv), _u8p(rm),
        s_row,
        out_pat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        _i32p(out_nb), _i32p(out_first_c), _u8p(out_coded),
        _i32p(out_a), _i32p(out_b), _i32p(out_d),
        _i64p(out_bits), _i32p(out_align), _i32p(out_err),
        n_threads, int(bug_compat), int(retarget_mvs), int(per_donor))

    bad = np.flatnonzero(out_err)
    if bad.size:
        codes = out_err[bad]
        overflow = bad[codes == -101]
        contract = bad[codes == -103]
        parse = bad[(codes != -101) & (codes != -103)]
        # Genuine parse errors dominate (a bigger class won't fix them),
        # but the -101 retry subset is still reported so callers see it.
        if parse.size:
            msg = (f"batch prep failed for donors {parse[:8].tolist()}: "
                   f"codes {out_err[parse][:8].tolist()}")
            if overflow.size:
                msg += (f"; additionally {overflow.size} donors exceeded "
                        f"the {s_row}-slot row chunk class (-101)")
            raise cavlc.CAVLCError(msg)
        if contract.size:
            raise NotImplementedError(
                "donor P_Skips with donor_ref_map[0] != 0: skips "
                "hardwire composite ref 0 — use retarget_mvs=True "
                "(explicit conversion) or the host path "
                f"(donors {contract[:8].tolist()}"
                + (f"; {overflow.size} also hit -101 class overflow"
                   if overflow.size else "") + ")")
        raise OverflowError(
            f"{overflow.size} donors need more than {s_row} row chunk "
            "slots; retry with a bigger class")

    return {
        "row_patterns": out_pat, "row_nbits": out_nb,
        "first_c": out_first_c, "coded": out_coded.astype(bool),
        "a_ref": out_a[:, :, 0].copy(), "a_mvx": out_a[:, :, 1].copy(),
        "a_mvy": out_a[:, :, 2].copy(),
        "b_ref": out_b[:, :, 0].copy(), "b_mvx": out_b[:, :, 1].copy(),
        "b_mvy": out_b[:, :, 2].copy(),
        "d_ref": out_d[:, :, 0].copy(), "d_mvx": out_d[:, :, 1].copy(),
        "d_mvy": out_d[:, :, 2].copy(),
        "donor_bits": out_bits, "has_align": out_align.astype(bool),
    }


def prepare_rows_blob_batch(payloads, start_bits, R: int, C: int,
                            num_ref_donor: int, num_ref_composite: int,
                            ref_map, s_row: int, s_flat: int, s_exc: int,
                            *,
                            at_left_edge: bool = False,
                            at_top_edge: bool = False,
                            at_right_edge: bool = False,
                            left_ring=None, top_ring=None,
                            right_ring=None,
                            rings_per_donor: bool = False,
                            n_threads: int = 0, bug_compat: bool = False,
                            retarget_mvs: bool = False):
    """prepare_rows_batch with native single-blob emission.

    Each donor's entire serving wire (flat chunk stream + row metadata +
    exceptions + first_c/coded + edge roles — splice_device.
    flat_wire_layout) is compacted in C straight into one uint32 record,
    skipping the padded-array materialization and the numpy compaction.
    Returns (blob u32[N, stride], donor_bits i64[N], has_align bool[N]),
    or None when the native library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    n = len(payloads)

    (concat, offsets, sbits, rmap, tv, tm, lv, lm, rv, rm,
     per_donor) = _marshal_rows_inputs(
        payloads, start_bits, R, C, ref_map, at_left_edge, at_top_edge,
        at_right_edge, left_ring, top_ring, right_ring, rings_per_donor)

    stride = int(lib.cavlc_blob_stride(R, C, s_flat, s_exc))
    out_blob = np.zeros((n, stride), np.uint32)
    out_bits = np.zeros(n, np.int64)
    out_align = np.zeros(n, np.int32)
    out_needed = np.zeros(n, np.int32)
    out_err = np.zeros(n, np.int32)

    def _u8p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    def _i64p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_long))

    lib.cavlc_prepare_rows_blob_batch(
        _u8p(concat), _i64p(offsets), _i64p(sbits),
        n, R, C, num_ref_donor, num_ref_composite,
        _i32p(rmap), len(rmap), int(at_left_edge), int(at_top_edge),
        _i32p(tv), _u8p(tm), _i32p(lv), _u8p(lm), _i32p(rv), _u8p(rm),
        s_row, s_flat, s_exc,
        out_blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        _i64p(out_bits), _i32p(out_align), _i32p(out_needed),
        _i32p(out_err),
        n_threads, int(bug_compat), int(retarget_mvs), int(per_donor))

    bad = np.flatnonzero(out_err)
    if bad.size:
        codes = out_err[bad]
        overflow = bad[codes == -101]
        contract = bad[codes == -103]
        roles = bad[codes == -104]
        excs = bad[codes == -105]
        parse = bad[(codes != -101) & (codes != -103)
                    & (codes != -104) & (codes != -105)]
        if parse.size:
            raise cavlc.CAVLCError(
                f"blob batch prep failed for donors {parse[:8].tolist()}: "
                f"codes {out_err[parse][:8].tolist()}")
        if contract.size:
            raise NotImplementedError(
                "donor P_Skips with donor_ref_map[0] != 0: skips "
                "hardwire composite ref 0 — use retarget_mvs=True "
                "(explicit conversion) or the host path "
                f"(donors {contract[:8].tolist()})")
        if roles.size:
            raise ValueError(
                f"donor edge-role MVs exceed the int16 wire range for "
                f"donors {roles[:8].tolist()} — rejecting instead of "
                "silently wrapping")
        if excs.size:
            raise OverflowError(
                f"{excs.size} donors need more than {s_exc} nbits "
                "exceptions; retry with a bigger exception class")
        raise OverflowError(
            f"{overflow.size} donors need up to "
            f"{int(out_needed[overflow].max())} chunk slots "
            f"(row class {s_row} / flat class {s_flat}); retry with a "
            "bigger class")

    return out_blob, out_bits, out_align.astype(bool)


def retarget_recs_raw(recs, mb_width: int, mb_height: int,
                      num_ref_composite: int, ref_map,
                      left_ring, top_ring, right_ring) -> None:
    """In-place successive-donor MV retarget of a parsed MBRec grid
    (cavlc_retarget_recs): every donor MB's decoded motion is preserved
    exactly in the composite context; skips become explicit P_L0_16x16
    pinned to their donor-context skip MV.  Rings: composite border
    (same layout as mv_edge_roles_raw)."""
    lib = load_library()
    R, C = mb_height, mb_width
    rmap = np.asarray(ref_map, np.int32)
    tv, tm = _ring_arrays(top_ring, C + 2)
    lv, lm = _ring_arrays(left_ring, R)
    rv, rm = _ring_arrays(right_ring, max(R - 1, 0))
    err = lib.cavlc_retarget_recs(
        recs, R, C, num_ref_composite, _i32p(rmap), len(rmap),
        _i32p(tv), tm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _i32p(lv), lm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _i32p(rv), rm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if err:
        raise cavlc.CAVLCError(f"native retarget failed: {err}")
