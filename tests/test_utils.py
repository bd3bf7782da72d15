"""Utility subsystems: MP4 mux, verifier CLI, trace, YUV I_PCM frames."""

import json
import struct

import numpy as np

from h264_scroll_encoder_tpu.config import ComposerConfig
from h264_scroll_encoder_tpu.models import ipcm
from h264_scroll_encoder_tpu.session import ComposerSession
from h264_scroll_encoder_tpu.utils import mp4mux
from h264_scroll_encoder_tpu.utils.trace import BitstreamTrace, StageTimer
from h264_scroll_encoder_tpu.verify import verify_stream


def _small_stream():
    cfg = ComposerConfig(64, 48)
    s = ComposerSession(cfg)
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    for off in (0, 4, 8):
        s.write_scroll_frame(off)
    return s.getvalue()


def test_mp4_mux_structure():
    stream = _small_stream()
    mp4 = mp4mux.mux(stream, fps=30)
    boxes = []
    pos = 0
    while pos < len(mp4):
        size, kind = struct.unpack(">I4s", mp4[pos:pos + 8])
        boxes.append(kind)
        pos += size
    assert boxes == [b"ftyp", b"moov", b"mdat"]
    # 5 samples (IDR + non-IDR I + 3 P), 1 sync sample.
    sps, pps, samples, sync = mp4mux.annexb_to_samples(stream)
    assert len(samples) == 5
    assert sync == [1]
    # AVCC sample sizes must fill the mdat payload exactly.
    pos2 = 0
    while pos2 < len(mp4):
        size, kind = struct.unpack(">I4s", mp4[pos2:pos2 + 8])
        if kind == b"mdat":
            assert sum(len(s) for s in samples) == size - 8
        pos2 += size


def test_verify_stream_detects_truncation():
    stream = _small_stream()
    assert verify_stream(stream).ok
    broken = stream[:-30]
    assert not verify_stream(broken).ok


def test_yuv_ipcm_frame_roundtrip():
    """The raw-YUV I_PCM variant (declared but unimplemented in the
    reference, include/h264_encoder.h:210-217) carries samples exactly."""
    cfg = ComposerConfig(32, 32)
    rng = np.random.default_rng(3)
    w, h = cfg.width, cfg.height
    yuv = rng.integers(0, 256, w * h * 3 // 2).astype(np.uint8)
    nal = ipcm.idr_frame_yuv(cfg, yuv)

    from h264_scroll_encoder_tpu.models import mb_transcode as mbt
    from h264_scroll_encoder_tpu.ops.bitio import BitReader
    from h264_scroll_encoder_tpu.syntax import parse as sparse
    from h264_scroll_encoder_tpu.syntax.parse import parse_idr_slice_header

    unit = list(sparse.iter_nal_units(nal))[0]
    rbsp = unit.rbsp
    hdr = parse_idr_slice_header(
        rbsp, log2_max_frame_num=4, pic_order_cnt_type=2,
        log2_max_pic_order_cnt_lsb=4,
        deblocking_filter_control_present_flag=1)
    br = BitReader(rbsp)
    br.skip_bits(hdr.mb_data_start_bit)
    grid = mbt.parse_i_slice_mbs(br, 2, 2)
    # MB (0,0): its Y block is the top-left 16x16 of the Y plane.
    yp = yuv[: w * h].reshape(h, w)
    exp = yp[:16, :16].reshape(-1).tobytes()
    assert grid[0][0].ipcm_samples[:256] == exp


def test_stage_timer_and_trace():
    t = StageTimer()
    with t.stage("compose"):
        pass
    t.count("frames", 3)
    rep = t.report()
    assert rep["compose"]["calls"] == 1
    assert rep["counters"]["frames"] == 3
    json.loads(t.report_json())

    a, b = BitstreamTrace(), BitstreamTrace()
    a.mark("sps", 0)
    a.mark("pps", 80)
    b.mark("sps", 0)
    b.mark("pps", 82)
    idx, ours, theirs = a.diff(b)
    assert idx == 1 and ours == ("pps", 80) and theirs == ("pps", 82)
    assert a.diff(a) is None
