#!/usr/bin/env python
"""The MASTER_DESIGN flagship composition: scrolling UI with a video
playing in a corner, composed entirely at the bitstream level.

Per frame, ONE spliced P-frame carries both surfaces:
  - background hint regions scroll the atlas content (motion-vector-only
    macroblocks, no pixel encoding),
  - the dynamic rect plays a real x264 clip: the first frame is seeded
    as I_PCM from the decoded donor IDR, then each donor P slice is
    spliced with its reference retargeted to the previous composed frame
    and every mvd re-resolved against the composite prediction context.

The result is verified three ways: structural conformance, the native
full decoder, and (when built) the system libavcodec — plus pixel
equality of the video interior against the clip's own decode.

Run: python examples/video_in_corner_demo.py [out.h264] [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(out_path: str = "/tmp/video_in_corner.h264") -> None:
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from h264_scroll_encoder_tpu.utils import jaxcache
    jaxcache.enable()

    from h264_scroll_encoder_tpu import avref
    from h264_scroll_encoder_tpu.config import ComposerConfig
    from h264_scroll_encoder_tpu.models import mb_transcode as mbt
    from h264_scroll_encoder_tpu.models.splice import (
        FrameHints, MotionRegion, ipcm_grid_from_picture,
        parse_slice_header)
    from h264_scroll_encoder_tpu.ops.bitio import BitReader
    from h264_scroll_encoder_tpu.session import ComposerSession
    from h264_scroll_encoder_tpu.syntax import parse
    from h264_scroll_encoder_tpu.verify import verify_stream

    if not avref.available():
        print("ERROR: needs the libavcodec/libx264 shim "
              "(make -C native avref)", file=sys.stderr)
        return

    # --- the "video": an 8-frame x264 clip with drifting content ------
    vh, vw = 80, 96
    yy, xx = np.mgrid[:vh + 64, :vw]
    canvas = (40 + 80 * np.sin(yy / 9.0) + 60 * np.cos(xx / 7.0)
              + yy * 0.7).clip(16, 235).astype(np.uint8)
    cc = (np.full((vh // 2, vw // 2), 90, np.uint8),
          np.full((vh // 2, vw // 2), 150, np.uint8))
    clip_frames = [(canvas[k * 4:k * 4 + vh],) + cc for k in range(8)]
    clip = avref.encode_x264(clip_frames, qp=24, keyint=99, refs=1,
                             extra_params="no-deblock=1")
    clip_pics, _ = avref.decode_pictures(clip)
    sps = pps = None
    p_units = []
    for u in parse.iter_nal_units(clip):
        if u.nal_unit_type == 7:
            sps = parse.parse_sps(u.rbsp)
        elif u.nal_unit_type == 8:
            pps = parse.parse_pps(u.rbsp)
        elif u.nal_unit_type == 1:
            p_units.append(u)
    dW, dH = sps.width // 16, sps.height // 16

    # --- the UI session ----------------------------------------------
    cfg = ComposerConfig(320, 240)
    s = ComposerSession(cfg)
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    rx, ry = 12, 9                       # video rect (MB coords)

    def ui_hints(scroll_px: int) -> FrameHints:
        """Scroll the upper UI band; keep chrome below static (P_Skip)."""
        return FrameHints(motion_regions=(
            MotionRegion(0, 0, cfg.mb_width, 8, ref_idx=0,
                         mv_x=0, mv_y=scroll_px),),
            dynamic_mb_x=rx, dynamic_mb_y=ry)

    # Frame 1: seed the video rect (I_PCM of the decoded clip IDR).
    # Donor-edge MC clamping makes a margin band drift by the content
    # motion per frame (the MASTER_DESIGN 360+32 margin absorbs bounded
    # segments); a periodic I_PCM re-seed — the dynamic encoder's
    # keyframe cadence — resets it, demonstrated mid-clip here.
    RESEED_EVERY = 4
    s.write_spliced_frame(ui_hints(0),
                          ipcm_grid_from_picture(clip_pics[0], 0, 0, dW, dH),
                          as_reference=True)
    # Frames 2..: scroll the UI while the clip plays in the rect.
    for k, u in enumerate(p_units):
        scroll = 4 * (k + 1)
        if (k + 1) % RESEED_EVERY == 0:
            s.write_spliced_frame(
                ui_hints(scroll),
                ipcm_grid_from_picture(clip_pics[k + 1], 0, 0, dW, dH),
                as_reference=True)
            continue
        br = BitReader(u.rbsp)
        hdr = parse_slice_header(
            br, is_idr=False, nal_ref_idc=u.nal_ref_idc,
            log2_max_frame_num=sps.log2_max_frame_num,
            pps_num_ref_idx_l0_default=(
                pps.num_ref_idx_l0_default_active_minus1 + 1))
        grid = mbt.parse_p_slice_mbs(br, dW, dH, hdr.num_ref_idx_l0)
        s.write_spliced_frame(
            ui_hints(scroll), grid, as_reference=True,
            donor_refs_previous=True,
            donor_slice_qp=26 + pps.pic_init_qp_minus26 + hdr.qp_delta)

    data = s.getvalue()
    with open(out_path, "wb") as f:
        f.write(data)
    rep = verify_stream(data)
    assert rep.ok, rep.errors

    pics, nerrors = avref.decode_pictures(data)
    assert nerrors == 0, f"{nerrors} decoder errors"
    bands = []
    for k in range(len(clip_frames)):
        comp = pics[2 + k]
        rect = comp.y[ry * 16:(ry + dH) * 16, rx * 16:(rx + dW) * 16]
        d = np.abs(rect.astype(int) - clip_pics[k].y.astype(int))
        m = 0
        while m < 40 and d[m:vh - m or None, m:vw - m or None].max() != 0:
            m += 1
        bands.append(m)
        # Exact beyond the accumulated margin; re-seeds reset it to 0.
        since_seed = k % RESEED_EVERY
        assert m <= 8 + 4 * since_seed, (k, m)
    print(f"{out_path}: {len(data)} bytes, {len(pics)} frames — "
          f"scrolling UI + {len(clip_frames)}-frame x264 clip, "
          f"0 decoder errors; per-frame exact-beyond-margin px: {bands} "
          f"(re-seed every {RESEED_EVERY} resets the band)")

    from h264_scroll_encoder_tpu.utils import mp4mux
    mp4 = out_path.rsplit(".", 1)[0] + ".mp4"
    with open(mp4, "wb") as f:
        f.write(mp4mux.mux(data, fps=30))
    print(f"muxed -> {mp4} ({os.path.getsize(mp4)} bytes)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--")
         else "/tmp/video_in_corner.h264")
