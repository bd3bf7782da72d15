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
     python examples/video_in_corner_demo.py --batched [--cpu]

--batched runs the SAME composition at 1280x720 as a batched
device-resident pipeline (VERDICT r2 item 3): B sessions step through
the row-contiguous splice kernel with native in-place MV retargeting
(successive donors reference the previous composed frame via the
short-term-lead header), byte-identical to the host path and
avref-decode clean.
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




def main_batched(out_path: str = "/tmp/video_in_corner_720p.h264",
                 batch: int = 4, *, width: int = 1280, height: int = 720,
                 rx: int = 40, ry: int = 25) -> None:
    """Batched device path of the same composition (default 1280x720;
    tests run it at smaller geometry)."""
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from h264_scroll_encoder_tpu.utils import jaxcache
    jaxcache.enable()

    import time

    import jax.numpy as jnp

    from h264_scroll_encoder_tpu import avref
    from h264_scroll_encoder_tpu.config import ComposerConfig, MAX_WAYPOINTS
    from h264_scroll_encoder_tpu.models import mb_transcode as mbt
    from h264_scroll_encoder_tpu.models import splice_device
    from h264_scroll_encoder_tpu.models.splice import (
        FrameHints, MotionRegion, ipcm_grid_from_picture,
        parse_slice_header)
    from h264_scroll_encoder_tpu.ops.bitio import BitReader, BitWriter
    from h264_scroll_encoder_tpu.parallel import batch as batch_mod
    from h264_scroll_encoder_tpu.session import ComposerSession
    from h264_scroll_encoder_tpu.syntax import parse
    from h264_scroll_encoder_tpu.syntax.slice_headers import (
        p_slice_header_symbols)

    if not avref.available():
        print("ERROR: needs the libavcodec/libx264 shim", file=sys.stderr)
        return

    # --- clip (same construction as the host demo) --------------------
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

    cfg = ComposerConfig(width, height)
    H, W = cfg.mb_height, cfg.mb_width
    # clip rect inside static chrome (below the scrolling band)
    BAND_H = 8                            # scrolling band rows 0..7
    RESEED_EVERY = 4

    def ui_hints(scroll_px, ref_shift):
        return FrameHints(motion_regions=(
            MotionRegion(0, 0, W, BAND_H, ref_idx=0 + ref_shift,
                         mv_x=0, mv_y=scroll_px),),
            dynamic_mb_x=rx, dynamic_mb_y=ry)

    # Host twin: the exact host composition for byte comparison.
    host = ComposerSession(cfg)
    host.write_parameter_sets()
    host.write_test_atlases(striped=True)

    def bg_fields(scroll_px, ref_shift):
        bg_ref = jnp.zeros((H, W), jnp.int32).at[:BAND_H].set(ref_shift)
        bg_mvy = jnp.zeros((H, W), jnp.int32).at[:BAND_H].set(
            scroll_px * 4)
        bg_coded = jnp.zeros((H, W), bool).at[:BAND_H].set(True)
        return bg_ref, jnp.zeros((H, W), jnp.int32), bg_mvy, bg_coded

    SEED_CLASS, P_CLASS = 768, 64
    seed_budget = splice_device.splice_rbsp_budget(
        cfg, dW * dH, dH * SEED_CLASS * 32, bg_bits_per_mb=16)
    p_budget = splice_device.splice_rbsp_budget(
        cfg, dW * dH, dH * P_CLASS * 32, bg_bits_per_mb=16)
    seed_step = batch_mod.make_batched_splice_step_rows(
        cfg, rx, ry, dW, dH, num_refs=2, nal_ref_idc=2, has_align=True,
        n_rbsp=seed_budget, compact_x=True)
    # Per-slice qp_delta is static in the header; x264 at fixed qp keeps
    # it constant across the clip (a change would compile one variant).
    hdr0 = None

    bcast = lambda x: jnp.broadcast_to(x, (batch,) + x.shape)
    zero_wl = jnp.zeros(MAX_WAYPOINTS, jnp.int32)
    zero_wv = jnp.zeros(MAX_WAYPOINTS, bool)

    def run_step(step, payload, start_bit, donor_num_refs, num_refs,
                 s_row, scroll_px, ref_shift, frame_num, abs_diff,
                 qp_delta, retarget):
        dn, (dbits, halign) = splice_device.prepare_donor_rows_serving(
            [payload] * batch, [start_bit] * batch, dH, dW,
            donor_num_refs, num_refs, s_row=s_row,
            retarget_mvs=retarget)
        hp, hn = p_slice_header_symbols(
            cfg, jnp.int32(frame_num % 16), jnp.int32((frame_num % 16) * 2),
            is_reference=True, long_term_idx=-1,
            num_waypoints=jnp.int32(0), wp_long_term_idx=zero_wl,
            wp_valid=zero_wv, slice_qp_delta=qp_delta,
            prev_ref_abs_diff=abs_diff)
        bg_ref, bg_mvx, bg_mvy, bg_coded = bg_fields(scroll_px, ref_shift)
        nal, nal_len, _, ovf = step(
            bcast(hp), bcast(hn), bcast(bg_ref), bcast(bg_mvx),
            bcast(bg_mvy), bcast(bg_coded), dn)
        assert not bool(np.asarray(ovf).any())
        return np.asarray(nal), np.asarray(nal_len)

    streams = [bytearray(host.getvalue()) for _ in range(batch)]
    frame_num = 2
    timed = 0.0
    n_p_frames = 0

    # Frame 1: I_PCM seed.
    grid = ipcm_grid_from_picture(clip_pics[0], 0, 0, dW, dH)
    bw = BitWriter()
    mbt.emit_p_slice_mbs(bw, grid, 1)
    bw.write_trailing_bits()
    nal, nal_len = run_step(seed_step, bw.getvalue(), 0, 1, 2, SEED_CLASS,
                            0, 0, frame_num, 0, 0, False)
    host.write_spliced_frame(ui_hints(0, 0), grid, as_reference=True)
    for b in range(batch):
        streams[b] += nal[b][: nal_len[b]].tobytes()
    frame_num += 1

    p_step = None
    for k, u in enumerate(p_units):
        scroll = 4 * (k + 1)
        if (k + 1) % RESEED_EVERY == 0:
            grid = ipcm_grid_from_picture(clip_pics[k + 1], 0, 0, dW, dH)
            bw = BitWriter()
            mbt.emit_p_slice_mbs(bw, grid, 1)
            bw.write_trailing_bits()
            nal, nal_len = run_step(seed_step, bw.getvalue(), 0, 1, 2,
                                    SEED_CLASS, scroll, 0, frame_num, 0,
                                    0, False)
            host.write_spliced_frame(ui_hints(scroll, 0), grid,
                                     as_reference=True)
        else:
            br = BitReader(u.rbsp)
            hdr = parse_slice_header(
                br, is_idr=False, nal_ref_idc=u.nal_ref_idc,
                log2_max_frame_num=sps.log2_max_frame_num,
                pps_num_ref_idx_l0_default=(
                    pps.num_ref_idx_l0_default_active_minus1 + 1))
            if hdr0 is None:
                hdr0 = hdr.qp_delta
            assert hdr.qp_delta == hdr0, "clip qp_delta changed mid-run"
            qp_delta = (26 + pps.pic_init_qp_minus26 + hdr.qp_delta
                        - (26 + cfg.pic_init_qp_minus26))
            if p_step is None:
                p_step = batch_mod.make_batched_splice_step_rows(
                    cfg, rx, ry, dW, dH, num_refs=3, nal_ref_idc=2,
                    has_align=True, n_rbsp=p_budget, compact_x=True)
            t0 = time.perf_counter()
            nal, nal_len = run_step(
                p_step, u.rbsp, br.bit_position,
                hdr.num_ref_idx_l0, 3, P_CLASS, scroll, 1, frame_num, 1,
                qp_delta, True)
            timed += time.perf_counter() - t0
            n_p_frames += 1
            br2 = BitReader(u.rbsp)
            hdr2 = parse_slice_header(
                br2, is_idr=False, nal_ref_idc=u.nal_ref_idc,
                log2_max_frame_num=sps.log2_max_frame_num,
                pps_num_ref_idx_l0_default=(
                    pps.num_ref_idx_l0_default_active_minus1 + 1))
            grid = mbt.parse_p_slice_mbs(br2, dW, dH, hdr2.num_ref_idx_l0)
            # write_spliced_frame shifts hint refs by 1 itself in
            # donor_refs_previous mode; pass the unshifted hints here
            # (the device bg grids above carry the shifted index 1).
            host.write_spliced_frame(
                ui_hints(scroll, 0), grid, as_reference=True,
                donor_refs_previous=True,
                donor_slice_qp=26 + pps.pic_init_qp_minus26 + hdr.qp_delta)
        for b in range(batch):
            streams[b] += nal[b][: nal_len[b]].tobytes()
        frame_num += 1

    host_stream = host.getvalue()
    for b in range(batch):
        assert bytes(streams[b]) == host_stream, (
            f"session {b} diverges from the host path at byte "
            f"{next(i for i, (x, y) in enumerate(zip(bytes(streams[b]), host_stream)) if x != y)}")

    data = bytes(streams[0])
    with open(out_path, "wb") as f:
        f.write(data)
    pics, nerrors = avref.decode_pictures(data)
    assert nerrors == 0, f"{nerrors} decoder errors"
    # Interior pixel check (host-path semantics carry over byte-for-byte,
    # but assert directly on the device stream anyway).
    for k in range(len(clip_frames)):
        comp = pics[2 + k]
        rect = comp.y[ry * 16:(ry + dH) * 16, rx * 16:(rx + dW) * 16]
        d = np.abs(rect.astype(int) - clip_pics[k].y.astype(int))
        m = 0
        while m < 40 and d[m:vh - m or None, m:vw - m or None].max() != 0:
            m += 1
        since_seed = k % RESEED_EVERY
        assert m <= 8 + 4 * since_seed, (k, m)
    fps = batch * n_p_frames / timed if timed else 0.0
    print(f"{out_path}: {len(data)} bytes x {batch} sessions, "
          f"{len(pics)} frames each, byte-identical to the host path, "
          f"0 decoder errors; successive-donor device splice "
          f"~{fps:.0f} fps at batch {batch} (incl. host prep, "
          f"small-sample)")



if __name__ == "__main__":
    if "--batched" in sys.argv:
        main_batched()
    else:
        main(sys.argv[1] if len(sys.argv) > 1
             and not sys.argv[1].startswith("--")
             else "/tmp/video_in_corner.h264")
