#!/usr/bin/env python
"""One session, every frame generator: the full composition surface.

Builds a single Annex-B stream that interleaves
  1. I_PCM atlas frames (long-term references),
  2. device-composed scroll P-frames (the flagship jitted kernel),
  3. a hint-composed frame (static chrome + motion regions),
  4. a dynamic-rect spliced frame (donor CAVLC MBs + nC repair),
  5. more scroll frames (frame_num continuity across generators),
then re-parses the whole stream with the structural oracle and muxes it
to a progressive MP4.

Run: python examples/full_pipeline_demo.py [out.h264]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(out_path: str = "/tmp/full_pipeline.h264") -> None:
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from h264_scroll_encoder_tpu.utils import jaxcache
    jaxcache.enable()

    from h264_scroll_encoder_tpu.config import ComposerConfig
    from h264_scroll_encoder_tpu.models import mb_transcode as mbt
    from h264_scroll_encoder_tpu.models.splice import (FrameHints,
                                                       MotionRegion)
    from h264_scroll_encoder_tpu.session import ComposerSession
    from h264_scroll_encoder_tpu.utils import fixtures
    from h264_scroll_encoder_tpu.verify import verify_stream

    cfg = ComposerConfig(1280, 720)
    s = ComposerSession(cfg)
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    # Emit the waypoint chain up front so low-offset frames stay within
    # the 512 px decoder MV limit (fixes reference defect #4, see
    # docs/KNOWN_ISSUES_ANALYSIS.md) — and the spliced frame below then
    # exercises donor-ref remapping against a populated reference list.
    s.preprovision_waypoints()

    # 1) scroll away from offset 0 (crosses no waypoint at these offsets)
    for off in (0, 8, 16, 24):
        s.write_scroll_or_waypoint_frame(off)

    # 2) hint frame: static chrome with two scrolling content bands
    hint = FrameHints(motion_regions=(
        MotionRegion(0, 2, 80, 10, ref_idx=0, mv_x=0, mv_y=32),
        MotionRegion(0, 34, 80, 42, ref_idx=1, mv_x=0, mv_y=-16)))
    s.write_hint_frame(hint)

    # 3) spliced frame: a 6x6-MB donor rect of synthetic CAVLC MBs
    #    composited into the hinted background (host path, exact mvds)
    rng = np.random.default_rng(42)
    donor = fixtures.random_p_slice_grid(rng, 6, 6, 1)
    for row in donor:
        for i, mb in enumerate(row):
            if mb is not mbt.SKIP and mb.kind == "ipcm":
                row[i] = fixtures.random_inter_mb(rng, 1)
    splice_hints = FrameHints(
        motion_regions=(MotionRegion(0, 2, 80, 10, ref_idx=0,
                                     mv_x=0, mv_y=40),),
        dynamic_mb_x=40, dynamic_mb_y=20)
    s.write_spliced_frame(splice_hints, donor)

    # 4) back to plain scrolling — frame_num must stay continuous
    for off in (32, 40, 48):
        s.write_scroll_or_waypoint_frame(off)

    data = s.getvalue()
    with open(out_path, "wb") as f:
        f.write(data)

    rep = verify_stream(data)
    assert rep.ok, rep.errors
    print(f"{out_path}: {len(data)} bytes, verifies OK "
          f"(errors={rep.errors}, warnings={rep.warnings})")

    from h264_scroll_encoder_tpu.utils import mp4mux
    mp4 = out_path.rsplit(".", 1)[0] + ".mp4"
    with open(mp4, "wb") as f:
        f.write(mp4mux.mux(data, fps=30))
    print(f"muxed -> {mp4} ({os.path.getsize(mp4)} bytes)")


if __name__ == "__main__":
    main(*[a for a in sys.argv[1:] if not a.startswith("--")])
