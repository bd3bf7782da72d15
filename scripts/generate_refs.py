#!/usr/bin/env python
"""Generate reference I-frame donor files (generate_refs.sh equivalent).

The reference's script uses ffmpeg/libx264 to produce two half-and-half
color IDR files (scripts/generate_refs.sh:20-44).  By default the donors
here are I_PCM IDR frames from our own generator — accepted identically
by both this framework's composer and the C reference binary (the donor
path treats the payload as opaque macroblock data).  With --x264 the
donors come from the real x264 encoder through the system libavcodec
(native/avref.c), reproducing the reference script's donor contract
exactly (baseline profile, keyint=1)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from h264_scroll_encoder_tpu.config import ComposerConfig  # noqa: E402
from h264_scroll_encoder_tpu.models import ipcm  # noqa: E402
from h264_scroll_encoder_tpu.session import ComposerSession  # noqa: E402
from h264_scroll_encoder_tpu.cli import COLOR_TABLE  # noqa: E402


def half_and_half_rows(cfg, top, bottom):
    import numpy as np
    rows = np.empty((cfg.mb_height, 3), np.uint8)
    half = cfg.mb_height // 2
    rows[:half] = top
    rows[half:] = bottom
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--color-a", default="red", choices=COLOR_TABLE)
    ap.add_argument("--color-b", default="blue", choices=COLOR_TABLE)
    ap.add_argument("--x264", action="store_true",
                    help="encode donors with the real x264 encoder "
                         "(generate_refs.sh parity) instead of I_PCM")
    ap.add_argument("--qp", type=int, default=20, help="x264 QP")
    args = ap.parse_args()

    cfg = ComposerConfig(args.width, args.height)
    out = Path(args.out_dir)
    # Ref A: color-a over color-b halves; Ref B: swapped (mirrors the
    # reference script's two half-and-half screens).
    ca, cb = COLOR_TABLE[args.color_a], COLOR_TABLE[args.color_b]
    for name, rows in (("ref_a", half_and_half_rows(cfg, ca, cb)),
                       ("ref_b", half_and_half_rows(cfg, cb, ca))):
        path = out / f"{name}.h264"
        if args.x264:
            from h264_scroll_encoder_tpu import avref
            if not avref.available():
                print("ERROR: libx264 unavailable (make -C native avref)",
                      file=sys.stderr)
                return 1
            import numpy as np
            h, w = args.height, args.width
            y = np.repeat(rows[:, 0], 16)[:, None].repeat(w, 1)
            u = np.repeat(rows[:, 1], 8)[:, None].repeat(w // 2, 1)
            v = np.repeat(rows[:, 2], 8)[:, None].repeat(w // 2, 1)
            data = avref.encode_x264([(y, u, v)], qp=args.qp,
                                     keyint=1, refs=1)
            path.write_bytes(data)
            size = len(data)
        else:
            s = ComposerSession(cfg)
            s.write_parameter_sets()
            s.writer.append_raw(ipcm.idr_frame(cfg, rows))
            size = s.write_to_file(path)
        print(f"wrote {path} ({size} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
