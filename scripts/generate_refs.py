#!/usr/bin/env python
"""Generate reference I-frame donor files (generate_refs.sh equivalent).

The reference's script uses ffmpeg/libx264 to produce two half-and-half
color IDR files (scripts/generate_refs.sh:20-44).  No external encoder
exists in this environment, so the donors are I_PCM IDR frames from our
own generator — accepted identically by both this framework's composer
and the C reference binary (the donor path treats the payload as opaque
macroblock data).
"""

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
    args = ap.parse_args()

    cfg = ComposerConfig(args.width, args.height)
    out = Path(args.out_dir)
    # Ref A: color-a over color-b halves; Ref B: swapped (mirrors the
    # reference script's two half-and-half screens).
    ca, cb = COLOR_TABLE[args.color_a], COLOR_TABLE[args.color_b]
    for name, rows in (("ref_a", half_and_half_rows(cfg, ca, cb)),
                       ("ref_b", half_and_half_rows(cfg, cb, ca))):
        s = ComposerSession(cfg)
        s.write_parameter_sets()
        s.writer.append_raw(ipcm.idr_frame(cfg, rows))
        path = out / f"{name}.h264"
        size = s.write_to_file(path)
        print(f"wrote {path} ({size} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
