#!/usr/bin/env bash
# End-to-end pipeline: compose -> verify -> mux (the run.sh /
# test_encoder.sh equivalent; the verification oracle is native since no
# ffmpeg exists here).
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${OUT:-/tmp/h264tpu_e2e}
W=${W:-1280}
H=${H:-720}
FRAMES=${FRAMES:-300}
SPEED=${SPEED:-4}
mkdir -p "$OUT"

echo "== 1. test-mode stream (striped I_PCM atlases + scroll) =="
python -c "
from h264_scroll_encoder_tpu.cli import scroll_encoder_main
scroll_encoder_main(['-n','$FRAMES','-S','$SPEED','-w','$W','-H','$H',
                     '-o','$OUT/scroll.h264'])"

echo "== 2. structural conformance verify =="
python -m h264_scroll_encoder_tpu.verify "$OUT/scroll.h264"

echo "== 3. donor-mode composer on synthesized donors =="
python - <<EOF
from h264_scroll_encoder_tpu.config import ComposerConfig
from h264_scroll_encoder_tpu.session import ComposerSession
from h264_scroll_encoder_tpu.models import ipcm
for name, color in [('a', (81, 90, 240)), ('b', (41, 240, 110))]:
    cfg = ComposerConfig($W, $H)
    s = ComposerSession(cfg); s.write_parameter_sets()
    s.writer.append_raw(ipcm.idr_frame_color(cfg, *color))
    s.write_to_file(f'$OUT/donor_{name}.h264')
EOF
python -m h264_scroll_encoder_tpu.cli \
    --ref-a "$OUT/donor_a.h264" --ref-b "$OUT/donor_b.h264" \
    -n "$FRAMES" -s "$SPEED" -o "$OUT/composed.h264"
python -m h264_scroll_encoder_tpu.verify "$OUT/composed.h264"

echo "== 4. mux to MP4 (playable; open tools/video_player.html) =="
python -m h264_scroll_encoder_tpu.utils.mp4mux "$OUT/scroll.h264" \
    "$OUT/scroll.mp4"
echo "done: $OUT"
