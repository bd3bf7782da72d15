import sys, subprocess, pathlib
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from h264_scroll_encoder_tpu.config import ComposerConfig
from h264_scroll_encoder_tpu.session import ComposerSession, open_donor_session
from h264_scroll_encoder_tpu.models import ipcm
from h264_scroll_encoder_tpu.cli import triangle_offsets
from h264_scroll_encoder_tpu.verify import nal_diff

REF = "/tmp/refbuild"  # built by tests/conftest.py from /root/reference
rng = np.random.default_rng(2026)
fails = 0

# --- experiment test-mode sweep ---
for i in range(10):
    w = 16 * int(rng.integers(2, 24))
    h = 16 * int(rng.integers(3, 40 if i < 8 else 300))  # tall cases last
    n = int(rng.integers(3, 60))
    speed = int(rng.choice([1, 2, 4, 8, 16, 31, 62, 124]))
    out = f"/tmp/sweep_ref_{i}.h264"
    r = subprocess.run([f"{REF}/h264_scroll_encoder", "-t", "-n", str(n),
                        "-S", str(speed), "-w", str(w), "-H", str(h),
                        "-o", out], capture_output=True)
    if r.returncode != 0:
        print(f"[test {i}] reference failed for {w}x{h}"); continue
    cfg = ComposerConfig(w, h)
    s = ComposerSession(cfg)
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    for off in triangle_offsets(n, speed, h - 16, start_offset=496):
        s.write_scroll_or_waypoint_frame(off)
    ref = pathlib.Path(out).read_bytes()
    ours = s.getvalue()
    if ours != ref:
        fails += 1
        print(f"[test {i}] MISMATCH {w}x{h} n={n} S={speed}")
        print(nal_diff(ours, ref))
    else:
        print(f"[test {i}] ok {w}x{h} n={n} S={speed} wp={s.waypoints.count}", flush=True)

# --- composer donor-mode sweep ---
for i in range(6):
    w = 16 * int(rng.integers(2, 12))
    h = 16 * int(rng.integers(4, 80))
    n = int(rng.integers(3, 40))
    speed = int(rng.choice([1, 2, 4, 8, 124]))
    da, db = f"/tmp/sweep_da_{i}.h264", f"/tmp/sweep_db_{i}.h264"
    cfg = ComposerConfig(w, h)
    for path, color in ((da, (81, 90, 240)), (db, (41, 240, 110))):
        sd = ComposerSession(cfg)
        sd.write_parameter_sets()
        sd.writer.append_raw(ipcm.idr_frame_color(cfg, *color))
        sd.write_to_file(path)
    out = f"/tmp/sweep_comp_{i}.h264"
    r = subprocess.run([f"{REF}/composer", "--ref-a", da, "--ref-b", db,
                        "-n", str(n), "-s", str(speed), "-o", out],
                       capture_output=True)
    if r.returncode != 0:
        print(f"[comp {i}] reference failed {w}x{h}"); continue
    s = open_donor_session(da, db)
    s.write_parameter_sets()
    s.write_donor_atlases(s._donor_a_rbsp, s._donor_b_rbsp,
                          rewrite_mode="splice")
    for off in triangle_offsets(n, speed, h):
        s.write_scroll_frame(off)
    ref = pathlib.Path(out).read_bytes()
    ours = s.getvalue()
    if ours != ref:
        fails += 1
        print(f"[comp {i}] MISMATCH {w}x{h} n={n} s={speed}")
        print(nal_diff(ours, ref))
    else:
        print(f"[comp {i}] ok {w}x{h} n={n} s={speed} wp={s.waypoints.count}", flush=True)

print("SWEEP DONE, fails =", fails)
