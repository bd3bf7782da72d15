"""Seeded parity sweep vs the C reference binaries + adversarial donors.

Promotes scripts/parity_sweep.py's coverage into CI: geometry x speed x
waypoint-density for the scroll/test modes, donor-mode composition, and
adversarial donor families (dense sub-8x8 partitions, extreme qp_delta,
emulation-prevention-triggering zero payloads) through both the padding
transcoder (vs the trans_resizer binary) and the dense device splice
path (vs the exact host path).

Geometries are pinned to a small set so the jit programs are shared (one
compile per ComposerConfig; offsets/speeds are traced arguments).
"""

import pathlib
import subprocess

import numpy as np
import pytest

from h264_scroll_encoder_tpu.cli import triangle_offsets
from h264_scroll_encoder_tpu.config import ComposerConfig
from h264_scroll_encoder_tpu.models import ipcm
from h264_scroll_encoder_tpu.models import mb_transcode as mbt
from h264_scroll_encoder_tpu.session import (ComposerSession,
                                             open_donor_session)
from h264_scroll_encoder_tpu.utils import fixtures
from h264_scroll_encoder_tpu.verify import nal_diff


def _run_ref(exe, args):
    r = subprocess.run([str(exe), *args], capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-500:]


def test_scroll_geometry_speed_sweep(ref_binaries, tmp_path):
    """Test-mode sweep: 4 geometries x 4 (speed, length) schedules, incl.
    waypoint-crossing tall frames — byte parity vs h264_scroll_encoder."""
    exe = ref_binaries.get("h264_scroll_encoder")
    if exe is None:
        pytest.skip("h264_scroll_encoder unavailable")

    geometries = [(64, 1024), (352, 288), (208, 640), (96, 2048)]
    schedules = [(8, 4), (20, 16), (40, 62), (12, 124)]  # (n, speed)
    for gi, (w, h) in enumerate(geometries):
        cfg = ComposerConfig(w, h)
        for si, (n, speed) in enumerate(schedules):
            out = tmp_path / f"ref_{gi}_{si}.h264"
            _run_ref(exe, ["-t", "-n", str(n), "-S", str(speed),
                           "-w", str(w), "-H", str(h), "-o", str(out)])
            s = ComposerSession(cfg)
            s.write_parameter_sets()
            s.write_test_atlases(striped=True)
            for off in triangle_offsets(n, speed, h - 16,
                                        start_offset=496):
                s.write_scroll_or_waypoint_frame(off)
            ours = s.getvalue()
            ref = out.read_bytes()
            assert ours == ref, (
                f"{w}x{h} n={n} S={speed}: " + nal_diff(ours, ref))


def test_donor_mode_sweep(ref_binaries, tmp_path):
    """Composer donor-mode sweep (bit-compat 'splice' rewrite) at two
    geometries x two speeds vs the composer binary."""
    exe = ref_binaries.get("composer")
    if exe is None:
        pytest.skip("composer unavailable")

    for gi, (w, h) in enumerate([(160, 320), (112, 640)]):
        cfg = ComposerConfig(w, h)
        da, db = tmp_path / f"da{gi}.h264", tmp_path / f"db{gi}.h264"
        for path, color in ((da, (81, 90, 240)), (db, (41, 240, 110))):
            sd = ComposerSession(cfg)
            sd.write_parameter_sets()
            sd.writer.append_raw(ipcm.idr_frame_color(cfg, *color))
            sd.write_to_file(str(path))
        for n, speed in [(30, 4), (10, 124)]:
            out = tmp_path / f"comp_{gi}_{speed}.h264"
            _run_ref(exe, ["--ref-a", str(da), "--ref-b", str(db),
                           "-n", str(n), "-s", str(speed),
                           "-o", str(out)])
            s = open_donor_session(str(da), str(db))
            s.write_parameter_sets()
            s.write_donor_atlases(s._donor_a_rbsp, s._donor_b_rbsp,
                                  rewrite_mode="splice")
            for off in triangle_offsets(n, speed, h):
                s.write_scroll_frame(off)
            ours = s.getvalue()
            ref = out.read_bytes()
            assert ours == ref, (
                f"{w}x{h} n={n} s={speed}: " + nal_diff(ours, ref))


# ---------------------------------------------------------------------------
# Adversarial donor families.
# ---------------------------------------------------------------------------

def _sub8x8_mb(rng, num_refs=1):
    """P_8x8 with all-4x4 sub-partitions (16 MVs) and full residuals —
    the densest inter grammar."""
    mvds = tuple((int(rng.integers(-32, 33)), int(rng.integers(-32, 33)))
                 for _ in range(16))
    mb = mbt.Macroblock(kind="inter", mb_type=3, sub_mb_types=(3, 3, 3, 3),
                        ref_idx=(), mvds=mvds, cbp=47,
                        qp_delta=int(rng.integers(-3, 4)))
    mb.luma = tuple(fixtures.random_residual_block(rng, 16, density=1.0)
                    for _ in range(16))
    mb.cb_dc = fixtures.random_residual_block(rng, 4, density=1.0)
    mb.cr_dc = fixtures.random_residual_block(rng, 4, density=1.0)
    return mb


def _extreme_qp_grid(rng, w, h):
    """Alternating large qp_deltas (legal se(v) magnitudes) on coded MBs."""
    grid = []
    flip = 1
    for r in range(h):
        row = []
        for c in range(w):
            mb = fixtures.representative_inter_mb(rng, 1)
            if mb.cbp > 0:
                mb.qp_delta = 12 * flip
                flip = -flip
            row.append(mb)
        grid.append(row)
    return grid


def _zero_ipcm_grid(w, h):
    """I_PCM MBs with all-zero samples: maximal emulation-prevention
    pressure (384 zero bytes per MB -> dense 00 00 0x patterns)."""
    zero_mb = mbt.Macroblock(kind="ipcm", mb_type=25,
                             ipcm_samples=b"\x00" * 384)
    return [[zero_mb for _ in range(w)] for _ in range(h)]


@pytest.mark.parametrize("family", ["sub8x8", "extreme_qp", "zero_ipcm"])
def test_adversarial_transcode_parity(ref_binaries, tmp_path, family):
    """Adversarial donor streams through the reference trans_resizer vs
    our padding transcoder (320x320 -> 720x320), byte parity."""
    exe = ref_binaries.get("trans_resizer")
    if exe is None:
        pytest.skip("trans_resizer unavailable")
    from h264_scroll_encoder_tpu.models.splice import transcode_pad_stream

    rng = np.random.default_rng(hash(family) % 2**32)
    w, h = 20, 20  # 320x320 in MBs
    if family == "sub8x8":
        p_grids = [[[_sub8x8_mb(rng) if rng.random() < 0.7 else mbt.SKIP
                     for _ in range(w)] for _ in range(h)]]
        stream = fixtures.synthetic_cavlc_stream(320, 320, n_p_frames=2,
                                                 seed=5, p_grids=p_grids,
                                                 bug_compat=True)
    elif family == "extreme_qp":
        stream = fixtures.synthetic_cavlc_stream(
            320, 320, n_p_frames=2, seed=6, bug_compat=True,
            p_grids=[_extreme_qp_grid(rng, w, h)])
    else:
        stream = fixtures.synthetic_cavlc_stream(
            320, 320, n_p_frames=1, seed=7, bug_compat=True,
            i_grid=_zero_ipcm_grid(w, h))

    inp = tmp_path / "in.h264"
    inp.write_bytes(stream)
    out = tmp_path / "ref_out.h264"
    subprocess.run([str(exe), str(inp), str(out)], capture_output=True)
    assert out.exists() and out.stat().st_size > 0
    ours = transcode_pad_stream(stream, 720, 320, bug_compat=True)
    ref = out.read_bytes()
    assert ours == ref, (
        f"{family}: sizes ours={len(ours)} ref={len(ref)}; first diff "
        f"{next((i for i, (a, b) in enumerate(zip(ours, ref)) if a != b), -1)}")


@pytest.mark.parametrize("family", ["sub8x8", "extreme_qp", "zero_ipcm"])
def test_adversarial_dense_splice_parity(family):
    """The same adversarial families through the dense device splice
    kernel vs the exact host path (byte equality).  zero_ipcm exercises
    both the align phase scan and emulation-prevention pressure."""
    from tests.test_splice_device import _run_dense_case

    rng = np.random.default_rng(1 + hash(family) % 2**31)
    cfg = ComposerConfig(192, 128)
    R = C = 3
    if family == "sub8x8":
        donor = [[_sub8x8_mb(rng) for _ in range(C)] for _ in range(R)]
    elif family == "extreme_qp":
        donor = _extreme_qp_grid(rng, C, R)
    else:
        donor = _zero_ipcm_grid(C, R)
        donor[1][1] = fixtures.representative_inter_mb(rng, 1)
    from h264_scroll_encoder_tpu.models.splice import MotionRegion
    regions = (MotionRegion(0, 0, 12, 1, ref_idx=0, mv_y=8),)
    _run_dense_case(cfg, donor, 3, 4, 2, 3, regions)


def test_scroll_1080p_parity(ref_binaries, tmp_path):
    """Frames beyond 4095 MBs (1920x1088 = 8160) — the wide symbol
    layout (skip run in its own slot) — byte parity vs the C binary."""
    exe = ref_binaries.get("h264_scroll_encoder")
    if exe is None:
        pytest.skip("h264_scroll_encoder unavailable")

    w, h = 1920, 1088
    n, speed = 5, 24
    out = tmp_path / "ref_1080p.h264"
    _run_ref(exe, ["-t", "-n", str(n), "-S", str(speed),
                   "-w", str(w), "-H", str(h), "-o", str(out)])
    s = ComposerSession(ComposerConfig(w, h))
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    for off in triangle_offsets(n, speed, h - 16, start_offset=496):
        s.write_scroll_or_waypoint_frame(off)
    ours = s.getvalue()
    ref = out.read_bytes()
    assert ours == ref, f"1080p: {nal_diff(ours, ref)}"
