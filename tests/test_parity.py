"""End-to-end byte-parity vs the C reference binaries.

The north-star correctness criterion (BASELINE.md): byte-identical Annex-B
streams vs the C encoder, NAL-level diff on mismatch.  Since this
environment has no external encoder (no ffmpeg/x264), donor streams are
synthesized from our I_PCM generator — themselves byte-verified against the
reference's test mode first.
"""

import subprocess
from pathlib import Path

import pytest

from h264_scroll_encoder_tpu.config import ComposerConfig
from h264_scroll_encoder_tpu.models import ipcm
from h264_scroll_encoder_tpu.session import ComposerSession
from h264_scroll_encoder_tpu.syntax import parse


from h264_scroll_encoder_tpu.verify import nal_diff  # noqa: E402


def assert_streams_identical(ours: bytes, ref: bytes):
    assert ours == ref, nal_diff(ours, ref)


@pytest.fixture(scope="module")
def tmpdir_mod(tmp_path_factory):
    return tmp_path_factory.mktemp("parity")


def run_ref(ref_binaries, name, args):
    exe = ref_binaries.get(name)
    if exe is None:
        pytest.skip(f"reference binary {name} unavailable")
    r = subprocess.run([str(exe), *args], capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-500:]


def test_test_mode_small(ref_binaries, tmpdir_mod):
    """Striped I_PCM atlases + scroll P-frames at 64x48 (no waypoints)."""
    out = tmpdir_mod / "ref_small.h264"
    run_ref(ref_binaries, "h264_scroll_encoder",
            ["-t", "-n", "8", "-w", "64", "-H", "48", "-o", str(out)])

    cfg = ComposerConfig(64, 48)
    s = ComposerSession(cfg)
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    from h264_scroll_encoder_tpu.cli import triangle_offsets
    for off in triangle_offsets(8, 1, 48 - 16, start_offset=496):
        s.write_scroll_or_waypoint_frame(off)
    assert_streams_identical(s.getvalue(), out.read_bytes())


def test_test_mode_waypoints(ref_binaries, tmpdir_mod):
    """Tall 64x1280 frame: multiple waypoints, A- and B-region redirection."""
    out = tmpdir_mod / "ref_tall.h264"
    run_ref(ref_binaries, "h264_scroll_encoder",
            ["-t", "-n", "220", "-S", "16", "-w", "64", "-H", "1280",
             "-o", str(out)])

    cfg = ComposerConfig(64, 1280)
    s = ComposerSession(cfg)
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    from h264_scroll_encoder_tpu.cli import triangle_offsets
    for off in triangle_offsets(220, 16, 1280 - 16, start_offset=496):
        s.write_scroll_or_waypoint_frame(off)
    assert_streams_identical(s.getvalue(), out.read_bytes())


@pytest.fixture(scope="module")
def donor_files(tmpdir_mod):
    """Synthesized donor IDR files (SPS+PPS+one I_PCM IDR each), 64x512 so
    the composer's triangle pattern crosses the 496 px waypoint boundary."""
    paths = {}
    for name, color in [("a", (81, 90, 240)), ("b", (41, 240, 110))]:
        cfg = ComposerConfig(64, 512)
        s = ComposerSession(cfg)
        s.write_parameter_sets()
        s.writer.append_raw(ipcm.idr_frame_color(cfg, *color))
        p = tmpdir_mod / f"donor_{name}.h264"
        s.write_to_file(p)
        paths[name] = p
    return paths


def test_composer_donor_mode(ref_binaries, donor_files, tmpdir_mod):
    """Full composer flow: parse donors, rewrite IDRs, scroll w/ waypoint."""
    out = tmpdir_mod / "ref_comp.h264"
    run_ref(ref_binaries, "composer",
            ["--ref-a", str(donor_files["a"]), "--ref-b",
             str(donor_files["b"]), "-n", "140", "-s", "4", "-o", str(out)])

    from h264_scroll_encoder_tpu.session import open_donor_session
    from h264_scroll_encoder_tpu.cli import triangle_offsets
    s = open_donor_session(donor_files["a"], donor_files["b"])
    s.write_parameter_sets()
    # "splice" = the C reference's raw bit-shift; required for byte parity
    # (the C path corrupts I_PCM-bearing donors — our "auto" mode fixes
    # that, verified separately in test_donor_realign_fixes_ipcm).
    s.write_donor_atlases(s._donor_a_rbsp, s._donor_b_rbsp,
                          rewrite_mode="splice")
    for off in triangle_offsets(140, 4, s.cfg.height):
        s.write_scroll_frame(off)
    assert_streams_identical(s.getvalue(), out.read_bytes())


def test_donor_realign_fixes_ipcm(donor_files):
    """The C reference's donor rewrite bit-shifts payloads, corrupting
    I_PCM alignment when the new header length differs mod 8 (the
    rewritten atlas B fails CAVLC grammar).  Our auto mode re-emits with
    recomputed alignment; the full stream must verify cleanly."""
    from h264_scroll_encoder_tpu.session import open_donor_session
    from h264_scroll_encoder_tpu.verify import verify_stream

    s = open_donor_session(donor_files["a"], donor_files["b"])
    s.write_parameter_sets()
    s.write_donor_atlases(s._donor_a_rbsp, s._donor_b_rbsp)  # auto
    for off in (0, 4, 8, 200, 496, 500):
        s.write_scroll_frame(off)
    rep = verify_stream(s.getvalue())
    assert rep.ok, rep.errors

    # And the splice mode indeed reproduces the defect on these donors.
    s2 = open_donor_session(donor_files["a"], donor_files["b"])
    s2.write_parameter_sets()
    s2.write_donor_atlases(s2._donor_a_rbsp, s2._donor_b_rbsp,
                           rewrite_mode="splice")
    rep2 = verify_stream(s2.getvalue())
    assert not rep2.ok


def test_experiment_donor_mode(ref_binaries, donor_files, tmpdir_mod):
    """scroll-encoder -i mode: one donor stream containing two IDRs."""
    two_idr = tmpdir_mod / "setup.h264"
    # SPS+PPS+IDR_A then IDR_B from the two donor files.
    a = donor_files["a"].read_bytes()
    b = donor_files["b"].read_bytes()
    # Second file's IDR NAL only (skip its SPS/PPS): find third start code.
    units = list(parse.iter_nal_units(b))
    idr_b = next(u for u in units if u.nal_unit_type == 5)
    idr_b_nal = b"\x00\x00\x00\x01" + bytes(
        [(idr_b.nal_ref_idc << 5) | idr_b.nal_unit_type]) + idr_b.data
    two_idr.write_bytes(a + idr_b_nal)

    out = tmpdir_mod / "ref_exp_donor.h264"
    run_ref(ref_binaries, "h264_scroll_encoder",
            ["-i", str(two_idr), "-n", "120", "-S", "8", "-o", str(out)])

    from h264_scroll_encoder_tpu.session import open_two_idr_session
    from h264_scroll_encoder_tpu.cli import triangle_offsets
    s = open_two_idr_session(two_idr)
    s.write_parameter_sets(nal_ref_idc=2)
    s.write_donor_atlases(s._donor_a_rbsp, s._donor_b_rbsp,
                          rewrite_mode="splice")  # C-parity bit splice
    for off in triangle_offsets(120, 8, s.cfg.height - 16, start_offset=496):
        s.write_scroll_or_waypoint_frame(off)
    assert_streams_identical(s.getvalue(), out.read_bytes())
