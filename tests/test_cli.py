"""CLI surface smoke tests (argument plumbing, exit codes, outputs)."""

import pathlib

from h264_scroll_encoder_tpu import cli
from h264_scroll_encoder_tpu.verify import verify_stream


def test_scroll_encoder_cli(tmp_path):
    out = tmp_path / "t.h264"
    rc = cli.scroll_encoder_main(["-n", "4", "-w", "64", "-H", "48",
                                  "-o", str(out)])
    assert rc == 0
    assert verify_stream(out.read_bytes()).ok


def test_composer_cli_roundtrip(tmp_path):
    # Donors from the generator script's library path.
    from h264_scroll_encoder_tpu.config import ComposerConfig
    from h264_scroll_encoder_tpu.models import ipcm
    from h264_scroll_encoder_tpu.session import ComposerSession

    cfg = ComposerConfig(64, 512)
    for name, color in (("a", (81, 90, 240)), ("b", (41, 240, 110))):
        s = ComposerSession(cfg)
        s.write_parameter_sets()
        s.writer.append_raw(ipcm.idr_frame_color(cfg, *color))
        s.write_to_file(tmp_path / f"{name}.h264")

    out = tmp_path / "c.h264"
    rc = cli.composer_main(["--ref-a", str(tmp_path / "a.h264"),
                            "--ref-b", str(tmp_path / "b.h264"),
                            "-n", "6", "-s", "124", "--safe-mv",
                            "-o", str(out)])
    assert rc == 0
    rep = verify_stream(out.read_bytes(), strict_mv=True, mv_limit_px=496)
    assert rep.ok, rep.errors


def test_composer_cli_errors(tmp_path):
    assert cli.composer_main(["--ref-a", "/nonexistent", "--ref-b",
                              "/nonexistent", "-o", "x"]) == 1
    garbage = tmp_path / "g.h264"
    garbage.write_bytes(b"\x12\x34" * 300)
    assert cli.composer_main(["--ref-a", str(garbage), "--ref-b",
                              str(garbage), "-o", "x"]) == 1
    assert cli.composer_main(["--ref-a", "a", "--ref-b", "b",
                              "-n", "0", "-o", "x"]) == 1


def test_cabac_donor_rejected(tmp_path):
    """CABAC donors must be rejected with a clear error (the C reference
    silently corrupts them; only its shell scripts guard,
    netflix_scroll.sh:74-78)."""
    from h264_scroll_encoder_tpu.config import ComposerConfig
    from h264_scroll_encoder_tpu.models import ipcm
    from h264_scroll_encoder_tpu.ops.bitio import BitWriter
    from h264_scroll_encoder_tpu.session import ComposerSession
    from h264_scroll_encoder_tpu.syntax.nal import AnnexBWriter
    from h264_scroll_encoder_tpu.syntax.params import generate_sps

    # Hand-build a PPS with entropy_coding_mode_flag = 1 (CABAC).
    bw = BitWriter()
    bw.write_ue(0)
    bw.write_ue(0)
    bw.write_bit(1)   # CABAC
    bw.write_bit(0)
    bw.write_ue(0)
    bw.write_ue(0)
    bw.write_ue(0)
    bw.write_bit(0)
    bw.write_bits(0, 2)
    bw.write_se(0)
    bw.write_se(0)
    bw.write_se(0)
    bw.write_bit(1)
    bw.write_bit(0)
    bw.write_bit(0)
    bw.write_trailing_bits()

    cfg = ComposerConfig(64, 48)
    out = AnnexBWriter()
    out.write_nal_unit(generate_sps(64, 48), 3, 7)
    out.write_nal_unit(bw.getvalue(), 3, 8)
    s = ComposerSession(cfg)
    s.writer = out
    s.writer.append_raw(ipcm.idr_frame_color(cfg, 81, 90, 240))
    donor = tmp_path / "cabac.h264"
    donor.write_bytes(out.getvalue())

    rc = cli.composer_main(["--ref-a", str(donor), "--ref-b", str(donor),
                            "-n", "2", "-o", str(tmp_path / "x.h264")])
    assert rc == 1


def test_trans_resizer_cli(tmp_path):
    from h264_scroll_encoder_tpu.utils.fixtures import synthetic_cavlc_stream

    inp = tmp_path / "in.h264"
    inp.write_bytes(synthetic_cavlc_stream(320, 320, n_p_frames=1, seed=8))
    out = tmp_path / "out.h264"
    rc = cli.trans_resizer_main([str(inp), str(out), "--out-width", "720"])
    assert rc == 0
    assert verify_stream(out.read_bytes()).ok


def test_splice_demo_cli(tmp_path):
    from h264_scroll_encoder_tpu.utils.fixtures import synthetic_cavlc_stream

    donor = tmp_path / "donor.h264"
    donor.write_bytes(synthetic_cavlc_stream(96, 96, n_p_frames=2, seed=9))
    out = tmp_path / "spliced.h264"
    rc = cli.splice_demo_main(["--donor", str(donor), "-o", str(out),
                               "--width", "320", "--height", "240",
                               "--rect-x", "4", "--rect-y", "3"])
    assert rc == 0
    assert pathlib.Path(out).stat().st_size > 0


def test_mux_cli(tmp_path):
    out = tmp_path / "t.h264"
    cli.scroll_encoder_main(["-n", "3", "-w", "64", "-H", "48",
                             "-o", str(out)])
    from h264_scroll_encoder_tpu.utils.mp4mux import mux_cli
    mp4 = tmp_path / "t.mp4"
    assert mux_cli([str(out), str(mp4)]) == 0
    assert mp4.read_bytes()[4:8] == b"ftyp"
