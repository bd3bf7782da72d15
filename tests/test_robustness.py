"""Robustness: boundary policy, verifier under corruption, edge configs."""

import numpy as np
import pytest

from h264_scroll_encoder_tpu.config import ComposerConfig
from h264_scroll_encoder_tpu.session import ComposerSession
from h264_scroll_encoder_tpu.verify import verify_stream


def _stream(**kw):
    cfg = ComposerConfig(64, 128)
    s = ComposerSession(cfg, **kw)
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    for off in (0, 9, 23, 40, 100):
        s.write_scroll_frame(off)
    return s.getvalue()


def test_boundary_policy_nearest():
    """'nearest' rounds the A/B seam to the closest MB row (halving the
    16px artifact band); 'floor' reproduces the reference."""
    import jax.numpy as jnp
    from h264_scroll_encoder_tpu.models import scroll
    from h264_scroll_encoder_tpu.config import MAX_WAYPOINTS

    cfg = ComposerConfig(64, 128)
    z8 = jnp.zeros(MAX_WAYPOINTS, jnp.int32)
    zb = jnp.zeros(MAX_WAYPOINTS, bool)
    # offset 9: seam at (128-9)/16 = 7.44 -> floor 7, nearest 7
    # offset 13: (128-13)/16 = 7.19 -> floor 7, nearest 7
    # offset 25: (128-25)/16 = 6.44 -> floor 6, nearest 6
    # offset 30: (128-30)/16 = 6.125 -> floor 6, nearest 6
    # offset 15: (128-15)/16 = 7.06 -> floor 7; nearest (113+8)//16 = 7
    # offset 23: (128-23)/16 = 6.56 -> floor 6, nearest 7  (differs!)
    for off, exp_floor, exp_nearest in ((9, 7, 7), (23, 6, 7), (40, 5, 6)):
        for policy, exp in (("floor", exp_floor), ("nearest", exp_nearest)):
            ref, _ = scroll.mb_fields(cfg, jnp.int32(off), z8, zb,
                                      jnp.int32(0), is_waypoint_frame=False,
                                      boundary_policy=policy)
            ref = np.asarray(ref)
            # First B-region row (ref 1) is the seam row.
            seam = int(np.argmax(ref[:, 0] == 1))
            assert seam == exp, (off, policy, seam)

    # A full 'nearest' stream still verifies.
    s = ComposerSession(cfg, boundary_policy="nearest")
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    for off in (0, 9, 23, 40, 100):
        s.write_scroll_frame(off)
    assert verify_stream(s.getvalue()).ok


def test_verifier_never_crashes_on_corruption():
    """Random bit flips must yield a clean ok/False report or a caught
    per-frame error — never an unhandled exception."""
    base = bytearray(_stream())
    rng = np.random.default_rng(13)
    crashes = 0
    for trial in range(30):
        data = bytearray(base)
        for _ in range(int(rng.integers(1, 6))):
            pos = int(rng.integers(6, len(data)))
            data[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            verify_stream(bytes(data))
        except Exception:  # noqa: BLE001
            crashes += 1
    assert crashes == 0


def test_minimal_geometry():
    """1x1-MB frames (16x16) through the full pipeline."""
    cfg = ComposerConfig(16, 32)
    s = ComposerSession(cfg)
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    for off in (0, 5, 16):
        s.write_scroll_frame(off)
    rep = verify_stream(s.getvalue())
    assert rep.ok, rep.errors


def test_minimal_geometry_parity(ref_binaries, tmp_path):
    """Degenerate 16-px-wide frames must still match the C reference
    (exercises the B-only/C-unavailable MV prediction branches)."""
    import subprocess
    from h264_scroll_encoder_tpu.cli import triangle_offsets

    exe = ref_binaries.get("h264_scroll_encoder")
    if exe is None:
        pytest.skip("reference unavailable")
    out = tmp_path / "narrow.h264"
    subprocess.run([str(exe), "-t", "-n", "12", "-S", "4", "-w", "16",
                    "-H", "96", "-o", str(out)], capture_output=True)
    cfg = ComposerConfig(16, 96)
    s = ComposerSession(cfg)
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    for off in triangle_offsets(12, 4, 96 - 16, start_offset=496):
        s.write_scroll_or_waypoint_frame(off)
    assert s.getvalue() == out.read_bytes()


def test_session_falls_back_to_exact_ebsp_on_overflow():
    """When the bounded emulation-prevention fast path flags overflow
    (MAX_EBSP_INSERTIONS / ZERO_RUN_WINDOW are a fast-path contract, not
    a capability limit), the session must re-emit through the exact
    unbounded path and produce the same bytes — never raise."""
    import jax.numpy as jnp

    reference = _stream()

    cfg = ComposerConfig(64, 128)
    s = ComposerSession(cfg)
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    real_scroll, real_wp = s._scroll_fn, s._waypoint_fn

    def lying(fn):
        def wrapped(*args):
            nal, nal_len, bits, _ = fn(*args)
            return nal, nal_len, bits, jnp.bool_(True)
        return wrapped

    s._scroll_fn = lying(real_scroll)
    s._waypoint_fn = lying(real_wp)
    for off in (0, 9, 23, 40, 100):
        s.write_scroll_frame(off)
    assert s.getvalue() == reference


def test_batch_ingest_hostile_payloads():
    """The fused batch ingest surfaces per-donor errors for truncated /
    garbage / wrong-geometry payloads instead of crashing or silently
    accepting them — and a valid donor in the same batch still preps."""
    import numpy as np
    import pytest

    from h264_scroll_encoder_tpu import native_bridge as nb
    from h264_scroll_encoder_tpu.models import mb_transcode as mbt
    from h264_scroll_encoder_tpu.ops import cavlc
    from h264_scroll_encoder_tpu.ops.bitio import BitWriter
    from h264_scroll_encoder_tpu.utils import fixtures

    if not nb.native_available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(17)
    R, C = 4, 5
    good_grid = fixtures.representative_donor_grid(rng, C, R)
    bw = BitWriter()
    mbt.emit_p_slice_mbs(bw, good_grid, 1)
    bw.write_trailing_bits()
    good = bw.getvalue()

    hostile = [
        good[: len(good) // 3],              # truncated mid-MB
        bytes(rng.integers(0, 256, 64, dtype=np.uint8)),  # garbage
        b"\x00" * 40,                        # zero bits (ue runs off)
        good,                                # valid control
    ]
    with pytest.raises(cavlc.CAVLCError):
        nb.prepare_rows_batch(hostile, [0] * 4, R, C, 1, 2, (0,), 256,
                              n_threads=2)

    # The valid donor alone preps fine after the batch rejection.
    out = nb.prepare_rows_batch([good], [0], R, C, 1, 2, (0,), 256)
    assert out["coded"].shape == (1, R * C)


def test_edge_role_int16_wire_guard():
    """ADVICE r3: the int16 edge-role wire cast must reject (not wrap)
    donor MVs outside int16 — a wrapped MV silently corrupts the
    composite stream."""
    from h264_scroll_encoder_tpu.models import splice_device as sd

    R = C = 3
    roles = {f"{p}_{f}": np.zeros((2, R * C), np.int32)
             for p in ("a", "b", "d") for f in ("ref", "mvx", "mvy")}
    # In-range roles pass.
    sd._check_roles_fit_int16(sd._edge_roles_wire(roles, R, C))
    # An out-of-range qpel MV in the edge read-set raises, naming the
    # offending batch row.
    roles["a_mvy"][1, C - 1] = 40_000
    with pytest.raises(ValueError, match=r"rows \[1\]"):
        sd._check_roles_fit_int16(sd._edge_roles_wire(roles, R, C))


def test_row_chunk_class_selection():
    """Exact-fit class is used; past-the-max raises OverflowError."""
    from h264_scroll_encoder_tpu.models import splice_device as sd

    assert sd.row_chunk_class(1) == sd.ROW_CHUNK_CLASSES[0]
    assert sd.row_chunk_class(16) == 16          # exact fit, not 24
    assert sd.row_chunk_class(17) == 24
    assert sd.row_chunk_class(2048) == 2048
    with pytest.raises(OverflowError):
        sd.row_chunk_class(2049)
