"""MASTER_DESIGN §10 fallback: full conventional encode on unservable
hints (docs/MASTER_DESIGN.md:213-220 — the rule the reference specifies
but never implemented).

A schedule whose middle frame is unservable must: (1) keep the output
stream conformant (0 libavcodec decode errors), (2) display the
conventionally encoded frame pixel-identically to a standalone x264
encode of the same pixels, and (3) let the session keep composing
against the fallback frame as the fresh atlas, pixel-correct across the
boundary.
"""

import numpy as np
import pytest

from h264_scroll_encoder_tpu import avref
from h264_scroll_encoder_tpu.config import ComposerConfig
from h264_scroll_encoder_tpu.models.splice import (FrameHints,
                                                   HintsNotServable,
                                                   MotionRegion)
from h264_scroll_encoder_tpu.session import ComposerSession

pytestmark = pytest.mark.skipif(
    not avref.available(), reason="system libavcodec/libx264 unavailable")

W, H = 128, 96


def _target_frame(seed=7):
    """The frame the UI wanted to show when hints broke: deterministic
    textured content, full session dimensions."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[:H, :W]
    y = ((xx * 255) // W + rng.integers(0, 24, (H, W))).astype(np.uint8)
    cb = (128 + (yy[::2, ::2] * 60) // H).astype(np.uint8)
    cr = (128 - (xx[::2, ::2] * 60) // W).astype(np.uint8)
    return y, cb, cr


def _session():
    s = ComposerSession(ComposerConfig(W, H))
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    return s


def test_fallback_midstream_conformant_and_pixel_correct():
    sess = _session()
    servable = FrameHints(motion_regions=(
        MotionRegion(0, 0, W // 16, H // 16, ref_idx=1, mv_x=0, mv_y=0),))
    # ref_idx=5 with no waypoints -> outside the active list.
    broken = FrameHints(motion_regions=(
        MotionRegion(0, 0, W // 16, H // 16, ref_idx=5),))
    target = _target_frame()

    assert sess.write_hint_frame_or_fallback(servable) is False
    took = sess.write_hint_frame_or_fallback(broken, fallback_frame=target)
    assert took is True
    fb_index = sess.frames_written - 1
    # Post-fallback composition: full-frame chrome (atlas 0 = the
    # fallback frame), then a band shifted up 16 px out of it.
    after_chrome = FrameHints(motion_regions=())
    sess.write_hint_frame_or_fallback(after_chrome)
    shifted = FrameHints(motion_regions=(
        MotionRegion(0, 0, W // 16, 2, ref_idx=0, mv_x=0, mv_y=16),))
    sess.write_hint_frame_or_fallback(shifted)

    pics, nerrors = avref.decode_pictures(sess.getvalue())
    assert nerrors == 0
    # display order: atlas A, atlas B, servable, fallback, chrome, shifted
    assert len(pics) == 6

    # (2) the fallback frame's pixels == a standalone x264 encode of the
    # same target, decoded by libavcodec (identical coded bits; the
    # slice-QP-delta compensation makes dequant exact).
    standalone = avref.encode_x264([target], qp=20, keyint=1, refs=1,
                                   extra_params="psy=0:chroma-qp-offset=0")
    ref_pics, _ = avref.decode_pictures(standalone)
    fb = pics[2 + fb_index]      # two atlas frames precede composed ones
    assert (fb.y == ref_pics[0].y).all()
    assert (fb.cb == ref_pics[0].cb).all()
    assert (fb.cr == ref_pics[0].cr).all()

    # (3) chrome after the fallback shows the fallback frame exactly
    # (atlas slot 0 was replaced), and the shifted band samples it 16 px
    # lower.
    chrome = pics[-2]
    assert (chrome.y == fb.y).all()
    assert (chrome.cb == fb.cb).all() and (chrome.cr == fb.cr).all()
    shifted_pic = pics[-1]
    assert (shifted_pic.y[:32] == fb.y[16:48]).all()
    assert (shifted_pic.y[32:] == fb.y[32:]).all()


def test_fallback_requires_pixels():
    sess = _session()
    broken = FrameHints(motion_regions=(
        MotionRegion(0, 0, 2, 2, ref_idx=3),))
    with pytest.raises(HintsNotServable):
        sess.write_hint_frame_or_fallback(broken)


def test_fallback_rejects_wrong_dims():
    sess = _session()
    bad = (np.zeros((H // 2, W // 2), np.uint8),
           np.zeros((H // 4, W // 4), np.uint8),
           np.zeros((H // 4, W // 4), np.uint8))
    with pytest.raises(ValueError, match="session is"):
        sess.write_fallback_frame(bad)


def test_fallback_resets_waypoints():
    """The MMCO 4 marking truncates long-term indices >= 2; the session
    must forget its waypoint chain (and subsequent frames stop listing
    them) instead of referencing evicted pictures."""
    cfg = ComposerConfig(128, 1008)      # tall enough for a waypoint
    sess = ComposerSession(cfg)
    sess.write_parameter_sets()
    sess.write_test_atlases(striped=True)
    sess.write_scroll_frame(496)         # creates waypoint + scroll frame
    assert sess.waypoints.count == 1
    sess.write_fallback_frame(_target_frame_sized(cfg))
    assert sess.waypoints.count == 0
    sess.write_hint_frame(FrameHints(motion_regions=()))
    pics, nerrors = avref.decode_pictures(sess.getvalue())
    assert nerrors == 0


def _target_frame_sized(cfg, seed=3):
    rng = np.random.default_rng(seed)
    h, w = cfg.height, cfg.width
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    cb = np.full((h // 2, w // 2), 100, np.uint8)
    cr = np.full((h // 2, w // 2), 150, np.uint8)
    return y, cb, cr
