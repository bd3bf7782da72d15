"""UI-hint-driven frame composition (MASTER_DESIGN §5 per-frame hints).

Builds per-MB (ref, mv) field grids from `FrameHints` motion regions over
a static-chrome background, then emits through the standard compose
kernel.  With `enable_pskip=True` the chrome (ref 0, zero MV) collapses
into P_Skip runs — the BASELINE "composer 720p: static chrome + scroll
region as P_Skip runs with long-term ref atlas" configuration.

The dynamic-rect donor path lives in models/splice_device.py (device) and
models/splice.py (host); this module is the donor-less fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ComposerConfig, MAX_WAYPOINTS
from ..syntax.slice_headers import p_slice_header_symbols
from .splice import FrameHints
from . import scroll as scroll_model


def hint_fields(cfg: ComposerConfig, hints: FrameHints):
    """FrameHints -> dense (ref, mv_x, mv_y) MB grids (host, numpy).

    Background is static chrome referencing atlas slot 0 with zero MV
    (P_Skip-eligible); motion regions override with their hinted vector.
    Later regions win where they overlap (z-order, MASTER_DESIGN §10).
    """
    H, W = cfg.mb_height, cfg.mb_width
    ref = np.zeros((H, W), np.int32)
    mvx = np.zeros((H, W), np.int32)
    mvy = np.zeros((H, W), np.int32)
    for reg in hints.motion_regions:
        ys = slice(max(0, reg.mb_y0), min(H, reg.mb_y1))
        xs = slice(max(0, reg.mb_x0), min(W, reg.mb_x1))
        ref[ys, xs] = reg.ref_idx
        mvx[ys, xs] = reg.mv_x * 4
        mvy[ys, xs] = reg.mv_y * 4
    return jnp.asarray(ref), jnp.asarray(mvx), jnp.asarray(mvy)


@functools.lru_cache(maxsize=None)
def _jitted_hint_frame(cfg: ComposerConfig, enable_pskip: bool):
    def fn(frame_num, ref, mv_x, mv_y, num_waypoints, wp_ltidx, wp_valid):
        max_fn = 1 << cfg.log2_max_frame_num
        fn_w = frame_num % max_fn
        hp, hn = p_slice_header_symbols(
            cfg, fn_w, fn_w * 2, is_reference=False, long_term_idx=-1,
            num_waypoints=num_waypoints, wp_long_term_idx=wp_ltidx,
            wp_valid=wp_valid)
        return scroll_model.emit_p_frame(
            cfg, hp, hn, ref, mv_x, mv_y,
            num_refs=2 + num_waypoints, nal_ref_idc=0,
            enable_pskip=enable_pskip)

    return jax.jit(fn)


def emit_hint_frame(cfg: ComposerConfig, frame_num: int, hints: FrameHints,
                    *, enable_pskip: bool = True, num_waypoints=0,
                    wp_ltidx=None, wp_valid=None):
    """One hint-composed P-frame NAL (device pipeline).

    Returns (nal u8[max_nal], nal_len, rbsp_bits, overflow)."""
    ref, mvx, mvy = hint_fields(cfg, hints)
    if wp_ltidx is None:
        wp_ltidx = jnp.zeros(MAX_WAYPOINTS, jnp.int32)
    if wp_valid is None:
        wp_valid = jnp.zeros(MAX_WAYPOINTS, bool)
    fn = _jitted_hint_frame(cfg, enable_pskip)
    return fn(jnp.int32(frame_num), ref, mvx, mvy,
              jnp.int32(num_waypoints), wp_ltidx, wp_valid)
