"""Batched multi-session compose: vmap over sessions, shard_map over chips.

The reference is a single-threaded C program; its honest first-class
parallel axis is *data parallelism over independent UI sessions*
(SURVEY.md §2.4, BASELINE config "multi-stream batch: 64 concurrent UI
sessions").  Per-session dynamic state (frame_num + waypoint registry) is a
pytree with a leading batch axis living in HBM; each step composes one
P-frame per session fully on-device.

Cross-chip: sessions shard over a 1-D mesh axis ("sessions"); the hot path
needs no collectives (embarrassingly parallel — placement/egress is a
scheduling concern).  `sharded_step` wires the sharding via shard_map so
XLA compiles one SPMD program per chip.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ComposerConfig, MAX_WAYPOINTS
from ..models import scroll


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SessionState:
    """Device-resident per-session state (batch axis leading).

    Mirrors the stream-internal persistent state of the reference —
    frame_num and the waypoint registry (include/h264_writer.h:30-58) —
    which is exactly what must be snapshot-able to evict/restore sessions
    (SURVEY.md §5 checkpoint/resume).
    """
    frame_num: jax.Array        # i32[B]
    wp_offsets: jax.Array       # i32[B, MAX_WAYPOINTS]
    wp_ltidx: jax.Array         # i32[B, MAX_WAYPOINTS]
    wp_valid: jax.Array         # bool[B, MAX_WAYPOINTS]
    wp_count: jax.Array         # i32[B]

    @classmethod
    def create(cls, batch: int, frame_num: int = 2) -> "SessionState":
        """Fresh sessions, frame_num=2 (after the two atlas frames)."""
        return cls(
            frame_num=jnp.full((batch,), frame_num, jnp.int32),
            wp_offsets=jnp.zeros((batch, MAX_WAYPOINTS), jnp.int32),
            wp_ltidx=jnp.zeros((batch, MAX_WAYPOINTS), jnp.int32),
            wp_valid=jnp.zeros((batch, MAX_WAYPOINTS), bool),
            wp_count=jnp.zeros((batch,), jnp.int32),
        )


def _session_step(cfg: ComposerConfig, enable_pskip: bool, emit_waypoints: bool,
                  state: SessionState, offset_px):
    """One composed frame for one session (unbatched; vmapped below).

    Exactly ONE NAL is emitted per step through the unified kernel: on the
    rare step whose offset crosses a 496 px boundary
    (h264_needs_waypoint) it is the waypoint *reference* frame — the
    session registers it, and the caller repeats the offset next step to
    get the scroll frame (the experiment scheduler's semantics,
    scroll-encoder main.c:417-424).  `emitted_waypoint` in the outputs
    tells the caller.  With emit_waypoints=False the waypoint check is
    skipped entirely (schedules known to stay within the MV limit).
    """
    if emit_waypoints:
        needs = scroll.needs_waypoint(offset_px, state.wp_offsets,
                                      state.wp_valid, state.wp_count)
    else:
        needs = jnp.asarray(False)

    nal, nal_len, rbsp_bits, overflow = scroll.unified_frame(
        cfg, state.frame_num, offset_px, state.wp_offsets, state.wp_ltidx,
        state.wp_valid, state.wp_count, needs, enable_pskip=enable_pskip)

    # Register the waypoint (no-op when `needs` is False).  A step that
    # needs a 9th slot raises `exhausted` instead of silently emitting
    # illegal >496 px MVs downstream (the C's src/h264_writer.c:771-777
    # drops it with no diagnostic); callers must evict or stop the
    # session.  OR-ed into `overflow`: both mean "frame not servable".
    slot = jnp.minimum(state.wp_count, MAX_WAYPOINTS - 1)
    exhausted = needs & (state.wp_count >= MAX_WAYPOINTS)
    can_reg = needs & ~exhausted
    new_offsets = jnp.where(can_reg,
                            state.wp_offsets.at[slot].set(offset_px),
                            state.wp_offsets)
    new_ltidx = jnp.where(can_reg,
                          state.wp_ltidx.at[slot].set(2 + state.wp_count),
                          state.wp_ltidx)
    new_valid = jnp.where(can_reg, state.wp_valid.at[slot].set(True),
                          state.wp_valid)
    new_count = state.wp_count + can_reg.astype(jnp.int32)
    state = SessionState(state.frame_num + 1, new_offsets, new_ltidx,
                         new_valid, new_count)
    return state, (nal, nal_len, needs, rbsp_bits, overflow | exhausted)


@functools.lru_cache(maxsize=None)
def make_batched_step(cfg: ComposerConfig, *, enable_pskip: bool = False,
                      emit_waypoints: bool = True):
    """jit(vmap(step)): (SessionState[B], offsets i32[B]) ->
    (SessionState[B], (nal u8[B,N], nal_len i32[B], wp_nal, wp_len, bits))."""
    step = functools.partial(_session_step, cfg, enable_pskip, emit_waypoints)
    return jax.jit(jax.vmap(step))


@functools.lru_cache(maxsize=None)
def make_sharded_step(cfg: ComposerConfig, mesh: Mesh, axis: str = "sessions",
                      *, enable_pskip: bool = False,
                      emit_waypoints: bool = True):
    """Batched step with the session axis sharded over `mesh`.

    The computation is per-session independent, so the SPMD program has no
    collectives; sharding annotations keep every session's state, offsets,
    and output bytes resident on its chip.
    """
    step = functools.partial(_session_step, cfg, enable_pskip, emit_waypoints)
    vstep = jax.vmap(step)
    spec = P(axis)
    state_sharding = SessionState(
        frame_num=NamedSharding(mesh, spec),
        wp_offsets=NamedSharding(mesh, spec),
        wp_ltidx=NamedSharding(mesh, spec),
        wp_valid=NamedSharding(mesh, spec),
        wp_count=NamedSharding(mesh, spec),
    )
    out_sharding = (state_sharding,
                    tuple(NamedSharding(mesh, spec) for _ in range(5)))
    return jax.jit(vstep,
                   in_shardings=(state_sharding, NamedSharding(mesh, spec)),
                   out_shardings=out_sharding)


@functools.lru_cache(maxsize=None)
def make_batched_hint_step(cfg: ComposerConfig, *,
                           enable_pskip: bool = True,
                           compact_x: bool = False):
    """jit(vmap) of the hint-frame kernel: per-session (frame_num,
    ref/mv field grids) -> one P-frame NAL each (static chrome collapses
    to P_Skip runs; BASELINE 'composer 720p' config at serving scale).

    Field grids come from models/hints.hint_fields (or any per-session
    composition logic); waypoint registries ride along for the reference
    list.  compact_x packs each MB into two symbol slots instead of
    three (see scroll.emit_p_frame) — valid whenever every hint region's
    mv_x is zero (the vertical-scroll serving shape); byte-identical to
    the generic layout there and ~1.26x on the batch step.  Returns
    (nal, nal_len, rbsp_bits, overflow) batched.
    """
    from ..models import scroll as scroll_model
    from ..syntax.slice_headers import p_slice_header_symbols

    def one(frame_num, ref, mv_x, mv_y, wp_count, wp_ltidx, wp_valid):
        max_fn = 1 << cfg.log2_max_frame_num
        fn = frame_num % max_fn
        hp, hn = p_slice_header_symbols(
            cfg, fn, fn * 2, is_reference=False, long_term_idx=-1,
            num_waypoints=wp_count, wp_long_term_idx=wp_ltidx,
            wp_valid=wp_valid)
        return scroll_model.emit_p_frame(
            cfg, hp, hn, ref, mv_x, mv_y, num_refs=2 + wp_count,
            nal_ref_idc=0, enable_pskip=enable_pskip,
            compact_x=compact_x)

    return jax.jit(jax.vmap(one))


@functools.lru_cache(maxsize=None)
def make_batched_splice_step_dense(cfg: ComposerConfig, rect_mb_x: int,
                                   rect_mb_y: int, rect_w: int, rect_h: int,
                                   num_refs: int = 2, *,
                                   has_align: bool = False,
                                   n_rbsp: int | None = None,
                                   ebsp_exact: bool = False):
    """jit(vmap) of the dense-donor splice kernel (the serving hot path).

    Per session: header symbols, background fields/coded mask, and the
    dense donor arrays (models/splice_device.prepare_donor_dense ->
    dense_device_arrays).  Returns (nal, nal_len, rbsp_bits, overflow)
    batched."""
    from ..models import splice_device

    def one(hp, hn, bg_ref, bg_mvx, bg_mvy, bg_coded, dn):
        return splice_device.emit_spliced_frame_dense(
            cfg, rect_mb_x, rect_mb_y, rect_h, rect_w, num_refs,
            hp, hn, bg_ref, bg_mvx, bg_mvy, bg_coded, dn,
            has_align=has_align, n_rbsp=n_rbsp, ebsp_exact=ebsp_exact)

    return jax.jit(jax.vmap(one))


@functools.lru_cache(maxsize=None)
def make_batched_splice_step_rows(cfg: ComposerConfig, rect_mb_x: int,
                                  rect_mb_y: int, rect_w: int, rect_h: int,
                                  num_refs: int = 2, *,
                                  nal_ref_idc: int = 0,
                                  has_align: bool = False,
                                  n_rbsp: int | None = None,
                                  ebsp_exact: bool = False,
                                  compact_x: bool = False,
                                  s_row: int | None = None,
                                  s_flat: int | None = None,
                                  s_exc: int | None = None,
                                  bg_static_skip: bool = False,
                                  bg_budget: int | None = None):
    """jit(vmap) of the row-contiguous dense splice kernel (see
    splice_device.pack_donor_rows): byte-identical to the per-MB dense
    step with a fraction of the padded symbol lanes.

    Every donor-dependent value (row chunks, first_c, coded mask, edge
    roles) is a traced array inside `dn`, so ONE compiled program serves
    all donors sharing the rect geometry, the row chunk class, and the
    n_rbsp budget — the serving requirement that per-frame fresh donors
    never recompile.  bg_static_skip compiles the static-chrome serving
    program (all background MBs P_Skip with zero motion — the
    MASTER_DESIGN shape): no background symbols, R-lane skip-run math,
    byte-identical to the generic program on such inputs at a fraction
    of the cost.  compact_x packs background MBs into 2 symbol slots
    (valid when every background mv_x is zero; the rect-adjacent ring
    keeps 3 slots for its donor-influenced mvd_x).  bg_budget=L
    compacts each background row segment to at most L nonzero lanes
    (order-preserving -> byte-identical; rows beyond L flag the frame
    for a generic-path retry) — the serving fast path when background
    MBs are mostly P_Skip."""
    from ..models import splice_device

    def one(hp, hn, bg_ref, bg_mvx, bg_mvy, bg_coded, dn):
        return splice_device.emit_spliced_frame_rows(
            cfg, rect_mb_x, rect_mb_y, rect_h, rect_w, num_refs,
            hp, hn, bg_ref, bg_mvx, bg_mvy, bg_coded, dn,
            nal_ref_idc=nal_ref_idc,
            has_align=has_align, n_rbsp=n_rbsp, ebsp_exact=ebsp_exact,
            compact_x=compact_x, s_row=s_row, s_flat=s_flat,
            s_exc=s_exc, bg_static_skip=bg_static_skip,
            bg_budget=bg_budget)

    return jax.jit(jax.vmap(one))


def run_frames(cfg: ComposerConfig, state: SessionState, offsets,
               *, enable_pskip: bool = False, emit_waypoints: bool = True,
               composer_semantics: bool = False):
    """lax.scan over a [T, B] offset schedule, fully on-device.

    With composer_semantics=True each session follows the composer CLI's
    two-NAL behavior (src/composer.c:255-264): a step that emits a
    waypoint does NOT consume the session's schedule entry — the session
    keeps its own schedule pointer and re-presents the same offset next
    step for the scroll frame (sessions drift independently; trailing
    steps past the schedule replay its last entry).

    Returns final state and stacked per-frame outputs; used by the
    benchmark so the host never touches per-frame data inside the timed
    region.
    """
    step = functools.partial(_session_step, cfg, enable_pskip, emit_waypoints)
    vstep = jax.vmap(step)
    offsets = jnp.asarray(offsets, jnp.int32)

    if not composer_semantics:
        def body(carry, offs):
            new_state, outs = vstep(carry, offs)
            # Keep only sizes in the scan output; NAL bytes are consumed
            # via the per-step API in production (egress), sizes suffice
            # to time the compose+pack pipeline end-to-end.
            nal, nal_len, emitted_wp, rbsp_bits, overflow = outs
            checksum = jnp.sum(nal.astype(jnp.uint32), axis=-1,
                               dtype=jnp.uint32)
            return new_state, (nal_len, emitted_wp, rbsp_bits, checksum,
                               overflow)

        return jax.lax.scan(body, state, offsets)

    T, B = offsets.shape
    cols = jnp.arange(B, dtype=jnp.int32)

    def body(carry, _):
        st, ptr = carry
        offs = offsets[jnp.clip(ptr, 0, T - 1), cols]
        new_state, outs = vstep(st, offs)
        nal, nal_len, emitted_wp, rbsp_bits, overflow = outs
        checksum = jnp.sum(nal.astype(jnp.uint32), axis=-1,
                           dtype=jnp.uint32)
        ptr = ptr + jnp.where(emitted_wp, 0, 1)
        return (new_state, ptr), (nal_len, emitted_wp, rbsp_bits, checksum,
                                  overflow)

    ptr0 = jnp.zeros((B,), jnp.int32)
    (final_state, _), outs = jax.lax.scan(body, (state, ptr0), None,
                                          length=T)
    return final_state, outs


def compact_batch_nal(nal, nal_len, cap: int):
    """Concatenate a batch's valid NAL bytes into one dense buffer.

    nal [B, N] u8 with nal_len [B] valid bytes each -> (packed [cap] u8,
    total i32, overflow bool): packed[:total] is stream 0's bytes, then
    stream 1's, ... — so egress is ONE contiguous fetch per step instead
    of B strided fetches of mostly-padding buffers (the reference
    delivers its bytes too: src/composer.c:274-291).  `cap` is static;
    overflow flags total > cap (nothing truncated silently — callers
    retry with a bigger cap).

    Gather-free: the original searchsorted-gather form serialized on
    TPU (~67 ms per batch-256 step — the real egress ceiling, not the
    link).  Each session's buffer is instead treated as one giant pack
    symbol: mask-to-length, a per-session sub-word byte funnel aligns
    it to its output offset, and a word-level monotone or-move
    (bitpack_flat._flat_or_move — distances are non-decreasing along
    the flat order, so mid-flight merges only happen between words
    whose remaining distances are equal, where OR is the intended
    boundary combine) lands every stream at its cumsum offset.
    """
    B, N = nal.shape
    if N % 4:
        nal = jnp.pad(nal, ((0, 0), (0, (-N) % 4)))
        N = nal.shape[1]
    from ..ops.bitpack_flat import _flat_or_move
    lens = nal_len.astype(jnp.int32)
    off_ex = jnp.cumsum(lens, dtype=jnp.int32) - lens   # exclusive
    total = off_ex[-1] + lens[-1]

    # Mask beyond each stream's length (the OR combine needs zero tails;
    # emit paths already guarantee this — the mask makes it caller-proof).
    byte_idx = jnp.arange(N, dtype=jnp.int32)[None, :]
    b8 = jnp.where(byte_idx < lens[:, None], nal, 0).astype(jnp.uint32)

    # Big-endian words per session.
    w = ((b8[:, 0::4] << 24) | (b8[:, 1::4] << 16)
         | (b8[:, 2::4] << 8) | b8[:, 3::4])           # [B, N//4]
    nw = N // 4

    # Per-session byte funnel to the output's sub-word phase.
    s_b = (off_ex & 3).astype(jnp.uint32)[:, None]
    prev = jnp.pad(w, ((0, 0), (1, 0)))[:, :nw]
    sh = s_b * 8
    w = jnp.where(s_b > 0,
                  (w >> sh) | (prev << (jnp.uint32(32) - sh)), w)

    # Word-level monotone or-move over the flat [B*nw] stream: session
    # b's word k moves from flat b*nw + k to (off_ex[b] >> 2) + k.
    d = (jnp.arange(B, dtype=jnp.int32) * nw
         - (off_ex >> 2))[:, None] + jnp.zeros((1, nw), jnp.int32)
    flat = B * nw
    pad = (-flat) % 128
    wf = jnp.pad(w.reshape(-1), (0, pad)).reshape(-1, 128)
    df = jnp.pad(d.reshape(-1), (0, pad)).reshape(-1, 128)
    out_w = _flat_or_move(wf, df, flat - 1).reshape(-1)

    cap_w = -(-cap // 4)
    if cap_w > flat + pad:
        out_w = jnp.pad(out_w, (0, cap_w - flat - pad))
    out_w = out_w[:cap_w]
    packed = jnp.stack(
        [(out_w >> 24) & 0xFF, (out_w >> 16) & 0xFF,
         (out_w >> 8) & 0xFF, out_w & 0xFF],
        axis=1).reshape(-1)[:cap].astype(jnp.uint8)
    pos = jnp.arange(cap, dtype=jnp.int32)
    packed = jnp.where(pos < total, packed, 0)
    return packed, total, total > jnp.int32(cap)
