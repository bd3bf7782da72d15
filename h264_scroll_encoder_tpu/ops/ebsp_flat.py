"""Flat-form emulation prevention + Annex-B framing (Pallas-ready).

Same closed-form insertion rule as ops/ebsp.rbsp_to_ebsp_tree's bounded
path (see ops/ebsp.py for the derivation; reference automaton:
src/nal.c:24-50), but formulated entirely over a flat row-major [R, 128]
working set of elementwise ops + static flat rolls, so the whole
RBSP -> framed NAL transform runs inside ONE Pallas program with every
intermediate VMEM-resident:

  windowed zero-run  ->  insertion mask  ->  flat cumsum (shift counts)
  ->  monotone right-expansion by (5 + shifts) lanes  ->  0x03 hole
  fill  ->  start-code + NAL-header framing  ->  valid-length mask

The +5 uniform framing offset folds the Annex-B prefix placement into
the same monotone move (shifts stay non-decreasing, so the expansion's
no-collision argument from ops/bitpack.monotone_expand is unchanged),
eliminating the two dynamic_update_slice passes of the XLA back end.

Measured on v5e (scripts/ebsp_stage_probe.py, batch 256): the Mosaic
kernel LOSES to the shipped XLA bounded composition at the production
serving budget (1.4-2.0 vs 0.93 ms per step at n_nal=8956) and only
reaches parity at the conservative 24 KB budget — the stage is not
HBM-bound like the place packer's was: the XLA path runs its byte
passes on uint8 lanes while this body is int32 throughout (4x the VPU
traffic), which outweighs VMEM residency.  NOT on the production path;
kept (with its differential tests) as the foothold for a 4-bytes-per-
lane SWAR reformulation, which is what a winning Pallas EBSP needs.
The probe run that mattered instead surfaced the cheap win: dropping
config.MAX_EBSP_INSERTIONS 128 -> 16 cut the XLA stage 1.11 -> 0.93 ms.

Semantics are bit-identical to the XLA bounded path for in-contract
streams (total insertions <= max_insertions), including the
ZERO_RUN_WINDOW saturation contract: streams whose zero runs outrun the
window report a total-insertions count above max_insertions, forcing
the caller's exact-path retry (ComposerSession already does).  The
reported insertion count always matches the XLA path; payload bytes of
over-bound streams are unspecified (the caller must retry anyway).

Differentially tested against the shipped ops/ebsp tree path in
tests/test_ebsp_flat.py (pure-jnp body and interpret-mode Pallas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .bitpack_flat import _flat_exclusive_cumsum, _flat_roll
from .ebsp import ZERO_RUN_WINDOW

# Sentinel for "no nonzero byte found in window" (plain int so the
# Pallas kernel body closes over no traced constants).
_INF = 1 << 20


def _ebsp_nal_body(bt, aux, max_ins: int):
    """RBSP bytes -> framed NAL bytes over flat [R, 128] int32 arrays.

    bt:  int32[R, 128] byte values (flat row-major payload, zero-padded).
    aux: int32[1, 128]; lane 0 = valid payload length n, lane 1 = the
         NAL header byte.  Kept as [1, 1] slices and used only through
         broadcasts so the body never materializes a scalar load.
    Returns (out int32[R, 128] framed NAL bytes, tot int32[1, 128] with
    the total insertion count — saturation-bumped past max_ins exactly
    like ops/ebsp._zero_run_windowed — broadcast to every lane).
    """
    rows, cols = bt.shape
    n = aux[:, 0:1]
    hb = aux[:, 1:2]
    idx = (jax.lax.broadcasted_iota(jnp.int32, bt.shape, 0) * cols
           + jax.lax.broadcasted_iota(jnp.int32, bt.shape, 1))
    valid = idx < n
    b = jnp.where(valid, bt, 0)

    # Windowed zero-run tracker (distance to nearest nonzero byte within
    # ZERO_RUN_WINDOW back); log-step min-plus over flat rolls.
    def shifted(a, s):
        return jnp.where(idx < s, _INF, _flat_roll(a, s))

    nz1 = jnp.where(valid & (b != 0), 1, _INF).astype(jnp.int32)
    acc = shifted(nz1, 1)
    w = 1
    while w < ZERO_RUN_WINDOW:
        stepped = shifted(acc, w)
        acc = jnp.minimum(acc, jnp.where(stepped >= _INF, _INF,
                                         stepped + jnp.int32(w)))
        w *= 2
    found = acc < _INF
    # Unresolved positions mirror _zero_run_windowed exactly (min(idx,
    # 255) stand-in + saturation flag) so the insertion mask — and the
    # reported count — stay identical to the XLA bounded path even on
    # window-saturating streams.
    t = jnp.where(found, acc - 1, jnp.minimum(idx, 255))
    saturated = valid & ~found & (idx > ZERO_RUN_WINDOW)

    ins = valid & (b <= 3) & (t >= 2) & (t % 2 == 0)
    ins_i = ins.astype(jnp.int32)
    shifts = _flat_exclusive_cumsum(ins_i) + ins_i  # inclusive
    total_real = jnp.max(shifts)                    # cumsum is monotone
    sat_any = jnp.max(jnp.where(saturated, jnp.int32(1), jnp.int32(0)))
    total = total_real + sat_any * jnp.int32(max_ins + 1)

    # Monotone right-expansion by (5 + shifts): framing offset folded in.
    size = rows * cols
    vals = b
    rem = jnp.where(valid, shifts + 5, 0)
    live = valid.astype(jnp.int32)
    bound = min(max_ins + 5 + 1, size)
    for bit in reversed(range(max(1, bound).bit_length())):
        step = 1 << bit
        if step >= size:
            continue
        v_r = _flat_roll(vals, step)
        r_r = _flat_roll(rem, step)
        l_r = _flat_roll(live, step)
        take = (l_r != 0) & (r_r >= step)
        vacate = (live != 0) & (rem >= step)
        vals = jnp.where(take, v_r, vals)
        rem = jnp.where(take, r_r - step,
                        jnp.where(vacate, 0, rem))
        live = jnp.where(take, 1, jnp.where(vacate, 0, live))

    out = jnp.where(live != 0, vals, jnp.int32(3))   # holes are the 0x03s
    out = jnp.where(idx < n + total + 5, out, 0)
    out = jnp.where(idx < 4, jnp.where(idx == 3, 1, 0), out)
    out = jnp.where(idx == 4, hb, out)
    tot = jnp.broadcast_to(total.reshape(1, 1), (1, cols))
    return out, tot


def _prep_inputs(rbsp_bytes, rbsp_len, header_byte, n_nal: int):
    p128 = -(-n_nal // 128) * 128
    b = jnp.asarray(rbsp_bytes, jnp.uint8).reshape(-1)
    if b.shape[0] < p128:
        b = jnp.pad(b, (0, p128 - b.shape[0]))
    else:
        b = b[:p128]
    bt = b.astype(jnp.int32).reshape(-1, 128)
    aux = jnp.zeros((1, 128), jnp.int32)
    aux = aux.at[0, 0].set(jnp.asarray(rbsp_len, jnp.int32))
    aux = aux.at[0, 1].set(jnp.asarray(header_byte, jnp.int32))
    return bt, aux, p128


@functools.partial(jax.jit, static_argnums=(3, 4))
def rbsp_to_nal_flat(rbsp_bytes, rbsp_len, header_byte, n_nal: int,
                     max_insertions: int):
    """Pure-jnp flat EBSP+framing (differential reference for the Pallas
    wrapper).  Returns (nal uint8[n_nal], total_insertions int32)."""
    bt, aux, p128 = _prep_inputs(rbsp_bytes, rbsp_len, header_byte, n_nal)
    out, tot = _ebsp_nal_body(bt, aux, max_insertions)
    nal = out.astype(jnp.uint8).reshape(-1)[:n_nal]
    return nal, tot[0, 0]


def _ebsp_kernel(b_ref, aux_ref, out_ref, tot_ref, *, max_ins: int):
    out, tot = _ebsp_nal_body(b_ref[:], aux_ref[:], max_ins)
    out_ref[:] = out.astype(jnp.uint8)
    tot_ref[:] = tot


@functools.partial(jax.jit, static_argnums=(3, 4))
def rbsp_to_nal_pallas(rbsp_bytes, rbsp_len, header_byte, n_nal: int,
                       max_insertions: int):
    """EBSP + Annex-B framing with every pass VMEM-resident.

    One Pallas program per (vmap'd) session holds the ~n_nal-byte
    working set in VMEM for all ~30 log-step passes; HBM traffic
    collapses to payload bytes in / framed NAL bytes out.  Off-TPU the
    wrapper runs in interpret mode (tests).

    Returns (nal uint8[n_nal] — start code + header + EBSP payload,
    zero past the valid length — and total_insertions; callers compute
    nal_len = 5 + rbsp_len + total and must retry via the exact XLA
    path when total > max_insertions, exactly as with
    ops/ebsp.rbsp_to_ebsp_tree's bounded form).
    """
    from jax.experimental import pallas as pl

    bt, aux, p128 = _prep_inputs(rbsp_bytes, rbsp_len, header_byte, n_nal)
    interpret = jax.default_backend() != "tpu"
    out, tot = pl.pallas_call(
        functools.partial(_ebsp_kernel, max_ins=max_insertions),
        out_shape=(jax.ShapeDtypeStruct((p128 // 128, 128), jnp.uint8),
                   jax.ShapeDtypeStruct((1, 128), jnp.int32)),
        interpret=interpret,
    )(bt, aux)
    nal = out.reshape(-1)[:n_nal]
    return nal, tot[0, 0]
