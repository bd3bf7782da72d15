"""Op-level XLA profile of the representative rows-splice serving step.

Captures a device trace of the batch-256 rep step (the bench
methodology's scan) and prints the top device ops by total time, so
symbols-stage optimization is directed by measurement instead of HLO
guesswork.  Requires the axon/TPU runtime to export trace events
(falls back with a clear message if the xspace has no device lines).

Run: python scripts/step_xprof.py [batch]
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from h264_scroll_encoder_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from h264_scroll_encoder_tpu.config import MAX_WAYPOINTS, ComposerConfig
from h264_scroll_encoder_tpu.models import mb_transcode as mbt
from h264_scroll_encoder_tpu.models import splice_device
from h264_scroll_encoder_tpu.ops.bitio import BitWriter
from h264_scroll_encoder_tpu.parallel import batch as batch_mod
from h264_scroll_encoder_tpu.syntax.slice_headers import p_slice_header_symbols
from h264_scroll_encoder_tpu.utils import fixtures

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 256
STEPS = 8
REPS = 4


def main():
    cfg = ComposerConfig(1280, 720)
    rng = np.random.default_rng(7)
    R = C = 23
    r0, c0 = 10, 30
    donor = fixtures.representative_donor_grid(rng, C, R)
    bw = BitWriter()
    mbt.emit_p_slice_mbs(bw, donor, 1)
    bw.write_trailing_bits()
    dd = splice_device.prepare_donor_dense_from_slice(
        bw.getvalue(), 0, C, R, 1, 2)
    dr = splice_device.pack_donor_rows(dd, R, C)
    dn = splice_device.rows_device_arrays(dr)

    H, W = cfg.mb_height, cfg.mb_width
    zero = jnp.zeros((H, W), jnp.int32)
    bg_coded = jnp.zeros((H, W), bool)
    hp, hn = p_slice_header_symbols(
        cfg, jnp.int32(3), jnp.int32(6), is_reference=False,
        long_term_idx=-1, num_waypoints=jnp.int32(0),
        wp_long_term_idx=jnp.zeros(MAX_WAYPOINTS, jnp.int32),
        wp_valid=jnp.zeros(MAX_WAYPOINTS, bool))
    n_rbsp = splice_device.splice_rows_rbsp_budget(
        cfg, R * C, R, dr.donor_bits, bg_bits_per_mb=4)
    step = batch_mod.make_batched_splice_step_rows(
        cfg, c0, r0, C, R, num_refs=2, has_align=dr.has_align,
        compact_x=True, n_rbsp=n_rbsp)
    bcast = lambda x: jnp.broadcast_to(x, (BATCH,) + x.shape)
    args = (bcast(hp), bcast(hn), bcast(zero), bcast(zero), bcast(zero),
            bcast(bg_coded), {k: bcast(v) for k, v in dn.items()})

    def scan_fn(a):
        hp0, hn0, bg_r, bg_x, bg_y, bg_c, dn0 = a

        def body(carry, _):
            bit = carry % 2
            hp_i = hp0.at[:, 0].set(hp0[:, 0] ^ bit)
            dn_i = dict(dn0)
            dn_i["row_patterns"] = dn0["row_patterns"] ^ bit
            nal, nlen, _, _ = step(hp_i, hn0, bg_r, bg_x, bg_y, bg_c,
                                   dn_i)
            return (carry + nal.astype(jnp.uint32).sum()
                    + nlen.sum(dtype=jnp.uint32)), None

        out, _ = jax.lax.scan(body, jnp.uint32(0), None, length=STEPS)
        return out

    scan = jax.jit(scan_fn)
    _ = int(scan(args))
    print("warmed; tracing...", flush=True)

    tdir = "/tmp/xprof_step"
    os.makedirs(tdir, exist_ok=True)
    with jax.profiler.trace(tdir):
        acc = None
        for _ in range(REPS):
            chk = scan(args)
            acc = chk if acc is None else acc + chk
        _ = int(acc)

    print("trace done; parsing...", flush=True)
    files = sorted(glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        print("no xplane captured")
        return
    pd = jax.profiler.ProfileData.from_file(files[-1])
    tot = defaultdict(float)
    cnt = defaultdict(int)
    device_total = 0.0
    for plane in pd.planes:
        if "TPU" not in plane.name and "Device" not in plane.name \
                and "device" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns / 1e3  # us
                name = ev.name
                tot[name] += dur
                cnt[name] += 1
                device_total += dur
    n_steps = REPS * STEPS
    print(f"planes: {[p.name for p in pd.planes]}")
    print(f"device total {device_total/1e3:.3f} ms over {n_steps} steps "
          f"= {device_total/1e3/n_steps:.4f} ms/step (batch {BATCH})")
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
    for name, us in rows:
        print(f"  {us/n_steps:9.2f} us/step  x{cnt[name]//n_steps:<4d} "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
