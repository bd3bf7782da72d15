"""XLA cost analysis + HLO shape census of the rep rows-splice step.

Prints bytes-accessed / flops from compiled.cost_analysis() for the
batch-256 representative serving step, plus the largest HLO buffers, to
bound the symbols stage's HBM-traffic share against the measured step.

Run: python scripts/step_cost.py [batch]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

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

    lowered = jax.jit(lambda *a: step(*a)).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    keys = ["bytes accessed", "flops", "transcendentals",
            "utilization operand 0 {}", "optimal_seconds"]
    for k in sorted(ca):
        if "bytes" in k or k in ("flops", "optimal_seconds"):
            v = ca[k]
            if isinstance(v, float) and v > 1e4:
                print(f"  {k:28s} {v/1e6:12.2f} MB")
            else:
                print(f"  {k:28s} {v}")
    hbm_gbps = 819.0
    ba = ca.get("bytes accessed", float("nan"))
    print(f"HBM-SoL for bytes-accessed: {ba/ (hbm_gbps*1e9) * 1e3:.3f} ms")

    txt = compiled.as_text()
    # census of fusion output shapes (rough view of materialized buffers)
    shapes = Counter()
    for m in re.finditer(r"^\s*ROOT?\s?.*?=\s([a-z0-9]+)\[([0-9,]*)\]",
                         txt, re.M):
        pass
    fus = re.findall(r"fusion(?:\.\d+)?\s*=\s*\(?([^)=]*)\)?\s*fusion",
                     txt)
    n_fusions = txt.count(" fusion(")
    n_custom = txt.count("custom-call")
    n_while = txt.count(" while(")
    print(f"fusions={n_fusions} custom_calls={n_custom} whiles={n_while}")
    print(f"hlo lines={len(txt.splitlines())}")


if __name__ == "__main__":
    main()
