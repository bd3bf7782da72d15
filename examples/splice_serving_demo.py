#!/usr/bin/env python
"""Batched dynamic-rect splice serving (BASELINE 'dynamic-rect splice').

Division of labor per frame:
  host: parse the donor slice (native C++ CAVLC engine) and flatten it to
        device symbol arrays (tail chunks + token metadata);
  device: nC repair in the composite geometry, coeff_token re-encode,
        frame assembly, pack, emulation prevention — batched over
        sessions with one vmapped kernel.

Run: JAX_PLATFORMS=cpu python examples/splice_serving_demo.py  (or on TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from h264_scroll_encoder_tpu.utils import jaxcache
    jaxcache.enable()

    import jax.numpy as jnp

    from h264_scroll_encoder_tpu.config import ComposerConfig, MAX_WAYPOINTS
    from h264_scroll_encoder_tpu.models import mb_transcode as mbt
    from h264_scroll_encoder_tpu.models import splice_device
    from h264_scroll_encoder_tpu.parallel import batch
    from h264_scroll_encoder_tpu.syntax.slice_headers import (
        p_slice_header_symbols)
    from h264_scroll_encoder_tpu.utils import fixtures

    cfg = ComposerConfig(1280, 720)
    R = C = 12                      # 192x192 donor rect
    r0, c0 = 10, 30
    B = 8

    # Donor macroblocks (synthetic here; a real deployment feeds the
    # dynamic encoder's output through the native parser each frame).
    rng = np.random.default_rng(1)
    donor = fixtures.random_p_slice_grid(rng, C, R, 1)
    for row in donor:
        for i, mb in enumerate(row):
            if mb is not mbt.SKIP and mb.kind == "ipcm":
                row[i] = fixtures.random_inter_mb(rng, 1)

    # Serving-shaped ingest: the per-frame donor arrives as CAVLC slice
    # payload bytes; the native C++ engine parses it and resolves
    # composite nC/tokens, pre-packs dense chunks, and decodes exact
    # composite edge motion (~1-3 ms/donor; no hint-placement
    # restrictions — role-based prediction is exact).
    from h264_scroll_encoder_tpu.ops.bitio import BitWriter
    bw = BitWriter()
    mbt.emit_p_slice_mbs(bw, donor, 1)
    bw.write_trailing_bits()
    payload = bw.getvalue()
    t0 = time.perf_counter()
    dd = splice_device.prepare_donor_dense_from_slice(
        payload, 0, C, R, 1, 2)
    dr = splice_device.pack_donor_rows(dd, R, C)
    t_prep = time.perf_counter() - t0
    # (First jnp transfer pays backend init; not part of per-donor prep.)
    dn = splice_device.rows_device_arrays(dr)

    H, W = cfg.mb_height, cfg.mb_width
    zero = jnp.zeros((H, W), jnp.int32)
    bg_coded = jnp.zeros((H, W), bool)
    hp, hn = p_slice_header_symbols(
        cfg, jnp.int32(3), jnp.int32(6), is_reference=False,
        long_term_idx=-1, num_waypoints=jnp.int32(0),
        wp_long_term_idx=jnp.zeros(MAX_WAYPOINTS, jnp.int32),
        wp_valid=jnp.zeros(MAX_WAYPOINTS, bool))

    step = batch.make_batched_splice_step_rows(
        cfg, c0, r0, C, R,
        num_refs=2, has_align=dr.has_align,
        n_rbsp=splice_device.splice_rbsp_budget(cfg, R * C, dr.donor_bits))
    bcast = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
    args = (bcast(hp), bcast(hn), bcast(zero), bcast(zero), bcast(zero),
            bcast(bg_coded), {k: bcast(v) for k, v in dn.items()})

    nal, nal_len, bits, ovf = step(*args)
    assert not bool(ovf.any())
    t1 = time.perf_counter()
    nal, nal_len, bits, ovf = step(*args)
    sizes = np.asarray(nal_len)
    dt = time.perf_counter() - t1
    print(f"host donor prep: {t_prep*1000:.1f} ms; device splice step of "
          f"{B} sessions: {dt*1000:.1f} ms; NAL sizes {sizes.tolist()}")

    # Verify one composed frame with the native oracle.
    from h264_scroll_encoder_tpu.verify import verify_stream
    from h264_scroll_encoder_tpu.session import ComposerSession

    s = ComposerSession(cfg)
    s.write_parameter_sets()
    s.write_test_atlases(striped=True)
    s.frame_num = 3
    s.writer.append_raw(np.asarray(nal[0])[: int(nal_len[0])].tobytes())
    rep = verify_stream(s.getvalue())
    assert rep.ok, rep.errors
    print("spliced stream verifies OK")


if __name__ == "__main__":
    main()
