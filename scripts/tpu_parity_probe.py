"""On-hardware parity probe (run on a real TPU; takes ~5 min of compiles
on a cold cache).

Checks, on chip:
  1. the full splice emit with the Pallas place packer is byte-identical
     to the XLA-packer branch on representative + dense donors;
  2. the static-chrome program (bg_static_skip) emits the same bytes;
  3. pack race at the production shapes (scroll 2-slot + splice rep):
     Pallas place vs the XLA merge tree, printed.

The CPU test suite covers the XLA branches; this probe is the on-silicon
check of the Mosaic kernel that `python -m pytest` (forced-CPU) cannot
reach.  Companion check: run the test-mode CLI on the TPU backend and
`cmp` against the C reference binary (see .claude/skills/verify)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from h264_scroll_encoder_tpu.utils import jaxcache
jaxcache.enable()

import jax
import jax.numpy as jnp

from h264_scroll_encoder_tpu.config import ComposerConfig, MAX_WAYPOINTS
from h264_scroll_encoder_tpu.models import mb_transcode as mbt
from h264_scroll_encoder_tpu.models import splice_device as sd
from h264_scroll_encoder_tpu.ops.bitio import BitWriter
from h264_scroll_encoder_tpu.syntax.slice_headers import p_slice_header_symbols
from h264_scroll_encoder_tpu.utils import fixtures

cfg = ComposerConfig(1280, 720)
H, W = cfg.mb_height, cfg.mb_width
zero = jnp.zeros((H, W), jnp.int32)
bg_coded = jnp.zeros((H, W), bool)
hp, hn = p_slice_header_symbols(
    cfg, jnp.int32(3), jnp.int32(6), is_reference=False,
    long_term_idx=-1, num_waypoints=jnp.int32(0),
    wp_long_term_idx=jnp.zeros(MAX_WAYPOINTS, jnp.int32),
    wp_valid=jnp.zeros(MAX_WAYPOINTS, bool))

rng = np.random.default_rng(7)
for family, fab in [("rep", fixtures.representative_donor_grid),
                    ("dense", fixtures.dense_donor_grid)]:
    donor = fab(rng, 23, 23)
    bw = BitWriter()
    mbt.emit_p_slice_mbs(bw, donor, 1)
    bw.write_trailing_bits()
    dd = sd.prepare_donor_dense_from_slice(bw.getvalue(), 0, 23, 23, 1, 2)
    dr = sd.pack_donor_rows(dd, 23, 23)
    dn = sd.rows_device_arrays(dr)
    budget = sd.splice_rbsp_budget(cfg, 529, dr.donor_bits,
                                   bg_bits_per_mb=16)
    kw = dict(has_align=dr.has_align, n_rbsp=budget)

    def emit(static_bg=False):
        f = jax.jit(lambda: sd.emit_spliced_frame_rows(
            cfg, 30, 10, 23, 23, 2, hp, hn, zero, zero, zero, bg_coded,
            dn, bg_static_skip=static_bg, **kw))
        nal, nlen, bits, ovf = f()
        assert not bool(np.asarray(ovf)), family
        ln = int(nlen)
        return np.asarray(nal)[:ln]

    a = emit()
    g = emit(static_bg=True)
    real_backend = jax.default_backend
    jax.default_backend = lambda: "cpu"          # force the XLA branch
    try:
        b = emit()
    finally:
        jax.default_backend = real_backend
    assert np.array_equal(a, b), f"{family}: pallas != xla branch"
    assert np.array_equal(g, a), f"{family}: static-chrome mismatch"
    print(f"{family}: pallas==xla byte-identical ({len(a)} B); "
          "static-chrome identical")

# Scroll-shape pack race: tree (shipped) vs pallas place.
from h264_scroll_encoder_tpu.ops import bitpack, bitpack_flat

for n_sym, n_rbsp, tag in [(7250, 3712, "scroll-2slot"),
                           (8483, 5960, "splice-rep")]:
    r2 = np.random.default_rng(1)
    nb = r2.integers(0, 9, size=n_sym).astype(np.int32)
    pat = (r2.integers(0, 2 ** 31, size=n_sym).astype(np.uint32)
           & ((1 << np.clip(nb, 0, 31)) - 1).astype(np.uint32))
    pat_b = jnp.asarray(np.broadcast_to(pat, (256, n_sym)))
    nb_b = jnp.asarray(np.broadcast_to(nb, (256, n_sym)))

    def timed(fn):
        def scan_fn(p, n):
            def body(carry, _):
                p0 = p.at[:, 0].set(p[:, 0] ^ (carry % 2))
                return carry + fn(p0, n), None
            out, _ = jax.lax.scan(body, jnp.uint32(0), None, length=8)
            return out
        scan = jax.jit(scan_fn)
        _ = int(scan(pat_b, nb_b))
        best = None
        for _b in range(3):
            t0 = time.perf_counter()
            acc = None
            for _ in range(10):
                chk = scan(pat_b, nb_b)
                acc = chk if acc is None else acc + chk
            _ = int(acc)
            dt = (time.perf_counter() - t0) / 80
            best = dt if best is None else min(best, dt)
        return best * 1000.0

    def mk(packer, words=False):
        def one(pp, nn):
            if words:
                w, t = packer(pp, nn, n_rbsp // 4)
                r = bitpack.words_to_bytes(w)
            else:
                r, t = packer(pp, nn, n_rbsp)
            return r.astype(jnp.uint32).sum() + t.astype(jnp.uint32)
        return lambda p, n: jax.vmap(one)(p, n).sum(dtype=jnp.uint32)

    t_tree = timed(mk(bitpack.pack_bytes_tree))
    t_pl = timed(mk(bitpack_flat.pack_words_place_pallas, words=True))
    print(f"{tag}: tree {t_tree:.3f} ms  pallas-place {t_pl:.3f} ms")
