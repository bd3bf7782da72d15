"""h264_scroll_encoder_tpu — TPU-native UI-aware hybrid H.264 composer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the C
reference `wreuven/h264-scroll-encoder` (see SURVEY.md): it composes valid
Baseline/CAVLC H.264 bitstreams at the *bitstream* level — scrolling UI
regions become motion-vector-only P_L0_16x16 / P_Skip macroblocks referencing
long-term reference-picture atlases, small dynamic regions are spliced in from
a donor encoder's pre-encoded CAVLC macroblocks.

Layer map (TPU-first redesign of reference layers L0..L5, SURVEY.md §1):

  ops/       — compute primitives: closed-form Exp-Golomb, the parallel
               prefix-sum bitstream packer (replaces the reference's
               bit-at-a-time BitWriter, src/bitwriter.c), vectorized
               RBSP<->EBSP emulation prevention (src/nal.c, src/nal_parser.c),
               CAVLC tables/kernels (experiments/trans-resizer).
  syntax/    — H.264 syntax as symbol streams: SPS/PPS templates, slice
               headers incl. MMCO/waypoint variants (src/h264_writer.c),
               host-side parsers (src/nal_parser.c).
  models/    — frame families: the flagship vectorized scroll compose kernel,
               I_PCM frame generators, donor IDR rewriting, dynamic-rect
               CAVLC splice.
  parallel/  — session batching over jax.sharding.Mesh (vmap/shard_map);
               the reference is single-threaded C, so the honest first-class
               parallel axis is data-parallel over UI sessions (SURVEY §2.4).
  session.py — Composer session API (mirrors include/composer.h).
  cli.py     — CLI with the reference's surface (src/main.c).
"""

__version__ = "0.1.0"

from .config import ComposerConfig, MAX_WAYPOINTS, MV_LIMIT_PX  # noqa: F401
