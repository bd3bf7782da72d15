"""Closed-form Exp-Golomb coding as (value, nbits) symbol pairs.

The reference writes Exp-Golomb one bit at a time
(bitwriter_write_ue src/bitwriter.c:50-74, write_se :91-101). On TPU we
instead compute, fully vectorized, the *pattern* and *bit length* of each
codeword and feed them to the parallel bitstream packer (ops/bitpack.py).

ue(v) codeword = [M zeros][1][INFO], M = floor(log2(v+1)), INFO = v+1-2^M in
M bits.  Writing the (M+1+M)-bit value (v+1) reproduces this exactly: v+1 has
bit length M+1, so the top M bits of the 2M+1-wide field are zero.

se(v) maps v>0 -> 2v-1, v<=0 -> -2v, then ue (src/bitwriter.c:91-101).

te(v) (truncated Exp-Golomb for ref_idx, H.264 9.1.1): with x=1 possible
value it is the single inverted bit, otherwise ue(v)
(write_p16x16_mb src/h264_writer.c:434-453).

All functions return (pattern:uint32, nbits:int32) arrays and are usable
under jit / vmap on any shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _ilog2(x):
    """floor(log2(x)) for x >= 1, exact integer arithmetic (no float)."""
    x = x.astype(jnp.uint32)
    return (31 - jax.lax.clz(x)).astype(jnp.int32)


def ue(v):
    """Unsigned Exp-Golomb: returns (pattern, nbits).

    pattern = v+1, nbits = 2*floor(log2(v+1)) + 1.
    """
    v = jnp.asarray(v, jnp.uint32)
    vp1 = v + jnp.uint32(1)
    m = _ilog2(vp1)
    return vp1, 2 * m + 1


def se_mapped(v):
    """Map signed value to the unsigned Exp-Golomb domain.

    v > 0 -> 2v-1; v <= 0 -> -2v  (src/bitwriter.c:91-101).
    """
    v = jnp.asarray(v, jnp.int32)
    return jnp.where(v > 0, 2 * v - 1, -2 * v).astype(jnp.uint32)


def se(v):
    """Signed Exp-Golomb: returns (pattern, nbits)."""
    return ue(se_mapped(v))


def te(v, num_values):
    """Truncated Exp-Golomb for ref_idx given `num_values` possible values.

    num_values == 1: zero bits; == 2: one inverted bit; > 2: ue(v).
    Branchless so `num_values` may be a traced scalar.
    """
    v = jnp.asarray(v, jnp.uint32)
    num_values = jnp.asarray(num_values, jnp.int32)
    ue_pat, ue_n = ue(v)
    one_bit_pat = (jnp.uint32(1) - (v & jnp.uint32(1)))
    pat = jnp.where(num_values <= 2, one_bit_pat, ue_pat)
    nbits = jnp.where(
        num_values <= 1, 0, jnp.where(num_values == 2, 1, ue_n))
    return pat, nbits


def ue_bit_length(v):
    """Bit length of ue(v) without the pattern (for size estimation)."""
    v = jnp.asarray(v, jnp.uint32)
    return 2 * _ilog2(v + jnp.uint32(1)) + 1
