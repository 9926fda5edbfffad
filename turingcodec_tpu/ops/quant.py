"""Batched (de)quantization ops (spec 8.6.3; havoc/quantize.cpp parity).

All shapes (B, N, N) int32; scalar qp per batch element supported via
broadcast arrays so one jit covers mixed-QP batches.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from turingcodec_tpu.hevc.tables import LEVEL_SCALE, QUANT_SCALES

_LEVEL_SCALE = jnp.asarray(np.asarray(LEVEL_SCALE))
_QUANT_SCALES = jnp.asarray(np.asarray(QUANT_SCALES))


@functools.partial(jax.jit, static_argnames=("bit_depth", "log2_size"))
def dequant_batch(coeffs: jax.Array, qp: jax.Array, bit_depth: int,
                  log2_size: int) -> jax.Array:
    """(B, N, N) levels + (B,) qp -> (B, N, N) int32 dequantized (flat list).

    Products can reach 2^15 * 51 * 2^8 > 2^31 for high QP, so accumulate in
    int64 exactly as the oracle does, then clip to int16 range.
    """
    bd_shift = bit_depth + log2_size - 5
    ls = (_LEVEL_SCALE[qp % 6] << (qp // 6)).astype(jnp.int64)
    d = (coeffs.astype(jnp.int64) * ls[:, None, None] * 16
         + (1 << (bd_shift - 1))) >> bd_shift
    return jnp.clip(d, -32768, 32767).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("bit_depth", "log2_size"))
def quant_batch(coeffs: jax.Array, qp: jax.Array, bit_depth: int,
                log2_size: int, rounding_num: jax.Array) -> jax.Array:
    """Forward quantization (HM-style): (B, N, N) transform coeffs -> levels.

    level = sign(c) * ((|c| * f[qp%6] + round) >> shift)
    shift = 29 - 6 - bitDepth - log2 + qp//6 ... expressed per HM:
    qShift = 14 + qp//6 + TransformShift, TransformShift = 15 - bitDepth - log2.
    rounding_num: (B,) additive rounding (lambda-dependent; 1/3 intra, 1/6
    inter of (1<<qShift) typically), passed in by the encoder.
    """
    t_shift = 15 - bit_depth - log2_size
    q_shift = 14 + (qp // 6) + t_shift
    f = _QUANT_SCALES[qp % 6].astype(jnp.int64)
    a = jnp.abs(coeffs.astype(jnp.int64))
    level = (a * f[:, None, None] + rounding_num[:, None, None].astype(jnp.int64)) >> q_shift[:, None, None]
    level = jnp.clip(level, 0, 32767)
    return jnp.where(coeffs < 0, -level, level).astype(jnp.int32)


def dequant_np(coeffs, qp, bit_depth, log2_size):
    """numpy oracle (flat scaling matrix)."""
    bd_shift = bit_depth + log2_size - 5
    ls = int(LEVEL_SCALE[qp % 6]) << (qp // 6)
    d = (coeffs.astype(np.int64) * ls * 16 + (1 << (bd_shift - 1))) >> bd_shift
    return np.clip(d, -32768, 32767).astype(np.int32)
