"""RDOQ-lite: rate-distortion optimized level decisions after scalar
quantization (the light version of turing/Rdoq.cpp:35-444).

Vectorized per block: for each coefficient, choose between the rounded
level, level-1 and 0 by comparing transform-domain distortion change
against estimated rate change; then decide whole-coefficient-group zeroing.
The pixel-domain distortion scale per coefficient is the squared gain of
the inverse transform path (computed once per (log2, bit_depth, qp)).
"""
from __future__ import annotations

import functools

import numpy as np

from turingcodec_tpu.hevc.tables import LEVEL_SCALE


@functools.lru_cache(maxsize=None)
def _err_scale(log2: int, bit_depth: int) -> float:
    """Pixel-SSD per unit squared coefficient-reconstruction error.

    The inverse transform is (up to rounding) an orthogonal map with gain
    g = 2^(M_BITS) folded with the stage shifts; measure it once exactly.
    """
    from turingcodec_tpu.decode.reconstruct import inverse_transform
    n = 1 << log2
    d = np.zeros((n, n), np.int32)
    d[n // 2, n // 2] = 1024
    r = inverse_transform(d, bit_depth, False).astype(np.float64)
    return float((r ** 2).sum()) / (1024.0 ** 2)


def _level_bits(levels: np.ndarray) -> np.ndarray:
    """Approximate per-coefficient rate in bits (sig + gt flags + remaining)."""
    a = np.abs(levels.astype(np.float64))
    bits = np.where(a > 0, 1.8 + 2.0 * np.log2(a + 1.0), 0.0)
    return bits


def rdoq_levels(coeffs: np.ndarray, levels: np.ndarray, qp: int,
                log2: int, bit_depth: int, lam: float) -> np.ndarray:
    """Optimize quantized levels; returns the improved level block."""
    if not levels.any():
        return levels
    ls16 = (int(LEVEL_SCALE[qp % 6]) << (qp // 6)) * 16
    bd_shift = bit_depth + log2 - 5
    k = _err_scale(log2, bit_depth)

    def dq(lv):
        return ((lv.astype(np.int64) * ls16) + (1 << (bd_shift - 1))) >> bd_shift

    c = coeffs.astype(np.float64)
    cand = [levels]
    a = np.abs(levels)
    down = np.where(levels > 0, levels - 1, np.where(levels < 0, levels + 1,
                                                    levels))
    zero = np.zeros_like(levels)
    best = None
    for lv in (levels, down, zero):
        err = (c - dq(lv).astype(np.float64)) ** 2 * k
        cost = err + lam * _level_bits(lv)
        if best is None:
            best = (cost, lv)
        else:
            better = cost < best[0]
            best = (np.where(better, cost, best[0]),
                    np.where(better, lv, best[1]))
    out = best[1].astype(np.int32)

    # coefficient-group zeroing: drop whole 4x4 CGs whose total cost exceeds
    # the all-zero alternative
    n = 1 << log2
    for ys in range(0, n, 4):
        for xs in range(0, n, 4):
            cg = out[ys:ys + 4, xs:xs + 4]
            if not cg.any():
                continue
            cc = c[ys:ys + 4, xs:xs + 4]
            err_keep = ((cc - dq(cg).astype(np.float64)) ** 2 * k).sum() \
                + lam * (_level_bits(cg).sum() + 2.0)
            err_zero = (cc ** 2 * k).sum()
            if err_zero < err_keep:
                cg[:] = 0
    return out
