"""Adaptive quantization: TM5-style activity-based per-CTB dQP
(turing/AdaptiveQuantisation.h:101 analogue).

dQP(ctb) = clip(strength * (log2 act(ctb) - log2 avg_act), +-max_range),
activity = 1 + min variance over the CTB's 8x8 sub-blocks (computed on the
source picture, vectorized).
"""
from __future__ import annotations

import numpy as np


def compute_aq_map(luma: np.ndarray, ctb_log2: int, strength: float,
                   max_range: int = 6) -> np.ndarray:
    h, w = luma.shape
    ctb = 1 << ctb_log2
    hc = -(-h // ctb)
    wc = -(-w // ctb)
    # pad to CTB multiple
    pad = np.pad(luma.astype(np.float64),
                 ((0, hc * ctb - h), (0, wc * ctb - w)), mode="edge")
    # 8x8 block variances
    b = pad.reshape(hc * ctb // 8, 8, wc * ctb // 8, 8).transpose(0, 2, 1, 3)
    v = b.var(axis=(2, 3)) + 1.0
    k = ctb // 8
    v_ctb = v.reshape(hc, k, wc, k).transpose(0, 2, 1, 3).min(axis=(2, 3))
    act = np.log2(v_ctb)
    avg = act.mean()
    dqp = np.clip(np.round(strength * (act - avg)), -max_range, max_range)
    return dqp.astype(np.int32)
