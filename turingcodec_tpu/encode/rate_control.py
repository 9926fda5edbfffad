"""Rate control: λ-domain R-λ model (CBR), the analogue of
turing/RateControl.h SequenceController/PictureController (759/494).

Model: bits-per-pixel -> λ via λ = α·bpp^β with per-temporal-level (α, β)
adapted after each coded picture; QP from λ via the HM relation
QP = 4.2005·ln λ + 13.7122, clipped for smoothness.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field


_LEVEL_WEIGHTS = {  # relative bit share per hierarchy level (gop 8-ish)
    0: 14.0, 1: 5.0, 2: 2.5, 3: 1.0,
}


@dataclass
class _Model:
    alpha: float = 3.2003
    beta: float = -1.367


def intra_complexity(y_plane, bit_depth: int = 8) -> int:
    """EstimateIntraComplexity::preAnalysis (EstimateIntraComplexity.h:27):
    per-8x8 source-pixel Hadamard 'SATD' with the DC term excluded,
    (sad+2)>>2 per block (>>2 more at 10 bit), summed over the picture.
    Feeds the intra picture bit allocation
    (SequenceController::pictureRateAllocationIntra, RateControl.cpp:905)."""
    import numpy as np
    h, w = y_plane.shape
    hb, wb = h >> 3, w >> 3
    if hb == 0 or wb == 0:
        return 0
    blocks = y_plane[:hb * 8, :wb * 8].astype(np.int64).reshape(
        hb, 8, wb, 8).transpose(0, 2, 1, 3)
    hmat = np.array([[1, 1], [1, -1]], np.int64)
    for _ in range(2):
        hmat = np.kron(hmat, np.array([[1, 1], [1, -1]], np.int64))
    t = hmat @ blocks @ hmat
    sad = np.abs(t).sum(axis=(2, 3)) - np.abs(t[:, :, 0, 0])
    sad = (sad + 2) >> 2
    if bit_depth > 8:
        sad >>= 2
    return int(sad.sum())


class SequenceRateController:
    def __init__(self, target_bps: float, frame_rate: float,
                 width: int, height: int, base_qp: int = 32,
                 level_mix=None):
        self.target_bpp = target_bps / (frame_rate * width * height)
        self.pixels = width * height
        self.models = {lvl: _Model() for lvl in range(5)}
        self.intra_model = _Model(alpha=6.7542, beta=-1.7860)
        self.buffer_debt = 0.0   # bits over/under budget so far
        self.base_qp = base_qp
        self.last_qp = base_qp
        self.frames_coded = 0
        # normalize weights over the actual temporal-level mix of the GOP
        mix = level_mix or {0: 1}
        total = sum(mix.values())
        self.weight_avg = sum(
            _LEVEL_WEIGHTS.get(l, 1.0) * c for l, c in mix.items()) / total

    # ------------------------------------------------------------------
    def pre_picture(self, is_intra: bool, temporal_id: int,
                    intra_cost: int = 0) -> tuple:
        """Returns (qp, lambda, target_bits) for the next picture.

        intra_cost: the EstimateIntraComplexity SATD sum — when given for
        an intra picture, its allocation follows the reference's
        complexity-scaled formula (pictureRateAllocationIntra,
        RateControl.cpp:905-935: bits = a*(cost*4/avg)^0.5582*avg)
        instead of the fixed 4x weight."""
        w = 4.0 if is_intra else _LEVEL_WEIGHTS.get(temporal_id, 1.0)
        target_bpp = self.target_bpp * w / self.weight_avg
        if is_intra and intra_cost > 0:
            avg_bits = max(self.target_bpp * self.pixels, 200.0)
            a = 0.25 if avg_bits * 40 < self.pixels else 0.30
            bits = a * ((intra_cost * 4.0 / avg_bits) ** 0.5582) * avg_bits
            target_bpp = bits / self.pixels
        # spend the budget debt over the next second of frames
        target_bpp -= self.buffer_debt / (self.pixels * 32.0)
        target_bpp = max(target_bpp,
                         0.25 * self.target_bpp * w / self.weight_avg)
        model = self.intra_model if is_intra else self.models[min(temporal_id, 4)]
        lam = model.alpha * (target_bpp ** model.beta)
        lam = min(max(lam, 0.1), 10000.0)
        qp = int(round(4.2005 * math.log(lam) + 13.7122))
        qp = min(max(qp, self.last_qp - 3), self.last_qp + 3)
        qp = min(max(qp, 1), 51)
        self._cur = (model, target_bpp, lam, qp)
        return qp, lam, target_bpp * self.pixels

    def post_picture(self, actual_bits: int):
        model, target_bpp, lam_used, qp = self._cur
        bpp_real = max(actual_bits / self.pixels, 1e-6)
        # adapt alpha/beta towards observed (bpp, lambda)
        ln_err = math.log(lam_used) - math.log(
            max(model.alpha * (bpp_real ** model.beta), 1e-9))
        model.alpha *= math.exp(min(max(0.10 * ln_err, -0.5), 0.5))
        model.alpha = min(max(model.alpha, 0.05), 500.0)
        model.beta += min(max(0.05 * ln_err * math.log(bpp_real), -0.2), 0.2)
        model.beta = min(max(model.beta, -3.0), -0.1)
        self.buffer_debt += actual_bits - target_bpp * self.pixels
        self.last_qp = qp
        self.frames_coded += 1
