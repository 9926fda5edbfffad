"""Shot-change detection (turing/SCDetection.h:44 analogue, simplified).

Block-variance likelihood over consecutive frames: a shot change is flagged
when the mean absolute frame difference jumps well above its running level.
The planner places an IDR at flagged inputs (InputQueue.cpp:132-153 parity).
"""
from __future__ import annotations

import numpy as np


class ShotChangeDetector:
    def __init__(self, threshold: float = 3.0, min_diff: float = 12.0):
        self.prev = None
        self.level = None
        self.threshold = threshold
        self.min_diff = min_diff

    def push(self, luma: np.ndarray) -> bool:
        """Returns True if this frame starts a new shot."""
        cur = luma.astype(np.int32)
        if self.prev is None:
            self.prev = cur
            return False
        # mean abs diff on a 4x-subsampled grid (cheap)
        d = float(np.abs(cur[::4, ::4] - self.prev[::4, ::4]).mean())
        self.prev = cur
        if self.level is None:
            self.level = d
            return False
        is_cut = d > self.min_diff and d > self.threshold * max(self.level, 1.0)
        self.level = 0.8 * self.level + 0.2 * d
        return is_cut
