"""Pallas kernel parity tests (interpret mode; TPU execution verified
separately — both kernels are bit-exact on hardware)."""
import numpy as np
import pytest

from turingcodec_tpu.hevc.tables import LEVEL_SCALE
from turingcodec_tpu.ops.pallas_kernels import (
    fused_dequant_idct_add,
    fused_dequant_idct_add_np,
    sad_grid,
    sad_grid_np,
)

rng = np.random.default_rng(3)


@pytest.mark.parametrize("n", [8, 16, 32])
def test_fused_dequant_idct_add(n):
    b = 5
    lv = rng.integers(-300, 300, (b, n, n)).astype(np.int32)
    pr = rng.integers(0, 256, (b, n, n)).astype(np.int32)
    qp = np.full(b, 31, np.int32)
    log2 = int(np.log2(n))
    ls16 = (LEVEL_SCALE[qp % 6] * 16).astype(np.int32)
    shift = (8 + log2 - 5 - qp // 6).astype(np.int32)
    got = np.asarray(fused_dequant_idct_add(lv, pr, ls16, shift, 8, False,
                                            interpret=True))
    want = fused_dequant_idct_add_np(lv, pr, qp, 8, False)
    np.testing.assert_array_equal(got, want)


def test_sad_grid():
    o = rng.integers(0, 256, (16, 16)).astype(np.int32)
    win = rng.integers(0, 256, (24, 24)).astype(np.int32)
    got = np.asarray(sad_grid(o, win, interpret=True))
    np.testing.assert_array_equal(got, sad_grid_np(o, win))
