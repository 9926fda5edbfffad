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


def test_dense_me_argmin_matches_scan_formulation():
    """The production dense-ME Pallas kernel must equal the host/XLA
    selection rule: argmin (sad<<2)+|ox|+|oy| in (oy, ox) scan order."""
    from turingcodec_tpu.ops.pallas_kernels import dense_me_argmin
    b = 7
    cur = rng.integers(0, 256, (b, 16, 16)).astype(np.int32)
    pat = rng.integers(0, 256, (b, 32, 32)).astype(np.int32)
    # plant exact matches at known offsets to exercise tie-breaks
    pat[0, 8:24, 8:24] = cur[0]          # offset (0, 0)
    pat[1, 0:16, 0:16] = cur[1]          # offset (-8, -8)
    pat[2, 16:32, 13:29] = cur[2]        # offset (+5, +8)
    got = np.asarray(dense_me_argmin(cur, pat, interpret=True))
    want = np.zeros((b, 3), np.int64)
    for i in range(b):
        best = None
        for oy in range(17):
            for ox in range(17):
                sad = np.abs(cur[i].astype(np.int64)
                             - pat[i, oy:oy + 16, ox:ox + 16]).sum()
                cost = (sad << 2) + abs(ox - 8) + abs(oy - 8)
                if best is None or cost < best:
                    best = cost
                    want[i] = (ox - 8, oy - 8, sad)
    np.testing.assert_array_equal(got, want)
    assert tuple(got[0]) == (0, 0, 0)
    assert tuple(got[1]) == (-8, -8, 0)
    assert tuple(got[2]) == (5, 8, 0)
