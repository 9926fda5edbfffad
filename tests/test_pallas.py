"""Pallas kernel parity (interpret mode on the CPU backend)."""
import numpy as np

rng = np.random.default_rng(7)


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
