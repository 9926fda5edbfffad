"""Native (C++) CABAC core parity vs the pure-Python oracles."""
import os

import numpy as np
import pytest

from turingcodec_tpu import native

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native cabac core unavailable")

rng = np.random.default_rng(21)


def _random_block(log2, density):
    n = 1 << log2
    blk = np.zeros((n, n), np.int32)
    m = rng.random((n, n)) < density
    blk[m] = rng.integers(-40, 40, m.sum())
    if not blk.any():
        blk[0, 0] = 3
    return blk


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("scan", [0, 1, 2])
@pytest.mark.parametrize("c_idx", [0, 1])
def test_residual_bits_matches_python(log2, scan, c_idx):
    if log2 > 3 and scan > 0:
        pytest.skip("h/v scans only exist for 4x4/8x8")
    from turingcodec_tpu.cabac.engine import ContextPool
    from turingcodec_tpu.cabac.rate import RateEstimator
    from turingcodec_tpu.encode.ctu_write import residual_core

    for density in (0.05, 0.3, 0.9):
        blk = _random_block(log2, density)
        ctx_a = ContextPool()
        ctx_a.initialize(1, 30)
        ctx_b = ctx_a.copy()
        est = RateEstimator(ctx_a)
        residual_core(est, blk, log2, c_idx, scan, False)
        got = native.residual_bits(ctx_b, log2, c_idx, scan, False, blk)
        assert got == pytest.approx(est.bits)
        assert ctx_a.states == ctx_b.states


def test_residual_decode_matches_python():
    """Decode the first frames of the bundled stream with and without the
    native path: outputs and hash verification must be identical."""
    import hashlib
    path = "/root/reference/test/excerpt_(CC)_caminandes.com_640x360.hevc"
    if not os.path.exists(path):
        pytest.skip("reference stream unavailable")
    data = open(path, "rb").read()
    from turingcodec_tpu.decode.decoder import Decoder

    def run(limit=3):
        dec = Decoder()
        md5 = hashlib.md5()
        c = 0
        for fr in dec.decode_stream(data):
            for p in fr.planes:
                md5.update(p.astype("uint8").tobytes())
            c += 1
            if c >= limit:
                break
        return md5.hexdigest()

    h_native = run()
    os.environ["TURING_TPU_NO_NATIVE"] = "1"
    native._TRIED, native._LIB = False, None
    try:
        h_python = run()
    finally:
        del os.environ["TURING_TPU_NO_NATIVE"]
        native._TRIED, native._LIB = False, None
    assert h_native == h_python
