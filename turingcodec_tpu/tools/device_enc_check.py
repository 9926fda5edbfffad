"""Real-chip check of the device encoder analysis stage
(TURING_TPU_DEVICE_ENC): runs the lowres pre-ME on whatever JAX platform
is live (the axon TPU under the driver; CPU in tests), asserts
integer-exact equality with the host twin, and encodes a few frames
both ways asserting byte-identical bitstreams.

Run with the environment's default JAX platform (do NOT set
JAX_PLATFORMS; the axon plugin registers via sitecustomize). Always set
JAX_COMPILATION_CACHE_DIR for TPU runs (cold compiles over the tunnel
take ~15 s).

Round-3 measurement on the tunneled TPU v5 lite: 14.7 s cold compile,
85 ms warm per reference plane (integer-exact), vs ~11 ms host AVX2 —
the device->host pull dominates over the tunnel; co-located hosts would
see sub-ms.
"""
import os
import sys
import time

import numpy as np

STREAM = ("/root/reference/test/"
          "excerpt_(CC)_caminandes.com_640x360.hevc")


def main():
    import jax
    plat = jax.devices()[0].platform
    print(f"JAX platform: {plat}")

    from turingcodec_tpu.decode.decoder import Decoder
    from turingcodec_tpu.encode.device_analysis import seed_field_device
    from turingcodec_tpu.encode.inter_search import InterPictureEncoder
    from turingcodec_tpu.encode.encoder import EncoderConfig, Encoder

    data = open(STREAM, "rb").read()
    dec = Decoder()
    frames = []
    for f in dec.decode_stream(data):
        frames.append([np.asarray(p).astype(np.int16) for p in f.planes])
        if len(frames) >= 4:
            break

    # 1) seed-field parity + timing
    t0 = time.time()
    sm, wb, hb = seed_field_device(frames[1][0], frames[0][0])
    t_cold = time.time() - t0
    t0 = time.time()
    seed_field_device(frames[1][0], frames[0][0])
    t_warm = time.time() - t0
    h = InterPictureEncoder.__new__(InterPictureEncoder)
    h._lr_seed_cache = {}
    h.orig = [frames[1][0]]
    host, wbh, hbh = h._lowres_seed_field(frames[0][0])
    exact = bool(np.array_equal(sm, host)) and (wb, hb) == (wbh, hbh)
    print(f"seed field ({hb}x{wb} blocks): cold {t_cold:.1f}s, "
          f"warm {t_warm * 1e3:.0f}ms, exact vs host: {exact}")
    assert exact

    # 1b) dense ME field parity + Pallas-vs-XLA A/B timing
    from turingcodec_tpu.encode.device_analysis import analysis_device

    def bench_dense(pallas):
        os.environ["TC_DENSE_PALLAS"] = "1" if pallas else "0"
        try:
            t0 = time.time()
            sm2, dm, ds, wb2, hb2 = analysis_device(frames[1][0],
                                                    frames[0][0])
            cold = time.time() - t0
            t0 = time.time()
            n_rep = 3
            for _ in range(n_rep):
                analysis_device(frames[1][0], frames[0][0])
            warm = (time.time() - t0) / n_rep
            return sm2, dm, ds, wb2, hb2, cold, warm
        finally:
            os.environ.pop("TC_DENSE_PALLAS", None)

    smx, dmx, dsx, wb2, hb2, cold_x, warm_x = bench_dense(False)
    h2 = InterPictureEncoder.__new__(InterPictureEncoder)
    h2._lr_seed_cache = {}
    h2._dense_cache = {}
    h2.orig = [frames[1][0]]
    dmh, dsh, _, _ = h2._dense_field(frames[0][0])
    exact_x = bool(np.array_equal(dmx, dmh) and np.array_equal(dsx, dsh))
    n_blocks = hb2 * wb2
    sad_ops = n_blocks * 289 * 256  # |a-b| accumulations per plane sweep
    print(f"dense ME field XLA-scan: cold {cold_x:.1f}s, "
          f"warm {warm_x * 1e3:.0f}ms "
          f"({sad_ops / max(warm_x, 1e-9) / 1e9:.1f} G sad-ops/s, "
          f"{n_blocks / max(warm_x, 1e-9) / 1e3:.0f} k blocks/s), "
          f"exact vs host: {exact_x}")
    assert exact_x
    if plat != "cpu":
        smp, dmp, dsp, _, _, cold_p, warm_p = bench_dense(True)
        exact_p = bool(np.array_equal(dmp, dmh)
                       and np.array_equal(dsp, dsh)
                       and np.array_equal(smp, smx))
        print(f"dense ME field Pallas:   cold {cold_p:.1f}s, "
              f"warm {warm_p * 1e3:.0f}ms "
              f"({sad_ops / max(warm_p, 1e-9) / 1e9:.1f} G sad-ops/s), "
              f"exact vs host: {exact_p}, "
              f"speedup vs XLA-scan: {warm_x / max(warm_p, 1e-9):.2f}x")
        assert exact_p
    else:
        print("(CPU backend: skipping the Pallas variant — interpret "
              "mode is ~1000x slower; TPU runs bench it for real)")

    # 1b') full dense SAD surface (the exact integers the full-pel search
    # serves aligned probes from; TC_DEV_SURF install path)
    from turingcodec_tpu import native as _nat
    from turingcodec_tpu.encode.device_analysis import analysis_device
    t0 = time.time()
    out = analysis_device(frames[1][0], frames[0][0], want_surf=True)
    sf_cold = time.time() - t0
    t0 = time.time()
    analysis_device(frames[1][0], frames[0][0], want_surf=True)
    sf_warm = time.time() - t0
    res_n = _nat.dense_analysis(frames[1][0], frames[0][0], 8)
    sf_exact = res_n is not None and res_n[5] is not None \
        and bool(np.array_equal(out[5], res_n[5]))
    print(f"dense SAD surface ({out[5].shape[0]}x289 int32): "
          f"cold {sf_cold:.1f}s, warm {sf_warm * 1e3:.0f}ms/ref "
          f"(incl. the {out[5].nbytes / 1e6:.1f} MB pull), "
          f"exact vs native: {sf_exact}")
    assert res_n is None or sf_exact

    # 1c) subpel-plane stage parity + timing (the interpolated-reference
    # planes the subpel search reads; enc_core sp_build_plane twins)
    from turingcodec_tpu.encode.device_analysis import (subpel_planes_device,
                                                        subpel_planes_host)
    t0 = time.time()
    spd = subpel_planes_device(frames[0][0], 8)
    sp_cold = time.time() - t0
    t0 = time.time()
    subpel_planes_device(frames[0][0], 8)
    sp_warm = time.time() - t0
    sph = subpel_planes_host(frames[0][0], 8)
    sp_exact = bool(np.array_equal(spd, sph))
    print(f"subpel planes (15x{sph.shape[1]}x{sph.shape[2]}): "
          f"cold {sp_cold:.1f}s, warm {sp_warm * 1e3:.0f}ms/ref, "
          f"exact vs host: {sp_exact}")
    assert sp_exact

    # 1d) rank-SATD tables (source-referenced 35-mode intra ranking —
    # rank_modes' sweep as one batched device stage)
    from turingcodec_tpu.encode.device_analysis import (
        rank_satd_tables_device, rank_satd_tables_host)
    from turingcodec_tpu.encode.encoder import EncoderConfig as _EC
    from turingcodec_tpu.encode.encoder import Encoder as _E
    geom = _E(_EC(width=640, height=360, qp=32)).geom
    t0 = time.time()
    rkd = rank_satd_tables_device(frames[0][0], geom.zscan, 8, True)
    rk_cold = time.time() - t0
    t0 = time.time()
    rank_satd_tables_device(frames[0][0], geom.zscan, 8, True)
    rk_warm = time.time() - t0
    rkh = rank_satd_tables_host(frames[0][0], geom.zscan, 8, True)
    rk_exact = all(np.array_equal(rkd[n], rkh[n]) for n in rkd)
    nsat = sum(v.size for v in rkd.values())
    print(f"rank-SATD tables ({nsat} block-mode SATDs, sizes 4..32): "
          f"cold {rk_cold:.1f}s, warm {rk_warm * 1e3:.0f}ms/picture, "
          f"exact vs host: {rk_exact}")
    assert rk_exact

    # 2) byte-identical bitstreams with the stage on
    def enc_once(dev):
        if dev:
            os.environ["TURING_TPU_DEVICE_ENC"] = "1"
        try:
            cfg = EncoderConfig(width=640, height=360, qp=32,
                                rd_candidates=2, gop_m=1, sao=False,
                                rdoq=True, sdh=True)
            enc = Encoder(cfg)
            out = [enc.headers()]
            for f in frames:
                for r in enc.push_frame([p.copy() for p in f]):
                    out.append(r[1])
            for r in enc.flush():
                out.append(r[1])
            return b"".join(out)
        finally:
            os.environ.pop("TURING_TPU_DEVICE_ENC", None)

    a, b = enc_once(False), enc_once(True)
    print(f"bitstreams identical with TURING_TPU_DEVICE_ENC=1: {a == b}")
    assert a == b
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
