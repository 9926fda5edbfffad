"""CLI: DSP kernel self-test + throughput benchmark on the current JAX
device (the `turing havoc` analogue, havoc/havoc.cpp:161-211): every kernel
family is checked bit-exact against its numpy oracle, then timed.

Usage: python -m turingcodec_tpu.tools.kernels [--batch N] [--iters N]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _bench(fn, args, iters):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    ap = argparse.ArgumentParser(prog="turingcodec_tpu kernels")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from turingcodec_tpu.decode.reconstruct import (
        dequant_block, inverse_transform)
    from turingcodec_tpu.ops.transform import (
        forward_transform_batch, forward_transform_np,
        inverse_transform_batch)
    from turingcodec_tpu.ops.quant import dequant_batch, quant_batch
    from turingcodec_tpu.ops.metrics import sad_batch, satd_batch, satd_np, ssd_batch
    from turingcodec_tpu.ops.intra import (
        intra_predict_all_modes, intra_predict_all_modes_np)
    from turingcodec_tpu.ops.inter import (
        interp_luma_all_phases, interp_luma_all_phases_np)

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    rng = np.random.default_rng(0)
    b = args.batch
    failures = 0

    def report(name, ok, t, work, unit):
        nonlocal failures
        if not ok:
            failures += 1
        rate = work / t
        print(f"{name:<28} {'OK ' if ok else 'FAIL'} {t * 1e3:8.3f} ms  "
              f"{rate / 1e9:8.2f} G{unit}/s")

    # transforms
    for log2 in (2, 3, 4, 5):
        n = 1 << log2
        d = rng.integers(-500, 500, (b, n, n)).astype(np.int32)
        got = np.asarray(inverse_transform_batch(d, 8, False))
        ok = all(np.array_equal(got[i], inverse_transform(d[i], 8, False))
                 for i in range(min(b, 8)))
        t = _bench(inverse_transform_batch, (jnp.asarray(d), 8, False),
                   args.iters)
        report(f"inverse_dct_{n}x{n}", ok, t, b * n * n, "samp")
        got = np.asarray(forward_transform_batch(d, 8, False))
        ok = all(np.array_equal(got[i], forward_transform_np(d[i], 8, False))
                 for i in range(min(b, 8)))
        t = _bench(forward_transform_batch, (jnp.asarray(d), 8, False),
                   args.iters)
        report(f"forward_dct_{n}x{n}", ok, t, b * n * n, "samp")

    # quant / dequant
    lv = rng.integers(-3000, 3000, (b, 16, 16)).astype(np.int32)
    qp = np.full(b, 26, np.int32)
    got = np.asarray(dequant_batch(lv, qp, 8, 4))
    ok = np.array_equal(got[0], dequant_block(lv[0], 26, 8, 4))
    t = _bench(dequant_batch, (jnp.asarray(lv), jnp.asarray(qp), 8, 4),
               args.iters)
    report("dequant_16x16", ok, t, b * 256, "coef")
    rnd = np.full(b, 171 << 6, np.int32)
    t = _bench(quant_batch,
               (jnp.asarray(lv), jnp.asarray(qp), 8, 4, jnp.asarray(rnd)),
               args.iters)
    report("quant_16x16", True, t, b * 256, "coef")

    # metrics
    a8 = rng.integers(0, 256, (b, 16, 16)).astype(np.int32)
    b8 = rng.integers(0, 256, (b, 16, 16)).astype(np.int32)
    ok = int(np.asarray(satd_batch(a8, b8, 8))[0]) == satd_np(a8[0], b8[0], 8)
    t = _bench(sad_batch, (jnp.asarray(a8), jnp.asarray(b8)), args.iters)
    report("sad_16x16", True, t, b * 256, "samp")
    t = _bench(satd_batch, (jnp.asarray(a8), jnp.asarray(b8), 8), args.iters)
    report("satd8_16x16", ok, t, b * 256, "samp")
    t = _bench(ssd_batch, (jnp.asarray(a8), jnp.asarray(b8)), args.iters)
    report("ssd_16x16", True, t, b * 256, "samp")

    # intra all modes
    for n in (8, 16, 32):
        rt = rng.integers(0, 256, (b, 2 * n + 1)).astype(np.int32)
        rl = rng.integers(0, 256, (b, 2 * n + 1)).astype(np.int32)
        co = rng.integers(0, 256, b).astype(np.int32)
        got = np.asarray(intra_predict_all_modes(rt, rl, co, n))
        ok = np.array_equal(got[:2], intra_predict_all_modes_np(
            rt[:2], rl[:2], co[:2], n))
        t = _bench(intra_predict_all_modes,
                   (jnp.asarray(rt), jnp.asarray(rl), jnp.asarray(co), n),
                   args.iters)
        report(f"intra35_{n}x{n}", ok, t, b * 35 * n * n, "samp")

    # interpolation all phases
    w = h = 16
    win = rng.integers(0, 256, (b, h + 7, w + 7)).astype(np.int16)
    got = np.asarray(interp_luma_all_phases(win, w, h)).astype(np.int64)
    ok = np.array_equal(got[:2], interp_luma_all_phases_np(win[:2], w, h))
    t = _bench(interp_luma_all_phases, (jnp.asarray(win), w, h), args.iters)
    report("interp16_luma_16x16", ok, t, b * 16 * w * h, "samp")

    # native SATD kernels (havoc_test analogue: optimized vs C template,
    # bit-exact required, ns/block reported)
    from turingcodec_tpu.native import get_lib
    lib = get_lib()
    if lib is not None:
        import ctypes
        lib.tc_satd_selftest.argtypes = [ctypes.c_int, ctypes.c_void_p]
        out = np.zeros(3, np.int64)
        iters = 20000
        lib.tc_satd_selftest(iters, out.ctypes.data)
        ok = out[0] == 0
        if not ok:
            failures += 1
        print(f"satd8_native      {'OK ' if ok else 'FAIL'}  "
              f"int32 {out[1] / iters / 16:6.2f} ns/blk   "
              f"int16 {out[2] / iters / 16:6.2f} ns/blk")

    print("ALL OK" if not failures else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
