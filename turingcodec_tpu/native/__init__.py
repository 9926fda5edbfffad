"""Native (C++) CABAC decode core loader.

Compiles cabac_core.cpp on first use (g++ -O2 -shared) into a cached .so and
exposes `residual_decode(dec, log2_size, c_idx, scan_idx, sdh)` which runs
the residual_coding hot loop natively, advancing the Python CabacDecoder's
state exactly as the pure-Python path would (parity: tests/test_native.py).

Set TURING_TPU_NO_NATIVE=1 to force the pure-Python path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_LIB = None
_TRIED = False


def _build_and_load():
    here = os.path.dirname(__file__)
    src = os.path.join(here, "cabac_core.cpp")
    so = os.path.join(here, f"_cabac_core_{sys.implementation.cache_tag}.so")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", so + ".tmp", src]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(so + ".tmp", so)
    lib = ctypes.CDLL(so)
    lib.tc_init_tables.argtypes = [ctypes.c_void_p] * 4 + [
        ctypes.c_void_p, ctypes.c_void_p]
    lib.tc_residual_decode.restype = ctypes.c_int
    lib.tc_residual_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p]

    from turingcodec_tpu.cabac.engine import ctx_index
    from turingcodec_tpu.cabac.tables import (
        NEXT_STATE_LPS, NEXT_STATE_MPS, RANGE_TAB_LPS)
    from turingcodec_tpu.hevc.tables import SIG_CTX_4x4
    from turingcodec_tpu.decode.ctu_parse import _scan

    rt = np.ascontiguousarray(RANGE_TAB_LPS, np.uint8)
    nm = np.ascontiguousarray(NEXT_STATE_MPS, np.uint8)
    nl = np.ascontiguousarray(NEXT_STATE_LPS, np.uint8)
    s4 = np.ascontiguousarray(SIG_CTX_4x4, np.uint8)
    offs = np.array([ctx_index("sig_coeff_flag"),
                     ctx_index("coded_sub_block_flag"),
                     ctx_index("last_sig_coeff_x_prefix"),
                     ctx_index("last_sig_coeff_y_prefix"),
                     ctx_index("coeff_abs_level_greater1_flag"),
                     ctx_index("coeff_abs_level_greater2_flag")], np.int32)
    scans = []
    for s in range(4):
        for idx in range(3):
            t = np.asarray(_scan(s, idx), np.int8)[:, :2]
            scans.append(np.ascontiguousarray(t).reshape(-1))
    sc = np.concatenate(scans).astype(np.int8)
    lib.tc_init_tables(rt.ctypes.data, nm.ctypes.data, nl.ctypes.data,
                       s4.ctypes.data, offs.ctypes.data, sc.ctypes.data)

    from turingcodec_tpu.cabac.rate import BITS
    lib.tc_init_rate.argtypes = [ctypes.c_void_p]
    lib.tc_residual_bits.restype = ctypes.c_int64
    lib.tc_residual_bits.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p]
    bits = np.ascontiguousarray(BITS, np.int32)
    lib.tc_init_rate(bits.ctypes.data)

    from turingcodec_tpu.hevc.tables import dct2_matrix, DST4
    lib.tc_init_intra.argtypes = [ctypes.c_void_p] * 8
    lib.tc_intra_tu.restype = ctypes.c_int
    lib.tc_intra_tu.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    from turingcodec_tpu.hevc.tables import LEVEL_SCALE
    from turingcodec_tpu.decode.reconstruct import (intra_inv_angle,
                                                    intra_pred_angle)
    mats = [np.ascontiguousarray(dct2_matrix(1 << k), np.int32)
            for k in (2, 3, 4, 5)]
    dst = np.ascontiguousarray(DST4, np.int32)
    ls = np.ascontiguousarray(LEVEL_SCALE, np.int32)
    ang = np.zeros(35, np.int8)
    inv = np.zeros(35, np.int16)
    for mode in range(2, 35):
        ang[mode] = intra_pred_angle(mode)
        if 11 <= mode <= 25:
            inv[mode] = intra_inv_angle(mode)
    _keep = (mats, dst, ls, ang, inv)
    lib._tc_keep = _keep  # prevent GC before init copies... (copied in C)
    lib.tc_init_intra(mats[0].ctypes.data, mats[1].ctypes.data,
                      mats[2].ctypes.data, mats[3].ctypes.data,
                      dst.ctypes.data, ls.ctypes.data, ang.ctypes.data,
                      inv.ctypes.data)
    return lib


def get_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("TURING_TPU_NO_NATIVE"):
        return None
    try:
        _LIB = _build_and_load()
    except Exception:
        _LIB = None  # fall back to the pure-Python path
    return _LIB


_NUMCTX = None


def residual_decode(dec, log2_size: int, c_idx: int, scan_idx: int,
                    sdh: bool):
    """Run residual_coding natively from the last-position syntax down.

    Returns the (n, n) int16 coefficient block, or None when the native
    library is unavailable (caller falls back to Python). Advances `dec`
    (pos/range/offset/contexts) exactly like the Python path."""
    lib = get_lib()
    if lib is None:
        return None
    states = dec.ctx.states
    if type(states) is not bytearray:  # legacy list pools: fall back
        return None
    n = 1 << log2_size
    ctx = (ctypes.c_uint8 * len(states)).from_buffer(states)  # zero-copy
    pos = ctypes.c_int64(dec.pos)
    rng = ctypes.c_int32(dec.range)
    off = ctypes.c_int32(dec.offset)
    out = np.zeros((n, n), np.int16)
    rc = lib.tc_residual_decode(
        dec.data, 8 * len(dec.data), ctypes.byref(pos), ctypes.byref(rng),
        ctypes.byref(off), ctx, log2_size, c_idx, scan_idx, int(sdh),
        out.ctypes.data)
    if rc != 0:
        raise ValueError("native residual_coding failed (corrupt stream?)")
    dec.pos = pos.value
    dec.range = rng.value
    dec.offset = off.value
    dec._cache = 0
    dec._cache_bits = 0
    return out


def residual_bits(ctx_pool, log2_size: int, c_idx: int, scan_idx: int,
                  sdh: bool, levels: np.ndarray):
    """Fractional bits (float) of residual_coding, mutating ctx_pool exactly
    like the writer; None when the native library is unavailable."""
    lib = get_lib()
    if lib is None or type(ctx_pool.states) is not bytearray:
        return None
    blk = np.ascontiguousarray(levels, np.int16)
    ctx = (ctypes.c_uint8 * len(ctx_pool.states)).from_buffer(ctx_pool.states)
    frac = lib.tc_residual_bits(ctx, log2_size, c_idx, scan_idx, int(sdh),
                                blk.ctypes.data)
    if frac < 0:
        raise ValueError("residual_bits on an all-zero block")
    return frac / 256.0


def intra_tu(plane, zscan32, x0, y0, n, c_idx, sub, bit_depth, mode,
             strong, coeff_plane, cbf, qp, use_dst) -> bool:
    """Reconstruct one intra TB natively (build refs + filter + predict +
    dequant/IDCT + add + clip, in place). False if unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    lib.tc_intra_tu(plane.ctypes.data, plane.shape[1], plane.shape[0],
                    zscan32.ctypes.data, zscan32.shape[1], x0, y0, n,
                    c_idx, sub, bit_depth, mode, int(strong),
                    coeff_plane.ctypes.data, int(cbf), qp, int(use_dst))
    return True
