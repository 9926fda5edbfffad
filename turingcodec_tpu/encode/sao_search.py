"""SAO parameter estimation (EncSao::rdSao analogue, turing/EncSao.h:32,950).

Per CTB: gather edge-class and band statistics from the deblocked picture vs
the source, derive RD-optimal offsets per class/band, pick the best of
{off, band, 4 edge classes} by distortion + lambda*rate. Chroma obeys the
shared-type constraint (sao_type_idx_chroma / eo_class_chroma cover both Cb
and Cr; offsets and band positions are per-component).

Closed form: offset k applied to n samples with error sum e changes SSD by
n*k^2 - 2*k*e.
"""
from __future__ import annotations

import numpy as np

from turingcodec_tpu.decode.plan import PicturePlan

_EO_NEIGHBOURS = {
    0: ((0, -1), (0, 1)),
    1: ((-1, 0), (1, 0)),
    2: ((-1, -1), (1, 1)),
    3: ((-1, 1), (1, -1)),
}


def _best_offset(n, e, lam, max_off=7, sign=None):
    """Minimize n*k^2 - 2*k*e + lam*bits(k) over k (0 always allowed)."""
    if n == 0:
        return 0, 0.0
    best_k, best_c = 0, 0.0
    k0 = int(np.clip(round(e / n), -max_off, max_off))
    ks = range(0, k0 + 1) if k0 >= 0 else range(k0, 1)
    for k in ks:
        if sign is not None and k * sign < 0:
            continue
        c = n * k * k - 2.0 * k * e + lam * (abs(k) + 1)
        if c < best_c:
            best_c, best_k = c, k
    return best_k, best_c


def _ctb_candidates(o, r, y0, y1, x0, x1, bd, lam):
    """Per-candidate (cost, class, offsets) for one CTB of one component.

    Returns {"off": ..., "band": ..., ("eo", 0..3): ...}."""
    h, w = r.shape
    ob = o[y0:y1, x0:x1]
    rb = r[y0:y1, x0:x1]
    err = (ob - rb).astype(np.float64)
    out = {"off": (0.0, 0, [0, 0, 0, 0])}

    for eo in range(4):
        (ady, adx), (bdy, bdx) = _EO_NEIGHBOURS[eo]
        ys = np.arange(y0, y1)
        xs = np.arange(x0, x1)
        Y, X = np.meshgrid(ys, xs, indexing="ij")
        ay, ax = Y + ady, X + adx
        by_, bx_ = Y + bdy, X + bdx
        valid = (ay >= 0) & (ay < h) & (ax >= 0) & (ax < w) & \
                (by_ >= 0) & (by_ < h) & (bx_ >= 0) & (bx_ < w)
        av = r[np.clip(ay, 0, h - 1), np.clip(ax, 0, w - 1)]
        bv = r[np.clip(by_, 0, h - 1), np.clip(bx_, 0, w - 1)]
        cat = 2 + np.sign(rb - av) + np.sign(rb - bv)
        remap = np.array([1, 2, 0, 3, 4])
        cat = np.where(valid, remap[cat], 0)
        cost = 0.0
        offs = []
        for cls, sgn in ((1, 1), (2, 1), (3, -1), (4, -1)):
            m = cat == cls
            k, c = _best_offset(int(m.sum()), float(err[m].sum()), lam,
                                sign=sgn)
            offs.append(k)
            cost += c
        out[("eo", eo)] = (cost, eo, offs)

    shift = bd - 5
    bands = (rb >> shift).ravel()
    n_b = np.bincount(bands, minlength=32)
    e_b = np.bincount(bands, weights=err.ravel(), minlength=32)
    kb = np.zeros(32, np.int32)
    cb = np.zeros(32)
    for b in range(32):
        kb[b], cb[b] = _best_offset(int(n_b[b]), float(e_b[b]), lam)
    best_pos, best_cost = 0, 1e30
    for pos in range(29):
        c = cb[pos:pos + 4].sum()
        if c < best_cost:
            best_cost, best_pos = c, pos
    out["band"] = (best_cost, best_pos, list(kb[best_pos:best_pos + 4]))
    return out


def estimate_sao(plan: PicturePlan, geom, orig, deblocked, lam: float):
    """Fill plan.sao_* for all CTBs; luma independent, chroma joint-type."""
    sps = plan.sps
    if _estimate_sao_native(plan, orig, deblocked, lam):
        return
    ctb = sps.ctb_size_y
    hc, wc = sps.pic_height_in_ctbs_y, sps.pic_width_in_ctbs_y
    sig = 2.0 * lam  # type/class signalling proxy bits
    for cy in range(hc):
        for cx in range(wc):
            # luma
            o = orig[0].astype(np.int32)
            r = deblocked[0].astype(np.int32)
            h, w = r.shape
            y0, x0 = cy * ctb, cx * ctb
            cands = _ctb_candidates(o, r, y0, min(y0 + ctb, h),
                                    x0, min(x0 + ctb, w),
                                    sps.bit_depth_y, lam)
            items = [("off", cands["off"][0]),
                     ("band", cands["band"][0] + sig)]
            items += [(("eo", e), cands[("eo", e)][0] + sig)
                      for e in range(4)]
            key = min(items, key=lambda t: t[1])[0]
            _apply(plan, cy, cx, 0, key, cands[key])

            # chroma: shared type/class between cb and cr
            cands_c = []
            for ci in (1, 2):
                o = orig[ci].astype(np.int32)
                r = deblocked[ci].astype(np.int32)
                h, w = r.shape
                cs = ctb // 2
                y0, x0 = cy * cs, cx * cs
                cands_c.append(_ctb_candidates(
                    o, r, y0, min(y0 + cs, h), x0, min(x0 + cs, w),
                    sps.bit_depth_c, lam))
            items = [("off", cands_c[0]["off"][0] + cands_c[1]["off"][0]),
                     ("band", cands_c[0]["band"][0] + cands_c[1]["band"][0]
                      + sig)]
            items += [(("eo", e),
                       cands_c[0][("eo", e)][0] + cands_c[1][("eo", e)][0]
                       + sig) for e in range(4)]
            key = min(items, key=lambda t: t[1])[0]
            _apply(plan, cy, cx, 1, key, cands_c[0][key])
            _apply(plan, cy, cx, 2, key, cands_c[1][key])


def _estimate_sao_native(plan, orig, deblocked, lam) -> bool:
    """C twin of the loop above (enc_core.cpp tc_sao_estimate)."""
    import os
    if os.environ.get("TURING_TPU_NO_NATIVE_ENC"):
        return False
    from turingcodec_tpu import native
    lib = native.get_lib()
    sps = plan.sps
    if lib is None or sps.chroma_array_type != 1:
        return False
    o = [np.ascontiguousarray(p, np.int16) for p in orig]
    r = deblocked
    for p in r:
        if p.dtype != np.int16 or not p.flags.c_contiguous:
            return False
    optrs = np.array([p.ctypes.data for p in o], np.int64)
    rptrs = np.array([p.ctypes.data for p in r], np.int64)
    lib.tc_sao_estimate(
        optrs.ctypes.data, rptrs.ctypes.data,
        plan.sao_type.ctypes.data, plan.sao_class.ctypes.data,
        plan.sao_offsets.ctypes.data,
        sps.pic_width_in_ctbs_y, sps.pic_height_in_ctbs_y, sps.ctb_size_y,
        sps.pic_width_in_luma_samples, sps.pic_height_in_luma_samples,
        sps.bit_depth_y, sps.bit_depth_c, float(lam))
    return True


def _apply(plan, cy, cx, c_idx, key, cand):
    _, cls, offs = cand
    if key == "off":
        plan.sao_type[cy, cx, c_idx] = 0
        plan.sao_class[cy, cx, c_idx] = 0
        plan.sao_offsets[cy, cx, c_idx] = 0
    elif key == "band":
        plan.sao_type[cy, cx, c_idx] = 1
        plan.sao_class[cy, cx, c_idx] = cls
        plan.sao_offsets[cy, cx, c_idx] = offs
    else:
        plan.sao_type[cy, cx, c_idx] = 2
        plan.sao_class[cy, cx, c_idx] = cls
        plan.sao_offsets[cy, cx, c_idx] = offs
