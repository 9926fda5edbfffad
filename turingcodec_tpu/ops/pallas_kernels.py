"""Hand-written Pallas TPU kernels for the hottest fused paths.

Two kernels (the havoc JIT-kernel analogues, havoc/quantize.h:48-97
"quantize_reconstruct" and havoc/sad.h:104 multiref SAD):

- fused_dequant_idct_add: levels -> dequant -> 2-stage inverse DCT ->
  + prediction -> clip, for a batch of same-size TBs in one VMEM-resident
  kernel (saves three HBM round trips of the unfused op chain).
- sad_grid: SAD of one origin block against every integer-pel candidate in a
  search window (the motion-estimation inner loop as one kernel).

Both are bit-exact vs the numpy oracles and run under interpret mode on CPU
for the unit suite.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from turingcodec_tpu.hevc.tables import LEVEL_SCALE, dct2_matrix, DST4


def _matrix(n, dst):
    return np.asarray(DST4 if dst else dct2_matrix(n), np.int32)


@functools.partial(jax.jit,
                   static_argnames=("bit_depth", "use_dst", "interpret"))
def fused_dequant_idct_add(levels: jax.Array, pred: jax.Array,
                           ls16: jax.Array, shift: jax.Array,
                           bit_depth: int = 8, use_dst: bool = False,
                           interpret: bool = False) -> jax.Array:
    """(B, N, N) levels + (B, N, N) prediction -> clipped reconstruction.

    ls16: (B,) int32 dequant scale*16; shift: (B,) int32 dequant shift
    (bd_shift - qp//6, always > 0 for sane QPs; negative handled by caller).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, _ = levels.shape
    m = jnp.asarray(_matrix(n, use_dst))
    bd_shift2 = 20 - bit_depth
    max_val = (1 << bit_depth) - 1

    def kernel(lv_ref, pr_ref, ls_ref, sh_ref, m_ref, out_ref):
        lv = lv_ref[...]
        ls = ls_ref[...][:, 0][:, None, None]
        sh = sh_ref[...][:, 0][:, None, None]
        rnd = jnp.where(sh > 0, 1 << jnp.maximum(sh - 1, 0), 0)
        d = ((lv * ls + rnd) >> jnp.maximum(sh, 0)) << jnp.maximum(-sh, 0)
        d = jnp.clip(d, -32768, 32767)
        # int32 matmuls are unsupported by Mosaic; unroll the transform as
        # N exact multiply-add VPU steps per stage (matrix is static)
        # stage 1 (columns): e[b, y, x] = sum_k M[k, y] * d[b, k, x]
        e = jnp.zeros_like(d)
        for k in range(n):
            e = e + m_ref[k, :][None, :, None] * d[:, k, :][:, None, :]
        g = jnp.clip((e + 64) >> 7, -32768, 32767)
        # stage 2 (rows): r[b, y, x] = sum_k g[b, y, k] * M[k, x]
        r = jnp.zeros_like(d)
        for k in range(n):
            r = r + g[:, :, k][:, :, None] * m_ref[k, :][None, None, :]
        r = (r + (1 << (bd_shift2 - 1))) >> bd_shift2
        r = jnp.clip(r, -32768, 32767)
        out_ref[...] = jnp.clip(pr_ref[...] + r, 0, max_val)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, n), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(levels.astype(jnp.int32), pred.astype(jnp.int32),
      ls16.astype(jnp.int32)[:, None], shift.astype(jnp.int32)[:, None], m)


def fused_dequant_idct_add_np(levels, pred, qp, bit_depth, use_dst):
    """Oracle via the decoder ops."""
    from turingcodec_tpu.decode.reconstruct import (
        dequant_block, inverse_transform)
    out = np.zeros_like(pred, dtype=np.int32)
    for i in range(levels.shape[0]):
        d = dequant_block(levels[i], int(qp[i]), bit_depth,
                          int(np.log2(levels.shape[-1])))
        r = inverse_transform(d, bit_depth, use_dst)
        out[i] = np.clip(pred[i] + r, 0, (1 << bit_depth) - 1)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def sad_grid(orig: jax.Array, window: jax.Array,
             interpret: bool = False) -> jax.Array:
    """orig (H, W) vs window (H + R, W + R): SAD at every (dy, dx) offset.

    Returns (R + 1, R + 1) int32 — the full-grid multiref SAD kernel.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = orig.shape
    rh = window.shape[0] - h + 1
    rw = window.shape[1] - w + 1

    assert rh * rw <= 128, "sad_grid kernel is statically unrolled; use a " \
        "seeded window (<=128 candidates) like the pattern search does"

    def kernel(o_ref, w_ref, out_ref):
        o = o_ref[...]
        for dy in range(rh):      # static unroll: all slices are static
            sads = []
            for dx in range(rw):
                blk = w_ref[dy:dy + h, dx:dx + w]
                sads.append(jnp.sum(jnp.abs(o - blk)))
            out_ref[dy, :] = jnp.stack(sads)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rh, rw), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(orig.astype(jnp.int32), window.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def dense_me_argmin(cur: jax.Array, patches: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """Production dense-ME kernel (encoder full-pel prepass): for each
    block, the (oy, ox) in [-8, 8]^2 minimizing
    (SAD(cur, patch[oy:oy+16, ox:ox+16]) << 2) + |ox| + |oy|, scan-order
    strict-improvement tie-break — integer-exact with the host twins
    (enc_core dense_search_rows / inter_search._dense_field).

    cur: (B, 16, 16) int32 source blocks; patches: (B, 32, 32) int32
    reference windows at seed-8. Returns (B, 3) int32 [ox, oy, sad] —
    winner offsets plus the winner's pure SAD (the facade's
    noise-adaptivity input). The whole 17x17 sweep stays VMEM-resident
    per 256-block tile (one HBM read per input element) instead of
    re-streaming the patch tensor 289 times as the XLA scan formulation
    does. Layout: blocks ride the 128-lane dimension — inputs are
    transposed to (rows, cols, B) so every slice/reduce is lane-parallel
    across blocks and all stores are full-lane rows (Mosaic rejects the
    naive (B, 16, 16) formulation's strided small-lane layouts).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = cur.shape[0]
    tile = 256
    bp = -(-b // tile) * tile
    if bp != b:
        cur = jnp.pad(cur, ((0, bp - b), (0, 0), (0, 0)))
        patches = jnp.pad(patches, ((0, bp - b), (0, 0), (0, 0)))
    cur_t = jnp.transpose(cur.astype(jnp.int32), (1, 2, 0))      # (16,16,B)
    pat_t = jnp.transpose(patches.astype(jnp.int32), (1, 2, 0))  # (32,32,B)

    def kernel(c_ref, p_ref, out_ref):
        c = c_ref[...]
        best = jnp.full((1, tile), np.iinfo(np.int32).max, jnp.int32)
        bsad = jnp.zeros((1, tile), jnp.int32)
        box = jnp.zeros((1, tile), jnp.int32)
        boy = jnp.zeros((1, tile), jnp.int32)
        for oy in range(17):       # static unroll: all slices are static
            for ox in range(17):
                sad = jnp.sum(
                    jnp.abs(c - p_ref[oy:oy + 16, ox:ox + 16, :]),
                    (0, 1)).reshape(1, tile)
                cost = (sad << 2) + abs(ox - 8) + abs(oy - 8)
                m = cost < best
                best = jnp.where(m, cost, best)
                bsad = jnp.where(m, sad, bsad)
                box = jnp.where(m, ox - 8, box)
                boy = jnp.where(m, oy - 8, boy)
        out_ref[0:1, :] = box
        out_ref[1:2, :] = boy
        out_ref[2:3, :] = bsad

    out = pl.pallas_call(
        kernel,
        grid=(bp // tile,),
        out_shape=jax.ShapeDtypeStruct((3, bp), jnp.int32),
        in_specs=[
            pl.BlockSpec((16, 16, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 32, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(cur_t, pat_t)
    return out[:, :b].T


def sad_grid_np(orig, window):
    h, w = orig.shape
    rh = window.shape[0] - h + 1
    rw = window.shape[1] - w + 1
    out = np.zeros((rh, rw), np.int64)
    o = orig.astype(np.int64)
    for dy in range(rh):
        for dx in range(rw):
            out[dy, dx] = np.abs(o - window[dy:dy + h, dx:dx + w]).sum()
    return out
