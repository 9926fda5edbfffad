"""Hand-written Pallas TPU kernel for the encoder's dense-ME prepass.

dense_me_argmin is the production kernel behind the TURING_TPU_DEVICE_ENC
dense full-pel ME field (the havoc multiref-SAD analogue, havoc/sad.h:104,
recast as one whole-picture batched sweep): bit-exact vs the host twins
and validated on real TPU hardware (tools/device_enc_check.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np



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
