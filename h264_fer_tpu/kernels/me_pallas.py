"""Pallas full-search integer ME kernel.

The XLA formulation of the ±window integer score map
(codec/tpu_pframe.integer_score_map) re-reads the whole reference plane
from HBM for every one of the S² = (2·window+1)² shifts — ~2.3 GB of
redundant traffic and 3.2 s/frame at 1080p (PROFILE_r04.md). Here each
kernel grid step owns ONE 8-pixel block row: its source strip and the
(8 + 2·window)-row reference window strip are DMA'd into VMEM once, and
all S² shifted metric passes run VPU-resident — the ~70× traffic
reduction the full search needs to be HBM-optimal.

Outputs are bit-identical to integer_score_map (tests/test_me_pallas.py);
shift index s = (dy + W)·S + (dx + W), row-major (dy, dx), preserving the
host argmin tie-break order.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _me_kernel_body(S: int, window: int, ext: int, metric_id: int,
                    wb: int, W: int, src_ref, ref_ref, g_ref, out_ref):
    src = src_ref[0].astype(jnp.int32)  # (8, W)
    G = g_ref[...]  # (W, wb) f32 0/1 lane→block selector
    for dy in range(S):
        for dx in range(S):
            win = ref_ref[0, dy : dy + 8,
                          (ext - window + dx) : (ext - window + dx) + W]
            d = win.astype(jnp.int32) - src
            if metric_id == 0:
                m = jnp.abs(d)
            elif metric_id == 1:
                m = d * d
            else:
                m = 2 * (d * d)
            # per-block 8x8 sums: sublane reduce then an MXU contraction
            # with the 0/1 selector (Mosaic cannot split the lane dim via
            # reshape; f32 is exact here — row sums <= 8*2*255^2 < 2^24)
            row = m.sum(axis=0, keepdims=True).astype(jnp.float32)
            sums = jax.lax.dot_general(
                row, G, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (1, wb)
            out_ref[0, dy * S + dx, :] = sums[0].astype(jnp.int32)
    return


def pallas_integer_score_map(src_y, plane0, ext: int, window: int,
                             metric_id: int):
    """Drop-in replacement for tpu_pframe.integer_score_map.

    src_y: (H, W) int32; plane0: (H + 2*ext, W + 2*ext) int32 (the
    edge-extended integer plane). Returns (nb, S*S) int32.
    """
    H, W = src_y.shape
    hb, wb = H // 8, W // 8
    S = 2 * window + 1
    Wp = plane0.shape[1]

    # per-block-row reference strips: rows [i*8 + ext - window,
    # i*8 + ext + window + 8) of plane0, materialized contiguously so the
    # kernel's BlockSpec is non-overlapping (one strided gather in XLA)
    rows = (jnp.arange(hb)[:, None] * 8
            + jnp.arange(8 + 2 * window)[None, :] + (ext - window))
    ref_strips = plane0[rows]  # (hb, 8+2W, Wp)
    src_strips = src_y.reshape(hb, 8, W)

    g = np.zeros((W, wb), np.float32)
    g[np.arange(W), np.arange(W) // 8] = 1.0
    kernel = functools.partial(_me_kernel_body, S, window, ext,
                               metric_id, wb, W)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        grid=(hb,),
        in_specs=[
            pl.BlockSpec((1, 8, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8 + 2 * window, Wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, wb), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S * S, wb), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hb, S * S, wb), jnp.int32),
        interpret=interpret,
    )(src_strips, ref_strips, jnp.asarray(g))
    # (hb, S2, wb) -> (nb, S2) raster block order
    return jnp.moveaxis(out, 1, 2).reshape(hb * wb, S * S)
