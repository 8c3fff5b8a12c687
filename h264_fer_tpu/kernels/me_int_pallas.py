"""Pallas integer full-search score map.

Same contract as codec/tpu_pframe.integer_score_map (per-8x8-block
distortion at every integer shift in ±window, the basicInterEncoding
search envelope, moestimation.cpp:298-390), restructured for the VPU:
the grid walks 8-px block rows; each step holds the one edge-extended
reference strip those rows can reach in VMEM and evaluates all (2w+1)^2
shifts as STATIC column slices (the shift row rides the second grid
axis) — no gathers, no dynamic lane offsets.  The kernel emits per-shift
COLUMN sums (int16 on the SAD tier); the 8-lane block fold runs as one
fused XLA reshape-reduce over the kernel output, because Mosaic has no
lane-strided loads for in-kernel compaction.

Bit-identical to integer_score_map (tests/test_pframe_bulk.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll(v, shift: int, axis: int):
    try:
        return pltpu.roll(v, shift=shift, axis=axis)
    except Exception:  # interpret mode
        return jnp.roll(v, shift, axis=axis)


def _int_kernel(wb: int, window: int, ext: int, metric_id: int, hb: int,
                strip_r: int, wp: int, src_ref, plane_hbm, out_ref, strip,
                sem):
    r = pl.program_id(0)
    dyi = pl.program_id(1)
    S = 2 * window + 1
    odt = out_ref.dtype

    @pl.when(dyi == 0)
    def _():
        dma = pltpu.make_async_copy(
            plane_hbm.at[pl.ds(pl.multiple_of(r * 8, 8), strip_r), :],
            strip, sem)
        dma.start()
        dma.wait()

    src = src_ref[0].astype(jnp.int32)  # (8, WP)
    ry = ext + dyi - window  # strip row of the window's first row
    ry0 = pl.multiple_of((ry // 8) * 8, 8)
    slab = strip[pl.ds(ry0, 16), :].astype(jnp.int32)
    rotr = 16 - (ry & 7)
    try:
        slab = pltpu.roll(slab, shift=rotr, axis=0)
    except Exception:  # interpret mode
        slab = jnp.roll(slab, rotr, axis=0)
    rows = slab[:8]
    for dx in range(-window, window + 1):
        x0 = ext + dx
        d = rows[:, x0 : x0 + wp] - src
        if metric_id == 0:
            m = jnp.abs(d)
        elif metric_id == 1:
            m = d * d
        else:
            m = 2 * (d * d)
        col = m.sum(axis=0, keepdims=True)  # (1, WP)
        out_ref[0, 0, pl.ds(dx + window, 1), :] = col.astype(odt)


def integer_score_map_pallas_impl(src_y, plane0, ext: int, window: int,
                                  metric_id: int):
    """(nb, S*S) int32 — drop-in for integer_score_map."""
    H, W = src_y.shape
    hb, wb = H // 8, W // 8
    S = 2 * window + 1

    wp = -(-W // 128) * 128  # kernel row width (128-lane rows)
    src3 = jnp.pad(src_y.astype(jnp.int16).reshape(hb, 8, W),
                   ((0, 0), (0, 0), (0, wp - W)))
    strip_r = ((2 * window + 2) // 8) * 8 + 16
    he, we = plane0.shape
    # lanes: wide enough for the widest static slice (ext+window+wp);
    # rows: so the bottom strip DMA fits
    we_pad = wp + 128
    he_pad = max(he, 8 * (hb - 1) + strip_r)
    plane_p = jnp.pad(plane0.astype(jnp.int16),
                      ((0, he_pad - he), (0, we_pad - we)))

    # SAD column sums fit int16 (<= 8*255); squared tiers need int32
    odt = jnp.int16 if metric_id == 0 else jnp.int32
    kernel = functools.partial(
        _int_kernel, wb, window, ext, metric_id, hb, strip_r, wp)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        grid=(hb, S),
        in_specs=[
            pl.BlockSpec((1, 8, wp), lambda r, dy: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, S, wp), lambda r, dy: (r, dy, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hb, S, S, wp), odt),
        scratch_shapes=[
            pltpu.VMEM((strip_r, we_pad), jnp.int16),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(src3, plane_p)
    # fused XLA block fold: (hb, S, S, wp) -> 8-lane sums -> (nb, S*S)
    blocks = out[..., : wb * 8].astype(jnp.int32)
    blocks = blocks.reshape(hb, S * S, wb, 8).sum(axis=-1)
    return blocks.transpose(0, 2, 1).reshape(hb * wb, S * S)
