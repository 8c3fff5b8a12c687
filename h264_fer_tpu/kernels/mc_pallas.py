"""Pallas whole-frame motion compensation at the final per-quadrant MVs.

Drop-in for codec/tpu_pframe.mc_luma_bulk + 2x mc_chroma_bulk (the MC of
mocomp.cpp:152-208: quarter-pel luma windows from the 16-phase plane
stack, eighth-pel bilinear chroma), which are (nmb, 4, 8, 8)-class
advanced-indexing gathers (~150 ms combined at 1080p — TPU gathers
scalarize).  Here the grid walks MB rows with the row's plane/chroma
strips in VMEM (one DMA set per row, double-buffered is unnecessary at
3 strips x ~1 MB); per quadrant the windows are aligned slab loads +
dynamic lane/sublane rotates, written to per-MB output slots and
reassembled into planes by a free XLA transpose.

Bit-identical to the XLA bulk MC (tests/test_pframe_bulk.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rolled_win(ref, slot_rows, ry, rx, h, w):
    """(h, w) int32 window at dynamic (ry, rx) from a VMEM strip ref."""
    ry0 = pl.multiple_of((ry // 8) * 8, 8)
    rx0 = pl.multiple_of((rx // 128) * 128, 128)
    slab = ref[pl.ds(ry0, slot_rows), pl.ds(rx0, 256)].astype(jnp.int32)
    rotc = (256 - (rx & 127)) & 255
    rotr = slot_rows - (ry & 7)
    try:
        slab = pltpu.roll(slab, shift=rotc, axis=1)
        slab = pltpu.roll(slab, shift=rotr, axis=0)
    except Exception:  # interpret mode
        slab = jnp.roll(slab, rotc, axis=1)
        slab = jnp.roll(slab, rotr, axis=0)
    return slab[:h, :w]


def _mc_kernel(wmb: int, ext: int, ext_c: int, strip_ry: int,
               strip_rc: int, hmb: int,
               mv_ref, planes_hbm, cb_hbm, cr_hbm,
               oy_ref, ocb_ref, ocr_ref, ystrip, cbstrip, crstrip, sems):
    r = pl.program_id(0)
    cr8 = r % 8

    def _():
        d0 = pltpu.make_async_copy(
            planes_hbm.at[:, pl.ds(pl.multiple_of(16 * r, 8), strip_ry), :],
            ystrip, sems.at[0])
        d1 = pltpu.make_async_copy(
            cb_hbm.at[pl.ds(pl.multiple_of(8 * r, 8), strip_rc), :],
            cbstrip, sems.at[1])
        d2 = pltpu.make_async_copy(
            cr_hbm.at[pl.ds(pl.multiple_of(8 * r, 8), strip_rc), :],
            crstrip, sems.at[2])
        d0.start()
        d1.start()
        d2.start()
        d0.wait()
        d1.wait()
        d2.wait()

    _()

    def mb_body(b, carry):
        for q in range(4):
            mvx = mv_ref[cr8, (b * 4 + q) * 2]
            mvy = mv_ref[cr8, (b * 4 + q) * 2 + 1]
            # luma: (8, 8) window from the 16-phase strip
            f = (mvy & 3) * 4 + (mvx & 3)
            ry = 8 * (q >> 1) + (mvy >> 2) + ext
            rx = 16 * b + 8 * (q & 1) + (mvx >> 2) + ext
            win = _rolled_win(ystrip.at[f], 16, ry, rx, 8, 8)
            oy_ref[0, b, q] = win
            # chroma: eighth-pel bilinear from (5, 5) windows
            cy = 4 * (q >> 1) + (mvy >> 3) + ext_c + 1
            cx = 8 * b + 4 * (q & 1) + (mvx >> 3) + ext_c + 1
            fx = mvx & 7
            fy = mvy & 7
            for cref, oref in ((cbstrip, ocb_ref), (crstrip, ocr_ref)):
                w5 = _rolled_win(cref, 16, cy, cx, 5, 5)
                a = w5[0:4, 0:4]
                bb = w5[0:4, 1:5]
                c = w5[1:5, 0:4]
                d = w5[1:5, 1:5]
                oref[0, b, q] = ((8 - fx) * (8 - fy) * a
                                 + fx * (8 - fy) * bb
                                 + (8 - fx) * fy * c
                                 + fx * fy * d + 32) >> 6
        return carry

    jax.lax.fori_loop(0, wmb, mb_body, 0)


def mc_bulk_pallas_impl(planes, cb_pad, cr_pad, mv, ext: int, ext_c: int,
                        wmb: int, hmb: int):
    """(pred_y (H, W), pred_cb, pred_cr (H/2, W/2)) int32 — drop-in for
    mc_luma_bulk + mc_chroma_bulk at the quadrant-major MVs mv (nmb,4,2)."""
    nmb = wmb * hmb
    strip_ry = ((16 + 2 * ext - 12) // 8) * 8 + 16  # luma strip rows
    strip_rc = 32                                    # chroma strip rows
    he, we = planes.shape[1], planes.shape[2]
    we_pad = (-(-we // 128) + 2) * 128
    he_pad = max(he, 16 * (hmb - 1) + strip_ry)
    planes16 = jnp.pad(planes.astype(jnp.int16),
                       ((0, 0), (0, he_pad - he), (0, we_pad - we)))
    hec, wec = cb_pad.shape
    wec_pad = (-(-wec // 128) + 2) * 128
    hec_pad = max(hec, 8 * (hmb - 1) + strip_rc)
    cb16 = jnp.pad(cb_pad.astype(jnp.int16),
                   ((0, hec_pad - hec), (0, wec_pad - wec)))
    cr16 = jnp.pad(cr_pad.astype(jnp.int16),
                   ((0, hec_pad - hec), (0, wec_pad - wec)))

    hmb8 = -(-hmb // 8) * 8
    mvg = jnp.pad(mv.astype(jnp.int32).reshape(hmb, wmb * 8),
                  ((0, hmb8 - hmb), (0, 0)))

    kernel = functools.partial(
        _mc_kernel, wmb, ext, ext_c, strip_ry, strip_rc, hmb)
    interpret = jax.default_backend() != "tpu"
    oy, ocb, ocr = pl.pallas_call(
        kernel,
        grid=(hmb,),
        in_specs=[
            pl.BlockSpec((8, wmb * 8), lambda r: (r // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, wmb, 4, 8, 8), lambda r: (r, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wmb, 4, 4, 4), lambda r: (r, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wmb, 4, 4, 4), lambda r: (r, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((hmb, wmb, 4, 8, 8), jnp.int32),
            jax.ShapeDtypeStruct((hmb, wmb, 4, 4, 4), jnp.int32),
            jax.ShapeDtypeStruct((hmb, wmb, 4, 4, 4), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((16, strip_ry, we_pad), jnp.int16),
            pltpu.VMEM((strip_rc, wec_pad), jnp.int16),
            pltpu.VMEM((strip_rc, wec_pad), jnp.int16),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(mvg, planes16, cb16, cr16)

    def luma_plane(x):  # (hmb, wmb, 4, 8, 8) -> (H, W)
        x = x.reshape(hmb, wmb, 2, 2, 8, 8)
        return x.transpose(0, 2, 4, 1, 3, 5).reshape(hmb * 16, wmb * 16)

    def chroma_plane(x):  # (hmb, wmb, 4, 4, 4) -> (H/2, W/2)
        x = x.reshape(hmb, wmb, 2, 2, 4, 4)
        return x.transpose(0, 2, 4, 1, 3, 5).reshape(hmb * 8, wmb * 8)

    return luma_plane(oy), chroma_plane(ocb), chroma_plane(ocr)
