"""Pallas quarter-pel ME refinement: both 49-offset maps in ONE kernel.

The XLA formulation (codec/tpu_pframe.qpel_refine_map) evaluates each of
the 49 qpel offsets as a three-axis advanced-indexing gather of (nb, 8, 8)
windows from the 16-phase interpolated plane stack — ~100M gathered
elements per map, ~1.6 s/frame each on a v5e at 1080p (PROFILE_r04.md):
TPU gathers scalarize.  Here the gather disappears: the grid walks 8-px
block rows; each step DMAs the one plane-stack strip that every window of
that row can touch (all 16 phases x (2*window+10) rows, double-buffered
HBM->VMEM), and the per-block windows become cheap dynamic-offset vector
loads from VMEM.  Both refinement maps (integer-argmin center + temporal
center, codec/encoder._search_mb's two centers; the optimized-ME candidate
re-scoring idea of the reference, moestimation.cpp:460-520) share the strip.

Outputs are bit-identical to qpel_refine_map (tests/test_pframe_bulk.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _refine_kernel(wb: int, window: int, ext: int, radius: int,
                   metric_id: int, hb: int,
                   c1_ref, c2_ref, src_ref, planes_hbm, q1_ref, q2_ref,
                   strip, sems):
    r = pl.program_id(0)
    # strip row 0 = plane row 8*r (8-aligned for the HBM-side slice);
    # window rows then live at strip row ext + (mvy >> 2) in
    # [ext - window - 1, ext + window + 1]
    nrows_s = ((2 * window + 3) // 8) * 8 + 16  # aligned scratch rows
    K = 2 * radius + 1

    def dma(slot, row):
        return pltpu.make_async_copy(
            planes_hbm.at[:, pl.ds(pl.multiple_of(row * 8, 8), nrows_s), :],
            strip.at[slot],
            sems.at[slot],
        )

    @pl.when(r == 0)
    def _():
        dma(0, 0).start()

    @pl.when(r + 1 < hb)
    def _():
        dma((r + 1) % 2, r + 1).start()

    dma(r % 2, r).wait()
    slot = r % 2

    cr = r % 8  # row within the (8, 2*wb) SMEM center block
    K2 = K * K
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K2), 1)

    def rolled_slab(f, ry, rx):
        # Mosaic only loads at aligned offsets (sublanes %8, lanes %128):
        # fetch the aligned (16, 256) superset slab and rotate the window
        # origin to (0, 0) (tpu dynamic rotates want 32-bit data)
        ry0 = pl.multiple_of((ry // 8) * 8, 8)
        rx0 = pl.multiple_of((rx // 128) * 128, 128)
        slab = strip[slot, f, pl.ds(ry0, 16),
                     pl.ds(rx0, 256)].astype(jnp.int32)
        rotr = (16 - (ry & 7)) & 15
        rotc = (256 - (rx & 127)) & 255
        try:
            slab = pltpu.roll(slab, shift=rotc, axis=1)
            slab = pltpu.roll(slab, shift=rotr, axis=0)
        except Exception:  # interpret mode
            slab = jnp.roll(slab, rotc, axis=1)
            slab = jnp.roll(slab, rotr, axis=0)
        return slab

    def metric_sum(d):
        if metric_id == 0:
            return jnp.abs(d).sum()
        if metric_id == 1:
            return (d * d).sum()
        return 2 * (d * d).sum()

    # offsets hitting phase (dy & 3): frac-0 centers make the integer
    # sub-offset per candidate STATIC (negative qpel -> floor to -1)
    phase_dys = [[d for d in range(-radius, radius + 1) if (d & 3) == g]
                 for g in range(4)]

    def block_body(b, carry):
        sb = src_ref[0, b].astype(jnp.int32)  # (8, 8)

        # --- center 1: integer-argmin center, always frac 0 — group the
        # 49 offsets by phase: ONE rotated slab per phase covers its
        # <=2x2 integer sub-offsets as static slices (16 loads vs 49)
        c1x = c1_ref[cr, 2 * b]
        c1y = c1_ref[cr, 2 * b + 1]
        bx = (c1x >> 2) - 1 + 8 * b + ext  # top-left of the 2x2 int span
        by = (c1y >> 2) - 1 + ext
        row = jnp.zeros((1, K2), jnp.int32)
        for gy in range(4):
            for gx in range(4):
                f = gy * 4 + gx
                slab = rolled_slab(f, by, bx)
                for dy in phase_dys[gy]:
                    oy = 0 if dy < 0 else 1
                    for dx in phase_dys[gx]:
                        ox = 0 if dx < 0 else 1
                        d = slab[oy : oy + 8, ox : ox + 8] - sb
                        k = (dy + radius) * K + (dx + radius)
                        row = jnp.where(lane == k, metric_sum(d), row)
        q1_ref[0, pl.ds(b, 1), :] = row

        assert radius == 3, "c2 phase grouping assumes the +/-3 window"
        # --- center 2: temporal center, arbitrary frac — phase-grouped
        # with RUNTIME offset mapping: for phase g the offsets are
        # dy in {m-4, m} with m = (g - frac) & 3, whose integer parts are
        # consecutive, so one slab per phase again covers a 2x2 static
        # sub-window span. Out-of-range candidates (m == 0 -> dy = -4)
        # get a negative k and their lane select never fires.
        c2x = c2_ref[cr, 2 * b]
        c2y = c2_ref[cr, 2 * b + 1]
        fy = c2y & 3
        fx = c2x & 3
        row = jnp.zeros((1, K2), jnp.int32)
        for gy in range(4):
            my = (gy - fy) & 3
            by2 = ((c2y + my) >> 2) - 1
            for gx in range(4):
                mx = (gx - fx) & 3
                bx2 = ((c2x + mx) >> 2) - 1
                f = gy * 4 + gx
                slab = rolled_slab(f, by2 + ext, 8 * b + bx2 + ext)
                for oy in range(2):
                    dy = my + 4 * (oy - 1)
                    for ox in range(2):
                        dx = mx + 4 * (ox - 1)
                        d = slab[oy : oy + 8, ox : ox + 8] - sb
                        k = (dy + radius) * K + (dx + radius)
                        # m == 0 phantoms (dy or dx = -4) must be masked
                        # EXPLICITLY: dx = -4 makes k = K*(dy+r) - 1,
                        # which collides with a real offset of the row
                        # above whenever dy > -r
                        k = jnp.where((dy >= -radius) & (dx >= -radius),
                                      k, -1)
                        row = jnp.where(lane == k, metric_sum(d), row)
        q2_ref[0, pl.ds(b, 1), :] = row
        return carry

    jax.lax.fori_loop(0, wb, block_body, 0)


def qpel_refine_pallas_impl(src_y, planes, c1, c2, window: int, ext: int,
                            metric_id: int, radius: int = 3):
    """(q1map, q2map), each (nb, (2r+1)^2) int32 — the two qpel refinement
    maps of codec/tpu_pframe.pframe_maps in one launch.

    src_y: (H, W) int; planes: (16, he, we) from interpolated_planes_jax
    (values 0..255); c1/c2: (nb, 2) qpel centers, every offset in-bounds
    (callers range-check as for qpel_refine_map).
    """
    H, W = src_y.shape
    hb, wb = H // 8, W // 8
    K2 = (2 * radius + 1) ** 2
    nrows = 2 * window + 10

    # per-block (8, 8) source tiles: block index = major dim (dynamic
    # major indexing is free; dynamic lane offsets are not)
    src4 = (src_y.astype(jnp.int16).reshape(hb, 8, wb, 8)
            .transpose(0, 2, 1, 3))  # (hb, wb, 8, 8)
    # pad plane lanes so every 128-aligned 256-lane slab load is in
    # bounds, and rows so the aligned full-height strip DMA stays in
    # bounds at the bottom block row
    he, we = planes.shape[1], planes.shape[2]
    we_pad = (-(-we // 128) + 2) * 128
    nrows_s = ((2 * window + 3) // 8) * 8 + 16
    he_pad = max(he, 8 * (hb - 1) + nrows_s)
    planes16 = jnp.pad(planes.astype(jnp.int16),
                       ((0, 0), (0, he_pad - he), (0, we_pad - we)))
    # centers ride in SMEM; Mosaic wants 8-row blocks there, so pad the
    # row count and index row r % 8 of block r // 8 in the kernel
    hb8 = -(-hb // 8) * 8
    pad_r = ((0, hb8 - hb), (0, 0))
    c1g = jnp.pad(c1.astype(jnp.int32).reshape(hb, 2 * wb), pad_r)
    c2g = jnp.pad(c2.astype(jnp.int32).reshape(hb, 2 * wb), pad_r)

    kernel = functools.partial(
        _refine_kernel, wb, window, ext, radius, metric_id, hb)
    interpret = jax.default_backend() != "tpu"
    q1, q2 = pl.pallas_call(
        kernel,
        grid=(hb,),
        in_specs=[
            pl.BlockSpec((8, 2 * wb), lambda r: (r // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 2 * wb), lambda r: (r // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, wb, 8, 8), lambda r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, wb, K2), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wb, K2), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((hb, wb, K2), jnp.int32),
            jax.ShapeDtypeStruct((hb, wb, K2), jnp.int32),
        ),
        scratch_shapes=[
            # row dim padded so the aligned 16-row slab loads stay in
            # bounds: max ry = 2*window + 2, aligned-down + 16
            pltpu.VMEM((2, 16, nrows_s, we_pad), jnp.int16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(c1g, c2g, src4, planes16)
    return q1.reshape(hb * wb, K2), q2.reshape(hb * wb, K2)


qpel_refine_pallas = functools.partial(jax.jit, static_argnames=(
    "window", "ext", "metric_id", "radius"))(qpel_refine_pallas_impl)
