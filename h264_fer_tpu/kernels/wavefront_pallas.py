"""Pallas grid-sequential intra wavefront: whole-frame reconstruction in ONE
kernel launch.

The XLA `lax.fori_loop` wavefronts (kernels/wavefront.py) pay per-diagonal
dispatch + HBM round-trip costs: at 1080p the fused I16 frame wavefront is
~187 XLA loop steps (~23 ms) and the Intra_4x4 wavefront ~1022 steps
(~840 ms). Here the anti-diagonal loop IS the Pallas grid: TPU grid steps
execute sequentially on a core, VMEM scratch persists across steps, so the
loop-carried neighbor state (the reconstructed bottom rows / right columns
of the previous diagonal — a few KB) never leaves VMEM, and the skewed
source/outputs stream HBM↔VMEM via double-buffered BlockSpec DMA.

Layout inside the kernel: (y, x, slot) — pixels of a diagonal's MBs, with
the wavefront slot (absolute MB row) in the lane dimension, so every
predict / transform / quant step is an elementwise int32 VPU op over all
MBs of the diagonal; 4x4 transforms are unrolled shift-add butterflies over
static y/x slices (the reference's forwardTransform4x4 / inverseTransform4x4
math, quantizationTransform.cpp:41-100, scaleTransform.cpp:101-150).

Outputs are bit-identical to kernels/wavefront.py (tests/test_pallas_wavefront.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.tables import LEVEL_QUANTIZE, LEVEL_SCALE


# ---------------------------------------------------------------------------
# in-kernel integer transform helpers, layout (ny*4, nx*4, L) spatial


def _roll_lanes(v, shift: int):
    """Circular shift along the last (lane) axis, interpret-safe."""
    try:
        return pltpu.roll(v, shift=shift, axis=v.ndim - 1)
    except Exception:
        return jnp.roll(v, shift, axis=v.ndim - 1)


_FWD_W = ((256, 256, 256, 256), (416, 208, -208, -416),
          (256, -256, -256, 256), (208, -416, 416, -208))


def _fwd_transform(diff, nb_y: int, nb_x: int):
    """Forward scaled 4x4 DCT on (4*nb_y, 4*nb_x, L) int32 spatial residual."""
    h = jnp.where(diff == 0, 0, (diff << 6) - 32)
    # column pass (along y): rows of each 4-row group
    rows = []
    for by in range(nb_y):
        for i in range(4):
            acc = None
            for k in range(4):
                t = _FWD_W[i][k] * h[4 * by + k]
                acc = t if acc is None else acc + t
            rows.append((acc + 512) >> 10)
    f = jnp.stack(rows, axis=0)  # (4*nb_y, 4*nb_x, L)
    # row pass (along x)
    cols = []
    for bx in range(nb_x):
        for j in range(4):
            acc = None
            for k in range(4):
                t = _FWD_W[j][k] * f[:, 4 * bx + k]
                acc = t if acc is None else acc + t
            cols.append((acc + 512) >> 10)
    return jnp.stack(cols, axis=1)


def _inv_transform(d, nb_y: int, nb_x: int):
    """Inverse 4x4 core transform on (4*nb_y, 4*nb_x, L) int32 coefficients.

    Reference butterfly (scaleTransform.cpp:101-150): column-direction pass
    over d[..., :, k] first, then row-direction, final (h + 32) >> 6.
    """
    # pass 1: combine the 4 columns of each block (along x)
    fs = []
    for bx in range(nb_x):
        d0, d1 = d[:, 4 * bx + 0], d[:, 4 * bx + 1]
        d2, d3 = d[:, 4 * bx + 2], d[:, 4 * bx + 3]
        e0, e1 = d0 + d2, d0 - d2
        e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
        fs += [e0 + e3, e1 + e2, e1 - e2, e0 - e3]
    f = jnp.stack(fs, axis=1)
    # pass 2: combine the 4 rows of each block (along y)
    hs = []
    for by in range(nb_y):
        f0, f1 = f[4 * by + 0], f[4 * by + 1]
        f2, f3 = f[4 * by + 2], f[4 * by + 3]
        g0, g1 = f0 + f2, f0 - f2
        g2, g3 = (f1 >> 1) - f3, f1 + (f3 >> 1)
        hs += [g0 + g3, g1 + g2, g1 - g2, g0 - g3]
    h = jnp.stack(hs, axis=0)
    return (h + 32) >> 6


def _coef_table(table, qp: int, ny: int, nx: int):
    """Spatial (ny, nx, 1) per-coefficient table built from iota (Pallas
    kernels may not capture array constants). Both LEVEL_QUANTIZE and
    LEVEL_SCALE follow the 3-value H.264 pattern: (even,even) → m[0,0],
    (odd,odd) → m[1,1], else m[0,1], by coefficient position mod 2."""
    m = np.asarray(table[qp % 6])
    a, b, c = int(m[0, 0]), int(m[1, 1]), int(m[0, 1])
    yi = jax.lax.broadcasted_iota(jnp.int32, (ny, nx, 1), 0) % 2
    xi = jax.lax.broadcasted_iota(jnp.int32, (ny, nx, 1), 1) % 2
    return jnp.where(
        (yi == 0) & (xi == 0), a, jnp.where((yi == 1) & (xi == 1), b, c)
    )


def _quant_spatial(d, qp: int, nb_y: int, nb_x: int):
    """quantisationResidualBlock on spatial coefficients (no DC bypass)."""
    lq = _coef_table(LEVEL_QUANTIZE, qp, 4 * nb_y, 4 * nb_x)
    if qp < 24:
        qbits = 4 - qp // 6
        adjust = 1 << (3 - qp // 6)
        return (((d << qbits) - adjust) * lq + 16384) >> 15
    return ((d >> (qp // 6 - 4)) * lq + 16384) >> 15


def _scale_spatial(c, qp: int, nb_y: int, nb_x: int):
    """scaleResidualBlock on spatial coefficients (no DC bypass)."""
    ls = _coef_table(LEVEL_SCALE, qp, 4 * nb_y, 4 * nb_x)
    if qp >= 24:
        return (c * ls) << (qp // 6 - 4)
    return (c * ls + (1 << (3 - qp // 6))) >> (4 - qp // 6)


def _dc_mask(nb_y: int, nb_x: int):
    yi = jax.lax.broadcasted_iota(jnp.int32, (4 * nb_y, 4 * nb_x, 1), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (4 * nb_y, 4 * nb_x, 1), 1)
    return (yi % 4 == 0) & (xi % 4 == 0)


def _rep4(v):
    """(a, b, L) -> (4a, 4b, L) with value[y, x] = v[y//4, x//4].

    Element-repeat via broadcast + merge of leading dims (pltpu.repeat has
    tile semantics, not jnp.repeat's element semantics).
    """
    a, b, L = v.shape
    e = jnp.broadcast_to(v[:, None, :, None, :], (a, 4, b, 4, L))
    return e.reshape(4 * a, 4 * b, L)


def _block_dc(d, nb_y: int, nb_x: int):
    """Collect per-block DC coefficients: (4a, 4b, L) -> (a, b, L)."""
    return jnp.concatenate(
        [
            jnp.concatenate(
                [d[4 * by : 4 * by + 1, 4 * bx : 4 * bx + 1]
                 for bx in range(nb_x)],
                axis=1,
            )
            for by in range(nb_y)
        ],
        axis=0,
    )


# ---------------------------------------------------------------------------
# the fused 3-plane I16 wavefront kernel


def _i16_kernel_body(wmb, hmb, qp, qpc,
                     msk_ref, cmsk_ref, ysk_ref, cbsk_ref, crsk_ref,
                     yrec_ref, qy_ref, qydc_ref,
                     cbrec_ref, crrec_ref, qcb_ref, qcr_ref, qcdc_ref,
                     trow_s, lcol_s, corner_s, ctrow_s, clcol_s, ccorner_s):
    dmax = hmb
    d = pl.program_id(0)

    slot = jax.lax.broadcasted_iota(jnp.int32, (1, dmax), 1)
    c_of = d - slot
    valid = (c_of >= 0) & (c_of < wmb)
    left_ok = valid & (c_of > 0)
    top_ok = valid & (slot > 0)
    corner_ok = left_ok & top_ok

    # ---- luma neighbor fetch from carried scratch -------------------------
    trow_prev = trow_s[...]          # (16, dmax): bottom rows of diag d-1
    lcol_prev = lcol_s[...]          # (16, dmax): right cols of diag d-1
    corner_prev = corner_s[...]      # (1, dmax): bottom-right px of diag d-2

    lcol = jnp.where(left_ok, lcol_prev, -1)               # (16, dmax)
    trow = jnp.where(top_ok, _roll_lanes(trow_prev, 1), -1)
    corner = jnp.where(corner_ok, _roll_lanes(corner_prev, 1), -1)  # (1, dmax)

    m16 = msk_ref[0]  # (1, dmax)

    # ---- luma prediction (V / H / DC / Plane), layout (16, 16, dmax) ------
    pred_v = jnp.broadcast_to(trow[None, :, :], (16, 16, dmax))
    pred_h = jnp.broadcast_to(lcol[:, None, :], (16, 16, dmax))
    sum_t = trow.sum(axis=0, keepdims=True)  # (1, dmax)
    sum_l = lcol.sum(axis=0, keepdims=True)
    dcval = jnp.where(
        corner_ok,
        (sum_t + sum_l + 16) >> 5,
        jnp.where(
            left_ok,
            (sum_l + 8) >> 4,
            jnp.where(top_ok, (sum_t + 8) >> 4, 128),
        ),
    )
    pred_dc = jnp.broadcast_to(dcval[None, :, :], (16, 16, dmax))
    # plane (8.3.3.4): H/V gradients from boundary samples; all (1, dmax)
    hgrad = None
    vgrad = None
    for i in range(8):
        tm = corner if i == 7 else trow[6 - i : 7 - i]
        lm = corner if i == 7 else lcol[6 - i : 7 - i]
        th = (i + 1) * (trow[8 + i : 9 + i] - tm)
        tv = (i + 1) * (lcol[8 + i : 9 + i] - lm)
        hgrad = th if hgrad is None else hgrad + th
        vgrad = tv if vgrad is None else vgrad + tv
    a = (lcol[15:16] + trow[15:16]) << 4   # (1, dmax)
    b = (5 * hgrad + 32) >> 6
    c = (5 * vgrad + 32) >> 6
    xs = jax.lax.broadcasted_iota(jnp.int32, (16, 16, 1), 1) - 7
    ys = jax.lax.broadcasted_iota(jnp.int32, (16, 16, 1), 0) - 7
    pred_p = jnp.clip(
        (a[None] + b[None] * xs + c[None] * ys + 16) >> 5,
        0,
        255,
    )
    mm = m16[None]  # (1, 1, dmax)
    pred = jnp.where(
        mm == 0,
        pred_v,
        jnp.where(mm == 1, pred_h, jnp.where(mm == 2, pred_dc, pred_p)),
    )

    # ---- luma transform + quant + DC path + reconstruct -------------------
    src = ysk_ref[0]  # (16, 16, dmax)
    dcoef = _fwd_transform(src - pred, 4, 4)
    q = _quant_spatial(dcoef, qp, 4, 4)
    dcm = _dc_mask(4, 4)

    dc16 = _block_dc(dcoef, 4, 4)  # (4, 4, dmax) raw DC (bypass quirk)
    # forward 4x4 Hadamard (+8)>>4, then DC quant
    H4 = ((1, 1, 1, 1), (1, 1, -1, -1), (1, -1, -1, 1), (1, -1, 1, -1))

    def had4(v):
        r1 = jnp.stack(
            [sum(H4[i][k] * v[k] for k in range(4)) for i in range(4)], axis=0
        )
        return jnp.stack(
            [sum(H4[j][k] * r1[:, k] for k in range(4)) for j in range(4)],
            axis=1,
        )

    fdc = (had4(dc16) + 8) >> 4
    lq0 = int(LEVEL_QUANTIZE[qp % 6, 0, 0])
    if qp >= 36:
        qdc = ((fdc >> (qp // 6 - 6)) * lq0 + 16384) >> 15
    else:
        qdc = (((fdc << (6 - qp // 6)) - (1 << (5 - qp // 6))) * lq0 + 16384) >> 15
    # inverse: Hadamard (no shift) then scale
    idc = had4(qdc)
    ls0 = int(LEVEL_SCALE[qp % 6, 0, 0])
    if qp >= 36:
        dcv = (idc * ls0) << (qp // 6 - 6)
    else:
        dcv = (idc * ls0 + (1 << (5 - qp // 6))) >> (6 - qp // 6)

    scaled = _scale_spatial(q, qp, 4, 4)
    scaled = jnp.where(dcm, _rep4(dcv), scaled)
    res = _inv_transform(scaled, 4, 4)
    recon = jnp.clip(pred + res, 0, 255)

    yrec_ref[0] = recon
    qy_ref[0] = jnp.where(dcm, 0, q)
    qydc_ref[0] = qdc

    # ---- luma scratch update (order matters: corner snapshot first) -------
    corner_s[...] = trow_prev[15:16, :]
    trow_s[...] = recon[15]
    lcol_s[...] = recon[:, 15]

    # ---- chroma (both planes share the mode) -------------------------------
    cm = cmsk_ref[0]  # (1, dmax)
    ctrow_prev = ctrow_s[...]    # (2, 8, dmax)
    clcol_prev = clcol_s[...]
    ccorner_prev = ccorner_s[...]  # (2, dmax) — 2D: a (2,1,L) VMEM scratch
    # trips a Mosaic lowering assert (middle dim 1), so corners carry flat

    ctrow = jnp.where(top_ok[None], _roll_lanes(ctrow_prev, 1), -1)   # (2,8,dmax)
    clcol = jnp.where(left_ok[None], clcol_prev, -1)
    ccorner = jnp.where(
        corner_ok, _roll_lanes(ccorner_prev, 1), -1
    )  # (2,dmax)

    csrc = jnp.stack([cbsk_ref[0], crsk_ref[0]], axis=0)  # (2, 8, 8, dmax)

    # chroma prediction (modes: 0 DC, 1 H, 2 V, 3 Plane), layout (2,8,8,dmax)
    cpred_h = jnp.broadcast_to(clcol[:, :, None, :], (2, 8, 8, dmax))
    cpred_v = jnp.broadcast_to(ctrow[:, None, :, :], (2, 8, 8, dmax))
    # DC per quadrant (intra.cpp:568-630 rules)
    qsum_t = [ctrow[:, 0:4].sum(axis=1), ctrow[:, 4:8].sum(axis=1)]  # (2,dmax)
    qsum_l = [clcol[:, 0:4].sum(axis=1), clcol[:, 4:8].sum(axis=1)]

    def qdc_val(xq, yq):
        # shapes: sums (2, dmax), ok masks (1, dmax) → broadcast (2, dmax)
        sx, sy = qsum_t[xq], qsum_l[yq]
        both = (sx + sy + 4) >> 3
        lonly = (sy + 2) >> 2
        tonly = (sx + 2) >> 2
        if (xq, yq) in ((0, 0), (1, 1)):  # corner quadrants: both→left→top
            return jnp.where(
                corner_ok,
                both,
                jnp.where(left_ok, lonly, jnp.where(top_ok, tonly, 128)),
            )
        if (xq, yq) == (1, 0):  # top-right: top→left
            return jnp.where(
                top_ok, tonly, jnp.where(left_ok, lonly, 128)
            )
        return jnp.where(  # bottom-left: left→top
            left_ok, lonly, jnp.where(top_ok, tonly, 128)
        )

    ygrid = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 8, 1), 1)
    xgrid = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 8, 1), 2)
    cpred_dc = jnp.zeros((2, 8, 8, dmax), jnp.int32)
    for yq in range(2):
        for xq in range(2):
            sel = ((ygrid >= 4 * yq) & (ygrid < 4 * yq + 4)
                   & (xgrid >= 4 * xq) & (xgrid < 4 * xq + 4))
            cpred_dc = jnp.where(
                sel, qdc_val(xq, yq)[:, None, None, :], cpred_dc
            )
    # plane
    chg = None
    cvg = None
    for i in range(4):
        tm = ccorner if i == 3 else ctrow[:, 2 - i]  # (2, dmax)
        lm = ccorner if i == 3 else clcol[:, 2 - i]
        th = (i + 1) * (ctrow[:, 4 + i] - tm)
        tv = (i + 1) * (clcol[:, 4 + i] - lm)
        chg = th if chg is None else chg + th
        cvg = tv if cvg is None else cvg + tv
    ca = (clcol[:, 7] + ctrow[:, 7]) << 4   # (2, dmax)
    cb = (34 * chg + 32) >> 6
    cc = (34 * cvg + 32) >> 6
    cxs = xgrid - 3
    cys = ygrid - 3
    cpred_p = jnp.clip(
        (ca[:, None, None, :] + cb[:, None, None, :] * cxs
         + cc[:, None, None, :] * cys + 16) >> 5,
        0,
        255,
    )
    cmm = cm[None, None]  # (1, 1, 1, dmax)
    cpred = jnp.where(
        cmm == 0,
        cpred_dc,
        jnp.where(cmm == 1, cpred_h,
                  jnp.where(cmm == 2, cpred_v, cpred_p)),
    )

    cdiff = csrc - cpred
    cdcoef = jnp.stack(
        [_fwd_transform(cdiff[k], 2, 2) for k in range(2)], axis=0
    )
    cq = jnp.stack(
        [_quant_spatial(cdcoef[k], qpc, 2, 2) for k in range(2)], axis=0
    )
    cdcm = _dc_mask(2, 2)

    cdc = jnp.stack([_block_dc(cdcoef[k], 2, 2) for k in range(2)], axis=0)
    # 2x2 Hadamard fwd (+2)>>2, chroma DC quant / dequant (no rounding inv)
    def had2(v):  # (2, 2, 2, dmax)
        r0 = v[:, 0] + v[:, 1]
        r1 = v[:, 0] - v[:, 1]
        return jnp.stack(
            [
                jnp.stack([r0[:, 0] + r0[:, 1], r0[:, 0] - r0[:, 1]], axis=1),
                jnp.stack([r1[:, 0] + r1[:, 1], r1[:, 0] - r1[:, 1]], axis=1),
            ],
            axis=1,
        )

    cfdc = (had2(cdc) + 2) >> 2
    clq0 = int(LEVEL_QUANTIZE[qpc % 6, 0, 0])
    cqdc = (((cfdc << 5) >> (qpc // 6)) * clq0 + 16384) >> 15
    cls0 = int(LEVEL_SCALE[qpc % 6, 0, 0])
    cdcv = ((had2(cqdc) * cls0) << (qpc // 6)) >> 5

    cscaled = jnp.stack(
        [_scale_spatial(cq[k], qpc, 2, 2) for k in range(2)], axis=0
    )
    crep = jnp.stack([_rep4(cdcv[k]) for k in range(2)], axis=0)
    cscaled = jnp.where(cdcm[None], crep, cscaled)
    cres = jnp.stack(
        [_inv_transform(cscaled[k], 2, 2) for k in range(2)], axis=0
    )
    crecon = jnp.clip(cpred + cres, 0, 255)

    cbrec_ref[0] = crecon[0]
    crrec_ref[0] = crecon[1]
    qcb_ref[0] = jnp.where(cdcm, 0, cq[0])
    qcr_ref[0] = jnp.where(cdcm, 0, cq[1])
    qcdc_ref[0] = cqdc

    ccorner_s[...] = ctrow_prev[:, 7]
    ctrow_s[...] = crecon[:, 7]
    clcol_s[...] = crecon[:, :, 7]


def _skew(grid, ndiag: int, wmb: int, hmb: int, lead: int = 0):
    """(…, hmb, wmb, …) → (…, ndiag, dmax, …): skew[d, r] = grid[r, d - r]."""
    rows = []
    for r in range(hmb):
        g = grid[(slice(None),) * lead + (r,)]
        pad = [(0, 0)] * lead + [(r, ndiag - wmb - r)] + [(0, 0)] * (
            g.ndim - 1 - lead
        )
        rows.append(jnp.pad(g, pad))
    return jnp.stack(rows, axis=lead + 1)


def _unskew_idx(wmb: int, hmb: int):
    rg = jnp.arange(hmb)[:, None]
    cg = jnp.arange(wmb)[None, :]
    return rg + cg, jnp.broadcast_to(rg, (hmb, wmb))


@functools.partial(jax.jit, static_argnames=("wmb", "hmb", "qp", "qpc"))
def pallas_i16_frame(y_src, cb_src, cr_src, modes, cmodes,
                     wmb: int, hmb: int, qp: int, qpc: int):
    """Drop-in replacement for kernels.wavefront.wavefront_i16_frame.

    Returns (y, i16dc (nmb,16), ac (nmb,16,15), cb, cr,
    cdc (2,nmb,4), cac (2,nmb,4,15)) — bit-identical outputs.
    """
    nmb = wmb * hmb
    ndiag = hmb + wmb - 1
    dmax = hmb

    ygrid = y_src.reshape(hmb, 16, wmb, 16).transpose(0, 2, 1, 3)
    cbgrid = cb_src.reshape(hmb, 8, wmb, 8).transpose(0, 2, 1, 3)
    crgrid = cr_src.reshape(hmb, 8, wmb, 8).transpose(0, 2, 1, 3)

    # skew to (ndiag, dmax, …) then move the slot axis to lanes
    ysk = _skew(ygrid, ndiag, wmb, hmb).transpose(0, 2, 3, 1)      # (nd,16,16,dmax)
    cbsk = _skew(cbgrid, ndiag, wmb, hmb).transpose(0, 2, 3, 1)    # (nd,8,8,dmax)
    crsk = _skew(crgrid, ndiag, wmb, hmb).transpose(0, 2, 3, 1)
    msk = _skew(modes.reshape(hmb, wmb), ndiag, wmb, hmb)[:, None, :]   # (nd,1,dmax)
    cmsk = _skew(cmodes.reshape(hmb, wmb), ndiag, wmb, hmb)[:, None, :]

    kernel = functools.partial(_i16_kernel_body, wmb, hmb, qp, qpc)

    def spec(shape):
        return pl.BlockSpec(
            (1,) + shape,
            lambda d: (d,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    out_shapes = (
        jax.ShapeDtypeStruct((ndiag, 16, 16, dmax), jnp.int32),  # yrec
        jax.ShapeDtypeStruct((ndiag, 16, 16, dmax), jnp.int32),  # qy (AC)
        jax.ShapeDtypeStruct((ndiag, 4, 4, dmax), jnp.int32),    # qydc
        jax.ShapeDtypeStruct((ndiag, 8, 8, dmax), jnp.int32),    # cbrec
        jax.ShapeDtypeStruct((ndiag, 8, 8, dmax), jnp.int32),    # crrec
        jax.ShapeDtypeStruct((ndiag, 8, 8, dmax), jnp.int32),    # qcb (AC)
        jax.ShapeDtypeStruct((ndiag, 8, 8, dmax), jnp.int32),    # qcr (AC)
        jax.ShapeDtypeStruct((ndiag, 2, 2, 2, dmax), jnp.int32), # qcdc
    )

    interpret = jax.default_backend() != "tpu"
    yrec, qy, qydc, cbrec, crrec, qcb, qcr, qcdc = pl.pallas_call(
        kernel,
        grid=(ndiag,),
        in_specs=[
            spec((1, dmax)), spec((1, dmax)),
            spec((16, 16, dmax)), spec((8, 8, dmax)), spec((8, 8, dmax)),
        ],
        out_specs=tuple(
            spec(s.shape[1:]) for s in out_shapes
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((16, dmax), jnp.int32),      # trow
            pltpu.VMEM((16, dmax), jnp.int32),      # lcol
            pltpu.VMEM((1, dmax), jnp.int32),       # corner (d-2)
            pltpu.VMEM((2, 8, dmax), jnp.int32),    # ctrow
            pltpu.VMEM((2, 8, dmax), jnp.int32),    # clcol
            pltpu.VMEM((2, dmax), jnp.int32),       # ccorner (d-2)
        ],
        interpret=interpret,
    )(msk, cmsk, ysk, cbsk, crsk)

    # ---- unskew + list assembly (bulk XLA, once per frame) ----------------
    from ..ops import transform

    di, ri = _unskew_idx(wmb, hmb)

    def unskew(a):  # (ndiag, …, dmax) → (hmb, wmb, …)
        moved = jnp.moveaxis(a, -1, 1)  # (ndiag, dmax, …)
        return moved[di, ri]

    ygridr = unskew(yrec)
    frame = ygridr.transpose(0, 2, 1, 3).reshape(hmb * 16, wmb * 16)
    cbf = unskew(cbrec).transpose(0, 2, 1, 3).reshape(hmb * 8, wmb * 8)
    crf = unskew(crrec).transpose(0, 2, 1, 3).reshape(hmb * 8, wmb * 8)

    def zmb_blocks(x):  # (…, 16, 16) → (…, 16, 4, 4) Z-scan
        b = x.reshape(*x.shape[:-2], 2, 2, 4, 2, 2, 4)
        b = jnp.moveaxis(b, (-6, -3, -5, -2), (-6, -5, -4, -3))
        return b.reshape(*x.shape[:-2], 16, 4, 4)

    qblocks = zmb_blocks(unskew(qy)).reshape(nmb, 16, 4, 4)
    ac = transform.zigzag_scan(qblocks)[..., 1:]                 # (nmb,16,15)
    i16dc = transform.zigzag_scan(unskew(qydc).reshape(nmb, 4, 4))

    def cblocks(x):  # (…, 8, 8) → (…, 4, 4, 4) raster
        b = x.reshape(*x.shape[:-2], 2, 4, 2, 4)
        b = jnp.moveaxis(b, -3, -2)
        return b.reshape(*x.shape[:-2], 4, 4, 4)

    cacb = transform.zigzag_scan(cblocks(unskew(qcb)).reshape(nmb, 4, 4, 4))[..., 1:]
    cacr = transform.zigzag_scan(cblocks(unskew(qcr)).reshape(nmb, 4, 4, 4))[..., 1:]
    cac = jnp.stack([cacb, cacr], axis=0)                        # (2,nmb,4,15)
    # qcdc: (ndiag, 2, 2, 2, dmax) → (nmb, 2 planes, 4 raster) → (2, nmb, 4)
    cdc = jnp.moveaxis(unskew(qcdc).reshape(nmb, 2, 4), 1, 0)

    return frame, i16dc, ac, cbf, crf, cdc, cac


# ---------------------------------------------------------------------------
# Intra_4x4 luma wavefront (knight-move waves d = 2R + C over the global
# 4x4-block grid; kernels/wavefront.py:wavefront_i4x4_luma is the XLA
# reference implementation, ~1022 sequential fori_loop steps at 1080p).
#
# DMA-byte economy (this platform's Pallas DMA streams at ~1 GB/s): the
# kernel reads uint8 skewed source blocks + int32 modes and writes ONLY the
# reconstructed pixels as uint8. The quantized levels are recomputed
# afterwards in bulk XLA (i4x4_levels_from_recon below): once recon is
# known, every block's prediction/transform/quant is independent.


def _i4_kernel_body(WB, HB, qp,
                    msk_ref, src_ref,
                    rec_ref,
                    rcol_s, brow1_s, brow2_s, cor3_s):
    S = HB
    d = pl.program_id(0)

    slotv = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)  # absolute row R
    C = d - 2 * slotv
    valid = (C >= 0) & (C < WB)
    left_ok = valid & (C > 0)
    top_ok = valid & (slotv > 0)
    corner_ok = left_ok & top_ok

    rcol_prev = rcol_s[...]   # (4, S) right cols of wave d-1
    brow1 = brow1_s[...]      # (4, S) bottom rows of wave d-1
    brow2 = brow2_s[...]      # (4, S) bottom rows of wave d-2
    cor3 = cor3_s[...]        # (1, S) bottom-right px of wave d-3

    lcol = jnp.where(left_ok, rcol_prev, -1)                  # (4, S) y=0..3
    trow = jnp.where(top_ok, _roll_lanes(brow2, 1), -1)       # (4, S) x=0..3
    corner = jnp.where(corner_ok, _roll_lanes(cor3, 1), -1)   # (1, S)
    # above-right with the replication rule (intra.cpp:345-370)
    bx = C % 4
    by = slotv % 4
    repl = (
        (C + 1 >= WB)
        | ((bx == 3) & (by > 0))
        | ((bx == 1) & ((by == 1) | (by == 3)))
    )
    ar_raw = _roll_lanes(brow1, 1)                            # (4, S) x=4..7
    last = trow[3:4]
    ar = jnp.where(repl | ~top_ok, last, ar_raw)
    ar = jnp.where(top_ok, ar, -1)

    def P(x, y):
        """p(x, y) sample rows, each (1, S). Mirrors ops/intra._p4, where
        x==-1 selects p[y+1] — so (x=-1, y=-1) is the corner sample, and
        directional index arithmetic can also drive the first argument to
        -1 with y==-1 (e.g. VR's z==1 at (1,1)), again the corner."""
        if x == -1 and y == -1:
            return corner
        if x == -1:
            return lcol[y : y + 1]
        assert y == -1 and x >= 0
        if x < 4:
            return trow[x : x + 1]
        return ar[x - 4 : x - 3]

    def grid4(cells):
        """rows-of-cells [[(1,S)×4]×4] → (4, 4, S)."""
        return jnp.concatenate(
            [jnp.concatenate(r, axis=0)[None] for r in cells], axis=0
        )

    # ---- the 9 Intra_4x4 modes (norm 8.3.1.2.1-9; ops/intra.py is the
    # sample-layout reference implementation) --------------------------------
    preds = []
    # 0 V
    vrow = jnp.concatenate([P(x, -1) for x in range(4)], axis=0)  # (4, S)
    preds.append(jnp.broadcast_to(vrow[None], (4, 4, S)))
    # 1 H
    hcol = jnp.concatenate([P(-1, y) for y in range(4)], axis=0)
    preds.append(jnp.broadcast_to(hcol[:, None], (4, 4, S)))
    # 2 DC
    top4 = sum(P(x, -1) for x in range(4))
    left4 = sum(P(-1, y) for y in range(4))
    dcv = jnp.where(
        corner_ok,
        (top4 + left4 + 4) >> 3,
        jnp.where(
            left_ok,
            (left4 + 2) >> 2,
            jnp.where(top_ok, (top4 + 2) >> 2, 128),
        ),
    )
    preds.append(jnp.broadcast_to(dcv[None], (4, 4, S)))
    # 3 DDL
    cells = []
    for y in range(4):
        row = []
        for x in range(4):
            if x == 3 and y == 3:
                row.append((P(6, -1) + 3 * P(7, -1) + 2) >> 2)
            else:
                row.append(
                    (P(x + y, -1) + (P(x + y + 1, -1) << 1)
                     + P(x + y + 2, -1) + 2) >> 2
                )
        cells.append(row)
    preds.append(grid4(cells))
    # 4 DDR
    cells = []
    for y in range(4):
        row = []
        for x in range(4):
            if x > y:
                v = (P(x - y - 2, -1) + (P(x - y - 1, -1) << 1)
                     + P(x - y, -1) + 2) >> 2
            elif x < y:
                v = (P(-1, y - x - 2) + (P(-1, y - x - 1) << 1)
                     + P(-1, y - x) + 2) >> 2
            else:
                v = (P(0, -1) + (corner << 1) + P(-1, 0) + 2) >> 2
            row.append(v)
        cells.append(row)
    preds.append(grid4(cells))
    # 5 VR
    cells = []
    for y in range(4):
        row = []
        for x in range(4):
            z = 2 * x - y
            if z in (0, 2, 4, 6):
                v = (P(x - (y >> 1) - 1, -1) + P(x - (y >> 1), -1) + 1) >> 1
            elif z in (1, 3, 5):
                v = (P(x - (y >> 1) - 2, -1)
                     + (P(x - (y >> 1) - 1, -1) << 1)
                     + P(x - (y >> 1), -1) + 2) >> 2
            elif z == -1:
                v = (P(-1, 0) + (corner << 1) + P(0, -1) + 2) >> 2
            else:
                v = (P(-1, y - 1) + (P(-1, y - 2) << 1)
                     + P(-1, y - 3) + 2) >> 2
            row.append(v)
        cells.append(row)
    preds.append(grid4(cells))
    # 6 HD
    cells = []
    for y in range(4):
        row = []
        for x in range(4):
            z = 2 * y - x
            if z in (0, 2, 4, 6):
                v = (P(-1, y - (x >> 1) - 1) + P(-1, y - (x >> 1)) + 1) >> 1
            elif z in (1, 3, 5):
                v = (P(-1, y - (x >> 1) - 2)
                     + (P(-1, y - (x >> 1) - 1) << 1)
                     + P(-1, y - (x >> 1)) + 2) >> 2
            elif z == -1:
                v = (P(-1, 0) + (corner << 1) + P(0, -1) + 2) >> 2
            else:
                v = (P(x - 1, -1) + (P(x - 2, -1) << 1)
                     + P(x - 3, -1) + 2) >> 2
            row.append(v)
        cells.append(row)
    preds.append(grid4(cells))
    # 7 VL
    cells = []
    for y in range(4):
        row = []
        for x in range(4):
            if y in (0, 2):
                v = (P(x + (y >> 1), -1) + P(x + (y >> 1) + 1, -1) + 1) >> 1
            else:
                v = (P(x + (y >> 1), -1)
                     + (P(x + (y >> 1) + 1, -1) << 1)
                     + P(x + (y >> 1) + 2, -1) + 2) >> 2
            row.append(v)
        cells.append(row)
    preds.append(grid4(cells))
    # 8 HU
    cells = []
    for y in range(4):
        row = []
        for x in range(4):
            z = x + 2 * y
            if z in (0, 2, 4):
                v = (P(-1, y + (x >> 1)) + P(-1, y + (x >> 1) + 1) + 1) >> 1
            elif z in (1, 3):
                v = (P(-1, y + (x >> 1))
                     + (P(-1, y + (x >> 1) + 1) << 1)
                     + P(-1, y + (x >> 1) + 2) + 2) >> 2
            elif z == 5:
                v = (P(-1, 2) + 3 * P(-1, 3) + 2) >> 2
            else:
                v = P(-1, 3) + jnp.zeros((1, S), jnp.int32)
            row.append(v)
        cells.append(row)
    preds.append(grid4(cells))

    m = msk_ref[0]  # (1, S)
    pred = preds[8]
    for k in range(7, -1, -1):
        pred = jnp.where(m[None] == k, preds[k], pred)

    # ---- residual: fwd DCT + quant (NO DC bypass for Intra_4x4) -----------
    src = src_ref[0].astype(jnp.int32)  # (4, 4, S)
    q = _quant_spatial(_fwd_transform(src - pred, 1, 1), qp, 1, 1)
    res = _inv_transform(_scale_spatial(q, qp, 1, 1), 1, 1)
    recon = jnp.clip(pred + res, 0, 255)

    rec_ref[0] = recon.astype(jnp.uint8)

    # ---- carry update (corner snapshot before the generation shift) -------
    cor3_s[...] = brow2[3:4]
    brow2_s[...] = brow1
    brow1_s[...] = recon[3]
    rcol_s[...] = recon[:, 3]


@functools.partial(jax.jit, static_argnames=("wmb", "hmb", "qp"))
def pallas_i4x4_luma(y_src, modes, wmb: int, hmb: int, qp: int):
    """Drop-in replacement for kernels.wavefront.wavefront_i4x4_luma.

    Returns (recon (H, W) int32, levels (nmb, 16, 16) zig-zag lists) —
    bit-identical outputs; levels are recomputed in bulk XLA from the
    kernel's recon output (i4x4_levels_from_recon).
    """
    from ..ops.tables import RASTER_TO_LUMA_BLOCK

    nmb = wmb * hmb
    HB, WB = 4 * hmb, 4 * wmb
    nwave = 2 * (HB - 1) + WB
    S = HB

    # per-global-block modes
    rast_to_z = jnp.asarray(RASTER_TO_LUMA_BLOCK)
    Rg, Cg = jnp.meshgrid(jnp.arange(HB), jnp.arange(WB), indexing="ij")
    z_idx = rast_to_z[(Rg % 4) * 4 + (Cg % 4)]
    mode_grid = modes[(Rg // 4) * wmb + (Cg // 4), z_idx]  # (HB, WB)

    # skew with factor 2: sk[d, R] = grid[R, d - 2R]
    src_grid = y_src.reshape(HB, 4, WB, 4).transpose(0, 2, 1, 3)  # (HB,WB,4,4)

    def skew2(grid):
        rows = []
        for r in range(HB):
            pad = [(2 * r, nwave - WB - 2 * r)] + [(0, 0)] * (grid.ndim - 2)
            rows.append(jnp.pad(grid[r], pad))
        return jnp.stack(rows, axis=1)  # (nwave, HB, …)

    src_sk = skew2(src_grid).transpose(0, 2, 3, 1).astype(jnp.uint8)
    msk = skew2(mode_grid)[:, None, :]  # (nwave, 1, S)

    kernel = functools.partial(_i4_kernel_body, WB, HB, qp)

    def spec(shape, ms=pltpu.VMEM):
        return pl.BlockSpec(
            (1,) + shape,
            lambda d: (d,) + (0,) * len(shape),
            memory_space=ms,
        )

    interpret = jax.default_backend() != "tpu"
    rec_sk = pl.pallas_call(
        kernel,
        grid=(nwave,),
        in_specs=[spec((1, S)), spec((4, 4, S))],
        out_specs=spec((4, 4, S)),
        out_shape=jax.ShapeDtypeStruct((nwave, 4, 4, S), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((4, S), jnp.int32),   # rcol (d-1)
            pltpu.VMEM((4, S), jnp.int32),   # brow (d-1)
            pltpu.VMEM((4, S), jnp.int32),   # brow (d-2)
            pltpu.VMEM((1, S), jnp.int32),   # corner (d-3)
        ],
        interpret=interpret,
    )(msk, src_sk)

    # unskew: grid[R, C] = sk[2R + C, :, :, R]
    rg = jnp.arange(HB)[:, None]
    cg = jnp.arange(WB)[None, :]
    rb = jnp.broadcast_to(rg, (HB, WB))
    rec_grid = jnp.moveaxis(rec_sk, -1, 1)[2 * rg + cg, rb].astype(jnp.int32)
    frame = rec_grid.transpose(0, 2, 1, 3).reshape(HB * 4, WB * 4)
    levels = i4x4_levels_from_recon(y_src, frame, modes, wmb=wmb, hmb=hmb, qp=qp)
    return frame, levels


@functools.partial(jax.jit, static_argnames=("wmb", "hmb", "qp"))
def i4x4_levels_from_recon(y_src, recon, modes, wmb: int, hmb: int, qp: int):
    """Quantized levels of an all-Intra_4x4 frame, given its reconstruction.

    Once the reconstructed frame is known, every block's prediction reads
    only (already final) recon neighbors, so the whole frame's levels are
    one batched XLA computation (same p13 strided-slice construction as
    codec/tpu_intra.intra_mode_decision, but over the RECON plane).
    Returns (nmb, 16, 16) zig-zag lists in Z-scan block order.
    """
    from ..ops import intra, transform
    from ..ops.tables import RASTER_TO_LUMA_BLOCK

    nmb = wmb * hmb
    HB, WB = 4 * hmb, 4 * wmb
    H, W = HB * 4, WB * 4

    yp = jnp.pad(recon, ((1, 0), (1, 4)), constant_values=-1)
    corner_g = yp[0:H:4, 0:W:4]
    left_g = yp[1 : H + 1, 0:W:4].reshape(HB, 4, WB).transpose(0, 2, 1)
    trow_wide = yp[0:H:4, 1 : W + 5].reshape(HB, WB + 1, 4)
    top4_g = trow_wide[:, :WB, :]
    ar4_g = trow_wide[:, 1 : WB + 1, :]
    bx_g = jnp.arange(WB)[None, :] % 4
    by_g = (jnp.arange(HB)[:, None] % 4) * jnp.ones((1, WB), jnp.int32)
    cg = jnp.arange(WB)[None, :] * jnp.ones((HB, 1), jnp.int32)
    repl_g = (
        (cg + 1 >= WB)
        | ((bx_g == 3) & (by_g > 0))
        | ((bx_g == 1) & ((by_g == 1) | (by_g == 3)))
    )
    # above-right valid only when the top row exists; replication uses its
    # last sample (handled by predict_4x4's -1 convention otherwise)
    last_g = top4_g[..., 3]
    ar_g = jnp.where(repl_g[..., None], last_g[..., None], ar4_g)
    ar_g = jnp.where(top4_g[..., 0:1] == -1, -1, ar_g)
    p13_g = jnp.concatenate(
        [corner_g[..., None], left_g, top4_g, ar_g], axis=-1
    )  # (HB, WB, 13)

    rast_to_z = jnp.asarray(RASTER_TO_LUMA_BLOCK)
    Rg, Cg = jnp.meshgrid(jnp.arange(HB), jnp.arange(WB), indexing="ij")
    mode_grid = modes[(Rg // 4) * wmb + (Cg // 4), rast_to_z[(Rg % 4) * 4 + (Cg % 4)]]

    preds = intra.predict_4x4_all_modes(p13_g)  # (9, HB, WB, 4, 4)
    pred = jnp.take_along_axis(
        preds, mode_grid[None, :, :, None, None], axis=0
    )[0]
    src_grid = y_src.reshape(HB, 4, WB, 4).transpose(0, 2, 1, 3)
    q = transform.quantize_residual(
        transform.forward_transform_4x4(src_grid - pred), qp, False
    )
    lists = transform.zigzag_scan(q)  # (HB, WB, 16)

    # regroup (HB, WB) raster blocks → (nmb, 16 Z-scan blocks)
    lists_mb = lists.reshape(hmb, 4, wmb, 4, 16).transpose(0, 2, 1, 3, 4)
    lists_mb = lists_mb.reshape(nmb, 16, 16)  # raster block order in MB
    inv_z = jnp.asarray(np.argsort(np.asarray(RASTER_TO_LUMA_BLOCK)))
    return lists_mb[:, inv_z, :]


# ---------------------------------------------------------------------------
# Recon-only I16 wavefront + bulk level recompute (the fast path).
#
# Same DMA-byte economy as the i4x4 kernel: stream uint8 pixels both ways,
# keep every coefficient list out of the kernel, and rebuild the levels in
# one batched XLA pass over the finished reconstruction.


def _i16_recon_kernel_body(wmb, hmb, qp, qpc,
                           msk_ref, ysk_ref, cbsk_ref, crsk_ref,
                           yrec_ref, cbrec_ref, crrec_ref,
                           trow_s, lcol_s, corner_s,
                           ctrow_s, clcol_s, ccorner_s):
    dmax = hmb
    d = pl.program_id(0)

    slot = jax.lax.broadcasted_iota(jnp.int32, (1, dmax), 1)
    c_of = d - slot
    valid = (c_of >= 0) & (c_of < wmb)
    left_ok = valid & (c_of > 0)
    top_ok = valid & (slot > 0)
    corner_ok = left_ok & top_ok

    trow_prev = trow_s[...]
    lcol_prev = lcol_s[...]
    corner_prev = corner_s[...]

    lcol = jnp.where(left_ok, lcol_prev, -1)
    trow = jnp.where(top_ok, _roll_lanes(trow_prev, 1), -1)
    corner = jnp.where(corner_ok, _roll_lanes(corner_prev, 1), -1)

    m16 = msk_ref[0, 0:1]   # (1, dmax) luma mode
    cm = msk_ref[0, 1:2]    # (1, dmax) chroma mode

    pred_v = jnp.broadcast_to(trow[None, :, :], (16, 16, dmax))
    pred_h = jnp.broadcast_to(lcol[:, None, :], (16, 16, dmax))
    sum_t = trow.sum(axis=0, keepdims=True)
    sum_l = lcol.sum(axis=0, keepdims=True)
    dcval = jnp.where(
        corner_ok,
        (sum_t + sum_l + 16) >> 5,
        jnp.where(left_ok, (sum_l + 8) >> 4,
                  jnp.where(top_ok, (sum_t + 8) >> 4, 128)),
    )
    pred_dc = jnp.broadcast_to(dcval[None, :, :], (16, 16, dmax))
    hgrad = None
    vgrad = None
    for i in range(8):
        tm = corner if i == 7 else trow[6 - i : 7 - i]
        lm = corner if i == 7 else lcol[6 - i : 7 - i]
        th = (i + 1) * (trow[8 + i : 9 + i] - tm)
        tv = (i + 1) * (lcol[8 + i : 9 + i] - lm)
        hgrad = th if hgrad is None else hgrad + th
        vgrad = tv if vgrad is None else vgrad + tv
    a = (lcol[15:16] + trow[15:16]) << 4
    b = (5 * hgrad + 32) >> 6
    c = (5 * vgrad + 32) >> 6
    xs = jax.lax.broadcasted_iota(jnp.int32, (16, 16, 1), 1) - 7
    ys = jax.lax.broadcasted_iota(jnp.int32, (16, 16, 1), 0) - 7
    pred_p = jnp.clip((a[None] + b[None] * xs + c[None] * ys + 16) >> 5, 0, 255)
    mm = m16[None]
    pred = jnp.where(
        mm == 0, pred_v,
        jnp.where(mm == 1, pred_h, jnp.where(mm == 2, pred_dc, pred_p)),
    )

    src = ysk_ref[0].astype(jnp.int32)
    dcoef = _fwd_transform(src - pred, 4, 4)
    q = _quant_spatial(dcoef, qp, 4, 4)
    dcm = _dc_mask(4, 4)

    dc16 = _block_dc(dcoef, 4, 4)
    H4 = ((1, 1, 1, 1), (1, 1, -1, -1), (1, -1, -1, 1), (1, -1, 1, -1))

    def had4(v):
        r1 = jnp.stack(
            [sum(H4[i][k] * v[k] for k in range(4)) for i in range(4)], axis=0
        )
        return jnp.stack(
            [sum(H4[j][k] * r1[:, k] for k in range(4)) for j in range(4)],
            axis=1,
        )

    fdc = (had4(dc16) + 8) >> 4
    lq0 = int(LEVEL_QUANTIZE[qp % 6, 0, 0])
    if qp >= 36:
        qdc = ((fdc >> (qp // 6 - 6)) * lq0 + 16384) >> 15
    else:
        qdc = (((fdc << (6 - qp // 6)) - (1 << (5 - qp // 6))) * lq0 + 16384) >> 15
    idc = had4(qdc)
    ls0 = int(LEVEL_SCALE[qp % 6, 0, 0])
    if qp >= 36:
        dcv = (idc * ls0) << (qp // 6 - 6)
    else:
        dcv = (idc * ls0 + (1 << (5 - qp // 6))) >> (6 - qp // 6)

    scaled = jnp.where(dcm, _rep4(dcv), _scale_spatial(q, qp, 4, 4))
    recon = jnp.clip(pred + _inv_transform(scaled, 4, 4), 0, 255)
    yrec_ref[0] = recon.astype(jnp.uint8)

    corner_s[...] = trow_prev[15:16, :]
    trow_s[...] = recon[15]
    lcol_s[...] = recon[:, 15]

    # ---- chroma ------------------------------------------------------------
    ctrow_prev = ctrow_s[...]
    clcol_prev = clcol_s[...]
    ccorner_prev = ccorner_s[...]

    ctrow = jnp.where(top_ok[None], _roll_lanes(ctrow_prev, 1), -1)
    clcol = jnp.where(left_ok[None], clcol_prev, -1)
    ccorner = jnp.where(corner_ok, _roll_lanes(ccorner_prev, 1), -1)

    csrc = jnp.stack(
        [cbsk_ref[0].astype(jnp.int32), crsk_ref[0].astype(jnp.int32)], axis=0
    )

    cpred_h = jnp.broadcast_to(clcol[:, :, None, :], (2, 8, 8, dmax))
    cpred_v = jnp.broadcast_to(ctrow[:, None, :, :], (2, 8, 8, dmax))
    qsum_t = [ctrow[:, 0:4].sum(axis=1), ctrow[:, 4:8].sum(axis=1)]
    qsum_l = [clcol[:, 0:4].sum(axis=1), clcol[:, 4:8].sum(axis=1)]

    def qdc_val(xq, yq):
        sx, sy = qsum_t[xq], qsum_l[yq]
        both = (sx + sy + 4) >> 3
        lonly = (sy + 2) >> 2
        tonly = (sx + 2) >> 2
        if (xq, yq) in ((0, 0), (1, 1)):
            return jnp.where(
                corner_ok, both,
                jnp.where(left_ok, lonly, jnp.where(top_ok, tonly, 128)),
            )
        if (xq, yq) == (1, 0):
            return jnp.where(top_ok, tonly, jnp.where(left_ok, lonly, 128))
        return jnp.where(left_ok, lonly, jnp.where(top_ok, tonly, 128))

    ygrid = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 8, 1), 1)
    xgrid = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 8, 1), 2)
    cpred_dc = jnp.zeros((2, 8, 8, dmax), jnp.int32)
    for yq in range(2):
        for xq in range(2):
            sel = ((ygrid >= 4 * yq) & (ygrid < 4 * yq + 4)
                   & (xgrid >= 4 * xq) & (xgrid < 4 * xq + 4))
            cpred_dc = jnp.where(sel, qdc_val(xq, yq)[:, None, None, :], cpred_dc)
    chg = None
    cvg = None
    for i in range(4):
        tm = ccorner if i == 3 else ctrow[:, 2 - i]
        lm = ccorner if i == 3 else clcol[:, 2 - i]
        th = (i + 1) * (ctrow[:, 4 + i] - tm)
        tv = (i + 1) * (clcol[:, 4 + i] - lm)
        chg = th if chg is None else chg + th
        cvg = tv if cvg is None else cvg + tv
    ca = (clcol[:, 7] + ctrow[:, 7]) << 4
    cb_ = (34 * chg + 32) >> 6
    cc = (34 * cvg + 32) >> 6
    cxs = xgrid - 3
    cys = ygrid - 3
    cpred_p = jnp.clip(
        (ca[:, None, None, :] + cb_[:, None, None, :] * cxs
         + cc[:, None, None, :] * cys + 16) >> 5, 0, 255)
    cmm = cm[None, None]
    cpred = jnp.where(
        cmm == 0, cpred_dc,
        jnp.where(cmm == 1, cpred_h, jnp.where(cmm == 2, cpred_v, cpred_p)),
    )

    cdiff = csrc - cpred
    cdcoef = jnp.stack([_fwd_transform(cdiff[k], 2, 2) for k in range(2)], axis=0)
    cq = jnp.stack([_quant_spatial(cdcoef[k], qpc, 2, 2) for k in range(2)], axis=0)
    cdcm = _dc_mask(2, 2)
    cdc = jnp.stack([_block_dc(cdcoef[k], 2, 2) for k in range(2)], axis=0)

    def had2(v):
        r0 = v[:, 0] + v[:, 1]
        r1 = v[:, 0] - v[:, 1]
        return jnp.stack(
            [
                jnp.stack([r0[:, 0] + r0[:, 1], r0[:, 0] - r0[:, 1]], axis=1),
                jnp.stack([r1[:, 0] + r1[:, 1], r1[:, 0] - r1[:, 1]], axis=1),
            ],
            axis=1,
        )

    cfdc = (had2(cdc) + 2) >> 2
    clq0 = int(LEVEL_QUANTIZE[qpc % 6, 0, 0])
    cqdc = (((cfdc << 5) >> (qpc // 6)) * clq0 + 16384) >> 15
    cls0 = int(LEVEL_SCALE[qpc % 6, 0, 0])
    cdcv = ((had2(cqdc) * cls0) << (qpc // 6)) >> 5

    cscaled = jnp.stack(
        [_scale_spatial(cq[k], qpc, 2, 2) for k in range(2)], axis=0
    )
    cscaled = jnp.where(
        cdcm[None], jnp.stack([_rep4(cdcv[k]) for k in range(2)], axis=0), cscaled
    )
    cres = jnp.stack([_inv_transform(cscaled[k], 2, 2) for k in range(2)], axis=0)
    crecon = jnp.clip(cpred + cres, 0, 255)

    cbrec_ref[0] = crecon[0].astype(jnp.uint8)
    crrec_ref[0] = crecon[1].astype(jnp.uint8)

    ccorner_s[...] = ctrow_prev[:, 7]
    ctrow_s[...] = crecon[:, 7]
    clcol_s[...] = crecon[:, :, 7]


def i16_levels_from_recon_impl(y_src, cb_src, cr_src, yrec, cbrec, crrec,
                               modes, cmodes, wmb: int, hmb: int, qp: int,
                               qpc: int, frame_hmb: int | None = None):
    """Coefficient lists of an all-I16 frame, given its reconstruction.

    Batched XLA over all MBs: p33/p17 neighbor fetch from the RECON planes
    via strided slices, predict with the decided modes, transform + quant +
    DC paths. Returns (i16dc (nmb,16), ac (nmb,16,15), cdc (2,nmb,4),
    cac (2,nmb,4,15)) identical to wavefront_i16_frame's list outputs.
    """
    from ..ops import intra, transform
    from ..ops.tables import INTRA4X4_SCAN_ORDER_XY

    nmb = wmb * hmb
    H, W = hmb * 16, wmb * 16
    fh = frame_hmb if frame_hmb is not None else hmb
    fedge = (jnp.arange(hmb) % fh) == 0

    # --- luma p33 from recon -------------------------------------------
    yp = jnp.pad(yrec, ((1, 0), (1, 0)), constant_values=-1)
    corner = yp[0:H:16, 0:W:16]
    lefts = yp[1 : H + 1, 0:W:16].reshape(hmb, 16, wmb).transpose(0, 2, 1)
    tops = yp[0:H:16, 1 : W + 1].reshape(hmb, wmb, 16)
    if fh != hmb:
        tops = jnp.where(fedge[:, None, None], -1, tops)
        corner = jnp.where(fedge[:, None], -1, corner)
    p33 = jnp.concatenate(
        [corner[..., None], lefts, tops], axis=-1
    ).reshape(nmb, 33)
    preds = intra.predict_16x16_all_modes(p33)
    pred = jnp.take_along_axis(preds, modes[None, :, None, None], axis=0)[0]

    src = y_src.reshape(hmb, 16, wmb, 16).transpose(0, 2, 1, 3).reshape(nmb, 16, 16)

    def zmb_blocks(x):
        bl = x.reshape(*x.shape[:-2], 2, 2, 4, 2, 2, 4)
        bl = jnp.moveaxis(bl, (-6, -3, -5, -2), (-6, -5, -4, -3))
        return bl.reshape(*x.shape[:-2], 16, 4, 4)

    d = transform.forward_transform_4x4(zmb_blocks(src - pred))
    q = transform.quantize_residual(d, qp, True)
    bxy = INTRA4X4_SCAN_ORDER_XY
    zx, zy = bxy[:, 0] // 4, bxy[:, 1] // 4
    dc = jnp.zeros((nmb, 4, 4), jnp.int32).at[:, zy, zx].set(q[:, :, 0, 0])
    i16dc = transform.zigzag_scan(transform.forward_dc_luma(dc, qp))
    ac = transform.zigzag_scan(q)[:, :, 1:]

    # --- chroma p17 from recon -------------------------------------------
    Hc, Wc = hmb * 8, wmb * 8
    cdc_out = []
    cac_out = []
    for plane_src, plane_rec in ((cb_src, cbrec), (cr_src, crrec)):
        cp = jnp.pad(plane_rec, ((1, 0), (1, 0)), constant_values=-1)
        ccorner = cp[0:Hc:8, 0:Wc:8]
        clefts = cp[1 : Hc + 1, 0:Wc:8].reshape(hmb, 8, wmb).transpose(0, 2, 1)
        ctops = cp[0:Hc:8, 1 : Wc + 1].reshape(hmb, wmb, 8)
        if fh != hmb:
            ctops = jnp.where(fedge[:, None, None], -1, ctops)
            ccorner = jnp.where(fedge[:, None], -1, ccorner)
        p17 = jnp.concatenate(
            [ccorner[..., None], clefts, ctops], axis=-1
        ).reshape(nmb, 17)
        cpreds = intra.predict_chroma_all_modes(p17)
        cpred = jnp.take_along_axis(
            cpreds, cmodes[None, :, None, None], axis=0)[0]
        csrc = plane_src.reshape(hmb, 8, wmb, 8).transpose(0, 2, 1, 3).reshape(nmb, 8, 8)

        def cblocks(x):
            bl = x.reshape(*x.shape[:-2], 2, 4, 2, 4)
            bl = jnp.moveaxis(bl, -3, -2)
            return bl.reshape(*x.shape[:-2], 4, 4, 4)

        cq = transform.quantize_residual(
            transform.forward_transform_4x4(cblocks(csrc - cpred)), qpc, True
        )
        cdc2 = cq[..., 0, 0].reshape(nmb, 2, 2)
        cdc_out.append(transform.forward_dc_chroma(cdc2, qpc).reshape(nmb, 4))
        cac_out.append(transform.zigzag_scan(cq)[..., 1:])
    return i16dc, ac, jnp.stack(cdc_out), jnp.stack(cac_out)


def pallas_i16_frame_fast_impl(y_src, cb_src, cr_src, modes, cmodes,
                               wmb: int, hmb: int, qp: int, qpc: int):
    """Recon-only Pallas wavefront + bulk XLA levels. Same return tuple as
    wavefront_i16_frame, bit-identical, with ~5x less Pallas DMA traffic."""
    nmb = wmb * hmb
    ndiag = hmb + wmb - 1
    dmax = hmb

    ygrid = y_src.reshape(hmb, 16, wmb, 16).transpose(0, 2, 1, 3)
    cbgrid = cb_src.reshape(hmb, 8, wmb, 8).transpose(0, 2, 1, 3)
    crgrid = cr_src.reshape(hmb, 8, wmb, 8).transpose(0, 2, 1, 3)

    ysk = _skew(ygrid, ndiag, wmb, hmb).transpose(0, 2, 3, 1).astype(jnp.uint8)
    cbsk = _skew(cbgrid, ndiag, wmb, hmb).transpose(0, 2, 3, 1).astype(jnp.uint8)
    crsk = _skew(crgrid, ndiag, wmb, hmb).transpose(0, 2, 3, 1).astype(jnp.uint8)
    m2 = jnp.stack([modes.reshape(hmb, wmb), cmodes.reshape(hmb, wmb)], axis=0)
    msk = _skew(m2, ndiag, wmb, hmb, lead=1)  # (2, ndiag, dmax)
    msk = jnp.moveaxis(msk, 0, 1)             # (ndiag, 2, dmax)

    kernel = functools.partial(_i16_recon_kernel_body, wmb, hmb, qp, qpc)

    def spec(shape):
        return pl.BlockSpec(
            (1,) + shape,
            lambda d: (d,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    interpret = jax.default_backend() != "tpu"
    yrec_sk, cbrec_sk, crrec_sk = pl.pallas_call(
        kernel,
        grid=(ndiag,),
        in_specs=[
            spec((2, dmax)),
            spec((16, 16, dmax)), spec((8, 8, dmax)), spec((8, 8, dmax)),
        ],
        out_specs=(
            spec((16, 16, dmax)), spec((8, 8, dmax)), spec((8, 8, dmax)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ndiag, 16, 16, dmax), jnp.uint8),
            jax.ShapeDtypeStruct((ndiag, 8, 8, dmax), jnp.uint8),
            jax.ShapeDtypeStruct((ndiag, 8, 8, dmax), jnp.uint8),
        ),
        scratch_shapes=[
            pltpu.VMEM((16, dmax), jnp.int32),
            pltpu.VMEM((16, dmax), jnp.int32),
            pltpu.VMEM((1, dmax), jnp.int32),
            pltpu.VMEM((2, 8, dmax), jnp.int32),
            pltpu.VMEM((2, 8, dmax), jnp.int32),
            pltpu.VMEM((2, dmax), jnp.int32),
        ],
        interpret=interpret,
    )(msk, ysk, cbsk, crsk)

    di, ri = _unskew_idx(wmb, hmb)

    def unskew_frame(a, px):
        g = jnp.moveaxis(a, -1, 1)[di, ri].astype(jnp.int32)
        return g.transpose(0, 2, 1, 3).reshape(hmb * px, wmb * px)

    frame = unskew_frame(yrec_sk, 16)
    cbf = unskew_frame(cbrec_sk, 8)
    crf = unskew_frame(crrec_sk, 8)
    i16dc, ac, cdc, cac = i16_levels_from_recon_impl(
        y_src, cb_src, cr_src, frame, cbf, crf, modes, cmodes,
        wmb=wmb, hmb=hmb, qp=qp, qpc=qpc,
    )
    return frame, i16dc, ac, cbf, crf, cdc, cac


# jitted top-level entries; device programs embedding these call the
# _impls (see codec/tpu_intra.py on the jax-0.9 nested-jit issues)
i16_levels_from_recon = functools.partial(
    jax.jit,
    static_argnames=("wmb", "hmb", "qp", "qpc", "frame_hmb"))(
        i16_levels_from_recon_impl)
pallas_i16_frame_fast = functools.partial(
    jax.jit, static_argnames=("wmb", "hmb", "qp", "qpc"))(
        pallas_i16_frame_fast_impl)
