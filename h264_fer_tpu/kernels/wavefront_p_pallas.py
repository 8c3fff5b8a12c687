"""Pallas grid-sequential P-frame decision wavefront.

Same decisions as kernels/wavefront_p.pframe_decide_impl (the skip / ME
argmin / unify / mb_type / mvd chain over the knight-move diagonals
d = c + 2r, mode_pred.cpp:252-426 + moestimation.cpp:392-585), executed
as ONE kernel launch instead of ~254 XLA fori_loop steps.  The XLA form
pays ~1.4 ms/step for the five (slots, 16, 16) P_Skip/unify window
gathers (measured: 345 of the 494 ms at 1080p are those gathers —
TPU gathers scalarize).  Here the frame is cut into MB-row BANDS
processed sequentially on a 2-D sequential grid (band, diagonal): the
16-phase interpolated-plane strip of a band lives in VMEM (one DMA per
band), windows become dynamic-offset vector loads + lane/sublane
rotates, per-MB syntax state (MVs, types) lives in SMEM with free
scalar indexing, and the per-diagonal candidate/score/source inputs
stream through auto-pipelined BlockSpecs in band-local diagonal-skewed
layout (skewing is a pad+reshape, not a gather).

Band-sequential execution is byte-identical to the full wavefront: a
band's first row reads the band above's final last-row state (held in
an SMEM halo, written as the previous band completes), exactly the
tile_p halo contract but with no timing subtleties since bands are
sequential here.

Outputs are bit-identical to pframe_decide_impl
(tests/test_wavefront_p_pallas.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wavefront_p import MB_SKIP, _loc_static, _part_origin, _pred_part_width

BIG = np.int32(2**31 - 1)

# pidx lookup per mb_type 0..4 for a static in-part offset (xw, yw):
# ((yw // ph) << 1) + (xw // pw), h264_globals.h:123-128
_PW = (16, 16, 8, 8, 8)
_PH = (16, 8, 16, 8, 8)


def _metric_sum(d, metric_id: int):
    if metric_id == 0:
        return jnp.abs(d).sum()
    s = (d * d).sum()
    return 2 * s if metric_id == 2 else s


def _sel(c, a, b):
    return jnp.where(c, a, b)


def _decide_kernel(wmb, hmb, window, ext, metric_id, lam, hband, strip_r,
                   maps_ref, src_ref, c12_ref, aux_ref, planes_hbm,
                   out_ref, strip, dmasem, st_mv, st_t, halo_mv, halo_t):
    b = pl.program_id(0)
    dl = pl.program_id(1)
    S = 2 * window + 1
    S2 = S * S
    NC = S2 + 98
    i32 = jnp.int32

    @pl.when(dl == 0)
    def _():
        dma = pltpu.make_async_copy(
            planes_hbm.at[:, pl.ds(pl.multiple_of(16 * hband * b, 8),
                                   strip_r), :],
            strip, dmasem)
        dma.start()
        dma.wait()

    lane = jax.lax.broadcasted_iota(i32, (1, NC), 1)
    lane20 = jax.lax.broadcasted_iota(i32, (1, 20), 1)
    # static candidate coordinate pieces (int grid; refine offsets)
    ix = (lane % S - window) * 4          # valid on the first S2 lanes
    iy = (lane // S - window) * 4
    k49 = jax.lax.broadcasted_iota(i32, (1, 49), 1)
    offx = k49 % 7 - 3
    offy = k49 // 7 - 3
    has_top = b > 0

    def window16(src16, fr, py_rel, px):
        """Metric-ready (16,16) int32 window from the VMEM plane strip.

        fr/py_rel/px scalars: phase, strip-local row, plane column."""
        ry0 = pl.multiple_of((py_rel // 8) * 8, 8)
        rx0 = pl.multiple_of((px // 128) * 128, 128)
        slab = strip[fr, pl.ds(ry0, 24), pl.ds(rx0, 256)].astype(i32)
        rotc = (256 - (px & 127)) & 255
        rotr = 24 - (py_rel & 7)
        try:
            slab = pltpu.roll(slab, shift=rotc, axis=1)
            slab = pltpu.roll(slab, shift=rotr, axis=0)
        except Exception:  # interpret mode
            slab = jnp.roll(slab, rotc, axis=1)
            slab = jnp.roll(slab, rotr, axis=0)
        return slab[:16, :16]

    def mb_window(src16, r, c, mvx, mvy):
        fr = (mvy & 3) * 4 + (mvx & 3)
        py_rel = 16 * r + (mvy >> 2) + ext
        px = 16 * c + (mvx >> 2) + ext
        return window16(src16, fr, py_rel, px)

    def slot_body(r):
        c = dl - 2 * r
        rg = b * hband + r
        valid = (c >= 0) & (c < wmb) & (rg < hmb)

        @pl.when(valid)
        def _():
            cc = jnp.clip(c, 0, wmb - 1)
            src16 = src_ref[0, 0, r].astype(i32)  # (16, 16)
            md = aux_ref[0, 0, r, 4]
            c1 = [(c12_ref[0, 0, r, 2 * q], c12_ref[0, 0, r, 2 * q + 1])
                  for q in range(4)]
            c2 = [(c12_ref[0, 0, r, 8 + 2 * q], c12_ref[0, 0, r, 9 + 2 * q])
                  for q in range(4)]

            def fetch(loc):
                """(mvx, mvy, exists) for a static neighbour location
                (_Ctx.fetch, mode_pred.cpp:61-161). Reads clamped; the
                caller gates values on `exists`."""
                if loc is None:
                    z = jnp.full((), 0, i32)
                    return z, z, jnp.full((), False, jnp.bool_)
                dr, dc, xw, yw = loc
                cn = c + dc
                col_ok = (cn >= 0) & (cn < wmb)
                cnc = jnp.clip(cn, 0, wmb - 1)
                if dr == 0:
                    exists = col_ok
                    t = st_t[r * wmb + cnc]
                    row = r
                elif r > 0:
                    exists = col_ok
                    t = st_t[(r - 1) * wmb + cnc]
                    row = r - 1
                else:  # r == 0: the band above's final last row
                    exists = col_ok & has_top
                    t = halo_t[cnc]
                    row = None
                ti = jnp.clip(t, 0, 4)
                pidx_tab = [((yw // _PH[t_]) << 1) + (xw // _PW[t_])
                            for t_ in range(5)]
                pidx = jnp.full((), pidx_tab[0], i32)
                for t_ in range(1, 5):
                    pidx = _sel(ti == t_, pidx_tab[t_], pidx)
                pidx = _sel(t == MB_SKIP, 0, pidx)
                if row is None:
                    mvx = halo_mv[(cnc * 4 + pidx) * 2]
                    mvy = halo_mv[(cnc * 4 + pidx) * 2 + 1]
                else:
                    base = ((row * wmb + cnc) * 4 + pidx) * 2
                    mvx = st_mv[base]
                    mvy = st_mv[base + 1]
                return mvx, mvy, exists

            def predict(mb_type, part):
                """Scalar PredictMV_Luma (mode_pred.cpp:252-371)."""
                x, y = _part_origin(mb_type, part)
                pw = _pred_part_width(mb_type)
                Ax, Ay, exA = fetch(_loc_static(x - 1, y))
                Bx, By, exB = fetch(_loc_static(x, y - 1))
                Cx, Cy, exC = fetch(_loc_static(x + pw, y - 1))
                Dx, Dy, exD = fetch(_loc_static(x - 1, y - 1))
                Cx = _sel(exC, Cx, Dx)
                Cy = _sel(exC, Cy, Dy)
                exC = exC | exD
                both_none = ~exA & ~exB
                refA = _sel(exA | both_none, 0, -1)
                Ax = _sel(exA, Ax, 0)
                Ay = _sel(exA, Ay, 0)
                Bx2 = _sel(exB, Bx, Ax)
                By2 = _sel(exB, By, Ay)
                refB = _sel(exB, 0, refA)
                Cx2 = _sel(exC, Cx, Ax)
                Cy2 = _sel(exC, Cy, Ay)
                refC = _sel(exC, 0, refA)
                mA, mB, mC = refA == 0, refB == 0, refC == 0
                only_A = mA & ~mB & ~mC
                only_B = ~mA & mB & ~mC
                only_C = ~mA & ~mB & mC
                medx = (Ax + Bx2 + Cx2 - jnp.maximum(Ax, jnp.maximum(Bx2, Cx2))
                        - jnp.minimum(Ax, jnp.minimum(Bx2, Cx2)))
                medy = (Ay + By2 + Cy2 - jnp.maximum(Ay, jnp.maximum(By2, Cy2))
                        - jnp.minimum(Ay, jnp.minimum(By2, Cy2)))
                px_ = _sel(only_A, Ax, _sel(only_B, Bx2,
                                            _sel(only_C, Cx2, medx)))
                py_ = _sel(only_A, Ay, _sel(only_B, By2,
                                            _sel(only_C, Cy2, medy)))
                if mb_type == 1 and part == 0:
                    px_, py_ = _sel(exB, Bx, px_), _sel(exB, By, py_)
                elif mb_type == 1 and part == 1:
                    px_, py_ = _sel(exA, Ax, px_), _sel(exA, Ay, py_)
                elif mb_type == 2 and part == 0:
                    px_, py_ = _sel(exA, Ax, px_), _sel(exA, Ay, py_)
                elif mb_type == 2 and part == 1:
                    px_, py_ = _sel(exC, Cx, px_), _sel(exC, Cy, py_)
                return px_, py_

            # ---- P_Skip trial (mode_pred.cpp:381-426 + ExactPixels) ----
            p16x, p16y = predict(0, 0)
            edge = (rg == 0) | (c == 0)
            if r > 0:
                zb = (((r - 1) * wmb + cc) * 4 + 2) * 2
                zt = (st_mv[zb] == 0) & (st_mv[zb + 1] == 0)
            else:
                zb = (cc * 4 + 2) * 2
                zt = ((halo_mv[zb] == 0) & (halo_mv[zb + 1] == 0)
                      | ~has_top)
            lc = jnp.clip(c - 1, 0, wmb - 1)
            lb = ((r * wmb + lc) * 4 + 1) * 2
            zl = (st_mv[lb] == 0) & (st_mv[lb + 1] == 0)
            z = edge | zt | zl
            skx = _sel(z, 0, p16x)
            sky = _sel(z, 0, p16y)
            swin = mb_window(src16, r, cc, skx, sky)
            is_skip = (jnp.abs(src16 - swin) <= md).all()

            mb_base = (r * wmb + cc) * 8
            for q in range(4):
                st_mv[mb_base + 2 * q] = skx
                st_mv[mb_base + 2 * q + 1] = sky
            st_t[r * wmb + cc] = _sel(is_skip, MB_SKIP, 4)

            # ---- per-quadrant candidate argmin (host _search_mb) -------
            qmv = []
            qmvp = []
            qscore = []
            maps4 = maps_ref[0, 0, r]  # (4, NC)
            for q in range(4):
                mvpx, mvpy = predict(4, q)
                qmvp.append((mvpx, mvpy))
                c1x, c1y = c1[q]
                c2x, c2y = c2[q]
                candx = jnp.concatenate(
                    [ix[:, :S2], c1x + offx, c2x + offx], axis=1)
                candy = jnp.concatenate(
                    [iy[:, :S2], c1y + offy, c2y + offy], axis=1)
                cost = (maps4[q:q + 1, :]
                        + lam * (jnp.abs(candx - mvpx)
                                 + jnp.abs(candy - mvpy)))
                q2okq = aux_ref[0, 0, r, q] != 0
                cost = jnp.where((lane >= S2 + 49) & ~q2okq, BIG, cost)
                m = cost.min()
                k = jnp.where(cost == m, lane, NC).min()
                in_int = k < S2
                in_q1 = k < S2 + 49
                kq1 = k - S2
                kq2 = k - S2 - 49
                bx = _sel(in_int, (k % S - window) * 4,
                          _sel(in_q1, c1x + kq1 % 7 - 3, c2x + kq2 % 7 - 3))
                by = _sel(in_int, (k // S - window) * 4,
                          _sel(in_q1, c1y + kq1 // 7 - 3,
                               c2y + kq2 // 7 - 3))
                qmv.append([bx, by])
                qscore.append(m)
                st_mv[mb_base + 2 * q] = _sel(is_skip, skx, bx)
                st_mv[mb_base + 2 * q + 1] = _sel(is_skip, sky, by)

            # ---- 16x16 unify trial (encoder._maybe_unify) --------------
            # mvp_u: type-0 predictor on post-search state — its
            # locations read only neighbour MBs, whose state did not
            # change since the skip trial, so it equals p16
            all_eq0 = jnp.full((), True, jnp.bool_)
            for j in range(1, 4):
                all_eq0 = all_eq0 & ((qmv[j][0] == qmv[0][0])
                                     & (qmv[j][1] == qmv[0][1]))
            best_c = qscore[0] + qscore[1] + qscore[2] + qscore[3]
            bux = jnp.full((), 0, i32)
            buy = jnp.full((), 0, i32)
            found = jnp.full((), False, jnp.bool_)
            for j in range(4):
                ux, uy = qmv[j]
                uwin = mb_window(src16, r, cc, ux, uy)
                dist = _metric_sum(uwin - src16, metric_id)
                ucost = dist + lam * (jnp.abs(ux - p16x)
                                      + jnp.abs(uy - p16y))
                upd = ucost < best_c
                best_c = _sel(upd, ucost, best_c)
                bux = _sel(upd, ux, bux)
                buy = _sel(upd, uy, buy)
                found = found | upd
            unify = found & ~all_eq0 & ~is_skip
            for j in range(4):
                qmv[j][0] = _sel(unify, bux, qmv[j][0])
                qmv[j][1] = _sel(unify, buy, qmv[j][1])

            # ---- mb_type merge (moestimation.cpp:529-551) --------------
            eqh = (qmv[0][0] == qmv[1][0]) & (qmv[0][1] == qmv[1][1])
            eqh2 = (qmv[2][0] == qmv[3][0]) & (qmv[2][1] == qmv[3][1])
            eqv = (qmv[0][0] == qmv[2][0]) & (qmv[0][1] == qmv[2][1])
            eqv2 = (qmv[1][0] == qmv[3][0]) & (qmv[1][1] == qmv[3][1])
            all_eq = eqh & eqh2 & eqv & eqv2
            eq_rows = eqh & eqh2
            eq_cols = eqv & eqv2
            mb_type = _sel(all_eq, 0, _sel(eq_rows, 1, _sel(eq_cols, 2, 4)))

            # ---- final state ------------------------------------------
            fmv = []
            for q in range(4):
                fx = _sel(is_skip, skx, qmv[q][0])
                fy = _sel(is_skip, sky, qmv[q][1])
                fmv.append((fx, fy))
                st_mv[mb_base + 2 * q] = fx
                st_mv[mb_base + 2 * q + 1] = fy
            st_t[r * wmb + cc] = _sel(is_skip, MB_SKIP, mb_type)

            # ---- mvd on the final state (host final pass) --------------
            # type 0 predictor == p16 (no self reads among its locations)
            p0t1 = predict(1, 0)
            p1t1 = predict(1, 1)
            p0t2 = predict(2, 0)
            p1t2 = predict(2, 1)
            mvd = [[jnp.full((), 0, i32), jnp.full((), 0, i32)]
                   for _ in range(4)]
            t0 = mb_type == 0
            t1 = mb_type == 1
            t2 = mb_type == 2
            t4 = mb_type == 4
            for a in range(2):
                p16a = (p16x, p16y)[a]
                mvd[0][a] = _sel(t0, qmv[0][a] - p16a, mvd[0][a])
                mvd[0][a] = _sel(t1, qmv[0][a] - p0t1[a], mvd[0][a])
                mvd[1][a] = _sel(t1, qmv[2][a] - p1t1[a], mvd[1][a])
                mvd[0][a] = _sel(t2, qmv[0][a] - p0t2[a], mvd[0][a])
                mvd[1][a] = _sel(t2, qmv[1][a] - p1t2[a], mvd[1][a])
                for q in range(4):
                    mvd[q][a] = _sel(t4, qmv[q][a] - qmvp[q][a], mvd[q][a])
                    mvd[q][a] = _sel(is_skip, 0, mvd[q][a])

            # ---- halo write-through (band's last row) ------------------
            if r == hband - 1:
                for q in range(4):
                    halo_mv[cc * 8 + 2 * q] = fmv[q][0]
                    halo_mv[cc * 8 + 2 * q + 1] = fmv[q][1]
                halo_t[cc] = _sel(is_skip, MB_SKIP, mb_type)

            # ---- output row -------------------------------------------
            vals = [is_skip.astype(i32), mb_type]
            for q in range(4):
                vals += [fmv[q][0], fmv[q][1]]
            for q in range(4):
                vals += [mvd[q][0], mvd[q][1]]
            row = jnp.zeros((1, 20), i32)
            for idx, v in enumerate(vals):
                row = jnp.where(lane20 == idx, v, row)
            out_ref[0, 0, pl.ds(r, 1), :] = row

    for r in range(hband):
        slot_body(r)


def _skew_band(x, nbands: int, hband: int, wmb: int):
    """(hmb_pad = nbands*hband, wmb, F...) -> (nbands, D, hband, F...)
    with [b, d, r] = x[b*hband + r, d - 2*r] (junk where out of range).
    Pure pad+reshape — no gather."""
    F = x.shape[2:]
    P = wmb + 2 * hband
    D = P - 2
    x = x.reshape(nbands, hband, wmb, *F)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, P - wmb)) + ((0, 0),) * len(F))
    x = x.reshape(nbands, hband * P, *F)[:, : hband * D]
    x = x.reshape(nbands, hband, D, *F)
    return jnp.moveaxis(x, 1, 2)  # (nbands, D, hband, F...)


def _unskew_band(y, nbands: int, hband: int, wmb: int, hmb: int):
    """Inverse of _skew_band: (nbands, D, hband, F...) -> (hmb, wmb, F...)."""
    F = y.shape[3:]
    D = y.shape[1]
    P = D + 2
    y = jnp.moveaxis(y, 2, 1).reshape(nbands, hband * D, *F)
    y = jnp.pad(y, ((0, 0), (0, hband * P - hband * D)) + ((0, 0),) * len(F))
    y = y.reshape(nbands, hband, P, *F)[:, :, :wmb]
    return y.reshape(nbands * hband, wmb, *F)[:hmb]


def pframe_decide_pallas_impl(src_y, planes, int_map, c1mv, q1map, c2mv,
                              q2map, q2ok, maxdiff, wmb: int, hmb: int,
                              window: int, ext: int, metric_id: int,
                              lam: int, hband: int = 4):
    """Drop-in for pframe_decide_impl (non-banded): same inputs, same
    bit-identical outputs, one Pallas launch."""
    nmb = wmb * hmb
    S = 2 * window + 1
    S2 = S * S
    NC = S2 + 98
    nbands = -(-hmb // hband)
    hmb_pad = nbands * hband
    D = wmb + 2 * hband - 2

    def pad_rows(x):
        return jnp.pad(
            x.reshape(hmb, wmb, -1),
            ((0, hmb_pad - hmb), (0, 0), (0, 0)))

    allmap = jnp.concatenate(
        [int_map, q1map, q2map], axis=2).astype(jnp.int32)  # (nmb, 4, NC)
    maps_sk = _skew_band(
        pad_rows(allmap).reshape(hmb_pad, wmb, 4, NC), nbands, hband, wmb)
    c12 = jnp.concatenate(
        [c1mv.reshape(nmb, 8), c2mv.reshape(nmb, 8)], axis=1)
    c12_sk = _skew_band(pad_rows(c12), nbands, hband, wmb)
    aux = jnp.concatenate(
        [q2ok.astype(jnp.int32),
         maxdiff.astype(jnp.int32)[:, None],
         jnp.zeros((nmb, 3), jnp.int32)], axis=1)
    aux_sk = _skew_band(pad_rows(aux), nbands, hband, wmb)
    src_mb = (src_y.astype(jnp.int16).reshape(hmb, 16, wmb, 16)
              .transpose(0, 2, 1, 3))  # (hmb, wmb, 16, 16)
    src_sk = _skew_band(
        pad_rows(src_mb).reshape(hmb_pad, wmb, 16, 16), nbands, hband, wmb)

    # plane strip geometry (see window16): pad rows & lanes for aligned
    # slab loads and the per-band strip DMA
    strip_r = ((16 * (hband - 1) + 2 * ext - 1) // 8) * 8 + 24
    he, we = planes.shape[1], planes.shape[2]
    we_pad = (-(-we // 128) + 2) * 128
    he_pad = max(he, 16 * hband * (nbands - 1) + strip_r)
    planes16 = jnp.pad(planes.astype(jnp.int16),
                       ((0, 0), (0, he_pad - he), (0, we_pad - we)))

    kernel = functools.partial(
        _decide_kernel, wmb, hmb, window, ext, metric_id, lam, hband,
        strip_r)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        grid=(nbands, D),
        in_specs=[
            pl.BlockSpec((1, 1, hband, 4, NC), lambda b, d: (b, d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hband, 16, 16), lambda b, d: (b, d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hband, 16), lambda b, d: (b, d, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, hband, 8), lambda b, d: (b, d, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, hband, 20),
                               lambda b, d: (b, d, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbands, D, hband, 20), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((16, strip_r, we_pad), jnp.int16),
            pltpu.SemaphoreType.DMA(()),
            # SMEM pads the trailing dim to 128 lanes: keep all state
            # 1-D and index by hand (st_mv[(mb*4+q)*2+a], etc.)
            pltpu.SMEM((hband * wmb * 8,), jnp.int32),
            pltpu.SMEM((hband * wmb,), jnp.int32),
            pltpu.SMEM((wmb * 8,), jnp.int32),
            pltpu.SMEM((wmb,), jnp.int32),
        ],
        interpret=interpret,
    )(maps_sk, src_sk, c12_sk, aux_sk, planes16)

    res = _unskew_band(out, nbands, hband, wmb, hmb).reshape(nmb, 20)
    return {
        "skip": res[:, 0].astype(bool),
        "mb_type": res[:, 1],
        "mv": res[:, 2:10].reshape(nmb, 4, 2),
        "mvd": res[:, 10:18].reshape(nmb, 4, 2),
    }
