"""Device wavefront I16 reconstruction vs a sequential host reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from h264_fer_tpu.kernels.wavefront import wavefront_i16_luma
from h264_fer_tpu.ops import intra, transform
from h264_fer_tpu.ops.tables import INTRA4X4_SCAN_ORDER_XY


def host_i16_recon(y, modes, wmb, hmb, qp):
    """Sequential raster reconstruction (the encoder's exact semantics)."""
    recon = np.zeros_like(y)
    dc_all = np.zeros((wmb * hmb, 16), np.int32)
    ac_all = np.zeros((wmb * hmb, 16, 15), np.int32)
    for mb in range(wmb * hmb):
        r, c = mb // wmb, mb % wmb
        x0, y0 = c * 16, r * 16
        p = np.full(33, -1, np.int32)
        if x0 > 0 and y0 > 0:
            p[0] = recon[y0 - 1, x0 - 1]
        if x0 > 0:
            p[1:17] = recon[y0 : y0 + 16, x0 - 1]
        if y0 > 0:
            p[17:33] = recon[y0 - 1, x0 : x0 + 16]
        pred = intra.predict_16x16(p, int(modes[mb]))
        src = y[y0 : y0 + 16, x0 : x0 + 16]
        blocks = np.stack([
            (src - pred)[by : by + 4, bx : bx + 4]
            for bx, by in INTRA4X4_SCAN_ORDER_XY
        ])
        q = transform.quantize_residual(
            transform.forward_transform_4x4(blocks.astype(np.int32)), qp, True
        )
        dc = np.zeros((4, 4), np.int32)
        for b, (bx, by) in enumerate(INTRA4X4_SCAN_ORDER_XY):
            dc[by // 4, bx // 4] = q[b, 0, 0]
        qdc = transform.forward_dc_luma(dc, qp)
        dc_all[mb] = transform.zigzag_scan(qdc)
        ac_all[mb] = transform.zigzag_scan(q)[:, 1:]
        dcv = transform.inverse_dc_luma(qdc, qp)
        out = np.zeros((16, 16), np.int32)
        for b, (bx, by) in enumerate(INTRA4X4_SCAN_ORDER_XY):
            lst = np.zeros(16, np.int32)
            lst[0] = dcv[by // 4, bx // 4]
            lst[1:] = ac_all[mb, b]
            res = transform.inverse_residual(
                transform.zigzag_unscan(lst), qp, True
            )
            out[by : by + 4, bx : bx + 4] = res
        recon[y0 : y0 + 16, x0 : x0 + 16] = np.clip(pred + out, 0, 255)
    return recon, dc_all, ac_all


@pytest.mark.parametrize("qp", [20, 32])
def test_wavefront_matches_sequential(qp):
    rng = np.random.default_rng(qp)
    hmb, wmb = 5, 7
    y = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.int32)
    modes = rng.integers(0, 3, hmb * wmb).astype(np.int32)  # V/H/DC mix
    # availability: first row can't use V? mode 0 needs top — make row 0 DC,
    # col 0 not H
    modes[: wmb] = 2
    modes[:: wmb] = np.where(modes[::wmb] == 1, 2, modes[::wmb])
    gold = host_i16_recon(y, modes, wmb, hmb, qp)
    got = wavefront_i16_luma(jnp.asarray(y), jnp.asarray(modes),
                             wmb=wmb, hmb=hmb, qp=qp)
    np.testing.assert_array_equal(np.asarray(got[0]), gold[0])
    np.testing.assert_array_equal(np.asarray(got[1]), gold[1])
    np.testing.assert_array_equal(np.asarray(got[2]), gold[2])


def host_i4_recon(y, modes, wmb, hmb, qp):
    """Sequential reference for the Intra_4x4 wavefront."""
    recon = np.zeros_like(y)
    lv = np.zeros((wmb * hmb, 16, 16), np.int32)
    W = y.shape[1]
    for mb in range(wmb * hmb):
        r, c = mb // wmb, mb % wmb
        x0, y0 = c * 16, r * 16
        for blk in range(16):
            bx, by = INTRA4X4_SCAN_ORDER_XY[blk]
            x, yy = x0 + bx, y0 + by
            p = np.full(13, -1, np.int32)
            if x > 0 and yy > 0:
                p[0] = recon[yy - 1, x - 1]
            if x > 0:
                p[1:5] = recon[yy : yy + 4, x - 1]
            if yy > 0:
                p[5:9] = recon[yy - 1, x : x + 4]
                xf = x + 4
                edge = (xf >= W) or (bx == 12 and by > 0)
                if edge or blk in (3, 11):
                    p[9:13] = recon[yy - 1, x + 3]
                else:
                    p[9:13] = recon[yy - 1, xf : xf + 4]
            pred = intra.predict_4x4(p, int(modes[mb, blk]))
            src = y[yy : yy + 4, x : x + 4]
            q = transform.quantize_residual(
                transform.forward_transform_4x4((src - pred).astype(np.int32)),
                qp, False,
            )
            lv[mb, blk] = transform.zigzag_scan(q)
            res = transform.inverse_residual(q, qp, False)
            recon[yy : yy + 4, x : x + 4] = np.clip(pred + res, 0, 255)
    return recon, lv


@pytest.mark.parametrize("hmb,wmb,qp", [(4, 6, 28), (3, 3, 20), (6, 2, 35), (9, 2, 28)])
def test_i4x4_wavefront_matches_sequential(hmb, wmb, qp):
    from h264_fer_tpu.kernels.wavefront import wavefront_i4x4_luma

    rng = np.random.default_rng(qp)
    y = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.int32)
    modes = rng.integers(0, 9, (hmb * wmb, 16)).astype(np.int32)
    for mb in range(hmb * wmb):
        r, c = mb // wmb, mb % wmb
        for blk in range(16):
            bx, by = INTRA4X4_SCAN_ORDER_XY[blk]
            no_top = r == 0 and by == 0
            no_left = c == 0 and bx == 0
            m = modes[mb, blk]
            if no_top and no_left and m != 2:
                modes[mb, blk] = 2
            elif no_top and m in (0, 3, 4, 5, 6, 7):
                modes[mb, blk] = 2
            elif no_left and m in (1, 4, 5, 6, 8):
                modes[mb, blk] = 2
    gold = host_i4_recon(y, modes, wmb, hmb, qp)
    got = wavefront_i4x4_luma(jnp.asarray(y), jnp.asarray(modes),
                              wmb=wmb, hmb=hmb, qp=qp)
    np.testing.assert_array_equal(np.asarray(got[0]), gold[0])
    np.testing.assert_array_equal(np.asarray(got[1]), gold[1])


def host_chroma_recon(cbs, crs, modes, wmb, hmb, qp):
    rb = np.zeros_like(cbs)
    rr = np.zeros_like(crs)
    dc = np.zeros((2, wmb * hmb, 4), np.int32)
    ac = np.zeros((2, wmb * hmb, 4, 15), np.int32)
    for mb in range(wmb * hmb):
        r, c = mb // wmb, mb % wmb
        x0, y0 = c * 8, r * 8
        for ci, (src, plane) in enumerate([(cbs, rb), (crs, rr)]):
            p = np.full(17, -1, np.int32)
            if x0 > 0 and y0 > 0:
                p[0] = plane[y0 - 1, x0 - 1]
            if x0 > 0:
                p[1:9] = plane[y0 : y0 + 8, x0 - 1]
            if y0 > 0:
                p[9:17] = plane[y0 - 1, x0 : x0 + 8]
            pred = intra.predict_chroma(p, int(modes[mb]))
            diff = (src[y0 : y0 + 8, x0 : x0 + 8] - pred).astype(np.int32)
            blocks = np.stack([
                diff[(b // 2) * 4 : (b // 2) * 4 + 4, (b % 2) * 4 : (b % 2) * 4 + 4]
                for b in range(4)
            ])
            q = transform.quantize_residual(
                transform.forward_transform_4x4(blocks), qp, True)
            dc2 = np.array([[q[0, 0, 0], q[1, 0, 0]], [q[2, 0, 0], q[3, 0, 0]]],
                           np.int32)
            qdc = transform.forward_dc_chroma(dc2, qp)
            dc[ci, mb] = qdc.reshape(4)
            ac[ci, mb] = transform.zigzag_scan(q)[:, 1:]
            dcv = transform.inverse_dc_chroma(qdc, qp)
            rmb = np.zeros((8, 8), np.int32)
            for b in range(4):
                lst = np.zeros(16, np.int32)
                lst[0] = dcv[b // 2, b % 2]
                lst[1:] = ac[ci, mb, b]
                res = transform.inverse_residual(
                    transform.zigzag_unscan(lst), qp, True)
                rmb[(b // 2) * 4 : (b // 2) * 4 + 4,
                    (b % 2) * 4 : (b % 2) * 4 + 4] = res
            plane[y0 : y0 + 8, x0 : x0 + 8] = np.clip(pred + rmb, 0, 255)
    return rb, rr, dc, ac


@pytest.mark.parametrize("hmb,wmb,qp", [(4, 5, 26), (3, 3, 32), (2, 6, 20), (9, 2, 30)])
def test_chroma_wavefront_matches_sequential(hmb, wmb, qp):
    from h264_fer_tpu.kernels.wavefront import wavefront_chroma

    rng = np.random.default_rng(qp)
    cbs = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.int32)
    crs = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.int32)
    modes = rng.integers(0, 4, hmb * wmb).astype(np.int32)
    for mb in range(hmb * wmb):
        r, c = mb // wmb, mb % wmb
        m = modes[mb]
        if r == 0 and m == 2:
            modes[mb] = 0
        if c == 0 and m == 1:
            modes[mb] = 0
        if (r == 0 or c == 0) and m == 3:
            modes[mb] = 0
    gold = host_chroma_recon(cbs, crs, modes, wmb, hmb, qp)
    got = wavefront_chroma(jnp.asarray(cbs), jnp.asarray(crs),
                           jnp.asarray(modes), wmb=wmb, hmb=hmb, qp=qp)
    for g, h in zip(got, gold):
        np.testing.assert_array_equal(np.asarray(g), h)


@pytest.mark.parametrize("hmb,wmb,qp", [(5, 7, 28), (9, 2, 24)])
def test_i16_wavefront_tall_and_skewed(hmb, wmb, qp):
    from h264_fer_tpu.kernels.wavefront import (
        wavefront_i16_luma,
        wavefront_i16_luma_skewed,
    )

    rng = np.random.default_rng(hmb * 31 + wmb)
    y = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.int32)
    modes = rng.integers(0, 3, hmb * wmb).astype(np.int32)
    modes[:wmb] = 2
    modes[::wmb] = np.where(modes[::wmb] == 1, 2, modes[::wmb])
    gold = host_i16_recon(y, modes, wmb, hmb, qp)
    for fn in (wavefront_i16_luma, wavefront_i16_luma_skewed):
        got = fn(jnp.asarray(y), jnp.asarray(modes), wmb=wmb, hmb=hmb, qp=qp)
        for g, h in zip(got, gold):
            np.testing.assert_array_equal(np.asarray(g), h)
