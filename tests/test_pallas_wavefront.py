"""Pallas grid-sequential wavefront vs the XLA fori_loop wavefront.

Runs in interpreter mode on the CPU test mesh (conftest forces cpu);
on TPU the same code compiles to a single Mosaic kernel. Outputs must be
bit-identical to kernels/wavefront.py, which is itself bit-identical to the
host encoder's sequential reconstruction (test_wavefront.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from h264_fer_tpu.codec.tpu_intra import intra_mode_decision
from h264_fer_tpu.kernels.wavefront import wavefront_i16_frame
from h264_fer_tpu.kernels.wavefront_pallas import pallas_i16_frame
from h264_fer_tpu.ops.intra import INTRA16_TO_CHROMA_MODE
from h264_fer_tpu.ops.transform import chroma_qp


@pytest.mark.parametrize("wh", [(176, 144), (80, 176)])  # wide and tall grids
@pytest.mark.parametrize("qp", [10, 26, 40])
def test_pallas_i16_frame_matches_xla(wh, qp):
    W, H = wh
    wmb, hmb = W // 16, H // 16
    qpc = chroma_qp(qp)
    rng = np.random.default_rng(7)
    y = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.int32))
    cb = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32))
    cr = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32))

    m16 = intra_mode_decision(y, wmb=wmb, hmb=hmb, qp=qp)["mode16"]
    cmodes = jnp.asarray(INTRA16_TO_CHROMA_MODE)[m16]

    ref = wavefront_i16_frame(y, cb, cr, m16, cmodes,
                              wmb=wmb, hmb=hmb, qp=qp, qpc=qpc)
    got = pallas_i16_frame(y, cb, cr, m16, cmodes,
                           wmb=wmb, hmb=hmb, qp=qp, qpc=qpc)
    names = ("frame", "i16dc", "ac", "cb", "cr", "cdc", "cac")
    for name, r, g in zip(names, ref, got):
        np.testing.assert_array_equal(
            np.asarray(r), np.asarray(g), err_msg=f"{name} @ {W}x{H} qp{qp}"
        )


@pytest.mark.parametrize("wh", [(176, 144), (80, 176)])
@pytest.mark.parametrize("qp", [10, 40])
def test_pallas_i16_fast_matches_xla(wh, qp):
    """The PRODUCTION TPU wavefront (recon-only Pallas + bulk XLA levels,
    wired into device_i16_frame on real chips) must match the XLA
    wavefront bit-exactly."""
    from h264_fer_tpu.kernels.wavefront_pallas import pallas_i16_frame_fast

    W, H = wh
    wmb, hmb = W // 16, H // 16
    qpc = chroma_qp(qp)
    rng = np.random.default_rng(13)
    y = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.int32))
    cb = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32))
    cr = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32))
    m16 = intra_mode_decision(y, wmb=wmb, hmb=hmb, qp=qp)["mode16"]
    cmodes = jnp.asarray(INTRA16_TO_CHROMA_MODE)[m16]
    ref = wavefront_i16_frame(y, cb, cr, m16, cmodes,
                              wmb=wmb, hmb=hmb, qp=qp, qpc=qpc)
    got = pallas_i16_frame_fast(y, cb, cr, m16, cmodes,
                                wmb=wmb, hmb=hmb, qp=qp, qpc=qpc)
    names = ("frame", "i16dc", "ac", "cb", "cr", "cdc", "cac")
    for name, r, g in zip(names, ref, got):
        np.testing.assert_array_equal(
            np.asarray(r), np.asarray(g), err_msg=f"{name} @ {W}x{H} qp{qp}"
        )


@pytest.mark.parametrize("wh", [(176, 144), (80, 176)])
@pytest.mark.parametrize("qp", [10, 28])
def test_pallas_i4x4_matches_xla(wh, qp):
    from h264_fer_tpu.kernels.wavefront import wavefront_i4x4_luma
    from h264_fer_tpu.kernels.wavefront_pallas import pallas_i4x4_luma

    W, H = wh
    wmb, hmb = W // 16, H // 16
    rng = np.random.default_rng(11)
    y = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.int32))
    m4 = intra_mode_decision(y, wmb=wmb, hmb=hmb, qp=qp)["mode4"]

    ref = wavefront_i4x4_luma(y, m4, wmb=wmb, hmb=hmb, qp=qp)
    got = pallas_i4x4_luma(y, m4, wmb=wmb, hmb=hmb, qp=qp)
    for name, r, g in zip(("frame", "levels"), ref, got):
        np.testing.assert_array_equal(
            np.asarray(r), np.asarray(g), err_msg=f"{name} @ {W}x{H} qp{qp}"
        )


def test_frame_stacked_wavefront_matches_per_frame():
    """GOP-batch stacking: B frames stacked vertically with frame_hmb
    produce the same modes/recon/levels as B independent runs."""
    from h264_fer_tpu.kernels.wavefront import wavefront_i16_scan

    W, H, B, qp, qpc = 176, 144, 3, 26, 24
    wmb, hmb = W // 16, H // 16
    nmb = wmb * hmb
    rng = np.random.default_rng(2)
    ys = rng.integers(0, 256, (B, H, W)).astype(np.int32)
    cbs = rng.integers(0, 256, (B, H // 2, W // 2)).astype(np.int32)
    crs = rng.integers(0, 256, (B, H // 2, W // 2)).astype(np.int32)
    cmap = jnp.asarray(INTRA16_TO_CHROMA_MODE)

    ystk = jnp.asarray(ys.reshape(B * H, W))
    cbstk = jnp.asarray(cbs.reshape(B * H // 2, W // 2))
    crstk = jnp.asarray(crs.reshape(B * H // 2, W // 2))
    m16s = intra_mode_decision(
        ystk, wmb=wmb, hmb=B * hmb, qp=qp, frame_hmb=hmb, modes_only=True
    )["mode16"]
    got = wavefront_i16_scan(
        ystk, cbstk, crstk, m16s, cmap[m16s],
        wmb=wmb, hmb=B * hmb, qp=qp, qpc=qpc, frame_hmb=hmb,
    )

    for k in range(B):
        yk = jnp.asarray(ys[k])
        m16k = intra_mode_decision(yk, wmb=wmb, hmb=hmb, qp=qp)["mode16"]
        np.testing.assert_array_equal(
            np.asarray(m16k), np.asarray(m16s[k * nmb : (k + 1) * nmb]),
            err_msg=f"modes frame {k}",
        )
        ref = wavefront_i16_frame(
            yk, jnp.asarray(cbs[k]), jnp.asarray(crs[k]), m16k, cmap[m16k],
            wmb=wmb, hmb=hmb, qp=qp, qpc=qpc,
        )
        slices = (
            got[0][k * H : (k + 1) * H],
            got[1][k * nmb : (k + 1) * nmb],
            got[2][k * nmb : (k + 1) * nmb],
            got[3][k * H // 2 : (k + 1) * H // 2],
            got[4][k * H // 2 : (k + 1) * H // 2],
            got[5][:, k * nmb : (k + 1) * nmb],
            got[6][:, k * nmb : (k + 1) * nmb],
        )
        for name, r, g in zip(("frame", "dc", "ac", "cb", "cr", "cdc", "cac"),
                              ref, slices):
            np.testing.assert_array_equal(
                np.asarray(r), np.asarray(g), err_msg=f"{name} frame {k}"
            )
