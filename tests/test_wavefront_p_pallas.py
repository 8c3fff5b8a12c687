"""Pallas P-decision wavefront (kernels/wavefront_p_pallas.py) is
bit-identical to the XLA fori_loop wavefront (kernels/wavefront_p.py)
on realistic map inputs, across QP metric tiers and band splits."""

import numpy as np
import pytest

import jax.numpy as jnp

from h264_fer_tpu.codec.tpu_pframe import (
    adaptive_maxdiff,
    me_params,
    pframe_maps,
)
from h264_fer_tpu.kernels.wavefront_p import pframe_decide_impl
from h264_fer_tpu.kernels.wavefront_p_pallas import pframe_decide_pallas_impl
from h264_fer_tpu.ops.interp import interpolated_planes_jax


@pytest.mark.parametrize(
    "H,W,window,qp,hband",
    [
        (64, 96, 8, 28, 4),   # SAD tier
        (96, 64, 8, 40, 4),   # SSD tier; tall geometry, partial band
        (48, 80, 4, 46, 2),   # 2*SSD tier; small window, small band
        (64, 96, 8, 28, 8),   # band larger than needed rows
    ],
)
def test_pallas_decide_matches_xla(H, W, window, qp, hband):
    wmb, hmb = W // 16, H // 16
    ext = window + 2
    rng = np.random.default_rng(7 * H + W + qp)
    ref = rng.integers(0, 256, (H, W), np.int32)
    noise = rng.integers(-6, 7, (H, W))
    src = np.clip(np.roll(ref, (2, 3), (0, 1)) + noise, 0, 255)
    src = src.astype(np.int32)
    planes = interpolated_planes_jax(jnp.asarray(ref), ext)
    nmb = wmb * hmb
    prev = rng.integers(-20, 21, (nmb, 4, 2)).astype(np.int32)
    prev[rng.random((nmb,)) < 0.5] = 0

    maps = pframe_maps(jnp.asarray(src), planes, jnp.asarray(prev),
                       wmb, hmb, window, qp)
    md = adaptive_maxdiff(jnp.asarray(src), wmb, hmb, -1)
    metric_id, lam = me_params(qp)
    args = (jnp.asarray(src), planes, maps["int_map"], maps["c1mv"],
            maps["q1map"], maps["c2mv"], maps["q2map"], maps["q2ok"], md)
    kw = dict(wmb=wmb, hmb=hmb, window=window, ext=ext,
              metric_id=metric_id, lam=lam)
    want = pframe_decide_impl(*args, **kw)
    got = pframe_decide_pallas_impl(*args, hband=hband, **kw)
    for key in ("skip", "mb_type", "mv", "mvd"):
        assert np.array_equal(np.asarray(want[key]), np.asarray(got[key])), key
