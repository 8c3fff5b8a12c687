"""Pallas full-search ME kernel vs the XLA integer score map — the maps
must be bit-identical (same shift indexing, same argmin tie-breaks)."""

import numpy as np
import pytest

import jax.numpy as jnp

from h264_fer_tpu.codec.tpu_pframe import integer_score_map
from h264_fer_tpu.kernels.me_pallas import pallas_integer_score_map
from h264_fer_tpu.ops.interp import interpolated_planes


@pytest.mark.parametrize("window", [4, 8])
@pytest.mark.parametrize("metric_id", [0, 1])
def test_pallas_me_matches_xla(window, metric_id):
    W, H = 64, 48
    ext = window + 2
    rng = np.random.default_rng(3)
    src = rng.integers(0, 256, (H, W)).astype(np.int32)
    ref = rng.integers(0, 256, (H, W)).astype(np.int32)
    plane0 = jnp.asarray(interpolated_planes(ref, ext)[0])
    ref_map = integer_score_map(jnp.asarray(src), plane0, ext, window,
                                metric_id)
    got = pallas_integer_score_map(jnp.asarray(src), plane0, ext, window,
                                   metric_id)
    np.testing.assert_array_equal(np.asarray(ref_map), np.asarray(got))
