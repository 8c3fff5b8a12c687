"""Pallas kernels vs the reference-exact ops (interpret mode on CPU)."""

import numpy as np
import pytest

from h264_fer_tpu.kernels.transform_pallas import fwd_quant_pallas, satd_pallas
from h264_fer_tpu.ops import transform as T


@pytest.mark.parametrize("qp", [0, 14, 23, 24, 28, 51])
def test_fwd_quant_matches_reference_ops(qp):
    rng = np.random.default_rng(qp)
    blocks = rng.integers(-255, 256, (37, 4, 4)).astype(np.int32)
    gold = T.quantize_residual(T.forward_transform_4x4(blocks), qp, False)
    got = np.asarray(fwd_quant_pallas(blocks, qp, interpret=True))
    np.testing.assert_array_equal(got, gold)
    gold_b = T.quantize_residual(T.forward_transform_4x4(blocks), qp, True)
    got_b = np.asarray(fwd_quant_pallas(blocks, qp, dc_bypass=True, interpret=True))
    np.testing.assert_array_equal(got_b, gold_b)


def test_satd_matches_reference_ops():
    rng = np.random.default_rng(5)
    blocks = rng.integers(-255, 256, (300, 4, 4)).astype(np.int32)
    gold = np.abs(
        T.quantize_residual(T.forward_transform_4x4(blocks), 28, False)
    ).sum(axis=(1, 2))
    got = np.asarray(satd_pallas(blocks, 28, interpret=True))
    np.testing.assert_array_equal(got, gold)
