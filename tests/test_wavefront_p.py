"""P-frame decision wavefront vs the host encoder's per-MB loop.

pframe_decide (kernels/wavefront_p.py), driven by the bulk maps
(codec/tpu_pframe.py), must reproduce the host _inter_encode_mb decisions
exactly: skip flags, mb_type, final quadrant MVs, and mvds."""

import numpy as np
import pytest

import jax.numpy as jnp

from h264_fer_tpu.codec.encoder import MB_SKIP, Encoder, EncoderConfig
from h264_fer_tpu.codec.tpu_pframe import pframe_maps
from h264_fer_tpu.kernels.wavefront_p import pframe_decide
from h264_fer_tpu.ops.interp import interpolated_planes_jax
from h264_fer_tpu.vio.y4m import Y4MReader


@pytest.mark.parametrize("qp", [28, 40, 46])
def test_pframe_decisions_match_host(fixtures_dir, qp):
    frames = list(Y4MReader(str(fixtures_dir / "clip_qcif_10f.y4m")))[:3]
    w, h = 176, 144
    wmb, hmb = w // 16, h // 16
    nmb = wmb * hmb

    enc = Encoder(w, h, EncoderConfig(qp=qp, intra_every=100,
                                      lossy_prefilter=False))
    rec = {}
    orig = Encoder._inter_encode_mb

    def wrap(self, curr):
        res = orig(self, curr)
        rec[curr] = None if res is None else (res[0], res[2].copy())
        return res

    Encoder._inter_encode_mb = wrap
    try:
        enc.encode_frame(*frames[0])  # I
        for fi in (1, 2):
            ref_y = enc.ref_y.copy()
            prev_mv = enc.prev_mv[:, :, 0, :].copy()  # (nmb, 4, 2)
            rec.clear()
            enc.encode_frame(*frames[fi])
            host_mv = enc.mv[:, :, 0, :].copy()
            host_type = enc.mb_type.copy()

            window = enc.cfg.window_size // 2
            planes = interpolated_planes_jax(
                jnp.asarray(ref_y), ext=window + 2)
            src = jnp.asarray(frames[fi][0].astype(np.int32))
            maps = pframe_maps(src, planes, jnp.asarray(prev_mv),
                               wmb, hmb, window, qp)
            out = pframe_decide(
                src, planes, maps["int_map"], maps["c1mv"], maps["q1map"],
                maps["c2mv"], maps["q2map"], maps["q2ok"],
                jnp.asarray(np.asarray(
                    _host_maxdiff(frames[fi][0], wmb, hmb))),
                wmb=wmb, hmb=hmb, window=window, ext=maps["ext"],
                metric_id=maps["metric_id"], lam=maps["lam"])

            skip = np.asarray(out["skip"])
            mbt = np.asarray(out["mb_type"])
            mv = np.asarray(out["mv"])
            mvd = np.asarray(out["mvd"])
            for curr in range(nmb):
                host_skip = rec[curr] is None
                assert skip[curr] == host_skip, (fi, curr)
                assert np.array_equal(mv[curr], host_mv[curr]), (
                    fi, curr, mv[curr], host_mv[curr])
                if host_skip:
                    assert host_type[curr] == MB_SKIP
                    continue
                ht, hmvd = rec[curr]
                assert mbt[curr] == ht, (fi, curr, mbt[curr], ht)
                nparts = [1, 2, 2, 4, 4][ht]
                assert np.array_equal(mvd[curr, :nparts], hmvd[:nparts]), (
                    fi, curr, mvd[curr], hmvd)
    finally:
        Encoder._inter_encode_mb = orig


def _host_maxdiff(src_y, wmb, hmb):
    out = np.zeros(wmb * hmb, np.int32)
    s = src_y.astype(np.int32)
    for curr in range(wmb * hmb):
        x0, y0 = (curr % wmb) * 16, (curr // wmb) * 16
        mb = s[y0 : y0 + 16, x0 : x0 + 16]
        mean = int(mb.sum()) // 256
        out[curr] = max(3, int(np.abs(mb - mean).sum()) // 256)
    return out
