"""Minimal trigger search for the const-args dispatch crash."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=9").strip()
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from h264_fer_tpu.codec.tpu_gop import device_gop_ippp
from h264_fer_tpu.ops import transform

W, H, QP, T = 176, 144, 28, 3
wmb, hmb = W // 16, H // 16
nmb = wmb * hmb
qpc = transform.chroma_qp(QP, 0)
rng = np.random.default_rng(0)
ys = rng.integers(0, 255, (T, H, W)).astype(np.uint8)
cbs = rng.integers(0, 255, (T, H // 2, W // 2)).astype(np.uint8)
crs = rng.integers(0, 255, (T, H // 2, W // 2)).astype(np.uint8)
hdr_bits = jnp.asarray(np.full((T - 1,), 40, np.int32))

stage = sys.argv[1] if len(sys.argv) > 1 else "none"
if stage == "enc1":
    from h264_fer_tpu.codec.encoder import Encoder, EncoderConfig
    from h264_fer_tpu.codec.tpu_intra import TpuIntraPipeline

    enc = Encoder(W, H, EncoderConfig(qp=QP, intra_every=1,
                                      scene_cut_idr=False),
                  tpu_pipeline=TpuIntraPipeline(W, H, QP),
                  tpu_iframe=True)
    s = enc.encode_frame(ys[0], cbs[0], crs[0])
    print("enc1 ok", len(s))
elif stage == "encp":
    from h264_fer_tpu.codec.encoder import Encoder, EncoderConfig
    from h264_fer_tpu.codec.tpu_intra import TpuIntraPipeline

    enc = Encoder(W, H, EncoderConfig(qp=QP, intra_every=3,
                                      scene_cut_idr=False),
                  tpu_pipeline=TpuIntraPipeline(W, H, QP),
                  tpu_iframe=True, tpu_pframe=True)
    s = b"".join(enc.encode_frame(*f) for f in zip(ys, cbs, crs))
    print("encp ok", len(s))
elif stage == "pipeline":
    from h264_fer_tpu.codec.tpu_intra import TpuIntraPipeline

    pipe = TpuIntraPipeline(W, H, QP)
    out = pipe(ys[0].astype(np.int32))
    print("pipeline ok", int(np.asarray(out["mode16"])[0]))
elif stage == "iframe":
    from h264_fer_tpu.codec.tpu_iframe import device_i16_frame

    out = device_i16_frame(jnp.asarray(ys[0]), jnp.asarray(cbs[0]),
                           jnp.asarray(crs[0]), wmb=wmb, hmb=hmb, qp=QP,
                           qpc=qpc, nw=nmb * 24, cap=8)
    print("iframe ok", int(out["meta"][0]))
elif stage == "pframe":
    from h264_fer_tpu.codec.tpu_pframe import device_p_frame

    out = device_p_frame(
        jnp.asarray(ys[1]), jnp.asarray(cbs[1]), jnp.asarray(crs[1]),
        jnp.asarray(ys[0]), jnp.asarray(cbs[0]), jnp.asarray(crs[0]),
        jnp.zeros((nmb, 4, 2), jnp.int32), wmb=wmb, hmb=hmb, window=8,
        qp=QP, qpc=qpc, cfg_maxdiff=-1, prefilter=True, nw=nmb * 24, cap=8)
    print("pframe ok", int(out["meta"][0]))
elif stage == "sad":
    from h264_fer_tpu.codec.tpu_iframe import frame_sad

    print("sad ok", int(frame_sad(jnp.asarray(ys[0]), jnp.asarray(ys[1]))))

out = device_gop_ippp(
    jnp.asarray(ys), jnp.asarray(cbs), jnp.asarray(crs), hdr_bits,
    wmb=wmb, hmb=hmb, window=8, qp=QP, qpc=qpc, cfg_maxdiff=-1,
    prefilter=True, nw_i=nmb * 24, cap_i=8, nw_p=nmb * 24, cap_p=8)
print("gop ok", int(np.asarray(out["meta_i"])[0]))
