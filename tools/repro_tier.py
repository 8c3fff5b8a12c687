"""Focused repro: device_p_frame across capacity tiers (static-arg
variants of one jitted function) — the suspected dispatch-crash trigger."""
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

from h264_fer_tpu.codec.tpu_pframe import device_p_frame
from h264_fer_tpu.ops import transform

W, H, QP = 176, 144, 28
wmb, hmb = W // 16, H // 16
nmb = wmb * hmb
qpc = transform.chroma_qp(QP, 0)
rng = np.random.default_rng(0)


def call(i, nw, cap):
    ys = rng.integers(0, 255, (2, H, W)).astype(np.uint8)
    cbs = rng.integers(0, 255, (2, H // 2, W // 2)).astype(np.uint8)
    crs = rng.integers(0, 255, (2, H // 2, W // 2)).astype(np.uint8)
    out = device_p_frame(
        jnp.asarray(ys[1].astype(np.int32)),
        jnp.asarray(cbs[1].astype(np.int32)),
        jnp.asarray(crs[1].astype(np.int32)),
        jnp.asarray(ys[0].astype(np.int32)),
        jnp.asarray(cbs[0].astype(np.int32)),
        jnp.asarray(crs[0].astype(np.int32)),
        jnp.zeros((nmb, 4, 2), jnp.int32), wmb=wmb, hmb=hmb, window=8,
        qp=QP, qpc=qpc, cfg_maxdiff=-1, prefilter=True, nw=nw, cap=cap)
    print(f"call {i} nw={nw} cap={cap} ok meta={np.asarray(out['meta'])}",
          flush=True)


call(0, nmb * 24, 8)
call(1, nmb * 24, 8)
call(2, nmb * 192, 24)
call(3, nmb * 24, 8)
call(4, nmb * 192, 24)
call(5, None, None)
call(6, nmb * 24, 8)
print("ALL OK")
