"""Benchmark: TPU whole-frame intra pipeline throughput at 1080p.

Measures the device-side encode compute (full intra mode decision over all
MBs — 4 I16 modes + 9×16 I4x4 modes — plus forward transform and
quantization of the winning predictions) on one chip, the counterpart of
the reference's GPU offload which reached 2.92 fps at 1920×816 all-intra
(BASELINE.md, Diplomski.docx Table 6.5). vs_baseline is against that
2.92 fps.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from h264_fer_tpu.codec.tpu_intra import intra_mode_decision
    from h264_fer_tpu.kernels.wavefront import (
        wavefront_chroma,
        wavefront_i16_luma,
    )
    from h264_fer_tpu.ops.intra import INTRA16_TO_CHROMA_MODE

    W, H, QP = 1920, 1088, 26
    QPC = 24  # chroma_qp(26)
    rng = np.random.default_rng(0)
    # texture-like content (random is worst-case for SATD magnitudes)
    y = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.int32))
    cb = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32))
    cr = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32))
    wmb, hmb = W // 16, H // 16
    cmap = jnp.asarray(INTRA16_TO_CHROMA_MODE)

    def step(y, cb, cr):
        """Full device I-frame compute: mode decision over all MBs/blocks +
        exact wavefront reconstruction of all three planes + quantized
        levels (everything except host CAVLC writing)."""
        out = intra_mode_decision(y, wmb=wmb, hmb=hmb, qp=QP)
        m16 = out["mode16"]
        ry, dc, ac = wavefront_i16_luma(y, m16, wmb=wmb, hmb=hmb, qp=QP)
        rcb, rcr, cdc, cac = wavefront_chroma(
            cb, cr, cmap[m16], wmb=wmb, hmb=hmb, qp=QPC
        )
        return ry, dc, ac, rcb, rcr, cdc, cac, out["mode4"]

    step = jax.jit(step)
    jax.block_until_ready(step(y, cb, cr))  # compile
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        res = step(y, cb, cr)
    jax.block_until_ready(res)
    dt = time.perf_counter() - t0
    fps = n / dt

    ref_fps = 2.92  # reference all-intra 1920x816 with GPU offload
    print(json.dumps({
        "metric": "device_iframe_encode_1080p_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / ref_fps, 2),
    }))


if __name__ == "__main__":
    main()
