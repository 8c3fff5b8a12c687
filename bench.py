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

    W, H, QP = 1920, 1088, 26
    rng = np.random.default_rng(0)
    # texture-like content (random is worst-case for SATD magnitudes)
    y = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.int32))

    def step(y):
        out = intra_mode_decision(y, wmb=W // 16, hmb=H // 16, qp=QP)
        return out["mode16"], out["mode4"], out["satd16"], out["q16"]

    # warmup / compile
    jax.block_until_ready(step(y))
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        res = step(y)
    jax.block_until_ready(res)
    dt = time.perf_counter() - t0
    fps = n / dt

    ref_fps = 2.92  # reference all-intra 1920x816 with GPU offload
    print(json.dumps({
        "metric": "intra_pipeline_1080p_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / ref_fps, 2),
    }))


if __name__ == "__main__":
    main()
