"""Benchmark: end-to-end device I-frame encode throughput at 1080p.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the reference's best published all-intra figure:
2.92 fps at 1920×816 with its OpenCL offload (BASELINE.md, Diplomski.docx
Table 6.5).

Metrics, deepest-first with subprocess timeouts (the axon tunnel has shown
compile hangs and worker crashes; the driver must still get a line):

  e2e      — TRUE end-to-end: uint8 frames on the host in, decodable
             Annex-B bytes out (modes + wavefront recon + whole-slice
             CAVLC packed on device, EPB + NAL framing on host), timed
             over the full encode_frame loop. The stream is decoded and
             checked against the encoder reconstruction before the number
             is reported.
  device   — device-side frame program throughput (modes + wavefront +
             slice entropy, synced by the nbits scalar readback): the
             per-chip compute number, excluding the host↔tunnel byte
             moves that dominate e2e on this remote-TPU setup.

Usage: python bench.py [--metric e2e|device]  (no arg: orchestrate)
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REF_FPS = 2.92
W, H, QP = 1920, 1088, 28


def _content(n):
    """Structured test frames (gradients + texture — realistic CAVLC
    load, unlike uniform noise)."""
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:H, 0:W]
    frames = []
    for i in range(n):
        y = (((xx // 7 + yy // 5 + 3 * i) % 200)
             + rng.integers(0, 12, (H, W))).astype(np.uint8)
        cb = rng.integers(100, 140, (H // 2, W // 2)).astype(np.uint8)
        cr = rng.integers(100, 140, (H // 2, W // 2)).astype(np.uint8)
        frames.append((y, cb, cr))
    return frames


def run_metric(which: str) -> None:
    import jax.numpy as jnp

    from h264_fer_tpu.codec.encoder import Encoder, EncoderConfig
    from h264_fer_tpu.codec.tpu_intra import TpuIntraPipeline

    frames = _content(4)

    if which == "device":
        from h264_fer_tpu.codec.tpu_iframe import device_i16_frame

        y, cb, cr = (jnp.asarray(p) for p in frames[0])
        nw = (W // 16) * (H // 16) * 24  # encoder tier-0 payload capacity
        out = device_i16_frame(y, cb, cr, wmb=W // 16, hmb=H // 16,
                               qp=QP, qpc=26, nw=nw)
        assert int(out["nbits"]) <= 32 * nw  # compile + full execution
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            out = device_i16_frame(y, cb, cr, wmb=W // 16, hmb=H // 16,
                                   qp=QP, qpc=26, nw=nw)
            int(out["nbits"])  # true sync: scalar readback
        fps = n / (time.perf_counter() - t0)
        name = "device_iframe_encode_1080p_fps_per_chip"
    else:
        from h264_fer_tpu.parallel.gop_device import GopIntraEncoder

        frames = _content(9)
        # serial per-frame encoder: the byte-parity oracle (its streams
        # are reference-decoder-verified); also warms the shared jitted
        # frame program
        enc = Encoder(W, H, EncoderConfig(qp=QP, intra_every=1),
                      tpu_pipeline=TpuIntraPipeline(W, H, qp=QP),
                      tpu_iframe=True)
        serial = enc.encode_sequence(frames)
        # pipelined sequence encode: dispatch every frame's device program
        # before any readback so tunnel transfers overlap compute
        import jax

        genc = GopIntraEncoder(W, H, QP, devices=jax.devices()[:1])
        stream = genc.encode_sequence(frames)  # warm the pipelined path
        t0 = time.perf_counter()
        stream = genc.encode_sequence(frames)
        fps = len(frames) / (time.perf_counter() - t0)
        assert stream == serial, "pipelined stream != serial stream"
        # decodability gate: the last IDR (self-contained) must decode to
        # the serial encoder's reconstruction
        from h264_fer_tpu.bitstream.nal import iter_nal_units
        from h264_fer_tpu.codec.decoder import Decoder

        last = stream.rfind(b"\x00\x00\x00\x01")
        hdr_end = len(genc.headers())
        got = list(Decoder().decode_annexb(stream[:hdr_end] + stream[last:]))
        ry, rcb, rcr = enc.reconstructed()
        assert np.array_equal(got[-1][0], ry), "decode mismatch"
        assert np.array_equal(got[-1][1], rcb)
        assert np.array_equal(got[-1][2], rcr)
        name = "e2e_iframe_encode_1080p_fps"

    print(json.dumps({
        "metric": name,
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REF_FPS, 2),
    }))


def main() -> None:
    for which, budget in (("e2e", 560), ("device", 480)):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--metric",
                 which],
                capture_output=True, timeout=budget, text=True,
            )
            for line in r.stdout.splitlines():
                if line.startswith("{"):
                    print(line)
                    return
        except subprocess.TimeoutExpired:
            continue
    # nothing completed (device unavailable): report that fact in-format
    print(json.dumps({
        "metric": "e2e_iframe_encode_1080p_fps",
        "value": 0.0,
        "unit": "frames/s (device unavailable at bench time)",
        "vs_baseline": 0.0,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--metric":
        run_metric(sys.argv[2])
    else:
        main()
