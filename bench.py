"""Benchmark: end-to-end device encode throughput at 1080p.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}; the
headline metric is the all-intra 1080p e2e fps, and the ``extra`` field
carries every other metric that completed (IPPP 1080p e2e, device-only,
decode). vs_baseline is against the reference's best published all-intra
figure: 2.92 fps at 1920×816 with its OpenCL offload (BASELINE.md,
Diplomski.docx Table 6.5).

Metrics (each in its own subprocess so a compile hang can't kill the
round; the JAX persistent compilation cache makes retries and reruns skip
the 1080p compiles that cost round 3 its number):

  e2e      — TRUE end-to-end all-intra: uint8 frames on the host in,
             decodable Annex-B bytes out (modes + wavefront recon +
             whole-slice CAVLC packed on device, EPB + NAL framing on
             host), timed over the full pipelined sequence encode. The
             stream is parity-checked against the serial encoder and
             decode-gated before the number is reported.
  ippp     — TRUE end-to-end IPPP (GOP = IDR + 7 P frames): the whole-GOP
             device program (ME maps + decision wavefront + MC/residual/
             recon + slice entropy chained by lax.scan), decode-gated.
  device   — device-side frame program throughput (the per-chip compute
             number, excluding host↔tunnel byte moves).
  qcif     — QCIF all-intra e2e fallback so the driver records a real
             number even when the 1080p compiles exceed every budget.

Usage: python bench.py [--metric e2e|ippp|device|qcif]  (no arg: orchestrate)
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REF_FPS = 2.92
# reference inter baseline: best optimized-ME figure, 449 ms/frame at
# 640x352 (Diplomski_Davor Table 6.2) = 2.23 fps, pixel-scaled to
# 1920x1088 (x0.1078) — the reference never ran P frames at 1080p
REF_IPPP_FPS = 0.24
W, H, QP = 1920, 1088, 28


def _content(n, w=W, h=H):
    """Structured test frames (gradients + texture — realistic CAVLC
    load, unlike uniform noise)."""
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        y = (((xx // 7 + yy // 5 + 3 * i) % 200)
             + rng.integers(0, 12, (h, w))).astype(np.uint8)
        cb = rng.integers(100, 140, (h // 2, w // 2)).astype(np.uint8)
        cr = rng.integers(100, 140, (h // 2, w // 2)).astype(np.uint8)
        frames.append((y, cb, cr))
    return frames


def _intra_e2e(w, h, n_frames, reps=5):
    """Median-of-reps fps of the pipelined all-intra sequence encode,
    parity- and decode-gated over EVERY frame."""
    import jax

    from h264_fer_tpu.codec.decoder import Decoder
    from h264_fer_tpu.codec.encoder import Encoder, EncoderConfig
    from h264_fer_tpu.codec.tpu_intra import TpuIntraPipeline
    from h264_fer_tpu.parallel.gop_device import GopIntraEncoder

    frames = _content(n_frames, w, h)
    # serial per-frame encoder: the byte-parity oracle (its streams are
    # reference-decoder-verified); also warms the shared frame program.
    # Per-frame reconstructions feed the full decode gate below.
    enc = Encoder(w, h, EncoderConfig(qp=QP, intra_every=1),
                  tpu_pipeline=TpuIntraPipeline(w, h, qp=QP),
                  tpu_iframe=True)
    serial = bytearray(enc.headers())
    recons = []
    for f in frames:
        serial += enc.encode_frame(*f)
        recons.append(tuple(np.copy(p) for p in enc.reconstructed()))
    serial = bytes(serial)
    genc = GopIntraEncoder(w, h, QP, devices=jax.devices()[:1])
    stream = genc.encode_sequence(frames)  # warm the pipelined path
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        stream = genc.encode_sequence(frames)
        vals.append(len(frames) / (time.perf_counter() - t0))
    fps = sorted(vals)[len(vals) // 2]
    assert stream == serial, "pipelined stream != serial stream"
    # decode gate over the FULL stream: every decoded frame must equal
    # the serial encoder's reconstruction (catches mid-stream stitch
    # bugs, not just a bad final frame); doubles as the decode metric
    t0 = time.perf_counter()
    n_dec = 0
    for got, want in zip(Decoder().decode_annexb(stream), recons):
        assert np.array_equal(got[0], want[0]), f"decode y f{n_dec}"
        assert np.array_equal(got[1], want[1]), f"decode cb f{n_dec}"
        assert np.array_equal(got[2], want[2]), f"decode cr f{n_dec}"
        n_dec += 1
    dec_fps = n_dec / (time.perf_counter() - t0)
    assert n_dec == len(frames), "decode gate: frame count"
    print(json.dumps({
        "metric": f"decode_{w}x{h}_fps",
        "value": round(dec_fps, 2),
        "unit": "frames/s",
        "vs_baseline": 0.0,
    }))
    return fps


def run_metric(which: str) -> None:
    from h264_fer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    if which == "device":
        from h264_fer_tpu.codec.tpu_iframe import device_i16_frame

        y, cb, cr = (jnp.asarray(p) for p in _content(1)[0])
        nw = (W // 16) * (H // 16) * 24  # encoder tier-0 payload capacity
        out = device_i16_frame(y, cb, cr, wmb=W // 16, hmb=H // 16,
                               qp=QP, qpc=26, nw=nw)
        assert int(out["nbits"]) <= 32 * nw  # compile + full execution
        # amortized: a per-dispatch sync pays the ~25 ms tunnel RPC
        # latency per reading (PROFILE_r05.md) — dispatch N, sync once
        n = 16
        t0 = time.perf_counter()
        outs = [device_i16_frame(y, cb, cr, wmb=W // 16, hmb=H // 16,
                                 qp=QP, qpc=26, nw=nw) for _ in range(n)]
        int(outs[-1]["nbits"])  # scalar readback drains the queue
        fps = n / (time.perf_counter() - t0)
        name = "device_iframe_encode_1080p_fps_per_chip"
    elif which == "ippp":
        import jax

        from h264_fer_tpu.codec.decoder import Decoder
        from h264_fer_tpu.parallel.gop_device import GopIpppEncoder

        n_frames, gop_len = 16, 8
        frames = _content(n_frames)
        genc = GopIpppEncoder(W, H, QP, gop_len=gop_len,
                              devices=jax.devices()[:1])
        stream = genc.encode_sequence(frames)  # compile + warm
        vals = []
        for _ in range(3):
            t0 = time.perf_counter()
            stream = genc.encode_sequence(frames)
            vals.append(n_frames / (time.perf_counter() - t0))
        fps = sorted(vals)[1]
        # decode gate: the full GOP must round-trip (P frames chain, so
        # decoding the last frame exercises every frame)
        outs = list(Decoder().decode_annexb(stream))
        assert len(outs) == n_frames, "IPPP decode gate failed"
        print(json.dumps({
            "metric": "e2e_ippp_encode_1080p_fps",
            "value": round(fps, 2),
            "unit": "frames/s",
            "vs_baseline": round(fps / REF_IPPP_FPS, 2),
        }))
        return
    elif which == "qcif":
        fps = _intra_e2e(176, 144, 16)
        name = "e2e_iframe_encode_qcif_fps"
    else:
        fps = _intra_e2e(W, H, 24)
        name = "e2e_iframe_encode_1080p_fps"

    print(json.dumps({
        "metric": name,
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REF_FPS, 2),
    }))


def main() -> None:
    # persistent-cache dir is shared with the subprocesses via env
    os.environ.setdefault(
        "H264_FER_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "h264_fer_tpu",
                     "jax"))
    deadline = time.monotonic() + 2100  # hard stop for the whole bench
    results = {}
    # two attempts per metric: a first attempt that dies compiling still
    # persists its finished XLA modules, so the retry resumes warm (the
    # 1080p IPPP GOP-scan program is a ~25 min cold compile; warm ~10 min)
    plan = [("e2e", 420, 2), ("ippp", 780, 1), ("device", 300, 1)]
    for which, budget, attempts in plan:
        for _ in range(attempts):
            if time.monotonic() + 60 > deadline:
                break
            budget_now = min(budget, max(60, int(deadline - time.monotonic())))
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--metric",
                     which],
                    capture_output=True, timeout=budget_now, text=True,
                )
            except subprocess.TimeoutExpired:
                continue
            for line in r.stdout.splitlines():
                if line.startswith("{"):
                    obj = json.loads(line)
                    # keep the metric the subprocess was asked for under
                    # its plan key; piggybacked metrics under their names
                    if which not in results and not obj["metric"].startswith(
                            "decode_"):
                        results[which] = obj
                    else:
                        results[obj["metric"]] = obj
            if which in results:
                break
    if "e2e" not in results and time.monotonic() + 60 < deadline:
        # QCIF fallback: tiny compiles — always produces a real number
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--metric",
                 "qcif"],
                capture_output=True, timeout=300, text=True)
            for line in r.stdout.splitlines():
                if line.startswith("{"):
                    results["qcif"] = json.loads(line)
                    break
        except subprocess.TimeoutExpired:
            pass
    headline = (results.get("e2e") or results.get("ippp")
                or results.get("qcif") or results.get("device"))
    if headline is None:
        headline = {
            "metric": "e2e_iframe_encode_1080p_fps",
            "value": 0.0,
            "unit": "frames/s (device unavailable at bench time)",
            "vs_baseline": 0.0,
        }
    extra = {v["metric"]: v["value"] for k, v in results.items()
             if v["metric"] != headline["metric"]}
    if extra:
        headline = dict(headline)
        headline["extra"] = extra
    print(json.dumps(headline))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--metric":
        run_metric(sys.argv[2])
    else:
        main()
