"""Per-stage device timings of the I-frame pipeline (SURVEY §5.1 /
VERDICT r3 missing-7: profiling hooks).

Times each stage of the fully-device I-frame encode at a given geometry
with a true device sync per measurement (scalar readback — axon's
block_until_ready returns at dispatch). Optionally writes a
jax.profiler trace for xprof.

Usage: python tools/profile_stages.py [WxH] [qp] [--trace DIR]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from h264_fer_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def _sync(x):
    return float(jnp.asarray(x).reshape(-1)[0].astype(jnp.float32))


def timeit(label, fn, n=10):
    fn()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n
    print(f"{label:42s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    geo = sys.argv[1] if len(sys.argv) > 1 and "x" in sys.argv[1] else "1920x1088"
    W, H = (int(v) for v in geo.split("x"))
    qp = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 28
    wmb, hmb = W // 16, H // 16
    nmb = wmb * hmb

    from h264_fer_tpu.codec.tpu_entropy import i16_slice_entropy
    from h264_fer_tpu.codec.tpu_iframe import device_i16_frame
    from h264_fer_tpu.codec.tpu_intra import intra_mode_decision
    from h264_fer_tpu.kernels.wavefront import wavefront_i16_frame
    from h264_fer_tpu.kernels.wavefront_pallas import (
        i16_levels_from_recon,
        pallas_i16_frame_fast,
    )
    from h264_fer_tpu.ops.intra import INTRA16_TO_CHROMA_MODE
    from h264_fer_tpu.ops.transform import chroma_qp

    qpc = chroma_qp(qp)
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:H, 0:W]
    y = jnp.asarray((((xx // 7 + yy // 5) % 200)
                     + rng.integers(0, 12, (H, W))).astype(np.int32))
    cb = jnp.asarray(rng.integers(100, 140, (H // 2, W // 2)).astype(np.int32))
    cr = jnp.asarray(rng.integers(100, 140, (H // 2, W // 2)).astype(np.int32))

    print(f"stage timings @ {W}x{H} qp{qp} on {jax.default_backend()}")

    m16 = intra_mode_decision(y, wmb=wmb, hmb=hmb, qp=qp, modes_only=True,
                              i16_only=True)["mode16"]
    cm = jnp.asarray(INTRA16_TO_CHROMA_MODE)[m16]
    timeit("intra_mode_decision", lambda: _sync(intra_mode_decision(
        y, wmb=wmb, hmb=hmb, qp=qp, modes_only=True,
        i16_only=True)["mode16"][0]))

    wf = pallas_i16_frame_fast(y, cb, cr, m16, cm, wmb=wmb, hmb=hmb,
                               qp=qp, qpc=qpc)
    timeit("pallas wavefront (recon+levels)", lambda: _sync(
        pallas_i16_frame_fast(y, cb, cr, m16, cm, wmb=wmb, hmb=hmb,
                              qp=qp, qpc=qpc)[0][0, 0]))
    if "--xla-wavefront" in sys.argv:  # crashes the axon worker at 1080p
        timeit("xla wavefront (recon+levels)", lambda: _sync(
            wavefront_i16_frame(y, cb, cr, m16, cm, wmb=wmb, hmb=hmb,
                                qp=qp, qpc=qpc)[0][0, 0]))
    recon_y, i16dc, i16ac, rcb, rcr, cdc, cac = wf
    timeit("levels_from_recon alone", lambda: _sync(
        i16_levels_from_recon(y, cb, cr, recon_y, rcb, rcr, m16, cm,
                              wmb=wmb, hmb=hmb, qp=qp, qpc=qpc)[0][0, 0]))
    nw = nmb * 24
    timeit("slice entropy (symbols+pack)", lambda: _sync(
        i16_slice_entropy(m16, cm, i16dc, i16ac, cdc, cac, wmb=wmb,
                          hmb=hmb, nw=nw, cap=8)["meta"]))
    out = device_i16_frame(y, cb, cr, wmb=wmb, hmb=hmb, qp=qp, qpc=qpc,
                           nw=nw, cap=8)
    timeit("FULL device_i16_frame (sync meta)", lambda: _sync(
        device_i16_frame(y, cb, cr, wmb=wmb, hmb=hmb, qp=qp, qpc=qpc,
                         nw=nw, cap=8)["meta"]))
    nbits = int(np.asarray(out["meta"])[0])
    nwords = (nbits + 31) // 32

    def full_with_readback():
        o = device_i16_frame(y, cb, cr, wmb=wmb, hmb=hmb, qp=qp, qpc=qpc,
                             nw=nw, cap=8)
        np.asarray(o["words"][:nwords])

    timeit(f"FULL + payload readback ({nwords * 4 // 1024} KB)",
           full_with_readback)

    yh = np.asarray(y).astype(np.uint8)

    def upload():
        _sync(jnp.asarray(yh).astype(jnp.int32)[0, 0])

    timeit("host->device 1 luma plane upload", upload)

    if "--pframe" in sys.argv:
        import functools

        from h264_fer_tpu.codec import tpu_pframe as tp
        from h264_fer_tpu.kernels.wavefront_p import pframe_decide

        window = 8
        ext = window + 2
        ref_y = recon_y
        jit = jax.jit

        interp = jit(functools.partial(
            __import__("h264_fer_tpu.ops.interp",
                       fromlist=["interpolated_planes_jax"]
                       ).interpolated_planes_jax, ext=ext))
        planes = interp(ref_y)
        timeit("P: interp planes (16 phases)",
               lambda: _sync(interp(ref_y)[0, 0, 0]))
        pmv = jnp.zeros((nmb, 4, 2), jnp.int32)
        maps_fn = jit(functools.partial(
            tp.pframe_maps, wmb=wmb, hmb=hmb, window=window, qp=qp))
        maps = maps_fn(y, planes, pmv)
        timeit("P: bulk ME maps (int + 2x qpel)",
               lambda: _sync(maps_fn(y, planes, pmv)["int_map"][0, 0, 0]))
        md = tp.adaptive_maxdiff(y, wmb, hmb, -1)
        metric_id, lam = tp.me_params(qp)
        dec_fn = functools.partial(
            pframe_decide, wmb=wmb, hmb=hmb, window=window, ext=ext,
            metric_id=metric_id, lam=lam)
        dec = dec_fn(y, planes, maps["int_map"], maps["c1mv"],
                     maps["q1map"], maps["c2mv"], maps["q2map"],
                     maps["q2ok"], md)
        timeit("P: decision wavefront", lambda: _sync(dec_fn(
            y, planes, maps["int_map"], maps["c1mv"], maps["q1map"],
            maps["c2mv"], maps["q2map"], maps["q2ok"], md)["mv"][0, 0, 0]))
        full_p = functools.partial(
            tp.device_p_frame, wmb=wmb, hmb=hmb, window=window, qp=qp,
            qpc=qpc, cfg_maxdiff=-1, prefilter=True, nw=nmb * 24, cap=8)
        timeit("P: FULL device_p_frame (sync meta)", lambda: _sync(
            full_p(y, cb, cr, ref_y, rcb, rcr, pmv)["meta"]))

    if "--trace" in sys.argv:
        tdir = sys.argv[sys.argv.index("--trace") + 1]
        with jax.profiler.trace(tdir):
            for _ in range(3):
                _sync(device_i16_frame(y, cb, cr, wmb=wmb, hmb=hmb, qp=qp,
                                       qpc=qpc, nw=nw, cap=8)["meta"])
        print("trace written to", tdir)


if __name__ == "__main__":
    main()
