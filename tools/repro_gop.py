"""Minimal repro for the GopIpppEncoder single-device buffer-count crash."""
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

from h264_fer_tpu.parallel.gop_device import GopIpppEncoder
from h264_fer_tpu.vio.y4m import Y4MReader

clip = list(Y4MReader("tests/fixtures/clip_qcif_10f.y4m"))
frames = clip[:6]

mode = sys.argv[1] if len(sys.argv) > 1 else "alone"
if mode == "serial_first":
    from h264_fer_tpu.codec.encoder import Encoder, EncoderConfig
    from h264_fer_tpu.codec.tpu_intra import TpuIntraPipeline

    pipe = TpuIntraPipeline(176, 144, 28)
    enc = Encoder(176, 144, EncoderConfig(qp=28, intra_every=3,
                                          scene_cut_idr=False),
                  tpu_pipeline=pipe, tpu_iframe=True, tpu_pframe=True)
    serial = enc.encode_sequence(frames)
    print("serial ok", len(serial))

if mode == "sharded":
    import jax.numpy as jnp

    from h264_fer_tpu.codec.tpu_gop import device_gop_ippp

    genc1 = GopIpppEncoder(176, 144, 28, gop_len=3,
                           devices=jax.devices()[:1])
    s1 = genc1.encode_sequence(frames)
    genc2 = GopIpppEncoder(176, 144, 28, gop_len=3,
                           devices=jax.devices()[:2])
    s2 = genc2.encode_sequence(frames)
    print("1-dev vs 2-dev:", "MATCH" if s1 == s2 else "MISMATCH")
    if s1 != s2:
        # locate: run the GOP program directly per GOP and compare with
        # the batched outputs
        T = 3
        hdr_bits = jnp.asarray(genc2._hdr_bits)
        gops = [frames[i:i + T] for i in range(0, len(frames), T)]
        ys = np.stack([np.stack([f[0] for f in g]) for g in gops])
        cbs = np.stack([np.stack([f[1] for f in g]) for g in gops])
        crs = np.stack([np.stack([f[2] for f in g]) for g in gops])
        nw, cap = genc2.nmb * 24, 8
        direct = [device_gop_ippp(
            jnp.asarray(ys[g]), jnp.asarray(cbs[g]), jnp.asarray(crs[g]),
            hdr_bits, wmb=genc2.wmb, hmb=genc2.hmb, window=genc2.window,
            qp=28, qpc=genc2.qpc, cfg_maxdiff=genc2.maxdiff,
            prefilter=genc2.prefilter, nw_i=nw, cap_i=cap, nw_p=nw,
            cap_p=cap) for g in range(len(gops))]
        wi, mi, wp, mp = genc2._batched(nw, cap)(
            jnp.asarray(ys), jnp.asarray(cbs), jnp.asarray(crs), hdr_bits)
        for g in range(len(gops)):
            d = direct[g]
            print(f"GOP {g}: meta_i direct {np.asarray(d['meta_i'])} "
                  f"batched {np.asarray(mi[g])}")
            same_i = np.array_equal(np.asarray(d["words_i"]),
                                    np.asarray(wi[g]))
            print(f"  words_i equal: {same_i}")
            for j in range(T - 1):
                same_p = np.array_equal(np.asarray(d["words_p"][j]),
                                        np.asarray(wp[g, j]))
                print(f"  P{j}: meta direct {np.asarray(d['meta_p'][j])} "
                      f"batched {np.asarray(mp[g, j])} words equal {same_p}")
                if not same_p:
                    a = np.asarray(d["words_p"][j])
                    b = np.asarray(wp[g, j])
                    diff = np.nonzero(a != b)[0]
                    print(f"    first diff word {diff[0]} of {len(diff)}: "
                          f"{a[diff[0]]:08x} vs {b[diff[0]]:08x}")
    sys.exit(0)

genc = GopIpppEncoder(176, 144, 28, gop_len=3, devices=jax.devices()[:1])
out = genc.encode_sequence(frames)
print("gop ok", len(out))
if mode == "serial_first":
    print("MATCH" if out == serial else "MISMATCH")
    if out != serial:
        def nals(b):
            idx = []
            i = 0
            while True:
                j = b.find(b"\x00\x00\x00\x01", i + 1)
                if j < 0:
                    idx.append(b[i:])
                    break
                idx.append(b[i:j])
                i = j
            return idx
        a, b = nals(serial), nals(out)
        print("serial NALs:", [len(x) for x in a])
        print("gop    NALs:", [len(x) for x in b])
        for k, (x, y) in enumerate(zip(a, b)):
            if x != y:
                d = next(i for i in range(min(len(x), len(y)))
                         if i >= len(y) or x[i] != y[i])
                print(f"NAL {k}: first diff at byte {d} "
                      f"(lens {len(x)} vs {len(y)})")
                print("  serial:", x[max(0, d-4):d+8].hex())
                print("  gop:   ", y[max(0, d-4):d+8].hex())
                break
