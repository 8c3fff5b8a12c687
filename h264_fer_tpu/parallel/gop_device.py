"""GOP-axis data parallelism: end-to-end multi-device all-intra encode.

The codec counterpart of data parallelism (SURVEY.md §2.4): IDR frames are
independent, so a batch of frames shards across the ``gop`` mesh axis and
every device runs the full single-frame device program
(codec/tpu_iframe.py: mode decision → wavefront reconstruction →
whole-slice CAVLC packing) on its shard — zero collectives, pure DP. The
host reads back each frame's packed payload (content-sized) and stitches
the ordered Annex-B stream: SPS/PPS once, then one IDR NAL per frame with
the exact slice-header state sequence of the serial encoder
(idr_pic_id = frame index since frame_num stays 0 — encoder.py
_encode_slice), so the result is byte-identical to
``Encoder(tpu_iframe=...).encode_sequence``.

The reference has no multi-device anything; its closest analog is the
frame-at-a-time loop in encode() (fer_h264.cpp:81-134). This module is
the BASELINE.json config-5 path: GOP sharding with host-side ordered
bitstream concatenation, and `measure_scaling` is the frames/s scaling
harness over 1..N devices.
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..bitstream import nal as nal_mod
from ..bitstream.bitio import BitWriter
from ..bitstream.params import I_SLICE, PPS, SPS, SliceHeader
from ..ops import transform
from ..ops.cavlc_jax import words_to_bytes


class GopIntraEncoder:
    """All-intra sequence encoder sharded over a 1-D ``gop`` device mesh.

    mode: "i16" (I16-only device frames) or "mixed" (exact I4x4-vs-I16
    bit-cost arbitration) — the same two flavors as Encoder.tpu_iframe.
    """

    def __init__(self, width: int, height: int, qp: int,
                 mode: str = "i16", devices=None) -> None:
        assert width % 16 == 0 and height % 16 == 0
        from ..codec.tpu_iframe import device_i16_frame, device_mixed_frame

        self.w, self.h, self.qp = width, height, qp
        self.wmb, self.hmb = width // 16, height // 16
        self.nmb = self.wmb * self.hmb
        self.qpc = transform.chroma_qp(qp, 0)
        self.sps = SPS(pic_width_in_mbs=self.wmb,
                       pic_height_in_map_units=self.hmb)
        self.pps = PPS(pic_init_qp=14 + qp)
        self.devices = list(devices) if devices is not None else jax.devices()
        self.mesh = Mesh(np.asarray(self.devices), ("gop",))
        self._frame_fn = (device_mixed_frame if mode == "mixed"
                          else device_i16_frame)
        self._cache = {}

    def _batched(self, nw, cap):
        key = (nw, cap)
        if key not in self._cache:
            core = functools.partial(
                self._frame_fn, wmb=self.wmb, hmb=self.hmb,
                qp=self.qp, qpc=self.qpc, nw=nw, cap=cap)
            sh = NamedSharding(self.mesh, P("gop"))

            def run(y, cb, cr):
                out = jax.vmap(core)(y, cb, cr)
                return out["words"], out["nbits"], out["pack_ok"]

            self._cache[key] = jax.jit(
                run, in_shardings=(sh, sh, sh), out_shardings=(sh, sh, sh))
        return self._cache[key]

    def headers(self) -> bytes:
        w = BitWriter()
        self.sps.write(w)
        w.rbsp_trailing_bits()
        out = nal_mod.write_nal_unit(1, nal_mod.NAL_SPS, w.getvalue())
        w = BitWriter()
        self.pps.write(w)
        w.rbsp_trailing_bits()
        return out + nal_mod.write_nal_unit(1, nal_mod.NAL_PPS, w.getvalue())

    def _device_payloads(self, frames):
        """Run the sharded batch; returns (words (B, nw) np, nbits (B,))."""
        n_dev = len(self.devices)
        b = len(frames)
        if n_dev == 1:
            # single chip: the per-frame program as-is (no vmap batch dim —
            # reuses the serial path's compiled program; measured: the
            # vmapped recompile is minutes-slow over the axon tunnel)
            words, nbits = [], []
            for y, cb, cr in frames:
                for nw, cap in ((self.nmb * 24, 8), (self.nmb * 192, 24),
                                (None, None)):
                    out = self._frame_fn(
                        jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
                        wmb=self.wmb, hmb=self.hmb, qp=self.qp,
                        qpc=self.qpc, nw=nw, cap=cap)
                    nb = int(out["nbits"])
                    if (nw is None or nb <= 32 * nw) and bool(out["pack_ok"]):
                        break
                words.append(np.asarray(out["words"]))
                nbits.append(nb)
            return words, np.asarray(nbits)
        pad = (-b) % n_dev  # shard evenly; padded frames are discarded
        ys = np.stack([f[0] for f in frames]
                      + [frames[-1][0]] * pad).astype(np.uint8)
        cbs = np.stack([f[1] for f in frames]
                       + [frames[-1][1]] * pad).astype(np.uint8)
        crs = np.stack([f[2] for f in frames]
                       + [frames[-1][2]] * pad).astype(np.uint8)
        # tiered payload capacity like the serial path (encoder.py):
        # escalate when any frame overflows its static word budget
        for nw, cap in ((self.nmb * 24, 8), (self.nmb * 192, 24),
                        (None, None)):
            words, nbits, pok = self._batched(nw, cap)(ys, cbs, crs)
            nbits_h = np.asarray(nbits)
            if ((nw is None or int(nbits_h.max()) <= 32 * nw)
                    and bool(np.asarray(pok).all())):
                break
        return np.asarray(words)[:b], nbits_h[:b]

    def encode_sequence(self, frames) -> bytes:
        """frames: list of (y, cb, cr) uint8 planes. Returns the full
        Annex-B stream, byte-identical to the serial device-path encoder."""
        words, nbits = self._device_payloads(frames)
        out = bytearray(self.headers())
        for i in range(len(frames)):
            out += self._stitch_nal(words[i], int(nbits[i]), idr_pic_id=i)
        return bytes(out)

    def _stitch_nal(self, frame_words: np.ndarray, nbits: int,
                    idr_pic_id: int) -> bytes:
        shd = SliceHeader(
            slice_type=I_SLICE,
            frame_num=0,
            idr_pic_id=idr_pic_id,
            pic_order_cnt_lsb=0,
            slice_qp_delta=-14,
            disable_deblocking_filter_idc=1,
        )
        w = BitWriter()
        shd.write(w, self.sps, self.pps, nal_mod.NAL_IDR, 1)
        w.append_bits(words_to_bytes(frame_words, nbits), nbits)
        w.rbsp_trailing_bits()
        return nal_mod.write_nal_unit(1, nal_mod.NAL_IDR, w.getvalue())


def measure_scaling(width: int, height: int, qp: int, n_frames: int = 8,
                    device_counts=(1, 2, 4, 8), mode: str = "i16",
                    reps: int = 2):
    """Frames/s of the end-to-end sharded encode at several device counts
    (the BASELINE.json scaling-efficiency harness). Returns
    {n_devices: fps}. On a virtual CPU mesh the numbers are only
    indicative (the devices share host cores); on a real pod slice each
    mesh column is a chip and the efficiency target is ≥80 %."""
    rng = np.random.default_rng(3)
    frames = []
    yy, xx = np.mgrid[0:height, 0:width]
    for i in range(n_frames):
        y = (((xx // 6 + yy // 4 + 5 * i) % 220)
             + rng.integers(0, 10, (height, width))).astype(np.uint8)
        cb = rng.integers(90, 150, (height // 2, width // 2)).astype(np.uint8)
        cr = rng.integers(90, 150, (height // 2, width // 2)).astype(np.uint8)
        frames.append((y, cb, cr))
    avail = jax.devices()
    fps = {}
    for n in device_counts:
        if n > len(avail):
            continue
        enc = GopIntraEncoder(width, height, qp, mode=mode,
                              devices=avail[:n])
        enc.encode_sequence(frames)  # compile + warm
        best = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            enc.encode_sequence(frames)
            dt = time.perf_counter() - t0
            best = max(best, n_frames / dt)
        fps[n] = best
    return fps
