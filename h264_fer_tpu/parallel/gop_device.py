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
from ..bitstream.params import I_SLICE, P_SLICE, PPS, SPS, SliceHeader
from ..ops import transform
from ..ops.cavlc_jax import words_to_bytes


class GopIntraEncoder:
    """All-intra sequence encoder sharded over a 1-D ``gop`` device mesh.

    mode: "i16" (I16-only device frames) or "mixed" (exact I4x4-vs-I16
    bit-cost arbitration) — the same two flavors as Encoder.tpu_iframe.
    """

    def __init__(self, width: int, height: int, qp: int,
                 mode: str = "i16", devices=None,
                 deblock: bool = False) -> None:
        assert width % 16 == 0 and height % 16 == 0
        from ..codec.tpu_iframe import (
            device_i16_frame,
            device_i16_frame_impl,
            device_mixed_frame,
            device_mixed_frame_impl,
        )

        self.w, self.h, self.qp = width, height, qp
        self.wmb, self.hmb = width // 16, height // 16
        self.nmb = self.wmb * self.hmb
        self.qpc = transform.chroma_qp(qp, 0)
        self.sps = SPS(pic_width_in_mbs=self.wmb,
                       pic_height_in_map_units=self.hmb)
        self.deblock = bool(deblock)
        self.pps = PPS(pic_init_qp=14 + qp,
                       deblocking_filter_control_present_flag=1 if deblock
                       else 0)
        self.devices = list(devices) if devices is not None else jax.devices()
        self.mesh = Mesh(np.asarray(self.devices), ("gop",))
        # jitted entry for direct single-device dispatch; unjitted impl
        # for embedding under vmap+jit (nested-jit bug, codec/tpu_intra.py)
        self._frame_fn = (device_mixed_frame if mode == "mixed"
                          else device_i16_frame)
        self._frame_impl = (device_mixed_frame_impl if mode == "mixed"
                            else device_i16_frame_impl)
        self._cache = {}
        self._unpack = _plane_unpacker(width, height)

    def _batched(self, nw, cap):
        key = (nw, cap)
        if key not in self._cache:
            core = functools.partial(
                self._frame_impl, wmb=self.wmb, hmb=self.hmb,
                qp=self.qp, qpc=self.qpc, nw=nw, cap=cap,
                deblock=self.deblock)
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
            # vmapped recompile is minutes-slow over the axon tunnel).
            # PIPELINED: IDR frames are independent, so dispatch every
            # frame's program before any readback — uploads, compute and
            # downloads of successive frames overlap instead of paying
            # per-frame tunnel round trips (~120 ms each at 1080p).
            # BATCHED UPLOADS: the axon tunnel is latency-bound (~30 MB/s
            # on per-plane puts, ~70 MB/s on ~30-50 MB buffers), so frame
            # GROUPS ride as one flat packed uint8 buffer each, unpacked
            # into planes on device (the async-overlap design of IntraCL,
            # openCL_functions.cpp:221-274, one level up).
            tiers = ((self.nmb * 24, 8), (self.nmb * 192, 24), (None, None))

            def dispatch(f, nw, cap):
                out = self._frame_fn(
                    f[0], f[1], f[2],
                    wmb=self.wmb, hmb=self.hmb, qp=self.qp,
                    qpc=self.qpc, nw=nw, cap=cap, deblock=self.deblock)
                # retain only the payload outputs: holding the full dict
                # would pin every frame's recon planes in device memory
                # until the readback loop reaches it (O(frames) HBM)
                return {"words": out["words"], "meta": out["meta"]}

            nw0, cap0 = tiers[0]
            # interleave: the device queue is in-order, so a put blocks
            # everything enqueued after it — dispatch group g's programs
            # BEFORE uploading group g+1 and the transfer hides behind
            # g's compute (measured: put-then-compute serializes,
            # compute-then-put overlaps)
            if self.devices[0].platform != "tpu":
                # CPU/virtual devices: transfers are free, packing is not
                dframes = [tuple(jnp.asarray(np.asarray(p, np.uint8))
                                 for p in f) for f in frames]
                outs = [dispatch(f, nw0, cap0) for f in dframes]
            else:
                fsz = self.w * self.h * 3 // 2
                tgt = max(4 * fsz, min(32 << 20, len(frames) * fsz // 3))
                k = max(1, min(len(frames), tgt // fsz))
                groups = [frames[s : s + k]
                          for s in range(0, len(frames), k)]
                dev = self.devices[0]
                # pre-pack on host (np concat time would otherwise
                # serialize between transfers), then interleave
                # put/dispatch
                packed = [_pack_group(g) for g in groups]
                dbuf_next = jax.device_put(packed[0], dev)
                outs = []
                dframes = []
                for gi, grp in enumerate(groups):
                    dbuf = dbuf_next
                    planes = [self._unpack(dbuf, j)
                              for j in range(len(grp))]
                    outs += [dispatch(p, nw0, cap0) for p in planes]
                    dframes += planes
                    if gi + 1 < len(groups):
                        dbuf_next = jax.device_put(packed[gi + 1], dev)
            frames = dframes
            # ONE stacked meta readback instead of b tiny RPCs (each tiny
            # tunnel round trip costs ~25 ms of pure latency)
            metas = np.array(jnp.stack([o["meta"] for o in outs]))
            esc = {}
            for i, f in enumerate(frames):
                nb, pok = int(metas[i, 0]), int(metas[i, 1])
                if nb > 32 * nw0 or not pok:  # rare: escalate this frame
                    for nw, cap in tiers[1:]:
                        out = dispatch(f, nw, cap)
                        nb, pok = (int(v) for v in np.asarray(out["meta"]))
                        if (nw is None or nb <= 32 * nw) and pok:
                            break
                    esc[i] = (out, nb)
                    metas[i, 0] = nb
            nbits = metas[:, 0].astype(np.int64)
            # bucketed readback (see encoder._device_iframe_encode_full):
            # one COMMON power-of-two bucket and one stacked fetch
            nwords = (int(nbits.max()) + 31) // 32
            step = max(1024, (1 << max(nwords - 1, 1).bit_length()) // 8)
            bucket = min(-(-nwords // step) * step, outs[0]["words"].shape[0])
            wstack = np.asarray(jnp.stack(
                [o["words"][:bucket] for o in outs]))
            words = list(wstack)
            for i, (out, nb) in esc.items():
                words[i] = np.asarray(out["words"])
            return words, nbits
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

    def encode_sequence(self, frames, idr_base: int = 0) -> bytes:
        """frames: list of (y, cb, cr) uint8 planes. Returns the full
        Annex-B stream, byte-identical to the serial device-path encoder.

        idr_base: global index of frames[0] in a multi-host split
        (parallel/dist.py) — idr_pic_id runs globally across spans."""
        words, nbits = self._device_payloads(frames)
        out = bytearray(self.headers())
        for i in range(len(frames)):
            out += self._stitch_nal(words[i], int(nbits[i]),
                                    idr_pic_id=idr_base + i)
        return bytes(out)

    def _stitch_nal(self, frame_words: np.ndarray, nbits: int,
                    idr_pic_id: int) -> bytes:
        shd = SliceHeader(
            slice_type=I_SLICE,
            frame_num=0,
            idr_pic_id=idr_pic_id,
            pic_order_cnt_lsb=0,
            slice_qp_delta=-14,
            disable_deblocking_filter_idc=0 if self.deblock else 1,
        )
        w = BitWriter()
        shd.write(w, self.sps, self.pps, nal_mod.NAL_IDR, 1)
        w.append_bits(words_to_bytes(frame_words, nbits), nbits)
        w.rbsp_trailing_bits()
        return nal_mod.write_nal_unit(1, nal_mod.NAL_IDR, w.getvalue())


def _grow(a: np.ndarray, n: int) -> np.ndarray:
    """Zero-extend the last axis of a to length n (escalated-GOP merge)."""
    if a.shape[-1] >= n:
        return a
    pad = [(0, 0)] * (a.ndim - 1) + [(0, n - a.shape[-1])]
    return np.pad(a, pad)


def _plane_unpacker(width: int, height: int, T: int = 1):
    """Jitted device-side unpack of one packed uint8 frame-group row."""
    ysz = width * height
    csz = ysz // 4
    fsz = ysz + 2 * csz

    @jax.jit
    def unpack(buf, j):
        row = jax.lax.dynamic_slice(buf, (j * fsz,), (fsz,))
        if T == 1:
            y = row[:ysz].reshape(height, width)
            cb = row[ysz : ysz + csz].reshape(height // 2, width // 2)
            cr = row[ysz + csz :].reshape(height // 2, width // 2)
            return y, cb, cr
        return row  # unused

    @jax.jit
    def unpack_gop(buf):
        # (T*fsz,) -> per-frame plane stacks for the whole-GOP program
        g = buf.reshape(T, fsz)
        y = g[:, :ysz].reshape(T, height, width)
        cb = g[:, ysz : ysz + csz].reshape(T, height // 2, width // 2)
        cr = g[:, ysz + csz :].reshape(T, height // 2, width // 2)
        return y, cb, cr

    return unpack if T == 1 else unpack_gop


def _pack_group(frames) -> np.ndarray:
    return np.concatenate(
        [np.concatenate([np.asarray(f[0], np.uint8).ravel(),
                         np.asarray(f[1], np.uint8).ravel(),
                         np.asarray(f[2], np.uint8).ravel()])
         for f in frames])


class GopIpppEncoder:
    """IPPP sequence encoder sharded over a 1-D ``gop`` device mesh.

    The sequence splits into IDR-delimited GOPs of ``gop_len`` frames;
    each GOP is one fully-device program (codec/tpu_gop.device_gop_ippp:
    device I-frame, then a lax.scan P-frame chain carrying the DPB and MV
    state), and GOPs batch across devices — temporal data parallelism
    with zero collectives. Streams are byte-identical to the serial
    ``Encoder(tpu_iframe=True, tpu_pframe=True, intra_every=gop_len)``
    ONLY under that encoder's matching config: ``deblock=False`` (the
    emitted headers hardcode disable_deblocking_filter_idc=1) and a
    matching IDR rule — fixed GOPs need ``scene_cut_idr=False``;
    ``scene_cut_source=True`` here matches the serial encoder's
    ``scene_cut_idr=True, scene_cut_source=True`` mode (adaptive IDRs
    from SOURCE-frame SAD, ref_frames.cpp:185-234's decision made
    precomputable so variable-length GOPs still shard).
    """

    def __init__(self, width: int, height: int, qp: int, gop_len: int,
                 window_size: int = 16, maxdiff: int = -1,
                 lossy_prefilter: bool = True, devices=None,
                 scene_cut_source: bool = False) -> None:
        assert width % 16 == 0 and height % 16 == 0
        assert gop_len >= 2, "use GopIntraEncoder for all-intra"
        self.scene_cut_source = bool(scene_cut_source)
        self.w, self.h, self.qp, self.T = width, height, qp, gop_len
        self.wmb, self.hmb = width // 16, height // 16
        self.nmb = self.wmb * self.hmb
        self.qpc = transform.chroma_qp(qp, 0)
        self.window = window_size // 2
        self.maxdiff = maxdiff
        self.prefilter = bool(lossy_prefilter and qp < 36)
        self.sps = SPS(pic_width_in_mbs=self.wmb,
                       pic_height_in_map_units=self.hmb)
        self.pps = PPS(pic_init_qp=14 + qp)
        self.devices = list(devices) if devices is not None else jax.devices()
        self.mesh = Mesh(np.asarray(self.devices), ("gop",))
        self._set_hdrs(gop_len)
        self._cache = {}

    def _set_hdrs(self, T: int) -> None:
        """P slice headers for GOP length T: frame_num/POC sequences are
        deterministic, so the header bytes (and the bit counts the device
        scan needs for the trailing-skip drop) are precomputed."""
        self._p_hdrs = []
        for j in range(1, T):
            shd = SliceHeader(
                slice_type=P_SLICE, frame_num=j & (self.sps.max_frame_num - 1),
                idr_pic_id=0,
                pic_order_cnt_lsb=(2 * j) & (
                    (1 << self.sps.log2_max_pic_order_cnt_lsb) - 1),
                slice_qp_delta=-14, disable_deblocking_filter_idc=1)
            w = BitWriter()
            shd.write(w, self.sps, self.pps, nal_mod.NAL_NOT_IDR, 1)
            bits = w.bit_position
            if w.bit_position % 8:  # zero-pad for storage; append_bits
                w.write(0, 8 - w.bit_position % 8)  # replays `bits` only
            self._p_hdrs.append((w.getvalue(), bits))
        self._hdr_bits = np.asarray([b for _, b in self._p_hdrs], np.int32)

    def headers(self) -> bytes:
        w = BitWriter()
        self.sps.write(w)
        w.rbsp_trailing_bits()
        out = nal_mod.write_nal_unit(1, nal_mod.NAL_SPS, w.getvalue())
        w = BitWriter()
        self.pps.write(w)
        w.rbsp_trailing_bits()
        return out + nal_mod.write_nal_unit(1, nal_mod.NAL_PPS, w.getvalue())

    def _gop_fn(self, nw, cap, impl: bool = False):
        from ..codec.tpu_gop import device_gop_ippp, device_gop_ippp_impl

        # impl=True: unjitted body for embedding under vmap+jit
        # (nested-jit bug, see codec/tpu_intra.py)
        return functools.partial(
            device_gop_ippp_impl if impl else device_gop_ippp,
            wmb=self.wmb, hmb=self.hmb, window=self.window,
            qp=self.qp, qpc=self.qpc, cfg_maxdiff=self.maxdiff,
            prefilter=self.prefilter, nw_i=nw, cap_i=cap, nw_p=nw,
            cap_p=cap)

    def _batched(self, nw, cap):
        key = (nw, cap)
        if key not in self._cache:
            core = self._gop_fn(nw, cap, impl=True)
            sh = NamedSharding(self.mesh, P("gop"))

            def run(ys, cbs, crs, hdr_bits):
                out = jax.vmap(core, in_axes=(0, 0, 0, None))(
                    ys, cbs, crs, hdr_bits)
                return (out["words_i"], out["meta_i"],
                        out["words_p"], out["meta_p"])

            self._cache[key] = jax.jit(
                run, in_shardings=(sh, sh, sh, None),
                out_shardings=(sh, sh, sh, sh))
        return self._cache[key]

    def _meta_ok(self, meta_i, meta_p, nw) -> bool:
        ms = np.concatenate(
            [np.asarray(meta_i)[..., None, :2].reshape(-1, 2),
             np.asarray(meta_p)[..., :2].reshape(-1, 2)])
        size_ok = True if nw is None else bool((ms[:, 0] <= 32 * nw).all())
        return size_ok and bool((ms[:, 1] > 0).all())

    def _device_payloads(self, gops):
        """gops: (G, T, ...) plane stacks. Returns host (words_i, meta_i,
        words_p, meta_p) with the gop padding removed by the caller."""
        n_dev = len(self.devices)
        hdr_bits = jnp.asarray(self._hdr_bits)
        tiers = ((self.nmb * 24, 8), (self.nmb * 192, 24), (None, None))
        ys, cbs, crs = gops
        if n_dev == 1:
            # pipelined: dispatch every GOP's program before any readback;
            # each GOP's planes ride the tunnel as ONE packed uint8 buffer
            # (latency-bound link — see GopIntraEncoder) unpacked on device
            T = ys.shape[1]
            unpack = _plane_unpacker(self.w, self.h, T)
            nw0, cap0 = tiers[0]
            fn = self._gop_fn(nw0, cap0)
            keep = ("words_i", "meta_i", "words_p", "meta_p")
            # retain only payload outputs: the full dict would pin every
            # GOP's recon planes in device memory until readback (ADVICE).
            # Interleaved like GopIntraEncoder: dispatch GOP g's program
            # before uploading GOP g+1 so the packed transfer hides
            # behind g's compute (the queue is in-order).
            n_gop = len(ys)
            dev = self.devices[0]

            on_tpu = dev.platform == "tpu"

            def put(g):
                if not on_tpu:  # CPU: transfers are free, packing is not
                    return tuple(jnp.asarray(np.asarray(p, np.uint8))
                                 for p in (ys[g], cbs[g], crs[g]))
                buf = _pack_group(
                    [(ys[g][j], cbs[g][j], crs[g][j]) for j in range(T)])
                return jax.device_put(buf, dev)

            dbuf_next = put(0)
            dgops = []
            outs = []
            for g in range(n_gop):
                y, cb, cr = (dbuf_next if not on_tpu
                             else unpack(dbuf_next))
                dgops.append((y, cb, cr))
                o = fn(y, cb, cr, hdr_bits)
                outs.append({k: o[k] for k in keep})
                if g + 1 < n_gop:
                    dbuf_next = put(g + 1)
            # stacked meta readbacks (2 RPCs for the whole sequence), then
            # ONE common-bucket stacked words fetch — per-GOP full-width
            # words_p readbacks were ~22 MB/GOP of tunnel time
            mi = np.array(jnp.stack([o["meta_i"] for o in outs]))
            mp = np.array(jnp.stack([o["meta_p"] for o in outs]))
            esc = {}
            for g in range(n_gop):
                if not self._meta_ok(mi[g], mp[g], nw0):
                    for nw, cap in tiers[1:]:  # rare: escalate this GOP
                        out = self._gop_fn(nw, cap)(
                            dgops[g][0], dgops[g][1], dgops[g][2], hdr_bits)
                        if self._meta_ok(out["meta_i"], out["meta_p"], nw):
                            break
                    esc[g] = {k: np.asarray(out[k]) for k in keep}
                    mi[g] = esc[g]["meta_i"]
                    mp[g] = esc[g]["meta_p"]
            nb_max = max(int(mi[:, 0].max()), int(mp[:, :, 0].max()))
            nwords = (nb_max + 31) // 32
            step = max(1024, (1 << max(nwords - 1, 1).bit_length()) // 8)
            bucket = min(-(-nwords // step) * step,
                         outs[0]["words_i"].shape[0])
            wi = np.asarray(jnp.stack(
                [o["words_i"][:bucket] for o in outs]))
            wp = np.asarray(jnp.stack(
                [o["words_p"][:, :bucket] for o in outs]))
            if esc:
                full = max([wi.shape[-1]]
                           + [e["words_i"].shape[0] for e in esc.values()]
                           + [e["words_p"].shape[1] for e in esc.values()])
                wi = _grow(wi, full)
                wp = _grow(wp, full)
                for g, e in esc.items():
                    wi[g, : e["words_i"].shape[0]] = e["words_i"]
                    wp[g, :, : e["words_p"].shape[1]] = e["words_p"]
            return wi, mi, wp, mp
        ysj = jnp.asarray(np.stack(ys))
        cbsj = jnp.asarray(np.stack(cbs))
        crsj = jnp.asarray(np.stack(crs))
        for nw, cap in tiers:
            wi, mi, wp, mp = self._batched(nw, cap)(ysj, cbsj, crsj, hdr_bits)
            if self._meta_ok(mi, mp, nw):
                break
        return (np.asarray(wi), np.asarray(mi),
                np.asarray(wp), np.asarray(mp))

    def _gop_lengths(self, frames) -> list:
        """Per-GOP frame counts. Fixed mode: gop_len-sized chunks.
        scene_cut_source: an extra IDR wherever the source-SAD threshold
        fires (the serial encoder's scene_cut_source rule — thresholds
        and the absolute-frame-count IntraEvery period both match
        encoder._select_nal_unit_type)."""
        b = len(frames)
        if not self.scene_cut_source:
            return [min(self.T, b - s) for s in range(0, b, self.T)]
        thr = self.nmb << 12
        lens = []
        cur = 0
        for i in range(1, b):
            cut = (i % self.T == 0) or (
                int(np.abs(frames[i][0].astype(np.int64)
                           - frames[i - 1][0].astype(np.int64)).sum()) > thr)
            if cut:
                lens.append(i - cur)
                cur = i
        lens.append(b - cur)
        return lens

    def encode_sequence(self, frames) -> bytes:
        """frames: list of (y, cb, cr) uint8 planes; length need not be a
        multiple of gop_len or the device count (padded GOPs/frames are
        encoded and discarded)."""
        b = len(frames)
        lens = self._gop_lengths(frames)
        T = max(max(lens), 2)
        if T != len(self._p_hdrs) + 1:
            self._set_hdrs(T)
        n_gop = len(lens)
        gpad = 0 if len(self.devices) == 1 else (-n_gop) % len(self.devices)
        starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
        gops = [[frames[s + min(j, L - 1)] for j in range(T)]
                for s, L in zip(starts, lens)]  # per-GOP pad: repeat last
        ys = np.stack([[f[0] for f in g] for g in gops])
        cbs = np.stack([[f[1] for f in g] for g in gops])
        crs = np.stack([[f[2] for f in g] for g in gops])
        if gpad:
            rep = lambda a: np.concatenate(  # noqa: E731
                [a, np.repeat(a[-1:], gpad, axis=0)])
            ys, cbs, crs = rep(ys), rep(cbs), rep(crs)
        wi, mi, wp, mp = self._device_payloads((ys, cbs, crs))
        out = bytearray(self.headers())
        idr_id = 0
        prev_was_idr = False
        for g in range(n_gop):
            for j in range(int(lens[g])):
                if j == 0:
                    # idr_pic_id sequence (encoder._encode_slice): 0 on
                    # the first IDR and after P frames; +1 when the
                    # previous frame was also an IDR (length-1 GOPs)
                    if g == 0:
                        idr_id = 0
                    elif prev_was_idr:
                        idr_id += 1
                    else:
                        idr_id = 0
                    shd = SliceHeader(
                        slice_type=I_SLICE, frame_num=0, idr_pic_id=idr_id,
                        pic_order_cnt_lsb=0, slice_qp_delta=-14,
                        disable_deblocking_filter_idc=1)
                    w = BitWriter()
                    shd.write(w, self.sps, self.pps, nal_mod.NAL_IDR, 1)
                    nbits = int(mi[g][0])
                    w.append_bits(words_to_bytes(wi[g], nbits), nbits)
                    w.rbsp_trailing_bits()
                    out += nal_mod.write_nal_unit(
                        1, nal_mod.NAL_IDR, w.getvalue())
                    prev_was_idr = True
                else:
                    hdr_bytes, hdr_bits = self._p_hdrs[j - 1]
                    w = BitWriter()
                    w.append_bits(hdr_bytes, hdr_bits)
                    nbits = int(mp[g, j - 1, 0])
                    w.append_bits(words_to_bytes(wp[g, j - 1], nbits), nbits)
                    w.rbsp_trailing_bits()
                    out += nal_mod.write_nal_unit(
                        1, nal_mod.NAL_NOT_IDR, w.getvalue())
                    prev_was_idr = False
        return bytes(out)


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
