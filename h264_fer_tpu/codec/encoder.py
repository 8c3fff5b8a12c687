"""H.264 Baseline encoder (host orchestration; TPU pipeline in codec/tpu_*).

Capability-parity re-implementation of the reference encoder
(rbsp_encoding.cpp RBSP_encode + intra.cpp intraPredictionEncoding +
moestimation.cpp interEncoding), structured so that:

- The **intra path replicates the reference CPU mode decision exactly**
  (SATD per mode with availability gating, early-exit-at-zero, the
  coded_mb_size bit-cost oracle arbitrating Intra_4x4 vs Intra_16x16) —
  I-frame output is byte-identical to the reference encoder's
  (tests/test_encoder.py).
- The **inter path keeps the reference's decision structure** (adaptive
  MAXDIFF, P_Skip ExactPixels early-out, 8x8-granularity search merged into
  16x16/16x8/8x16/P_8x8 partitions, mvd against the spec predictor, the
  optional MAXDIFF lossy source prefilter, moestimation.cpp:392-585) but
  replaces the feature-indexed candidate heuristic with a clean full
  search ± window (integer SAD + quarter-pel refinement) — an RD-stronger,
  TPU-idiomatic equivalent (SURVEY.md §7 stage 6).

Bitstream-level choices are hardwired like the reference (profile 66,
one slice/frame, pic_init_qp=14+qp, slice_qp_delta=-14, mb_qp_delta=0).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..bitstream import nal as nal_mod
from ..bitstream.bitio import BitWriter
from ..bitstream.expgolomb import write_se, write_ue
from ..bitstream.params import I_SLICE, P_SLICE, PPS, SPS, SliceHeader
from ..ops import cavlc, intra, mc, transform
from ..ops import tables as T
from . import mvpred
from .decoder import MB_SKIP, _BLK_XY, _chroma_blk_neighbors, _luma_blk_neighbors


@dataclass
class EncoderConfig:
    """Knob parity with Starter::PostaviParametre (fer_h264.cpp:169-184)."""

    qp: int = 28
    intra_every: int = 100  # forced IDR period (frames)
    window_size: int = 16  # ME search window (full width, ± window/2)
    maxdiff: int = -1  # tolerated error; -1 = per-MB adaptive
    lossy_prefilter: bool = True  # MAXDIFF source filtering (reference default)
    scene_cut_idr: bool = True  # SAD-threshold IDR selection
    scene_cut_source: bool = False  # scene-cut SAD vs previous SOURCE
    # frame instead of the reconstructed reference: decisions become a
    # pure function of the input sequence, so IDR boundaries are
    # precomputable and the GOP-parallel encoders can shard adaptive
    # GOPs (parallel/gop_device.py scene_cut_source). The reference
    # compares vs the DPB recon (ref_frames.cpp:185-234); at these
    # thresholds (16/pixel) the two disagree only when recon drift is
    # comparable to a scene change.
    qpel: bool = True  # quarter-pel ME refinement
    deblock: bool = False  # in-loop deblocking filter (superset; the
    # reference has none — its streams/output are unfiltered)


# Availability gates for encoder mode trials (intra.cpp:983-989,1021-1031).
_I16_GATE = {0: "top", 1: "left", 3: "corner"}
_I4_GATE = {0: "top", 1: "left", 3: "top", 4: "corner", 5: "corner",
            6: "corner", 7: "top", 8: "left"}


class Encoder:
    def __init__(self, width: int, height: int, cfg: EncoderConfig,
                 tpu_pipeline=None, tpu_me=None, tpu_iframe: bool = False,
                 tpu_pframe: bool = False) -> None:
        """`tpu_pipeline`: optional TpuIntraPipeline. Whole-frame intra
        mode pre-decision on device (the reference's GPU-offload analog,
        rbsp_encoding.cpp:144 + intra.cpp:961-977); the exact bit-cost
        arbitration and reconstruction still run per MB."""
        assert width % 16 == 0 and height % 16 == 0
        if not 0 <= cfg.qp <= 51:
            raise ValueError(f"qp must be in 0..51, got {cfg.qp}")
        # NOTE (reference parity): pic_init_qp is written as 14+qp like the
        # reference (headers_and_parameter_sets.cpp:489), which exceeds the
        # norm's 51 ceiling for qp > 37; both codecs round-trip it
        # consistently via se(v).
        self.cfg = cfg
        self.w, self.h = width, height
        self.wmb, self.hmb = width // 16, height // 16
        self.nmb = self.wmb * self.hmb
        self.sps = SPS(pic_width_in_mbs=self.wmb,
                       pic_height_in_map_units=self.hmb)
        self.pps = PPS(pic_init_qp=14 + cfg.qp,
                       deblocking_filter_control_present_flag=1 if cfg.deblock else 0)
        self.qpy = cfg.qp
        self.qpc = transform.chroma_qp(self.qpy, self.pps.chroma_qp_index_offset)
        # session state (reference globals)
        self.frame_num = 0
        self.idr_pic_id = 0
        self.poc_lsb = 0
        self.first_frame = True
        self.curr_frame_count = 0
        self.ref_y = self.ref_cb = self.ref_cr = None
        # per-frame arrays (mirror decoder's)
        self.mb_type = np.zeros(self.nmb, np.int32)
        self.mb_intra = np.zeros(self.nmb, bool)
        self.mb_i4x4 = np.zeros(self.nmb, bool)
        self.tc_luma = np.zeros((self.nmb, 16), np.int32)
        self.tc_chroma = np.zeros((2, self.nmb, 4), np.int32)
        self.cbp_luma = np.zeros(self.nmb, np.int32)
        self.cbp_chroma = np.zeros(self.nmb, np.int32)
        self.i4x4_mode = np.zeros((self.nmb, 16), np.int32)
        self.mv = np.zeros((self.nmb, 4, 4, 2), np.int32)
        self.prev_mv = np.zeros((self.nmb, 4, 4, 2), np.int32)
        self.nz_luma = np.zeros((self.nmb, 16), bool)
        self.stats = []  # per-frame dicts (DohvatiStatistiku parity)
        self.tpu_pipeline = tpu_pipeline
        self._tpu_modes = None
        self.tpu_me = tpu_me
        self._me_cands = None
        # all-device I-frame path: modes + wavefront reconstruction +
        # whole-slice entropy on TPU. True/"i16" = Intra_16x16-only
        # (fast); "mixed" = exact per-MB I4x4-vs-I16 bit-cost arbitration
        # (kernels/wavefront_mixed.py), matching the host exact path.
        # Requires tpu_pipeline. The host reads back only the packed
        # payload; reconstruction/state stay device-resident until
        # something on the host needs them (_materialize).
        self.tpu_iframe = tpu_iframe
        # all-device P-frame path (codec/tpu_pframe.py): interp planes +
        # ME maps + decision wavefront + MC/residual/recon + slice entropy
        # in one jitted program; byte-identical to the host per-MB loop
        self.tpu_pframe = tpu_pframe
        self.tpu_entropy = True  # device slice entropy (tpu_entropy.py);
        # False falls back to the native host packer on read-back levels
        self._pending = None  # device-resident frame outputs awaiting sync

    # ------------------------------------------------------------------
    # Session API (encode() / NastaviEncode() parity, fer_h264.cpp:81-134)

    def headers(self) -> bytes:
        w = BitWriter()
        self.sps.write(w)
        w.rbsp_trailing_bits()
        out = nal_mod.write_nal_unit(1, nal_mod.NAL_SPS, w.getvalue())
        w = BitWriter()
        self.pps.write(w)
        w.rbsp_trailing_bits()
        out += nal_mod.write_nal_unit(1, nal_mod.NAL_PPS, w.getvalue())
        return out

    def encode_frame(self, y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> bytes:
        """Encode one frame, returning its Annex-B slice NAL."""
        import time

        t0 = time.time()
        is_idr = self._select_nal_unit_type(y)
        self._prev_src_y = y.copy()  # scene_cut_source comparand
        self.curr_frame_count += 1
        if is_idr:
            # IDR resets all prediction state: the MV field must not leak
            # across GOP boundaries (it otherwise could, via the
            # trailing-skip drop restore in the first P frame), so
            # GOP-parallel encode stays byte-identical to serial.
            # prev_mv must reset HERE (not only at the bottom of the
            # non-device path): the fully-device IDR branch returns early,
            # and a stale prev_mv would leak the previous GOP's MVs into
            # the next P frame's temporal qpel centers.
            self.mv[:] = 0
            self.prev_mv[:] = 0
        if is_idr and self.tpu_iframe and self.tpu_pipeline is not None \
                and self.tpu_entropy:
            # fully-device I-frame: no host working-frame conversion, no
            # host DPB copy — everything stays on device until needed
            self._src8 = (y, cb, cr)
            rbsp = self._encode_slice(True)
            out = nal_mod.write_nal_unit(1, nal_mod.NAL_IDR, rbsp)
            mb_types = [0] * 7
            mb_types[6] = self.nmb  # all-intra frame
            self.stats.append({
                "bytes": len(out),
                "ms": (time.time() - t0) * 1000.0,
                "idr": True,
                "mb_types": mb_types,
            })
            return out
        self._materialize()
        if is_idr and self.tpu_pipeline is not None:
            out = self.tpu_pipeline(y.astype(np.int32))
            m16, m4, _, _ = self.tpu_pipeline.modes_to_host(out)
            self._tpu_modes = (m16, m4)
        else:
            self._tpu_modes = None
        if (not is_idr) and self.tpu_me is not None:
            # whole-frame top-K integer candidates on device (ops/me.py)
            self._me_cands = self.tpu_me(y.astype(np.int32), self.ref_y)
        else:
            self._me_cands = None
        if not is_idr and not self.tpu_pframe:
            # 16-phase interpolated reference planes for qpel search
            # (FillInterpolatedRefFrame analog, moestimation.cpp:74-173)
            from ..ops.interp import interpolated_planes, pad_chroma

            self._interp_ext = self.cfg.window_size // 2 + 2
            self._interp = interpolated_planes(self.ref_y, ext=self._interp_ext)
            self._interp_extc = self._interp_ext // 2 + 1
            self._interp_cb = pad_chroma(self.ref_cb, self._interp_extc)
            self._interp_cr = pad_chroma(self.ref_cr, self._interp_extc)
        # working frame: source, progressively overwritten by reconstruction
        self.y = y.astype(np.int32).copy()
        self.cb = cb.astype(np.int32).copy()
        self.cr = cr.astype(np.int32).copy()
        rbsp = self._encode_slice(is_idr)
        nal_type = nal_mod.NAL_IDR if is_idr else nal_mod.NAL_NOT_IDR
        out = nal_mod.write_nal_unit(1, nal_type, rbsp)
        # previous frame's MV field: temporal qpel-refinement centers for
        # the next P frame's search (_search_mb). Zeroed at IDR so GOPs
        # stay independent (GOP-parallel encode must equal serial).
        self.prev_mv = np.zeros_like(self.mv) if is_idr else self.mv.copy()
        # DPB deep copy (ref_frames.cpp:17-35)
        self.ref_y = self.y.copy()
        self.ref_cb = self.cb.copy()
        self.ref_cr = self.cr.copy()
        self.stats.append({
            "bytes": len(out),
            "ms": (time.time() - t0) * 1000.0,
            "idr": is_idr,
            "mb_types": np.bincount(
                np.where(
                    self.mb_intra, 6,
                    np.where(self.mb_type == MB_SKIP, 5,
                             np.minimum(self.mb_type, 4)),
                ),
                minlength=7,
            ).tolist(),
        })
        return out

    def encode_sequence(self, frames) -> bytes:
        out = bytearray(self.headers())
        for y, cb, cr in frames:
            out += self.encode_frame(y, cb, cr)
        return bytes(out)

    def reconstructed(self):
        self._materialize()
        return (
            self.y.astype(np.uint8),
            self.cb.astype(np.uint8),
            self.cr.astype(np.uint8),
        )

    def _materialize(self) -> None:
        """Sync device-resident recon + per-MB state (from a fully-device
        I-frame) back to the host arrays; applies the in-loop filter and
        the DPB copy that the host path would have done."""
        if self._pending is None:
            return
        out = self._pending
        self._pending = None
        self.y = np.asarray(out["recon_y"])
        self.cb = np.asarray(out["recon_cb"])
        self.cr = np.asarray(out["recon_cr"])
        self.mb_type[:] = np.asarray(out["mb_type"])
        self.mb_intra[:] = True
        if "choice4" in out:  # mixed-mode frame
            self.mb_i4x4[:] = np.asarray(out["choice4"])
            self.i4x4_mode[:] = np.asarray(out["i4x4_mode"])
        else:
            self.mb_i4x4[:] = False
        self.cbp_luma[:] = np.asarray(out["cbp_luma"])
        self.cbp_chroma[:] = np.asarray(out["cbp_chroma"])
        self.tc_luma[:] = np.asarray(out["tc_luma"])
        self.tc_chroma[:] = np.asarray(out["tc_chroma"])
        self.nz_luma[:] = np.asarray(out["nz_luma"])
        # NOTE: no host deblock here — the device frame programs apply
        # the in-loop filter on device (tpu_iframe._deblock_intra) when
        # cfg.deblock is set, so the recon planes arrive already filtered.
        self.ref_y = self.y.copy()
        self.ref_cb = self.cb.copy()
        self.ref_cr = self.cr.copy()

    # ------------------------------------------------------------------
    def _select_nal_unit_type(self, y: np.ndarray) -> bool:
        """selectNALUnitType (ref_frames.cpp:185-234)."""
        if (self.ref_y is None and self._pending is None) \
                or self.curr_frame_count % self.cfg.intra_every == 0:
            return True
        if not self.cfg.scene_cut_idr:
            return False
        if self.cfg.scene_cut_source:
            ref = self._prev_src_y
            sad = int(np.abs(y.astype(np.int64) - ref.astype(np.int64)).sum())
            return sad > (self.nmb << 12)
        self._materialize()
        sad = int(np.abs(y.astype(np.int64) - self.ref_y.astype(np.int64)).sum())
        return sad > (self.nmb << 12)

    def _encode_slice(self, is_idr: bool) -> bytes:
        # slice header state machine (rbsp_encoding.cpp:139-173 + shd_write)
        if is_idr:
            slice_type = I_SLICE
            if self.first_frame:
                self.first_frame = False
                self.idr_pic_id = 0
            elif self.frame_num == 0:
                self.idr_pic_id += 1
            else:
                self.idr_pic_id = 0
            self.frame_num = 0
            self.poc_lsb = 0
        else:
            slice_type = P_SLICE
            self.frame_num += 1
            self.poc_lsb += 2

        shd = SliceHeader(
            slice_type=slice_type,
            frame_num=self.frame_num & (self.sps.max_frame_num - 1),
            idr_pic_id=self.idr_pic_id,
            pic_order_cnt_lsb=self.poc_lsb & ((1 << self.sps.log2_max_pic_order_cnt_lsb) - 1),
            slice_qp_delta=-14,
            disable_deblocking_filter_idc=0 if self.cfg.deblock else 1,
        )
        w = BitWriter()
        nal_type = nal_mod.NAL_IDR if is_idr else nal_mod.NAL_NOT_IDR
        shd.write(w, self.sps, self.pps, nal_type, 1)

        self.slice_type = slice_type
        if slice_type == P_SLICE and self.tpu_pframe:
            self._device_pframe_encode_full(w)
            w.rbsp_trailing_bits()
            return w.getvalue()
        if slice_type == I_SLICE and self.tpu_iframe and self.tpu_pipeline:
            if self.tpu_entropy:
                # fully-device: recon + packed slice bits on TPU; splice
                # the payload and return (no per-MB host loop at all)
                self._device_iframe_encode_full(w)
                w.rbsp_trailing_bits()
                return w.getvalue()
            self._device_iframe_precompute()
        else:
            self._dev_i16 = None
        # Snapshot of prior-frame MB state: needed to emulate the decoder's
        # trailing-skip drop (see below).
        prev_state = (
            self.mb_type.copy(), self.mb_intra.copy(), self.mb_i4x4.copy(),
            self.mv.copy(), self.tc_luma.copy(), self.tc_chroma.copy(),
            self.cbp_luma.copy(), self.cbp_chroma.copy(), self.nz_luma.copy(),
        )
        mb_skip_run = 0
        pos_after_last_coded = 0
        if self._dev_i16 is not None and self._intra_encode_frame_native(w):
            pos_after_last_coded = w.bit_position
        else:
            for curr in range(self.nmb):
                if slice_type == P_SLICE:
                    res = self._inter_encode_mb(curr)
                    if res is None:  # P_Skip
                        mb_skip_run += 1
                        continue
                    write_ue(w, mb_skip_run)
                    mb_skip_run = 0
                    self._write_inter_mb(w, curr, *res)
                    pos_after_last_coded = w.bit_position
                elif self._dev_i16 is not None:
                    self._intra_encode_mb_device(w, curr)
                    pos_after_last_coded = w.bit_position
                else:
                    self._intra_encode_mb(w, curr)
                    pos_after_last_coded = w.bit_position
        if mb_skip_run > 0:
            write_ue(w, mb_skip_run)
        w.rbsp_trailing_bits()
        rbsp = w.getvalue()
        if mb_skip_run > 0 and pos_after_last_coded > 0:
            # The reference decoder's more_rbsp_data is a byte-count
            # approximation (rbsp_IO.cpp:193): when everything after the
            # last coded MB fits in the final RBSP byte, the trailing skip
            # run is never read and those MBs keep their previous-frame
            # pixels and MB state. Mirror that in our reconstruction so the
            # encoder loop matches what every decoder of this stream does.
            if pos_after_last_coded // 8 >= len(rbsp) - 1:
                self._drop_tail_skips(
                    range(self.nmb - mb_skip_run, self.nmb), prev_state)
        if self.cfg.deblock:
            # in-loop filter: applied after full-frame reconstruction, before
            # the DPB copy (norm 8.7; intra prediction above used unfiltered
            # samples as required)
            from .loopfilter import deblock_frame

            deblock_frame(self)
        return rbsp

    def _drop_tail_skips(self, mbs, prev_state) -> None:
        (p_type, p_intra, p_i4, p_mv, p_tcl, p_tcc, p_cl, p_cc, p_nz) = prev_state
        for mb in mbs:
            x0, y0 = (mb % self.wmb) * 16, (mb // self.wmb) * 16
            self.y[y0 : y0 + 16, x0 : x0 + 16] = self.ref_y[y0 : y0 + 16, x0 : x0 + 16]
            cx0, cy0 = x0 // 2, y0 // 2
            self.cb[cy0 : cy0 + 8, cx0 : cx0 + 8] = self.ref_cb[cy0 : cy0 + 8, cx0 : cx0 + 8]
            self.cr[cy0 : cy0 + 8, cx0 : cx0 + 8] = self.ref_cr[cy0 : cy0 + 8, cx0 : cx0 + 8]
            self.mb_type[mb] = p_type[mb]
            self.mb_intra[mb] = p_intra[mb]
            self.mb_i4x4[mb] = p_i4[mb]
            self.mv[mb] = p_mv[mb]
            self.tc_luma[mb] = p_tcl[mb]
            self.tc_chroma[:, mb] = p_tcc[:, mb]
            self.cbp_luma[mb] = p_cl[mb]
            self.cbp_chroma[mb] = p_cc[mb]
            self.nz_luma[mb] = p_nz[mb]

    # ------------------------------------------------------------------
    # nC with encoder-side CBP gating (residual.cpp:87-106 allNeighbouringZero)

    def _nc_luma(self, curr: int, blk: int) -> int:
        a_same, a_blk, b_same, b_blk = _luma_blk_neighbors(blk)
        return self._nc_pair(curr, a_same, a_blk, b_same, b_blk, True, -1)

    def _nc_chroma(self, curr: int, c: int, blk: int) -> int:
        a_same, a_blk, b_same, b_blk = _chroma_blk_neighbors(blk)
        return self._nc_pair(curr, a_same, a_blk, b_same, b_blk, False, c)

    def _nc_pair(self, curr, a_same, a_blk, b_same, b_blk, luma, c):
        def n_of(addr, blk):
            if int(self.mb_type[addr]) == MB_SKIP:
                return 0
            if luma:
                if (int(self.cbp_luma[addr]) & (1 << (blk // 4))) == 0:
                    return 0
                return int(self.tc_luma[addr, blk])
            if (int(self.cbp_chroma[addr]) & 2) == 0:
                return 0
            return int(self.tc_chroma[c, addr, blk])

        left_edge = curr % self.wmb == 0
        top_edge = curr < self.wmb
        nA = nB = None
        if a_same:
            nA = n_of(curr, a_blk)
        elif not left_edge:
            nA = n_of(curr - 1, a_blk)
        if b_same:
            nB = n_of(curr, b_blk)
        elif not top_edge:
            nB = n_of(curr - self.wmb, b_blk)
        if nA is not None and nB is not None:
            return (nA + nB + 1) >> 1
        if nA is not None:
            return nA
        if nB is not None:
            return nB
        return 0

    # ------------------------------------------------------------------
    # Whole-MB forward transform + quantization (quantizationTransform,
    # quantizationTransform.cpp:349-486). Returns level arrays.

    def _quantize_mb_luma_i16(self, src16, pred16):
        diff = (src16 - pred16).astype(np.int32)
        blocks = np.stack([
            diff[by : by + 4, bx : bx + 4]
            for bx, by in ((int(_BLK_XY[b, 0]), int(_BLK_XY[b, 1])) for b in range(16))
        ])
        d = transform.forward_transform_4x4(blocks)
        q = transform.quantize_residual(d, self.qpy, True)
        # DC in raster order of 4x4 blocks within the MB (x/4, y/4)
        dc = np.zeros((4, 4), np.int32)
        for b in range(16):
            bx, by = int(_BLK_XY[b, 0]) // 4, int(_BLK_XY[b, 1]) // 4
            dc[by, bx] = q[b, 0, 0]
        qdc = transform.forward_dc_luma(dc, self.qpy)
        i16dc = transform.zigzag_scan(qdc)
        ac = transform.zigzag_scan(q)[:, 1:]  # drop index 0 per block
        return i16dc, ac

    def _quantize_mb_luma_4x4(self, src16, pred16):
        diff = (src16 - pred16).astype(np.int32)
        blocks = np.stack([
            diff[by : by + 4, bx : bx + 4]
            for bx, by in ((int(_BLK_XY[b, 0]), int(_BLK_XY[b, 1])) for b in range(16))
        ])
        d = transform.forward_transform_4x4(blocks)
        q = transform.quantize_residual(d, self.qpy, False)
        return transform.zigzag_scan(q)

    def _quantize_mb_chroma(self, src_cb, src_cr, pred_cb, pred_cr):
        out_dc = np.zeros((2, 4), np.int32)
        out_ac = np.zeros((2, 4, 15), np.int32)
        for ci, (src, pred) in enumerate(((src_cb, pred_cb), (src_cr, pred_cr))):
            diff = (src - pred).astype(np.int32)
            blocks = np.stack([
                diff[(b // 2) * 4 : (b // 2) * 4 + 4, (b % 2) * 4 : (b % 2) * 4 + 4]
                for b in range(4)
            ])
            d = transform.forward_transform_4x4(blocks)
            q = transform.quantize_residual(d, self.qpc, True)
            dc2 = np.array(
                [[q[0, 0, 0], q[1, 0, 0]], [q[2, 0, 0], q[3, 0, 0]]], np.int32
            )
            qdc = transform.forward_dc_chroma(dc2, self.qpc)
            out_dc[ci] = qdc.reshape(4)
            out_ac[ci] = transform.zigzag_scan(q)[:, 1:]
        return out_dc, out_ac

    @staticmethod
    def _cbp_from_levels(i16: bool, luma_ac, chroma_dc, chroma_ac):
        """setCodedBlockPattern (rbsp_encoding.cpp:21-105)."""
        cbp_luma = 0
        for i8 in range(4):
            if luma_ac[i8 * 4 : i8 * 4 + 4].any():
                cbp_luma |= 1 << i8
        if i16 and cbp_luma:
            cbp_luma = 15
        cbp_chroma = 0
        if chroma_dc.any():
            cbp_chroma |= 1
        if chroma_ac.any():
            cbp_chroma |= 2
        if cbp_chroma == 3:
            cbp_chroma = 2
        return cbp_luma, cbp_chroma

    # ------------------------------------------------------------------
    # Reconstruction (same math as the decoder, writing the working frame)

    def _reconstruct_luma_i16(self, curr, pred16, i16dc, ac):
        x0, y0 = (curr % self.wmb) * 16, (curr // self.wmb) * 16
        dcblk = transform.zigzag_unscan(i16dc)
        dcv = transform.inverse_dc_luma(dcblk, self.qpy)
        recon = np.zeros((16, 16), np.int32)
        for b in range(16):
            bx, by = int(_BLK_XY[b, 0]), int(_BLK_XY[b, 1])
            lst = np.zeros(16, np.int32)
            lst[0] = dcv[by >> 2, bx >> 2]
            lst[1:] = ac[b]
            res = transform.inverse_residual(
                transform.zigzag_unscan(lst), self.qpy, True
            )
            recon[by : by + 4, bx : bx + 4] = res
        self.y[y0 : y0 + 16, x0 : x0 + 16] = np.clip(pred16 + recon, 0, 255)

    def _reconstruct_luma_4x4_levels(self, curr, pred16, levels):
        """Inter-style whole-MB luma reconstruction from LumaLevel lists."""
        x0, y0 = (curr % self.wmb) * 16, (curr // self.wmb) * 16
        blocks = transform.zigzag_unscan(levels)
        res = transform.inverse_residual(blocks, self.qpy, False)
        recon = np.zeros((16, 16), np.int32)
        for b in range(16):
            bx, by = int(_BLK_XY[b, 0]), int(_BLK_XY[b, 1])
            recon[by : by + 4, bx : bx + 4] = res[b]
        self.y[y0 : y0 + 16, x0 : x0 + 16] = np.clip(pred16 + recon, 0, 255)

    def _reconstruct_chroma(self, curr, pred_cb, pred_cr, chroma_dc, chroma_ac):
        x0, y0 = (curr % self.wmb) * 8, (curr // self.wmb) * 8
        for ci, (pred, plane) in enumerate(((pred_cb, self.cb), (pred_cr, self.cr))):
            dcv = transform.inverse_dc_chroma(
                chroma_dc[ci].reshape(2, 2), self.qpc
            )
            rmb = np.zeros((8, 8), np.int32)
            for b in range(4):
                lst = np.zeros(16, np.int32)
                lst[0] = dcv[b // 2, b % 2]
                lst[1:] = chroma_ac[ci, b]
                res = transform.inverse_residual(
                    transform.zigzag_unscan(lst), self.qpc, True
                )
                rmb[(b // 2) * 4 : (b // 2) * 4 + 4, (b % 2) * 4 : (b % 2) * 4 + 4] = res
            plane[y0 : y0 + 8, x0 : x0 + 8] = np.clip(pred + rmb, 0, 255)

    # ------------------------------------------------------------------
    # Intra encoding (intraPredictionEncoding, intra.cpp:949-1110)

    def _fetch_p33(self, curr):
        x0, y0 = (curr % self.wmb) * 16, (curr // self.wmb) * 16
        p = np.full(33, -1, np.int32)
        if x0 > 0 and y0 > 0:
            p[0] = self.y[y0 - 1, x0 - 1]
        if x0 > 0:
            p[1:17] = self.y[y0 : y0 + 16, x0 - 1]
        if y0 > 0:
            p[17:33] = self.y[y0 - 1, x0 : x0 + 16]
        return p

    def _fetch_p13(self, curr, blk):
        x0, y0 = (curr % self.wmb) * 16, (curr // self.wmb) * 16
        bx, by = int(_BLK_XY[blk, 0]), int(_BLK_XY[blk, 1])
        x, y = x0 + bx, y0 + by
        W = self.w
        p = np.full(13, -1, np.int32)
        if x > 0 and y > 0:
            p[0] = self.y[y - 1, x - 1]
        if x > 0:
            p[1:5] = self.y[y : y + 4, x - 1]
        if y > 0:
            p[5:9] = self.y[y - 1, x : x + 4]
            xf = x + 4
            edge = (xf >= W) or (bx == 12 and by > 0)
            if edge or blk in (3, 11):
                p[9:13] = self.y[y - 1, x + 3]
            else:
                p[9:13] = self.y[y - 1, xf : xf + 4]
        return p

    def _fetch_p17(self, curr):
        x0, y0 = (curr % self.wmb) * 8, (curr // self.wmb) * 8
        out = []
        for plane in (self.cb, self.cr):
            p = np.full(17, -1, np.int32)
            if x0 > 0 and y0 > 0:
                p[0] = plane[y0 - 1, x0 - 1]
            if x0 > 0:
                p[1:9] = plane[y0 : y0 + 8, x0 - 1]
            if y0 > 0:
                p[9:17] = plane[y0 - 1, x0 : x0 + 8]
            out.append(p)
        return out

    def _satd(self, src, pred):
        """SATD = Σ|quantized transformed diff| (satdLuma4x4, intra.cpp:819-850).
        src/pred: (..., 4, 4)."""
        d = transform.forward_transform_4x4((src - pred).astype(np.int32))
        q = transform.quantize_residual(d, self.qpy, False)
        return np.abs(q).sum(axis=(-2, -1))

    def _mb_src(self, curr):
        x0, y0 = (curr % self.wmb) * 16, (curr // self.wmb) * 16
        return self.y[y0 : y0 + 16, x0 : x0 + 16].copy()

    def _mb_src_chroma(self, curr):
        x0, y0 = (curr % self.wmb) * 8, (curr // self.wmb) * 8
        return (
            self.cb[y0 : y0 + 8, x0 : x0 + 8].copy(),
            self.cr[y0 : y0 + 8, x0 : x0 + 8].copy(),
        )

    def _blocks_of(self, mb16):
        return np.stack([
            mb16[by : by + 4, bx : bx + 4]
            for bx, by in ((int(_BLK_XY[b, 0]), int(_BLK_XY[b, 1])) for b in range(16))
        ])

    def _mpm(self, curr, blk):
        """Most-probable-mode (setIntra4x4PredMode, intra.cpp:878-942)."""
        a_same, a_blk, b_same, b_blk = _luma_blk_neighbors(blk)
        left_edge = curr % self.wmb == 0
        top_edge = curr < self.wmb
        mode_a = mode_b = None
        if a_same:
            mode_a = int(self.i4x4_mode[curr, a_blk])
        elif not left_edge:
            addr = curr - 1
            mode_a = int(self.i4x4_mode[addr, a_blk]) if self.mb_i4x4[addr] else 2
        if b_same:
            mode_b = int(self.i4x4_mode[curr, b_blk])
        elif not top_edge:
            addr = curr - self.wmb
            mode_b = int(self.i4x4_mode[addr, b_blk]) if self.mb_i4x4[addr] else 2
        if mode_a is None or mode_b is None or self.pps.constrained_intra_pred_flag:
            mode_a = mode_b = 2
        return min(mode_a, mode_b)

    def _intra_mode_decision(self, curr):
        """Exact CPU-path decision. Returns
        (i16_mode or -1, chroma_mode, pred16, pred_cb, pred_cr, levels...)
        and leaves the working frame reconstructed for the winner."""
        src16 = self._mb_src(curr)
        src_cb, src_cr = self._mb_src_chroma(curr)
        src_blocks = self._blocks_of(src16)

        # --- Intra16x16 candidate ---
        p33 = self._fetch_p33(curr)
        if self._tpu_modes is not None:
            best16 = int(self._tpu_modes[0][curr])
        else:
            best16 = None
            min16 = None
            for m in range(4):
                gate = _I16_GATE.get(m)
                if gate == "top" and p33[17] == -1:
                    continue
                if gate == "left" and p33[1] == -1:
                    continue
                if gate == "corner" and p33[0] == -1:
                    continue
                pred = intra.predict_16x16(p33, m)
                satd = int(self._satd(src_blocks, self._blocks_of(pred)).sum())
                if min16 is None or satd < min16:
                    min16, best16 = satd, m
        pred16 = intra.predict_16x16(p33, best16)
        chroma_mode = int(intra.INTRA16_TO_CHROMA_MODE[best16])
        pcb, pcr = self._fetch_p17(curr)
        pred_cb = intra.predict_chroma(pcb, chroma_mode)
        pred_cr = intra.predict_chroma(pcr, chroma_mode)

        # levels + bit cost of the I16 candidate (coded_mb_size path)
        i16dc, i16ac = self._quantize_mb_luma_i16(src16, pred16)
        cdc, cac = self._quantize_mb_chroma(src_cb, src_cr, pred_cb, pred_cr)
        cbp_l16, cbp_c16 = self._cbp_from_levels(True, i16ac, cdc, cac)
        mb_type16 = T.i16_mb_type(best16, cbp_c16, cbp_l16 == 15)
        size16 = self._mb_bit_size(
            curr, mb_type16, True, None, chroma_mode,
            i16dc, i16ac, None, cdc, cac, cbp_l16, cbp_c16,
        )

        # --- Intra4x4 candidate: per-block mode trial on source neighbors ---
        self.mb_type[curr] = 0
        self.mb_intra[curr] = True
        self.mb_i4x4[curr] = True
        if self._tpu_modes is not None:
            modes = self._tpu_modes[1][curr].astype(np.int32)
        else:
            modes = np.zeros(16, np.int32)
            for blk in range(16):
                p13 = self._fetch_p13(curr, blk)
                bx, by = int(_BLK_XY[blk, 0]), int(_BLK_XY[blk, 1])
                sblk = src16[by : by + 4, bx : bx + 4]
                best, minv = None, None
                for m in range(9):
                    gate = _I4_GATE.get(m)
                    if gate == "top" and p13[5] == -1:
                        continue
                    if gate == "left" and p13[1] == -1:
                        continue
                    if gate == "corner" and p13[0] == -1:
                        continue
                    pred = intra.predict_4x4(p13, m)
                    satd = int(self._satd(sblk, pred))
                    if minv is None or satd < minv:
                        minv, best = satd, m
                        if minv == 0:
                            break
                modes[blk] = best
        self.i4x4_mode[curr] = modes

        # reconstruct 4x4 candidate in place (on reconstructed neighbors)
        original = src16.copy()
        x0, y0 = (curr % self.wmb) * 16, (curr // self.wmb) * 16
        prev_flags = [False] * 16
        rem_modes = [0] * 16
        luma_levels = np.zeros((16, 16), np.int32)
        pred4_full = np.zeros((16, 16), np.int32)
        for blk in range(16):
            mpm = self._mpm(curr, blk)
            mode = int(modes[blk])
            if mode == mpm:
                prev_flags[blk] = True
            else:
                rem_modes[blk] = mode if mode < mpm else mode - 1
            p13 = self._fetch_p13(curr, blk)
            pred = intra.predict_4x4(p13, mode)
            bx, by = int(_BLK_XY[blk, 0]), int(_BLK_XY[blk, 1])
            pred4_full[by : by + 4, bx : bx + 4] = pred
            diff = (original[by : by + 4, bx : bx + 4] - pred).astype(np.int32)
            q = transform.quantize_residual(
                transform.forward_transform_4x4(diff), self.qpy, False
            )
            luma_levels[blk] = transform.zigzag_scan(q)
            res = transform.inverse_residual(q, self.qpy, False)
            self.y[y0 + by : y0 + by + 4, x0 + bx : x0 + bx + 4] = np.clip(
                pred + res, 0, 255
            )

        cbp_l4, cbp_c4 = self._cbp_from_levels(False, luma_levels, cdc, cac)
        size4 = self._mb_bit_size(
            curr, 0, False, prev_flags, chroma_mode,
            None, None, luma_levels, cdc, cac, cbp_l4, cbp_c4,
        )

        if size4 < size16:
            return (-1, chroma_mode, pred4_full, pred_cb, pred_cr,
                    None, None, luma_levels, cdc, cac, prev_flags, rem_modes)
        # restore source; 16x16 wins
        self.y[y0 : y0 + 16, x0 : x0 + 16] = original
        return (best16, chroma_mode, pred16, pred_cb, pred_cr,
                i16dc, i16ac, None, cdc, cac, None, None)

    def _mb_bit_size(self, curr, mb_type, i16, prev_flags, chroma_mode,
                     i16dc, i16ac, luma_levels, cdc, cac, cbp_l, cbp_c) -> int:
        """coded_mb_size for intra MBs (rbsp_encoding.cpp:330-488).

        Note: like the reference, the CAVLC size pass updates this MB's
        TotalCoeff state (used by in-MB nC chaining); the final write pass
        recomputes it, and cross-MB reads are CBP-gated, so transient values
        are harmless.
        """
        from ..bitstream.expgolomb import ue_code

        total = ue_code(mb_type)[1]
        if not i16:
            for blk in range(16):
                total += 1
                if not prev_flags[blk]:
                    total += 3
        total += ue_code(chroma_mode)[1]
        if not i16:
            total += ue_code(int(T.CBP_TO_CODENUM_INTRA[(cbp_c << 4) | cbp_l]))[1]
        if cbp_l > 0 or cbp_c > 0 or i16:
            total += 1  # mb_qp_delta = 0
            total += self._residual_bits(curr, i16, i16dc, i16ac,
                                         luma_levels, cdc, cac, cbp_l, cbp_c)
        return total

    def _residual_bits(self, curr, i16, i16dc, i16ac, luma_levels, cdc, cac,
                       cbp_l, cbp_c, writer=None) -> int:
        """residual_write / residual_block_cavlc_size with TC state updates.

        With `writer`, writes the bits; always returns the bit count.
        """
        # make CBP visible for in-MB nC gating
        self.cbp_luma[curr] = cbp_l
        self.cbp_chroma[curr] = cbp_c
        total = 0

        def emit(levels, nc, maxc):
            nonlocal total
            syms, tc = cavlc.block_symbols(list(levels), nc, maxc)
            total += sum(n for _, n in syms)
            if writer is not None:
                for v, n in syms:
                    writer.write(v, n)
            return tc

        if i16:
            tc = emit(i16dc, self._nc_luma(curr, 0), 16)
            self.tc_luma[curr, 0] = tc
        for i8 in range(4):
            for i4 in range(4):
                blk = i8 * 4 + i4
                if cbp_l & (1 << i8):
                    if i16:
                        tc = emit(i16ac[blk], self._nc_luma(curr, blk), 15)
                    else:
                        tc = emit(luma_levels[blk], self._nc_luma(curr, blk), 16)
                    self.tc_luma[curr, blk] = tc
        for c in range(2):
            if cbp_c & 3:
                emit(cdc[c], -1, 4)
        for c in range(2):
            for blk in range(4):
                if cbp_c & 2:
                    tc = emit(cac[c, blk], self._nc_chroma(curr, c, blk), 15)
                    self.tc_chroma[c, curr, blk] = tc
        return total

    def _intra_encode_mb(self, w: BitWriter, curr: int) -> None:
        (i16_mode, chroma_mode, pred16, pred_cb, pred_cr, i16dc, i16ac,
         luma_levels, cdc, cac, prev_flags, rem_modes) = \
            self._intra_mode_decision(curr)
        src_cb, src_cr = self._mb_src_chroma(curr)

        if i16_mode == -1:
            self.mb_type[curr] = 0 if self.slice_type == I_SLICE else 5
            self.mb_intra[curr] = True
            self.mb_i4x4[curr] = True
            cbp_l, cbp_c = self._cbp_from_levels(False, luma_levels, cdc, cac)
            raw_type = 0 if self.slice_type == I_SLICE else 5
            write_ue(w, raw_type)
            for blk in range(16):
                w.write_flag(prev_flags[blk])
                if not prev_flags[blk]:
                    w.write(rem_modes[blk], 3)
            write_ue(w, chroma_mode)
            write_ue(w, int(T.CBP_TO_CODENUM_INTRA[(cbp_c << 4) | cbp_l]))
            if cbp_l > 0 or cbp_c > 0:
                write_se(w, 0)  # mb_qp_delta
                self._residual_bits(curr, False, None, None, luma_levels,
                                    cdc, cac, cbp_l, cbp_c, writer=w)
            else:
                self.cbp_luma[curr] = cbp_l
                self.cbp_chroma[curr] = cbp_c
            self.nz_luma[curr] = luma_levels.any(axis=1)
            self._reconstruct_chroma(curr, pred_cb, pred_cr, cdc, cac)
        else:
            cbp_l, cbp_c = self._cbp_from_levels(True, i16ac, cdc, cac)
            mb_type = T.i16_mb_type(i16_mode, cbp_c, cbp_l == 15)
            raw_type = mb_type if self.slice_type == I_SLICE else mb_type + 5
            self.mb_type[curr] = raw_type
            self.mb_intra[curr] = True
            self.mb_i4x4[curr] = False
            write_ue(w, raw_type)
            write_ue(w, chroma_mode)
            write_se(w, 0)  # mb_qp_delta (always present for I16x16)
            self._residual_bits(curr, True, i16dc, i16ac, None, cdc, cac,
                                cbp_l, cbp_c, writer=w)
            self.nz_luma[curr] = i16ac.any(axis=1) | i16dc.any()
            self._reconstruct_luma_i16(curr, pred16, i16dc, i16ac)
            self._reconstruct_chroma(curr, pred_cb, pred_cr, cdc, cac)

    def _device_iframe_precompute(self) -> None:
        """All-device I-frame: mode decision + wavefront reconstruction of
        every plane on TPU (Intra_16x16 path; the generalized form of the
        reference's GPU offload with reconstruction moved on-device too).
        The host slice loop below only performs CAVLC/syntax writing."""
        import jax.numpy as jnp

        from ..kernels.wavefront import wavefront_i16_frame
        from ..ops.intra import INTRA16_TO_CHROMA_MODE

        out = self.tpu_pipeline(np.asarray(self.y, np.int32))
        m16 = out["mode16"]
        cmodes = jnp.asarray(INTRA16_TO_CHROMA_MODE)[m16]
        (recon_y, i16dc, i16ac, recon_cb, recon_cr, cdc, cac) =             wavefront_i16_frame(
                jnp.asarray(self.y, jnp.int32),
                jnp.asarray(self.cb, jnp.int32),
                jnp.asarray(self.cr, jnp.int32),
                m16, cmodes,
                wmb=self.wmb, hmb=self.hmb, qp=self.qpy, qpc=self.qpc,
            )
        self._dev_i16 = {
            "mode16": np.asarray(m16),
            "cmode": np.asarray(cmodes),
            "i16dc": np.asarray(i16dc),
            "i16ac": np.asarray(i16ac),
            "cdc": np.asarray(cdc),
            "cac": np.asarray(cac),
        }
        self.y[:] = np.asarray(recon_y)
        self.cb[:] = np.asarray(recon_cb)
        self.cr[:] = np.asarray(recon_cr)

    def _device_iframe_encode_full(self, w: BitWriter) -> None:
        """Fully-device I-frame (codec/tpu_iframe.py): one jitted program
        computes modes, wavefront reconstruction and the packed slice
        payload; the host splices the payload after the slice header.
        Recon + per-MB state stay on device (see _materialize)."""
        import jax.numpy as jnp

        from ..ops.cavlc_jax import words_to_bytes
        from .tpu_iframe import device_i16_frame

        y, cb, cr = self._src8
        if self.tpu_iframe == "mixed":
            from .tpu_iframe import device_mixed_frame as device_frame
        else:
            device_frame = device_i16_frame
        # Tiered static payload capacity: the pack program's cost scales
        # with its word capacity, and worst-case (~15.4 kbit/MB) is ~40×
        # a typical frame. Start at 768 bit/MB and escalate ×8 on the
        # rare overflow (nbits is read back anyway; each tier compiles
        # once per geometry).
        nmb = self.wmb * self.hmb
        tiers = [(nmb * 24, 8), (nmb * 192, 24), (None, None)]
        for nw, cap in tiers:
            out = device_frame(
                jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
                wmb=self.wmb, hmb=self.hmb, qp=self.qpy, qpc=self.qpc,
                nw=nw, cap=cap, deblock=self.cfg.deblock)
            nbits, pok = (int(v) for v in np.asarray(out["meta"]))
            if (nw is None or nbits <= 32 * nw) and pok:
                break
        # Read back the payload in power-of-two word buckets: a raw
        # [:n] slice would trace a new program per distinct frame size
        # (measured: one slow recompile per frame on real content).
        nw = (nbits + 31) // 32
        step = max(1024, (1 << (nw - 1).bit_length()) // 8)  # ≤12.5% over
        bucket = -(-nw // step) * step
        words = np.asarray(out["words"][: min(bucket, out["words"].shape[0])])
        w.append_bits(words_to_bytes(words, nbits), nbits)
        self._pending = out

    def _device_pframe_encode_full(self, w: BitWriter) -> None:
        """Fully-device P-frame (codec/tpu_pframe.py): one jitted program
        computes ME maps, the decision wavefront, MC + residual +
        reconstruction, and the packed slice payload. The host splices
        the payload, writes back the per-MB state with the host path's
        exact update semantics (stale-on-ungated-blocks included), and
        applies the decoder's trailing-skip-drop emulation."""
        import jax.numpy as jnp

        from ..ops.cavlc_jax import words_to_bytes
        from .tpu_pframe import device_p_frame

        prev_state = (
            self.mb_type.copy(), self.mb_intra.copy(), self.mb_i4x4.copy(),
            self.mv.copy(), self.tc_luma.copy(), self.tc_chroma.copy(),
            self.cbp_luma.copy(), self.cbp_chroma.copy(), self.nz_luma.copy(),
        )
        nmb = self.nmb
        tiers = [(nmb * 24, 8), (nmb * 192, 24), (None, None)]
        for nw, cap in tiers:
            out = device_p_frame(
                jnp.asarray(self.y), jnp.asarray(self.cb),
                jnp.asarray(self.cr),
                jnp.asarray(self.ref_y), jnp.asarray(self.ref_cb),
                jnp.asarray(self.ref_cr),
                jnp.asarray(self.prev_mv[:, :, 0, :]),
                wmb=self.wmb, hmb=self.hmb,
                window=self.cfg.window_size // 2,
                qp=self.qpy, qpc=self.qpc,
                cfg_maxdiff=self.cfg.maxdiff,
                prefilter=bool(self.cfg.lossy_prefilter and self.qpy < 36),
                nw=nw, cap=cap)
            nbits, pok, trail_bits = (int(v) for v in np.asarray(out["meta"]))
            if (nw is None or nbits <= 32 * nw) and pok:
                break
        nwords = (nbits + 31) // 32
        step = max(1024, (1 << (nwords - 1).bit_length()) // 8)
        bucket = -(-nwords // step) * step
        words = np.asarray(out["words"][: min(bucket, out["words"].shape[0])])
        w.append_bits(words_to_bytes(words, nbits), nbits)

        # state writeback with host-loop semantics (_inter_encode_mb /
        # _write_inter_mb / _residual_bits): skip and residual-less MBs
        # zero their TC state; gated-off blocks keep the previous frame's
        # values (never read — every consumer re-gates by CBP/skip)
        skip = np.asarray(out["skip"])
        coded = ~skip
        raw_type = np.asarray(out["raw_type"])
        cbp_l = np.asarray(out["cbp_luma"])
        cbp_c = np.asarray(out["cbp_chroma"])
        has_resid = (cbp_l > 0) | (cbp_c > 0)
        zero_tc = skip | (coded & ~has_resid)
        coded_blk = np.asarray(out["coded_blk"])
        self.mb_type[:] = np.where(skip, MB_SKIP, raw_type)
        self.mb_intra[:] = False
        self.mb_i4x4[:] = False
        mv = np.asarray(out["mv"])
        self.mv[:] = mv[:, :, None, :]
        self.cbp_luma[:] = np.where(coded, cbp_l, self.cbp_luma)
        self.cbp_chroma[:] = np.where(coded, cbp_c, self.cbp_chroma)
        tc_l = np.asarray(out["tc_luma"])
        self.tc_luma[:] = np.where(
            zero_tc[:, None], 0,
            np.where(coded_blk, tc_l, self.tc_luma))
        tc_c = np.asarray(out["tc_chroma"])
        self.tc_chroma[:] = np.where(
            zero_tc[None, :, None], 0,
            np.where((cbp_c == 2)[None, :, None], tc_c, self.tc_chroma))
        self.nz_luma[:] = np.asarray(out["nz_luma"])
        self.y = np.array(out["recon_y"])
        self.cb = np.array(out["recon_cb"])
        self.cr = np.array(out["recon_cr"])

        # trailing-skip drop emulation (see the host loop below): when
        # everything after the last coded MB fits in the final RBSP byte,
        # decoders never read the trailing run — those MBs keep their
        # previous-frame pixels and state. (trail_bits came in via meta.)
        trail_run = int(skip[::-1].argmin()) if coded.any() else nmb
        if trail_bits > 0 and coded.any():
            total_bits = w.bit_position
            rbsp_len = (total_bits + 1 + 7) // 8  # + rbsp stop bit
            if (total_bits - trail_bits) // 8 >= rbsp_len - 1:
                self._drop_tail_skips(
                    range(nmb - trail_run, nmb), prev_state)
        if self.cfg.deblock:
            from .loopfilter import deblock_frame

            deblock_frame(self)

    def _intra_encode_frame_native(self, w: BitWriter) -> bool:
        """Whole-slice macroblock_layer entropy via the native C++ backend
        (native/cavlc_native.cpp i16_frame_entropy) — the counterpart of
        the reference's per-MB write loop (rbsp_encoding.cpp:175-305) for
        an all-device I16 frame: one call emits every MB's bits, spliced
        into the slice writer in bulk. Bit-identical to the per-MB
        `_intra_encode_mb_device` path (tests/test_native.py).

        Returns False when the native lib is unavailable so the Python
        per-MB loop runs instead.
        """
        from .. import native

        d = self._dev_i16
        res = native.i16_frame_entropy_native(
            d["mode16"], d["cmode"], d["i16dc"], d["i16ac"],
            d["cdc"], d["cac"], self.wmb,
        )
        if res is None:
            return False
        payload, nbits, mb_type, cbp_l, cbp_c, tc_luma, tc_chroma = res
        w.append_bits(payload, nbits)
        # write back per-MB state (used by later P-frames' nC/MV context
        # and by _drop_tail_skips)
        self.mb_type[:] = mb_type  # device path is I-slice only (raw type)
        self.mb_intra[:] = True
        self.mb_i4x4[:] = False
        self.cbp_luma[:] = cbp_l
        self.cbp_chroma[:] = cbp_c
        self.tc_luma[:] = tc_luma
        self.tc_chroma[:] = tc_chroma
        self.nz_luma[:] = (
            d["i16ac"].any(axis=2) | d["i16dc"].any(axis=1)[:, None]
        )
        return True

    def _intra_encode_mb_device(self, w: BitWriter, curr: int) -> None:
        """Syntax/CAVLC writing for a device-reconstructed I16 MB."""
        d = self._dev_i16
        i16dc = d["i16dc"][curr]
        i16ac = d["i16ac"][curr]
        cdc = d["cdc"][:, curr]
        cac = d["cac"][:, curr]
        cbp_l, cbp_c = self._cbp_from_levels(True, i16ac, cdc, cac)
        mb_type = T.i16_mb_type(int(d["mode16"][curr]), cbp_c, cbp_l == 15)
        raw_type = mb_type if self.slice_type == I_SLICE else mb_type + 5
        self.mb_type[curr] = raw_type
        self.mb_intra[curr] = True
        self.mb_i4x4[curr] = False
        write_ue(w, raw_type)
        write_ue(w, int(d["cmode"][curr]))
        write_se(w, 0)  # mb_qp_delta
        self._residual_bits(curr, True, i16dc, i16ac, None, cdc, cac,
                            cbp_l, cbp_c, writer=w)
        self.nz_luma[curr] = i16ac.any(axis=1) | i16dc.any()

    # ------------------------------------------------------------------
    # Inter encoding (interEncoding structure, moestimation.cpp:392-585;
    # search itself is ours: full integer SAD + quarter-pel refinement)

    def _inter_encode_mb(self, curr: int):
        """Returns None for P_Skip, else (mb_type, part_mvs, mvds,
        pred, levels...) for _write_inter_mb."""
        cfg = self.cfg
        x0, y0 = (curr % self.wmb) * 16, (curr // self.wmb) * 16
        src16 = self._mb_src(curr)
        src_cb, src_cr = self._mb_src_chroma(curr)

        # P_Skip trial (moestimation.cpp:402-425)
        self.mb_type[curr] = MB_SKIP
        self.mb_intra[curr] = False
        self.mb_i4x4[curr] = False
        skip_mv = mvpred.derive_skip_mv(self, curr)
        self.mv[curr, :, :, 0] = skip_mv[0]
        self.mv[curr, :, :, 1] = skip_mv[1]
        pred_l, pred_cb, pred_cr = self._mc_mb(curr)
        if cfg.maxdiff == -1:
            mean = int(src16.sum()) // 256
            maxdiff = max(3, int(np.abs(src16 - mean).sum()) // 256)
        else:
            maxdiff = cfg.maxdiff
        if int((np.abs(src16 - pred_l) <= maxdiff).sum()) == 256:
            # skip: reconstruction = prediction (transformDecodingP_Skip)
            self.tc_luma[curr] = 0
            self.tc_chroma[:, curr] = 0
            self.nz_luma[curr] = False
            self.y[y0 : y0 + 16, x0 : x0 + 16] = np.clip(pred_l, 0, 255)
            cx0, cy0 = x0 // 2, y0 // 2
            self.cb[cy0 : cy0 + 8, cx0 : cx0 + 8] = np.clip(pred_cb, 0, 255)
            self.cr[cy0 : cy0 + 8, cx0 : cx0 + 8] = np.clip(pred_cr, 0, 255)
            return None

        # --- our ME: full integer search ± window/2 per 8x8 + qpel refine ---
        part_mv, part_sad = self._search_mb(curr, src16, maxdiff)
        part_mv = self._maybe_unify(curr, src16, part_mv, part_sad)

        # merge into mb_type (moestimation.cpp:529-551)
        mvx, mvy = part_mv[:, 0], part_mv[:, 1]
        if (mvx == mvx[0]).all() and (mvy == mvy[0]).all():
            mb_type = 0
        elif mvx[0] == mvx[1] and mvy[0] == mvy[1] and mvx[2] == mvx[3] and mvy[2] == mvy[3]:
            mb_type = 1
            part_mv = part_mv[[0, 2, 2, 3]]
        elif mvx[0] == mvx[2] and mvy[0] == mvy[2] and mvx[1] == mvx[3] and mvy[1] == mvy[3]:
            mb_type = 2
            part_mv = part_mv[[0, 1, 1, 3]]
        else:
            mb_type = 4  # P_8x8ref0 (reference's choice)
        num_parts = [1, 2, 2, 4, 4][mb_type]

        # mvd via spec prediction with earlier parts finalized
        self.mb_type[curr] = mb_type
        mvds = np.zeros((4, 2), np.int32)
        final = np.zeros((4, 2), np.int32)
        for p in range(num_parts):
            px, py = mvpred.predict_mv_luma(
                self, curr, mb_type, num_parts, p, [0, 0, 0, 0])
            final[p] = part_mv[p]
            mvds[p, 0] = int(part_mv[p, 0]) - px
            mvds[p, 1] = int(part_mv[p, 1]) - py
            mvpred.store_part_mvs(self, curr, mb_type, num_parts, final, p)
        mvpred.store_part_mvs(self, curr, mb_type, num_parts, final, num_parts - 1)
        mvpred.fan_out(self, curr)

        pred_l, pred_cb, pred_cr = self._mc_mb(curr)

        # optional lossy MAXDIFF prefilter (moestimation.cpp:570-584);
        # auto-disabled at high QP where the adaptive tolerance exceeds the
        # quantizer's own distortion scale and costs PSNR (measured: QP40
        # 42.31dB/5568B without vs 42.06dB/5475B with)
        if cfg.lossy_prefilter and self.qpy < 36:
            lm = np.abs(src16 - pred_l) < maxdiff
            src16 = np.where(lm, pred_l, src16)
            self.y[y0 : y0 + 16, x0 : x0 + 16] = src16
            cmask_b = np.abs(src_cb - pred_cb) <= maxdiff
            cmask_r = np.abs(src_cr - pred_cr) <= maxdiff
            src_cb = np.where(cmask_b, pred_cb, src_cb)
            src_cr = np.where(cmask_r, pred_cr, src_cr)
            cx0, cy0 = x0 // 2, y0 // 2
            self.cb[cy0 : cy0 + 8, cx0 : cx0 + 8] = src_cb
            self.cr[cy0 : cy0 + 8, cx0 : cx0 + 8] = src_cr

        luma_levels = self._quantize_mb_luma_4x4(src16, pred_l)
        cdc, cac = self._quantize_mb_chroma(src_cb, src_cr, pred_cb, pred_cr)
        cbp_l, cbp_c = self._cbp_from_levels(False, luma_levels, cdc, cac)
        return (mb_type, num_parts, mvds, pred_l, pred_cb, pred_cr,
                luma_levels, cdc, cac, cbp_l, cbp_c)

    def _mc_mb(self, curr):
        """Whole-MB MC via the precomputed planes when the MVs are in
        range, else the per-window path (bit-identical either way)."""
        mv = self.mv[curr]
        lim = self._interp_ext * 4 - 4
        if np.abs(mv).max() <= lim:
            from ..ops.interp import mc_macroblock_from_planes

            return mc_macroblock_from_planes(
                self._interp, self._interp_cb, self._interp_cr,
                curr % self.wmb, curr // self.wmb, mv,
                self._interp_ext, self._interp_extc,
            )
        return mc.mc_macroblock(
            self.ref_y, self.ref_cb, self.ref_cr,
            curr % self.wmb, curr // self.wmb, mv,
        )

    def _me_metric(self, d):
        """ME distortion: SAD below QP36 (correlates with CAVLC residual
        bits, which dominate the rate there), scaled SSD at QP>=36 where
        residuals quantize to zero and prediction error IS the
        reconstruction error — measured on the QP sweep: SAD loses 0.2dB
        to the reference at QP40, SSD wins at QP37..46
        (moestimation.cpp:460-470 uses SAD+|Δmv| at every QP, which we
        beat on both ends). The QP>=45 pair (2·SSD, λ=3) is the integer
        encoding of λ=1.5 — high QP wants finer MVs than λ=2 allows."""
        if self.qpy >= 36:
            d = d.astype(np.int64)
            return (2 * d * d) if self.qpy >= 45 else (d * d)
        return np.abs(d)

    @property
    def _me_lambda(self) -> int:
        """|mv − mvp| weight matching the metric's scale."""
        if self.qpy >= 45:
            return 3
        return 2 if self.qpy >= 36 else 1

    def _search_mb(self, curr, src16, maxdiff) -> np.ndarray:
        """Full-search per 8x8 block over ±window/2 integer positions, then
        quarter-pel refinement around two centers: the pure-distortion
        integer argmin and the previous frame's co-located MV (a temporal
        predictor proxy — the reference instead searches all 16 fracs
        around the live mvp, moestimation.cpp:460-528; the co-located
        center is mvp-independent so the device pipeline precomputes both
        refinement SAD maps in bulk).

        (The device path batches the integer search across the whole frame;
        see ops/me.py, consumed via self._me_cands.)
        Returns (4, 2) quarter-pel MVs.
        """
        cfg = self.cfg
        W = cfg.window_size // 2
        x0, y0 = (curr % self.wmb) * 16, (curr // self.wmb) * 16
        out = np.zeros((4, 2), np.int32)
        from numpy.lib.stride_tricks import sliding_window_view

        # cost = distortion + λ·|mv − mvp| (the reference's rescoring
        # metric shape, moestimation.cpp:460-470); mvp per quadrant via
        # the spec predictor with earlier quadrants' best in place.
        lam = self._me_lambda
        self.mb_type[curr] = 4
        sad_out = np.zeros(4, np.float64)
        for q in range(4):
            bx, by = (q & 1) * 8, (q >> 1) * 8
            sb = src16[by : by + 8, bx : bx + 8]
            ax, ay = x0 + bx, y0 + by
            mvpx, mvpy = mvpred.predict_mv_luma(
                self, curr, 4, 4, q, [0, 0, 0, 0])
            if self._me_cands is None:
                pad = W + (4 if cfg.qpel else 0)
                win = mc.fetch_window(self.ref_y, ax - pad, ay - pad,
                                      8 + 2 * pad, 8 + 2 * pad)
            if self._me_cands is not None:
                # device top-K candidates, reranked with the |mv-mvp| cost
                sads_k, mvx_k, mvy_k = self._me_cands
                bi = (ay // 8) * (self.w // 8) + (ax // 8)
                sc = sads_k[bi] + lam * (
                    np.abs(mvx_k[bi] - mvpx) + np.abs(mvy_k[bi] - mvpy))
                j = int(np.argmin(sc))
                mvx_i, mvy_i = int(mvx_k[bi, j]), int(mvy_k[bi, j])
                best_score = float(sc[j])
                # top_k is distortion-ascending, first-index on ties →
                # slot 0 is the pure-distortion argmin
                cx_i, cy_i = int(mvx_k[bi, 0]), int(mvy_k[bi, 0])
            else:
                cands = sliding_window_view(win, (8, 8))[
                    pad - W : pad + W + 1, pad - W : pad + W + 1
                ]
                sads = self._me_metric(
                    cands.astype(np.int32) - sb).sum(axis=(2, 3))
                sh = np.arange(-W, W + 1) * 4
                mvcost = lam * (np.abs(sh[:, None] - mvpy)
                                + np.abs(sh[None, :] - mvpx))
                scores = sads + mvcost
                iy, ix = np.unravel_index(np.argmin(scores), scores.shape)
                mvx_i, mvy_i = (int(ix) - W) * 4, (int(iy) - W) * 4
                best_score = float(scores[iy, ix])
                # qpel center 1: the pure-distortion argmin —
                # mvp-independent, so the device pipeline precomputes its
                # 49 qpel SADs in bulk
                sy, sx = np.unravel_index(np.argmin(sads), sads.shape)
                cx_i, cy_i = (int(sx) - W) * 4, (int(sy) - W) * 4
            best_mv = (mvx_i, mvy_i)
            if cfg.qpel:
                # quarter-pel refinement around each center using the
                # precomputed 16-phase planes (bit-identical to per-window
                # interpolation; ops/interp.py). Center 2 is the previous
                # frame's co-located MV with a wider radius (temporal
                # candidates recover the reference's dense frac search
                # around the predictor without an mvp dependence).
                ext = self._interp_ext
                lim = ext * 4 - 4
                centers = [(cx_i, cy_i, 3)]
                p2x = int(self.prev_mv[curr, q, 0, 0])
                p2y = int(self.prev_mv[curr, q, 0, 1])
                if abs(p2x) <= lim - 3 and abs(p2y) <= lim - 3:
                    centers.append((p2x, p2y, 3))
                for ccx, ccy, rr in centers:
                    for dy in range(-rr, rr + 1):
                        for dx in range(-rr, rr + 1):
                            mvx, mvy = ccx + dx, ccy + dy
                            frac = (mvy & 3) * 4 + (mvx & 3)
                            px = ax + (mvx >> 2) + ext
                            py = ay + (mvy >> 2) + ext
                            pred = self._interp[frac][py : py + 8, px : px + 8]
                            score = float(
                                self._me_metric(pred - sb).sum()
                                + lam * (abs(mvx - mvpx) + abs(mvy - mvpy))
                            )
                            if score < best_score:
                                best_score, best_mv = score, (mvx, mvy)
            out[q] = best_mv
            sad_out[q] = best_score
            # make this quadrant's choice visible to the next predictor
            mvpred.store_part_mvs(self, curr, 4, 4, out, q)
        return out, sad_out

    def _maybe_unify(self, curr, src16, part_mv, part_sad) -> np.ndarray:
        """Try each quadrant's best vector as a single 16x16 MV: if one
        covers the whole MB more cheaply than the split (Σ 8x8 SAD + one
        |mv−mvp| vs Σ(SAD_q + |mv_q−mvp_q|)), unify. Counters partition
        over-fragmentation at high QP where mvd bits dominate."""
        if all((part_mv[q] == part_mv[0]).all() for q in range(1, 4)):
            return part_mv
        x0, y0 = (curr % self.wmb) * 16, (curr // self.wmb) * 16
        ext = self._interp_ext
        lim = ext * 4 - 4
        self.mb_type[curr] = 0  # predictor under P_L0_16x16 partitioning
        mvp = mvpred.predict_mv_luma(self, curr, 0, 1, 0, None)
        lam = self._me_lambda
        split_cost = float(part_sad.sum())
        best_u, best_cost = None, split_cost
        # quadrant order with first-occurrence dedup: deterministic tie
        # handling (a set would hash-order ties), matched by the device path
        cands = dict.fromkeys(tuple(part_mv[q]) for q in range(4))
        for u in cands:
            mvx, mvy = int(u[0]), int(u[1])
            if abs(mvx) > lim or abs(mvy) > lim:
                continue
            frac = (mvy & 3) * 4 + (mvx & 3)
            px = x0 + (mvx >> 2) + ext
            py = y0 + (mvy >> 2) + ext
            pred = self._interp[frac][py : py + 16, px : px + 16]
            sad = float(self._me_metric(pred - src16).sum())
            cost = sad + lam * (abs(mvx - mvp[0]) + abs(mvy - mvp[1]))
            if cost < best_cost:
                best_cost, best_u = cost, (mvx, mvy)
        if best_u is not None:
            part_mv = part_mv.copy()
            part_mv[:, 0] = best_u[0]
            part_mv[:, 1] = best_u[1]
        self.mb_type[curr] = 4
        return part_mv

    def _write_inter_mb(self, w, curr, mb_type, num_parts, mvds, pred_l,
                        pred_cb, pred_cr, luma_levels, cdc, cac, cbp_l,
                        cbp_c) -> None:
        write_ue(w, mb_type)
        if mb_type in (3, 4):
            for p in range(4):
                write_ue(w, 0)  # sub_mb_type = P_L0_8x8 (both P_8x8 kinds)
            for p in range(4):
                write_se(w, int(mvds[p, 0]))
                write_se(w, int(mvds[p, 1]))
        else:
            for p in range(num_parts):
                write_se(w, int(mvds[p, 0]))
                write_se(w, int(mvds[p, 1]))
        write_ue(w, int(T.CBP_TO_CODENUM_INTER[(cbp_c << 4) | cbp_l]))
        if cbp_l > 0 or cbp_c > 0:
            write_se(w, 0)  # mb_qp_delta
            self._residual_bits(curr, False, None, None, luma_levels, cdc,
                                cac, cbp_l, cbp_c, writer=w)
        else:
            self.cbp_luma[curr] = cbp_l
            self.cbp_chroma[curr] = cbp_c
            self.tc_luma[curr] = 0
            self.tc_chroma[:, curr] = 0
        self.nz_luma[curr] = luma_levels.any(axis=1)
        self._reconstruct_luma_4x4_levels(curr, pred_l, luma_levels)
        self._reconstruct_chroma(curr, pred_cb, pred_cr, cdc, cac)
