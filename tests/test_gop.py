"""GOP-parallel encoding harness (data-parallel axis)."""

import numpy as np

from h264_fer_tpu.codec.decoder import Decoder
from h264_fer_tpu.codec.encoder import Encoder, EncoderConfig
from h264_fer_tpu.parallel.gop import encode_gop_parallel
from h264_fer_tpu.vio.y4m import Y4MReader, psnr


def test_gop_parallel_stream_valid_and_equivalent(fixtures_dir):
    frames = list(Y4MReader(str(fixtures_dir / "clip_qcif_10f.y4m")))
    cfg = EncoderConfig(qp=28, intra_every=4)
    par = encode_gop_parallel(frames, 176, 144, cfg, workers=3)
    dec = list(Decoder().decode_annexb(par))
    assert len(dec) == len(frames)

    ser = Encoder(176, 144, cfg).encode_sequence(frames)
    ds = list(Decoder().decode_annexb(ser))
    pp = np.mean([psnr(d[0], s[0]) for d, s in zip(dec, frames)])
    ps = np.mean([psnr(d[0], s[0]) for d, s in zip(ds, frames)])
    # same GOP boundaries → same decisions; only idr_pic_id values differ
    assert abs(pp - ps) < 0.01
    assert abs(len(par) - len(ser)) < 64


def test_gop_idr_ids_distinct(fixtures_dir):
    """Back-to-back IDRs at GOP boundaries must carry distinct idr_pic_id
    (norm 7.4.3)."""
    from h264_fer_tpu.bitstream import nal as N
    from h264_fer_tpu.bitstream.bitio import BitReader
    from h264_fer_tpu.bitstream.params import PPS, SPS, SliceHeader

    frames = list(Y4MReader(str(fixtures_dir / "clip_qcif_10f.y4m")))[:4]
    cfg = EncoderConfig(qp=28, intra_every=1)  # every frame IDR
    data = encode_gop_parallel(frames, 176, 144, cfg, workers=2)
    sps = pps = None
    ids = []
    for u in N.iter_nal_units(data):
        if u.nal_unit_type == N.NAL_SPS:
            sps = SPS.parse(BitReader(u.rbsp))
        elif u.nal_unit_type == N.NAL_PPS:
            pps = PPS.parse(BitReader(u.rbsp))
        elif u.nal_unit_type == N.NAL_IDR:
            sh = SliceHeader.parse(BitReader(u.rbsp), sps, pps,
                                   u.nal_unit_type, u.nal_ref_idc)
            ids.append(sh.idr_pic_id)
    assert len(ids) == 4
    for a, b in zip(ids, ids[1:]):
        assert a != b, ids
