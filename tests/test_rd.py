"""RD regression guard: inter encode must stay >= the reference encoder.

Golden numbers are the reference binary's (tools/oracle refenc) results on
tests/fixtures/clip_qcif_10f.y4m, QP sweep with intra_every=100 — i.e. one
I-frame + nine P-frames (Diplomski_Davor Table 6.x workload shape). The
north star (BASELINE.md) requires luma PSNR >= reference at EVERY QP; bytes
should stay competitive (<= ref at low/mid QP, <= 1.10x at the QP46 extreme
where the encoder deliberately trades bits for PSNR — see
encoder._me_metric).

Regenerate goldens: python tools/conformance.py encode (plus QP43/46 runs).
"""

from __future__ import annotations

import pathlib

import numpy as np
import pytest

from h264_fer_tpu.codec.decoder import Decoder
from h264_fer_tpu.codec.encoder import Encoder, EncoderConfig
from h264_fer_tpu.vio.y4m import Y4MReader, psnr

CLIP = pathlib.Path(__file__).parent / "fixtures/clip_qcif_10f.y4m"

# qp -> (reference bytes, reference mean luma PSNR)
REF = {
    16: (13330, 46.21),
    28: (6168, 45.13),
    40: (6126, 42.474),
    46: (6470, 39.201),
}


@pytest.mark.parametrize("qp", sorted(REF))
def test_inter_rd_beats_reference(qp):
    frames = list(Y4MReader(str(CLIP)))
    enc = Encoder(176, 144, EncoderConfig(qp=qp, intra_every=100))
    mine = enc.encode_sequence(frames)
    dec = list(Decoder().decode_annexb(mine))
    pm = float(np.mean([psnr(d[0], s[0]) for d, s in zip(dec, frames)]))
    ref_bytes, ref_psnr = REF[qp]
    assert pm >= ref_psnr, f"QP{qp}: {pm:.3f}dB < reference {ref_psnr}dB"
    assert len(mine) <= ref_bytes * 1.10, (
        f"QP{qp}: {len(mine)}B > 1.10x reference {ref_bytes}B"
    )
