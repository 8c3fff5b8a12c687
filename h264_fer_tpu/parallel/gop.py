"""GOP-parallel encoding (the codec's data-parallel axis, SURVEY.md §2.4).

Frames between forced IDRs are independent of other GOPs, so GOPs encode
concurrently and the Annex-B chunks concatenate in order (the reference has
no equivalent — its only parallelism is the intra-mode GPU offload).

This host-level harness runs GOPs across a thread pool (NumPy releases the
GIL for the heavy ops); across hosts the same structure maps to
jax.distributed with each host owning a GOP range and the driver doing the
ordered concat (round-2 config 5).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..codec.encoder import Encoder, EncoderConfig
from .mesh import gop_boundaries


def encode_gop_parallel(frames, width: int, height: int, cfg: EncoderConfig,
                        workers: int = 4) -> bytes:
    """Encode `frames` with one independent encoder per IDR-delimited GOP.

    Each GOP starts with an IDR (scene-cut IDR selection stays active inside
    a GOP). idr_pic_id is seeded with the GOP index so consecutive IDRs at
    GOP boundaries carry distinct ids (norm 7.4.3 requirement for
    back-to-back IDRs).
    """
    spans = gop_boundaries(len(frames), cfg.intra_every)

    def encode_span(idx_span):
        gi, (start, end) = idx_span
        enc = Encoder(width, height, cfg)
        enc.idr_pic_id = gi  # distinct ids across GOP-boundary IDRs
        enc.first_frame = False
        chunk = bytearray()
        for f in frames[start:end]:
            chunk += enc.encode_frame(*f)
        return bytes(chunk)

    with ThreadPoolExecutor(max_workers=workers) as pool:
        chunks = list(pool.map(encode_span, enumerate(spans)))

    head = Encoder(width, height, cfg).headers()
    return head + b"".join(chunks)
