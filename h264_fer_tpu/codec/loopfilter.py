"""Frame-level in-loop deblocking driver (norm 8.7.2) — superset feature.

Applies the filter in the norm's per-MB raster order: for each MB, its
vertical luma/chroma edges left→right, then horizontal edges top→bottom.
bS derivation (8.7.2.1, simplified to this codec's envelope: one slice,
single reference, no fields):

  MB-boundary edge, either side intra → 4
  internal edge, either side intra    → 3
  either 4x4 block has nonzero coeffs → 2
  MV delta ≥ 4 quarter-pel (x or y)   → 1
  else                                → 0

State protocol: needs wmb, hmb, y, cb, cr (int32 planes), mb_intra,
nz_luma (nmb, 16) per-4x4-block nonzero flags in Z-scan order, mv
(nmb, 4, 4, 2), and qpy / qpc.
"""

from __future__ import annotations

import numpy as np

from ..ops.deblock import filter_edge
from ..ops.tables import RASTER_TO_LUMA_BLOCK


def _blk_nz(st, mb: int, raster_blk: int) -> bool:
    return bool(st.nz_luma[mb, int(RASTER_TO_LUMA_BLOCK[raster_blk])])


def _blk_mv(st, mb: int, raster_blk: int):
    q = (raster_blk // 8) * 2 + (raster_blk % 4) // 2
    return st.mv[mb, q, 0]


def _bs_pair(st, mb_p, blk_p, mb_q, blk_q, mb_edge: bool) -> int:
    if st.mb_intra[mb_p] or st.mb_intra[mb_q]:
        return 4 if mb_edge else 3
    if _blk_nz(st, mb_p, blk_p) or _blk_nz(st, mb_q, blk_q):
        return 2
    mvp = _blk_mv(st, mb_p, blk_p)
    mvq = _blk_mv(st, mb_q, blk_q)
    if abs(int(mvp[0]) - int(mvq[0])) >= 4 or abs(int(mvp[1]) - int(mvq[1])) >= 4:
        return 1
    return 0


def _edge_bs_vertical(st, mb: int, xblk: int) -> np.ndarray:
    """bS per 4-line group for the vertical edge at luma x offset 4*xblk."""
    wmb = st.wmb
    bs = np.zeros(4, np.int32)
    for yblk in range(4):
        q_blk = yblk * 4 + xblk
        if xblk == 0:
            mb_p = mb - 1
            p_blk = yblk * 4 + 3
            mb_edge = True
        else:
            mb_p = mb
            p_blk = yblk * 4 + xblk - 1
            mb_edge = False
        bs[yblk] = _bs_pair(st, mb_p, p_blk, mb, q_blk, mb_edge)
    return np.repeat(bs, 4)


def _edge_bs_horizontal(st, mb: int, yblk: int) -> np.ndarray:
    wmb = st.wmb
    bs = np.zeros(4, np.int32)
    for xblk in range(4):
        q_blk = yblk * 4 + xblk
        if yblk == 0:
            mb_p = mb - wmb
            p_blk = 3 * 4 + xblk
            mb_edge = True
        else:
            mb_p = mb
            p_blk = (yblk - 1) * 4 + xblk
            mb_edge = False
        bs[xblk] = _bs_pair(st, mb_p, p_blk, mb, q_blk, mb_edge)
    return np.repeat(bs, 4)


def deblock_frame(st) -> None:
    """Filter st.y / st.cb / st.cr in place (per-MB raster order)."""
    wmb, hmb = st.wmb, st.hmb
    qp = st.qpy
    qpc = st.qpc
    for mb in range(wmb * hmb):
        mbx, mby = mb % wmb, mb // wmb
        x0, y0 = mbx * 16, mby * 16
        cx0, cy0 = mbx * 8, mby * 8
        # vertical edges, left to right (8.7: vertical first)
        for xblk in range(4):
            if xblk == 0 and mbx == 0:
                continue
            bs = _edge_bs_vertical(st, mb, xblk)
            filter_edge(st.y, x0 + 4 * xblk, y0, True, 16, bs, qp, False)
            if xblk in (0, 2):  # chroma edges at luma x 0 and 8
                cbs = bs[::2]
                filter_edge(st.cb, cx0 + 2 * xblk, cy0, True, 8, cbs, qpc, True)
                filter_edge(st.cr, cx0 + 2 * xblk, cy0, True, 8, cbs, qpc, True)
        # horizontal edges, top to bottom
        for yblk in range(4):
            if yblk == 0 and mby == 0:
                continue
            bs = _edge_bs_horizontal(st, mb, yblk)
            filter_edge(st.y, x0, y0 + 4 * yblk, False, 16, bs, qp, False)
            if yblk in (0, 2):
                cbs = bs[::2]
                filter_edge(st.cb, cx0, cy0 + 2 * yblk, False, 8, cbs, qpc, True)
                filter_edge(st.cr, cx0, cy0 + 2 * yblk, False, 8, cbs, qpc, True)
