"""In-loop deblocking filter (norm 8.7) — the reference lacks one entirely
(headers_and_parameter_sets.h:364-367 "Deblocking filter not implemented");
this is the build's north-star superset (SURVEY.md §5.9).

Design: batched edge filtering. For one frame, all vertical edges are
filtered left-to-right column-group by column-group, then all horizontal
edges top-to-bottom — matching the norm's per-MB edge order observable
effects because H.264's filter for edge k only reads pixels that edge k's
own filtering window covers after edge k-1 was filtered; processing all
MBs' same-position edges simultaneously is equivalent to the per-MB raster
order for the vertical-then-horizontal sweep within a column/row group.

NOTE ON ORDERING: the norm filters per MB (all 4 vertical edges of MB i,
then its 4 horizontal edges, then MB i+1). A MB's *vertical* filtering
reads its left neighbor's last columns *after* that neighbor was fully
filtered (including horizontal edges). We therefore run: all vertical
edges in left-to-right column order is NOT exactly the norm order. To stay
exactly norm-conformant we process MB-column wavefronts: for MB column c,
vertical edges use left-neighbor pixels already horizontally filtered.
This module implements the *exact per-MB sequential order* on the host;
it is the conformance oracle for the device filter.

Tables ALPHA/BETA/TC0 are the norm Table 8-16/8-17 constants.
"""

from __future__ import annotations

import numpy as np

ALPHA = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
     32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182,
     203, 226, 255, 255],
    dtype=np.int32,
)
BETA = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8,
     9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16,
     17, 17, 18, 18],
    dtype=np.int32,
)
# TC0[bS-1][indexA] for bS 1..3 (norm Table 8-17)
TC0 = np.array(
    [
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
         0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1,
         1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 4, 4, 4, 5,
         6, 6, 7, 9],
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
         0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1,
         1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 4, 4, 5, 5, 6, 7,
         8, 8, 10, 11],
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
         0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2,
         2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10,
         11, 13, 14, 16],
    ],
    dtype=np.int32,
)


def _clip3(lo, hi, v):
    return np.minimum(hi, np.maximum(lo, v))


def _filter_line_normal(p, q, bs, alpha, beta, tc0, chroma):
    """bS 1..3 filter for one line of samples (vectorized over lines).

    p, q: (..., 4) with p[..., 0] nearest the edge. Returns new (p, q).
    """
    p0, p1, p2 = p[..., 0], p[..., 1], p[..., 2]
    q0, q1, q2 = q[..., 0], q[..., 1], q[..., 2]
    filt = (
        (np.abs(p0 - q0) < alpha)
        & (np.abs(p1 - p0) < beta)
        & (np.abs(q1 - q0) < beta)
        & (bs > 0)
    )
    ap = np.abs(p2 - p0)
    aq = np.abs(q2 - q0)
    if chroma:
        tc = tc0 + 1
    else:
        tc = tc0 + (ap < beta).astype(np.int32) + (aq < beta).astype(np.int32)
    delta = _clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
    np0 = np.clip(p0 + delta, 0, 255)
    nq0 = np.clip(q0 - delta, 0, 255)
    out_p = p.copy()
    out_q = q.copy()
    out_p[..., 0] = np.where(filt, np0, p0)
    out_q[..., 0] = np.where(filt, nq0, q0)
    if not chroma:
        dp1 = _clip3(-tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - (p1 << 1)) >> 1)
        dq1 = _clip3(-tc0, tc0, (q2 + ((p0 + q0 + 1) >> 1) - (q1 << 1)) >> 1)
        out_p[..., 1] = np.where(filt & (ap < beta), p1 + dp1, p1)
        out_q[..., 1] = np.where(filt & (aq < beta), q1 + dq1, q1)
    return out_p, out_q


def _filter_line_strong(p, q, alpha, beta, chroma):
    """bS 4 filter (vectorized over lines)."""
    p0, p1, p2, p3 = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    filt = (
        (np.abs(p0 - q0) < alpha)
        & (np.abs(p1 - p0) < beta)
        & (np.abs(q1 - q0) < beta)
    )
    ap = np.abs(p2 - p0)
    aq = np.abs(q2 - q0)
    strong = np.abs(p0 - q0) < ((alpha >> 2) + 2)
    out_p = p.copy()
    out_q = q.copy()
    if chroma:
        out_p[..., 0] = np.where(filt, ((p1 << 1) + p0 + q1 + 2) >> 2, p0)
        out_q[..., 0] = np.where(filt, ((q1 << 1) + q0 + p1 + 2) >> 2, q0)
        return out_p, out_q
    sp = filt & strong & (ap < beta)
    sq = filt & strong & (aq < beta)
    out_p[..., 0] = np.where(
        sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
        np.where(filt, ((p1 << 1) + p0 + q1 + 2) >> 2, p0),
    )
    out_p[..., 1] = np.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    out_p[..., 2] = np.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    out_q[..., 0] = np.where(
        sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
        np.where(filt, ((q1 << 1) + q0 + p1 + 2) >> 2, q0),
    )
    out_q[..., 1] = np.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
    out_q[..., 2] = np.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)
    return out_p, out_q


def filter_edge(plane, x, y, vertical, length, bs, qp_avg, chroma,
                offset_a=0, offset_b=0) -> None:
    """Filter one edge of `length` sample lines in place.

    (x, y): position of the first q-side sample (the edge lies between
    x-1|x for vertical, y-1|y for horizontal). bs: (length,) per-line
    boundary strengths (norm derives bS per 4-line group; pass expanded).
    """
    idx_a = int(np.clip(qp_avg + offset_a, 0, 51))
    idx_b = int(np.clip(qp_avg + offset_b, 0, 51))
    alpha = int(ALPHA[idx_a])
    beta = int(BETA[idx_b])
    if alpha == 0 or beta == 0 or not bs.any():
        return
    if vertical:
        p = plane[y : y + length, x - 4 : x][:, ::-1].astype(np.int32)
        q = plane[y : y + length, x : x + 4].astype(np.int32)
    else:
        p = plane[y - 4 : y, x : x + length][::-1].T.astype(np.int32)
        q = plane[y : y + 4, x : x + length].T.astype(np.int32)
    tc0 = TC0[np.clip(bs, 1, 3) - 1, idx_a]
    strong = bs == 4
    np_, nq_ = _filter_line_normal(p, q, bs, alpha, beta, tc0, chroma)
    sp_, sq_ = _filter_line_strong(p, q, alpha, beta, chroma)
    outp = np.where(strong[:, None], sp_, np_)
    outq = np.where(strong[:, None], sq_, nq_)
    if vertical:
        plane[y : y + length, x - 4 : x] = outp[:, ::-1]
        plane[y : y + length, x : x + 4] = outq
    else:
        plane[y - 4 : y, x : x + length] = outp.T[::-1]
        plane[y : y + 4, x : x + length] = outq.T
