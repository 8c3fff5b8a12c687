"""Batched device-side CAVLC symbol/size computation (norm 9.2).

The TPU counterpart of the scalar host codec in ops/cavlc.py (reference
residual_block_cavlc_write/_size, residual.cpp:374-957): every quantity is
computed for ALL blocks of a frame at once with vector ops; the only
sequential structure is the norm's own per-coefficient adaptive state
(suffixLength, zerosLeft), unrolled over the static 16-coefficient depth.

Key structural fact exploited by the encoder wavefront: of a block's bits,
ONLY the coeff_token length depends on nC (the neighbor TotalCoeff
context). Everything else — trailing-one signs, level prefix/suffix,
total_zeros, run_before — is a pure function of the level list. So the
expensive part runs embarrassingly parallel over all blocks here, and the
wavefront (which resolves nC and the Intra_4x4-vs-16x16 arbitration)
only gathers precomputed per-context token lengths.

Symbol stream layout (fixed slots per block, for the prefix-scan packer):
  slot 0        coeff_token        (filled by the caller once nC is known)
  slot 1        trailing-one signs (fused: t1 bits)
  slots 2..L+1  level codes        (fused prefix+stop+suffix, ≤28 bits)
  slot L+2      total_zeros
  slots L+3..   run_before         (L-1 slots)
Total 2L+3 slots; empty slots have length 0.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .cavlc_tables import (
    COEFF_TOKEN_BITS,
    COEFF_TOKEN_LEN,
    RUN_BEFORE_BITS,
    RUN_BEFORE_LEN,
    TOTAL_ZEROS_BITS,
    TOTAL_ZEROS_CDC_BITS,
    TOTAL_ZEROS_CDC_LEN,
    TOTAL_ZEROS_LEN,
)


def nc_to_ctx(nc):
    """nC → coeff_token table context (Table 9-5 columns); nc >= 0."""
    return (
        jnp.where(nc < 2, 0, 0)
        + jnp.where(nc >= 2, 1, 0)
        + jnp.where(nc >= 4, 1, 0)
        + jnp.where(nc >= 8, 1, 0)
    )


def ue_bits(v):
    """Bit length of ue(v): 2*floor(log2(v+1)) + 1."""
    # v < 2^31; bit_length via float log2 is unsafe — use integer compare sum
    vv = (v + 1).astype(jnp.uint32)
    nb = jnp.zeros(v.shape, jnp.int32)
    for k in range(1, 32):
        nb = nb + (vv >= jnp.uint32(1 << k)).astype(jnp.int32)
    return 2 * nb + 1


def ue_code(v):
    """(value, length) of ue(v) as one fused symbol: leading zeros, stop
    bit, then the binary remainder — value = v + 1 in `length` bits."""
    return v + 1, ue_bits(v)


def se_bits(v):
    """Bit length of se(v) (signed Exp-Golomb)."""
    u = jnp.where(v > 0, 2 * v - 1, -2 * v)
    return ue_bits(u)


def se_code(v):
    u = jnp.where(v > 0, 2 * v - 1, -2 * v)
    return ue_code(u)


def block_symbols_bulk(levels, max_num_coeff: int, sizes_only: bool = False):
    """Per-block CAVLC symbols and sizes for a batch of blocks.

    levels: (..., L) int32 zig-zag coefficient lists, L = levels.shape[-1].
    max_num_coeff: the maxNumCoeff of this block kind (16/15/4); chroma-DC
    (4) selects the chroma total_zeros table, like the reference's nC == -1.

    Returns dict:
      tc        (...,)   TotalCoeff
      t1        (...,)   TrailingOnes
      rest_bits (...,)   all bits except coeff_token
      ct_len    (..., 5) coeff_token length per nC context
      ct_val    (..., 5) coeff_token codeword per nC context
      vals/lens (..., 2L+3) fused symbol stream (slot 0 zeroed);
                omitted when sizes_only (the mode-decision wavefront only
                needs bit counts — coded_mb_size, rbsp_encoding.cpp:330)
    """
    L = levels.shape[-1]
    chroma_dc = max_num_coeff == 4
    lead = levels.shape[:-1]
    pos = jnp.arange(L, dtype=jnp.int32)
    nz = levels != 0
    nzi = nz.astype(jnp.int32)
    tc = nzi.sum(axis=-1)

    # nonzero values/positions in reverse-scan (high-frequency-first)
    # order. Rank of nonzero i from the top = #nonzeros at positions > i;
    # a one-hot contraction beats a sort on the VPU.
    rank = tc[..., None] - jnp.cumsum(nzi, axis=-1)  # (..., L)
    onehot = (
        (rank[..., None] == jnp.arange(L)) & nz[..., None]
    ).astype(jnp.int32)  # (..., L, Lrev)
    rev_vals = (levels[..., None] * onehot).sum(axis=-2)
    rev_pos = (pos[:, None] * onehot).sum(axis=-2)
    k_arange = jnp.arange(L, dtype=jnp.int32)
    valid = k_arange < tc[..., None]

    # trailing ones: run of |level| == 1 from the top, capped at 3
    ones = (jnp.abs(rev_vals) == 1) & valid
    t1 = jnp.cumprod(ones[..., :3].astype(jnp.int32), axis=-1).sum(axis=-1)

    # coeff_token per context (gather over the 5-ctx axis)
    ctl = jnp.asarray(COEFF_TOKEN_LEN)  # (5, 17, 4)
    ctb = jnp.asarray(COEFF_TOKEN_BITS)
    ct_len = ctl[:, tc, t1]  # (5, ...)
    ct_val = ctb[:, tc, t1]
    ct_len = jnp.moveaxis(ct_len, 0, -1)  # (..., 5)
    ct_val = jnp.moveaxis(ct_val, 0, -1)

    # columns are accumulated in Python lists and stacked once at the end
    # (a .at[..., slot].set per step materializes a full copy each time)
    vcols: list = []
    lcols: list = []
    bits_acc = jnp.zeros(lead, jnp.int32)

    # --- trailing one signs (fused into one symbol of t1 bits) ----------
    bits_acc = bits_acc + t1
    if not sizes_only:
        zero = jnp.zeros(lead, jnp.int32)
        vcols.append(zero)  # slot 0: coeff_token (finalize_symbols)
        lcols.append(zero)
        sign = (rev_vals < 0).astype(jnp.int32)
        t1_val = jnp.zeros(lead, jnp.int32)
        for k in range(3):
            in_t1 = k < t1
            # bit k sits at position (t1-1-k) from the LSB
            shift = jnp.maximum(t1 - 1 - k, 0)
            t1_val = t1_val + jnp.where(in_t1, sign[..., k] << shift, 0)
        vcols.append(t1_val)
        lcols.append(t1)

    # --- level codes (adaptive suffixLength fold, unrolled over L) ------
    suffix_len = jnp.where((tc > 10) & (t1 < 3), 1, 0).astype(jnp.int32)
    for i in range(L):
        active = (i >= t1) & (i < tc)
        lv = rev_vals[..., i]
        code = jnp.where(lv > 0, 2 * lv - 2, -2 * lv - 1)
        code = code - 2 * ((t1 == i) & (t1 < 3)).astype(jnp.int32)
        sl = suffix_len
        # suffix_len == 0 branch
        p0 = jnp.where(code < 14, code, jnp.where(code < 30, 14, 15))
        s0 = jnp.where(code < 14, 0, jnp.where(code < 30, 4, 12))
        u0 = jnp.where(code < 14, 0,
                       jnp.where(code < 30, code - 14, code - 30))
        # suffix_len > 0 branch
        pr = code >> sl
        px = jnp.minimum(pr, 15)
        sx = jnp.where(pr < 15, sl, 12)
        ux = jnp.where(pr < 15, code & ((1 << sl) - 1), code - (15 << sl))
        prefix = jnp.where(sl == 0, p0, px)
        ssize = jnp.where(sl == 0, s0, sx)
        length = prefix + 1 + ssize
        bits_acc = bits_acc + jnp.where(active, length, 0)
        if not sizes_only:
            suffix = jnp.where(sl == 0, u0, ux)
            value = (1 << ssize) | suffix
            vcols.append(jnp.where(active, value, 0))
            lcols.append(jnp.where(active, length, 0))
        sl1 = jnp.maximum(sl, 1)
        grow = (jnp.abs(lv) > (3 << (sl1 - 1))) & (sl1 < 6)
        sl2 = sl1 + grow.astype(jnp.int32)
        suffix_len = jnp.where(active, sl2, suffix_len)

    # --- total_zeros -----------------------------------------------------
    total_zeros = jnp.where(tc > 0, rev_pos[..., 0] + 1 - tc, 0)
    if chroma_dc:
        tzl = jnp.asarray(TOTAL_ZEROS_CDC_LEN)
        tzb = jnp.asarray(TOTAL_ZEROS_CDC_BITS)
    else:
        tzl = jnp.asarray(TOTAL_ZEROS_LEN)
        tzb = jnp.asarray(TOTAL_ZEROS_BITS)
    tz_active = (tc > 0) & (tc < max_num_coeff)
    tzi = jnp.clip(tc - 1, 0, tzl.shape[0] - 1)
    tzj = jnp.clip(total_zeros, 0, tzl.shape[1] - 1)
    bits_acc = bits_acc + jnp.where(tz_active, tzl[tzi, tzj], 0)
    if not sizes_only:
        vcols.append(jnp.where(tz_active, tzb[tzi, tzj], 0))
        lcols.append(jnp.where(tz_active, tzl[tzi, tzj], 0))

    # --- run_before (zerosLeft fold, unrolled over L-1) -------------------
    rbl = jnp.asarray(RUN_BEFORE_LEN)  # (6, 7)
    rbb = jnp.asarray(RUN_BEFORE_BITS)
    zeros_left = total_zeros
    for k in range(L - 1):
        active = (k <= tc - 2) & (zeros_left > 0)
        run = rev_pos[..., k] - rev_pos[..., k + 1] - 1
        run = jnp.where(active, run, 0)
        esc = zeros_left > 6
        v_esc = jnp.where(run < 7, 7 - run, 1)
        l_esc = jnp.where(run < 7, 3, run - 3)
        zi = jnp.clip(zeros_left - 1, 0, 5)
        ri = jnp.clip(run, 0, 6)
        length = jnp.where(esc, l_esc, rbl[zi, ri])
        bits_acc = bits_acc + jnp.where(active, length, 0)
        if not sizes_only:
            value = jnp.where(esc, v_esc, rbb[zi, ri])
            vcols.append(jnp.where(active, value, 0))
            lcols.append(jnp.where(active, length, 0))
        zeros_left = jnp.where(active, zeros_left - run, zeros_left)

    out = {
        "tc": tc,
        "t1": t1,
        "rest_bits": bits_acc,
        "ct_len": ct_len,
        "ct_val": ct_val,
    }
    if not sizes_only:
        out["vals"] = jnp.stack(vcols, axis=-1)
        out["lens"] = jnp.stack(lcols, axis=-1)
    return out


def finalize_symbols(blk, ctx):
    """Fill slot 0 with the coeff_token for the resolved nC contexts.

    blk: output of block_symbols_bulk; ctx: (...,) int32 in 0..4.
    Returns (vals, lens) with all slots final.
    """
    ct_val = jnp.take_along_axis(blk["ct_val"], ctx[..., None], axis=-1)[..., 0]
    ct_len = jnp.take_along_axis(blk["ct_len"], ctx[..., None], axis=-1)[..., 0]
    vals = blk["vals"].at[..., 0].set(ct_val)
    lens = blk["lens"].at[..., 0].set(ct_len)
    return vals, lens


# ---------------------------------------------------------------------------
# Prefix-scan bit packing: (value, length) symbol streams → packed bytes.


def pack_symbols(vals, lens, nw: int | None = None):
    """Pack a flat symbol stream into a uint32 big-endian word array.

    vals/lens: (n,) int32, each value in `length` bits (MSB-first), zero
    lengths skipped. Returns (words uint32 (nw,), total_bits).

    Strategy (XLA-native, no sequential bit cursor and NO scatter — TPU
    scatters serialize): an exclusive prefix scan of lengths gives every
    symbol's absolute bit offset; each symbol's value splits into a `hi`
    part for its word and a `lo` spill into the next word. Offsets are
    monotone, so the symbols landing in output word w form a contiguous
    index range, and because the packed bit ranges are disjoint the word
    value is their exact integer sum (< 2^32). Each word is therefore a
    difference of mod-2^32 prefix sums of hi/lo over a searchsorted-found
    segment — all cumsum + gather, which the VPU streams.

    nw: static output capacity in words. Bits past 32*nw are silently
    dropped — callers must check total_bits <= 32*nw and retry at a
    larger capacity (the default is the worst case, which never drops).
    """
    n = vals.shape[0]
    if nw is None:
        nw = (n * 28) // 32 + 3
    lens = lens.astype(jnp.int32)
    csum = jnp.cumsum(lens)  # inclusive prefix scan
    off = csum - lens
    total = csum[-1] if n else jnp.int32(0)
    bit = off & 31  # bit position of symbol MSB within word (from MSB side)
    v = vals.astype(jnp.uint32)
    # left-aligned 64-bit value split into two 32-bit halves:
    # value occupies bits [bit, bit+len) from the word's MSB
    sh_hi = 32 - bit - lens  # may be negative
    hi = jnp.where(
        sh_hi >= 0,
        v << jnp.maximum(sh_hi, 0).astype(jnp.uint32),
        v >> jnp.minimum(-sh_hi, 31).astype(jnp.uint32),
    ).astype(jnp.uint32)
    lo_sh = ((64 - bit - lens) & 31).astype(jnp.uint32)
    lo = jnp.where(sh_hi < 0, v << lo_sh, jnp.uint32(0)).astype(jnp.uint32)
    active = lens > 0
    zero32 = jnp.zeros((1,), jnp.uint32)
    p_hi = jnp.concatenate([zero32, jnp.cumsum(jnp.where(active, hi, 0))])
    p_lo = jnp.concatenate([zero32, jnp.cumsum(jnp.where(active, lo, 0))])
    # ends[w] = #symbols with offset < 32*(w+1)  (i.e. whose word <= w)
    wq = 32 * (jnp.arange(nw, dtype=jnp.int32) + 1)
    ends = jnp.searchsorted(off, wq, side="left").astype(jnp.int32)
    e1 = jnp.concatenate([jnp.zeros(1, jnp.int32), ends[:-1]])  # ends[w-1]
    e2 = jnp.concatenate([jnp.zeros(2, jnp.int32), ends[:-2]])  # ends[w-2]
    # hi parts of symbols in word w: indices [ends[w-1], ends[w]);
    # lo spills into word w come from symbols in word w-1: [e2, e1)
    words = (p_hi[ends] - p_hi[e1]) + (p_lo[e1] - p_lo[e2])
    return words, total


def words_to_bytes(words: np.ndarray, total_bits: int) -> bytes:
    """Host-side: big-endian words → byte string of ceil(total_bits/8)."""
    nbytes = (int(total_bits) + 7) // 8
    return np.asarray(words, ">u4").tobytes()[:nbytes]
