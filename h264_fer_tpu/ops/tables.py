"""Constant spec tables for the H.264 Baseline transform/quant/syntax path.

All tables are re-derivations of the H.264 norm tables that the reference
implements (quantizationTransform.cpp:12-32, scaleTransform.cpp:32-52,
inttransform.cpp:8-14, h264_globals.cpp:25-214). They are defined here as
NumPy int32 arrays; JAX code converts on use.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Zig-zag scan (norm 8.5.6; reference scaleTransform.cpp:43-47).
# ZIGZAG_FLAT[i] = raster index (4*row+col) of the i-th coefficient in
# zig-zag order.
ZIGZAG_YX = np.array(
    [
        [0, 0], [0, 1], [1, 0], [2, 0], [1, 1], [0, 2], [0, 3], [1, 2],
        [2, 1], [3, 0], [3, 1], [2, 2], [1, 3], [2, 3], [3, 2], [3, 3],
    ],
    dtype=np.int32,
)
ZIGZAG_FLAT = (ZIGZAG_YX[:, 0] * 4 + ZIGZAG_YX[:, 1]).astype(np.int32)
# Inverse: INV_ZIGZAG_FLAT[raster] = zig-zag position of that raster coeff.
INV_ZIGZAG_FLAT = np.argsort(ZIGZAG_FLAT).astype(np.int32)

# ---------------------------------------------------------------------------
# Dequant scale table LevelScale[qP%6][i][j] = 16 * normAdjust(m, i, j)
# (norm 8.5.12.1 with weightScale==16; reference scaleTransform.cpp:32-40).
_V = np.array(
    [[10, 16, 13], [11, 18, 14], [13, 20, 16],
     [14, 23, 18], [16, 25, 20], [18, 29, 23]],
    dtype=np.int32,
)


def _norm_adjust_table() -> np.ndarray:
    t = np.zeros((6, 4, 4), dtype=np.int32)
    for m in range(6):
        for i in range(4):
            for j in range(4):
                if i % 2 == 0 and j % 2 == 0:
                    t[m, i, j] = _V[m, 0]
                elif i % 2 == 1 and j % 2 == 1:
                    t[m, i, j] = _V[m, 1]
                else:
                    t[m, i, j] = _V[m, 2]
    return t


LEVEL_SCALE = 16 * _norm_adjust_table()  # (6, 4, 4) int32

# ---------------------------------------------------------------------------
# Encoder-side quantization multiplier table (reference
# quantizationTransform.cpp:24-32: "round(reciprocal >> 15)" of LevelScale).
# LevelQuantize[m][i][j] = round(2^22 / LevelScale[m][i][j]) >> 7  — the
# reference stores the literal table; we regenerate it and assert equality
# against the documented values in tests.
LEVEL_QUANTIZE = np.array(
    [
        [[205, 158, 205, 158], [158, 128, 158, 128],
         [205, 158, 205, 158], [158, 128, 158, 128]],
        [[186, 146, 186, 146], [146, 114, 146, 114],
         [186, 146, 186, 146], [146, 114, 146, 114]],
        [[158, 128, 158, 128], [128, 102, 128, 102],
         [158, 128, 158, 128], [128, 102, 128, 102]],
        [[146, 114, 146, 114], [114, 89, 114, 89],
         [146, 114, 146, 114], [114, 89, 114, 89]],
        [[128, 102, 128, 102], [102, 82, 102, 82],
         [128, 102, 128, 102], [102, 82, 102, 82]],
        [[114, 89, 114, 89], [89, 71, 89, 71],
         [114, 89, 114, 89], [89, 71, 89, 71]],
    ],
    dtype=np.int32,
)

# ---------------------------------------------------------------------------
# Chroma QP mapping (norm Table 8-15; reference inttransform.cpp:8-14).
QPI_TO_QPC = np.array(
    [0, 1, 2, 3, 4, 5, 6, 7,
     8, 9, 10, 11, 12, 13, 14, 15,
     16, 17, 18, 19, 20, 21, 22, 23,
     24, 25, 26, 27, 28, 29, 29, 30,
     31, 32, 32, 33, 34, 34, 35, 35,
     36, 36, 37, 37, 37, 38, 38, 38,
     39, 39, 39, 39],
    dtype=np.int32,
)

# ---------------------------------------------------------------------------
# Intra 4x4 block scan order: Intra4x4ScanOrder[blkIdx] = (x, y) pixel offset
# of the 4x4 block inside the macroblock (reference h264_globals.cpp:209-214).
# Ordering: Z-order over the four 8x8 quadrants, Z-order inside each.
INTRA4X4_SCAN_ORDER_XY = np.array(
    [
        [0, 0], [4, 0], [0, 4], [4, 4],
        [8, 0], [12, 0], [8, 4], [12, 4],
        [0, 8], [4, 8], [0, 12], [4, 12],
        [8, 8], [12, 8], [8, 12], [12, 12],
    ],
    dtype=np.int32,
)
# raster(row-major in 4x4-block units) -> zig/Z-scan block index
# (reference h264_globals.cpp:200-206 `to_4x4_luma_block`).
RASTER_TO_LUMA_BLOCK = np.array(
    [0, 1, 4, 5,
     2, 3, 6, 7,
     8, 9, 12, 13,
     10, 11, 14, 15],
    dtype=np.int32,
)

# ---------------------------------------------------------------------------
# CBP <-> codeNum mapping, ChromaArrayType==1 (norm Table 9-4; reference
# h264_globals.cpp:140-169).
CODENUM_TO_CBP_INTRA = np.array(
    [47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
     16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
     8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41],
    dtype=np.int32,
)
CODENUM_TO_CBP_INTER = np.array(
    [0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
     14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
     17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41],
    dtype=np.int32,
)
CBP_TO_CODENUM_INTRA = np.argsort(CODENUM_TO_CBP_INTRA).astype(np.int32)
CBP_TO_CODENUM_INTER = np.argsort(CODENUM_TO_CBP_INTER).astype(np.int32)

# ---------------------------------------------------------------------------
# Macroblock type enums. The reference encodes these as named constants used
# by spec tables 7-11/7-13/7-17 (h264_globals.h / h264_globals.cpp:25-132).
# We follow the norm's numeric mb_type ranges directly:
#   I slices:   mb_type 0 = I_4x4; 1..24 = I_16x16_<pred><cbpc><cbpl>; 25 = I_PCM
#   P slices:   mb_type 0..4 = P_L0_16x16, P_L0_L0_16x8, P_L0_L0_8x16,
#               P_8x8, P_8x8ref0; in a P slice the I types appear offset by 5.
# Internally we use a unified code: 0..4 inter, 5 = I_4x4, 6..30 = I_16x16+n,
# 31 = P_Skip sentinel.
MB_P_16x16 = 0
MB_P_16x8 = 1
MB_P_8x16 = 2
MB_P_8x8 = 3
MB_P_8x8REF0 = 4
MB_I_4X4 = 5
MB_I_16X16_BASE = 6  # unified code 6+n for I_16x16 variant n (n in 0..23)
MB_P_SKIP = 31

# Sub-macroblock types for P_8x8 (norm Table 7-17): width/height per type.
SUB_MB_PART_WH = np.array(
    [[8, 8], [8, 4], [4, 8], [4, 4]], dtype=np.int32
)  # sub_mb_type 0..3
SUB_MB_NUM_PARTS = np.array([1, 2, 2, 4], dtype=np.int32)

# Intra16x16 mb_type decomposition (norm 7-11): for n = mb_type-1 in 0..23:
#   Intra16x16PredMode = n % 4
#   CodedBlockPatternChroma = (n // 4) % 3
#   CodedBlockPatternLuma = 15 if n >= 12 else 0


def i16_mb_type(pred_mode: int, cbp_chroma: int, cbp_luma15: bool) -> int:
    """I-slice mb_type (1..24) for an Intra_16x16 MB."""
    return 1 + pred_mode + 4 * cbp_chroma + (12 if cbp_luma15 else 0)
