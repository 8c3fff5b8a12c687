"""Native extension vs pure-Python bit-identity."""

import numpy as np
import pytest

from h264_fer_tpu.bitstream import nal
from h264_fer_tpu.bitstream.bitio import BitWriter
from h264_fer_tpu.native import (
    bitpack_native,
    block_symbols_native,
    get_lib,
    insert_epb_native,
)
from h264_fer_tpu.ops import cavlc

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no native toolchain")


def test_block_symbols_bit_identical():
    rng = np.random.default_rng(11)
    for _ in range(800):
        maxc = int(rng.choice([4, 15, 16]))
        nc = -1 if maxc == 4 else int(rng.choice([0, 1, 2, 3, 5, 9]))
        levels = np.zeros(maxc, np.int64)
        nnz = int(rng.integers(0, maxc + 1))
        pos = rng.choice(maxc, nnz, replace=False)
        levels[pos] = rng.integers(-2000, 2000, nnz)
        levels[pos[levels[pos] == 0]] = 1
        py = cavlc.block_symbols(list(levels), nc, maxc)
        nat = block_symbols_native(levels, nc, maxc)
        assert py[0] == nat[0] and py[1] == nat[1]


def test_epb_bit_identical():
    rng = np.random.default_rng(12)
    for _ in range(300):
        data = bytes(rng.integers(0, 4, int(rng.integers(0, 64))).astype(np.uint8))
        # compare against the pure-python loop (bypass the native fast path)
        out = bytearray()
        zeros = 0
        for b in data:
            if zeros >= 2 and b <= 3:
                out.append(3)
                zeros = 0
            out.append(b)
            zeros = zeros + 1 if b == 0 else 0
        assert insert_epb_native(data) == bytes(out)


def test_bitpack_matches_bitwriter():
    rng = np.random.default_rng(13)
    lens = rng.integers(1, 25, 500).astype(np.uint8)
    vals = (rng.integers(0, 1 << 24, 500).astype(np.uint32)
            & ((1 << lens.astype(np.uint32)) - 1))
    w = BitWriter()
    for v, n in zip(vals, lens):
        w.write(int(v), int(n))
    nbits = w.bit_position
    w.write(0, (8 - nbits % 8) % 8)
    packed, bits = bitpack_native(vals, lens)
    assert bits == nbits
    assert packed == w.getvalue()
