"""Pallas TPU kernel: fused forward 4x4 transform + quantization (+SATD).

Layout: coefficient-planar — blocks are held as 16 coefficient planes of
shape (N,), so every butterfly/quant step is elementwise across N lanes
(VPU 8x128 sublane/lane shape; N is padded to a lane multiple). This is
the idiomatic TPU layout for 4x4-block math: the 4x4 transform becomes 16
linear combinations of 16 planes, with no sub-lane shuffles.

The XLA path (ops/transform.py under jit) already fuses well; this kernel
exists for the tight fused loop (transform+quant+|.|+reduce in one VMEM
pass) and as the template for the round-2 wavefront/CAVLC kernels. Both
paths are bit-identical (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..ops.tables import LEVEL_QUANTIZE

# forward transform weight matrix (ops/transform.py _FWD_W)
_W = np.array(
    [
        [256, 256, 256, 256],
        [416, 208, -208, -416],
        [256, -256, -256, 256],
        [208, -416, 416, -208],
    ],
    dtype=np.int64,
)


def _fwd_quant_planes(planes, qp: int, dc_bypass: bool):
    """planes: (16, n) int32 coefficient-planar blocks (row-major 4x4).
    Returns quantized planes (16, n). Pure jnp — usable inside Pallas."""
    h = [jnp.where(p == 0, 0, (p << 6) - 32) for p in planes]

    # column pass: f[i][j] = sum_k W[i][k] * h[k][j]  (rows of the 4x4)
    def rowcomb(vs, w):
        acc = vs[0] * int(w[0])
        for k in range(1, 4):
            acc = acc + vs[k] * int(w[k])
        return (acc + 512) >> 10

    f = [None] * 16
    for j in range(4):  # column index
        col = [h[0 * 4 + j], h[1 * 4 + j], h[2 * 4 + j], h[3 * 4 + j]]
        for i in range(4):
            f[i * 4 + j] = rowcomb(col, _W[i])
    d = [None] * 16
    for i in range(4):
        row = [f[i * 4 + 0], f[i * 4 + 1], f[i * 4 + 2], f[i * 4 + 3]]
        for j in range(4):
            d[i * 4 + j] = rowcomb(row, _W[j])

    lq = LEVEL_QUANTIZE[qp % 6].reshape(16)
    if qp < 24:
        qbits = 4 - qp // 6
        adjust = 1 << (3 - qp // 6)
        q = [
            (((d[k] << qbits) - adjust) * int(lq[k]) + 16384) >> 15
            for k in range(16)
        ]
    else:
        qbits = qp // 6 - 4
        q = [((d[k] >> qbits) * int(lq[k]) + 16384) >> 15 for k in range(16)]
    if dc_bypass:
        q[0] = d[0]
    return q


def _kernel_fwd_quant(x_ref, out_ref, *, qp: int, dc_bypass: bool):
    planes = [x_ref[k, :] for k in range(16)]
    q = _fwd_quant_planes(planes, qp, dc_bypass)
    for k in range(16):
        out_ref[k, :] = q[k]


def _kernel_satd(x_ref, out_ref, *, qp: int):
    planes = [x_ref[k, :] for k in range(16)]
    q = _fwd_quant_planes(planes, qp, False)
    acc = jnp.abs(q[0])
    for k in range(1, 16):
        acc = acc + jnp.abs(q[k])
    out_ref[:] = acc


def _to_planar(blocks):
    """(N, 4, 4) → (16, Npad) with lane padding."""
    n = blocks.shape[0]
    npad = -(-n // 128) * 128
    planar = blocks.reshape(n, 16).T
    return jnp.pad(planar, ((0, 0), (0, npad - n))), n


@functools.partial(jax.jit, static_argnames=("qp", "dc_bypass", "interpret"))
def fwd_quant_pallas(blocks, qp: int, dc_bypass: bool = False,
                     interpret: bool = False):
    """Forward transform + quantize (N, 4, 4) int32 blocks via Pallas."""
    planar, n = _to_planar(blocks)
    out = pl.pallas_call(
        functools.partial(_kernel_fwd_quant, qp=qp, dc_bypass=dc_bypass),
        out_shape=jax.ShapeDtypeStruct(planar.shape, jnp.int32),
        interpret=interpret,
    )(planar)
    return out[:, :n].T.reshape(n, 4, 4)


@functools.partial(jax.jit, static_argnames=("qp", "interpret"))
def satd_pallas(diff_blocks, qp: int, interpret: bool = False):
    """Fused SATD (Σ|quantized transformed diff|) per block."""
    planar, n = _to_planar(diff_blocks)
    out = pl.pallas_call(
        functools.partial(_kernel_satd, qp=qp),
        out_shape=jax.ShapeDtypeStruct((planar.shape[1],), jnp.int32),
        interpret=interpret,
    )(planar)
    return out[:n]
