"""Fully-device I-frame encode: modes → wavefront recon → slice entropy.

One jitted program per frame geometry covering everything the reference's
I-frame hot loop does (rbsp_encoding.cpp:175-305): whole-frame Intra_16x16
mode decision (the exact-QP generalization of intra_kernels.cl:308-335),
exact 3-plane wavefront reconstruction, and the whole slice's
macroblock_layer bits packed on device (codec/tpu_entropy.py). The host
reads back only the packed payload (content-sized — hundreds of KB at
1080p, not the ~16 MB of level arrays the round-1 path moved) and inserts
emulation-prevention bytes; reconstruction and per-MB syntax state stay
device-resident for the next frame.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..kernels.wavefront import wavefront_i16_frame
from ..ops.intra import INTRA16_TO_CHROMA_MODE
from .tpu_entropy import i16_slice_entropy
from .tpu_intra import intra_mode_decision


@functools.partial(jax.jit, static_argnames=("wmb", "hmb", "qp", "qpc"))
def device_i16_frame(y, cb, cr, wmb: int, hmb: int, qp: int, qpc: int):
    """y/cb/cr: uint8 or int32 source planes (device). Returns dict with
    recon planes, entropy payload words/nbits, and per-MB syntax state."""
    y = y.astype(jnp.int32)
    cb = cb.astype(jnp.int32)
    cr = cr.astype(jnp.int32)
    out = intra_mode_decision(
        y, wmb=wmb, hmb=hmb, qp=qp, modes_only=True, i16_only=True)
    m16 = out["mode16"]
    cmode = jnp.asarray(INTRA16_TO_CHROMA_MODE)[m16]
    (recon_y, i16dc, i16ac, recon_cb, recon_cr, cdc, cac) = \
        wavefront_i16_frame(y, cb, cr, m16, cmode,
                            wmb=wmb, hmb=hmb, qp=qp, qpc=qpc)
    ent = i16_slice_entropy(m16, cmode, i16dc, i16ac, cdc, cac,
                            wmb=wmb, hmb=hmb)
    nz_luma = i16ac.any(axis=2) | i16dc.any(axis=1)[:, None]
    return {
        "recon_y": recon_y,
        "recon_cb": recon_cb,
        "recon_cr": recon_cr,
        "nz_luma": nz_luma,
        **ent,
    }


@functools.partial(jax.jit, static_argnames=())
def frame_sad(a, b):
    """Whole-frame SAD for the scene-cut IDR decision on device
    (selectNALUnitType / subtractFramesCL analog)."""
    return jnp.abs(a.astype(jnp.int64) - b.astype(jnp.int64)).sum()
