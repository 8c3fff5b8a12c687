"""PPM frame dumps (reference toRGB/writeToPPM, fileIO.cpp:26-97).

The reference uses these for error-frame debugging; we keep the capability
for parity and debugging visualisation.
"""

from __future__ import annotations

import numpy as np


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """Full-range BT.601-style conversion as the reference implements it
    (fileIO.cpp:26-69), with 4:2:0 chroma upsampled by pixel doubling."""
    h, w = y.shape
    cbu = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)[:h, :w].astype(np.float64)
    cru = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)[:h, :w].astype(np.float64)
    yf = y.astype(np.float64)
    r = yf + 1.402 * (cru - 128.0)
    g = yf - 0.344136 * (cbu - 128.0) - 0.714136 * (cru - 128.0)
    b = yf + 1.772 * (cbu - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def write_ppm(path: str, y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> None:
    rgb = ycbcr_to_rgb(y, cb, cr)
    h, w, _ = rgb.shape
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(rgb.tobytes())
