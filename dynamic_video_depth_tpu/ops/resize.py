"""Image resizing with exact parity to torch's F.interpolate modes.

The reference uses three interpolation configurations:
- bilinear, align_corners=True  (FeatureFusionBlock upsample,
  third_party/midas_blocks.py:164-166; UpsamplingBilinear2d in the hourglass)
- bilinear, align_corners=False (MiDaS output conv Interpolate,
  third_party/midas_blocks.py:95-97; FCNUnet upsampling)
- bicubic, align_corners=True   (MiDaS optional input resize,
  third_party/MiDaS.py:222)

TPU-first design: separable 1-D interpolation expressed as two small dense
matrix contractions (``[H_out, H_in]`` and ``[W_out, W_in]``). For the
resolutions involved (<= 448) these matrices are tiny, constant-folded under
jit, run on the MXU, and — unlike gather-based resizing — have trivially
efficient transposes for the backward pass.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax.lax import Precision


@functools.lru_cache(maxsize=None)
def _linear_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """Dense ``[n_out, n_in]`` 1-D linear interpolation matrix."""
    if n_out == n_in:
        return np.eye(n_in, dtype=np.float32)
    i = np.arange(n_out, dtype=np.float64)
    if align_corners:
        src = i * (n_in - 1) / max(n_out - 1, 1)
    else:
        src = (i + 0.5) * n_in / n_out - 0.5
    src = np.clip(src, 0.0, n_in - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    w_hi = src - lo
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    mat[np.arange(n_out), lo] += 1.0 - w_hi
    mat[np.arange(n_out), hi] += w_hi
    return mat.astype(np.float32)


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel with torch's a=-0.75."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    out = np.where(
        ax <= 1,
        (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0),
    )
    return out


@functools.lru_cache(maxsize=None)
def _cubic_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """Dense ``[n_out, n_in]`` 1-D bicubic interpolation matrix (border
    replication at the edges, matching torch's clamped index access)."""
    if n_out == n_in:
        return np.eye(n_in, dtype=np.float32)
    i = np.arange(n_out, dtype=np.float64)
    if align_corners:
        src = i * (n_in - 1) / max(n_out - 1, 1)
    else:
        src = (i + 0.5) * n_in / n_out - 0.5
    lo = np.floor(src).astype(np.int64)
    frac = src - lo
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    for k in range(-1, 3):
        idx = np.clip(lo + k, 0, n_in - 1)
        w = _cubic_kernel(k - frac)
        np.add.at(mat, (np.arange(n_out), idx), w)
    return mat.astype(np.float32)


def _apply_separable(x: jnp.ndarray, mh: np.ndarray, mw: np.ndarray) -> jnp.ndarray:
    """Apply ``[H2, H]`` and ``[W2, W]`` matrices to ``[B, H, W, C]``."""
    mh_j = jnp.asarray(mh, dtype=x.dtype)
    mw_j = jnp.asarray(mw, dtype=x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh_j, x, precision=Precision.HIGHEST)
    x = jnp.einsum("ow,bhwc->bhoc", mw_j, x, precision=Precision.HIGHEST)
    return x


def resize_bilinear(x: jnp.ndarray, out_hw, align_corners: bool) -> jnp.ndarray:
    """Bilinearly resize ``[B, H, W, C]`` to ``out_hw = (H2, W2)``."""
    h2, w2 = out_hw
    _, h, w, _ = x.shape
    mh = _linear_matrix(h, h2, align_corners)
    mw = _linear_matrix(w, w2, align_corners)
    return _apply_separable(x, mh, mw)


def resize_bicubic(x: jnp.ndarray, out_hw, align_corners: bool) -> jnp.ndarray:
    """Bicubic-resize ``[B, H, W, C]`` to ``out_hw = (H2, W2)``."""
    h2, w2 = out_hw
    _, h, w, _ = x.shape
    mh = _cubic_matrix(h, h2, align_corners)
    mw = _cubic_matrix(w, w2, align_corners)
    return _apply_separable(x, mh, mw)


def upsample2x_bilinear(x: jnp.ndarray, align_corners: bool) -> jnp.ndarray:
    """2x bilinear upsampling of ``[B, H, W, C]``."""
    _, h, w, _ = x.shape
    return resize_bilinear(x, (2 * h, 2 * w), align_corners)
