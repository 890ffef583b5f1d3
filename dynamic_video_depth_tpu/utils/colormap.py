"""Depth pseudo-coloring (capability parity with reference
third_party/util_colormap.py + util/util_visualize.py:30-120).

Uses matplotlib's built-in 'turbo' colormap (same Google AI colormap the
reference vendors as a data table)."""

from __future__ import annotations

import numpy as np


def _turbo():
    try:
        import matplotlib

        return matplotlib.colormaps["turbo"]
    except Exception:
        import matplotlib.cm as cm

        return cm.get_cmap("viridis")


def normalize01(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float64)
    lo, hi = x.min(), x.max()
    return (x - lo) / (hi - lo + 1e-9)


def depth_to_image(depth: np.ndarray, invert: bool = True,
                   vmin: float | None = None, vmax: float | None = None) -> np.ndarray:
    """``[H, W]`` depth -> turbo-colored uint8 image of the (inverse) depth,
    matching the reference's inverse-depth convention
    (util/util_visualize.py:96-120)."""
    d = np.asarray(depth, np.float64)
    x = 1.0 / np.clip(d, 1e-8, None) if invert else d
    if vmin is None or vmax is None:
        x = normalize01(x)
    else:
        x = np.clip((x - vmin) / (vmax - vmin + 1e-9), 0, 1)
    rgba = _turbo()(x)
    return (rgba[..., :3] * 255).astype(np.uint8)
