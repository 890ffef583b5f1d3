"""Bilinear grid sampling with exact parity to the reference's warp.

The reference warps with ``F.grid_sample(..., align_corners=True,
padding_mode='border')`` on grids built as ``pixel_coord + flow`` normalized
to [-1, 1] (reference: losses/scene_flow_projection.py:212-220). With
align_corners=True the normalization round-trips exactly, so we sample
directly at un-normalized pixel coordinates. Border padding for bilinear
sampling is equivalent to clamping the continuous sample coordinate into
``[0, size-1]`` before interpolating, which is what we do — this also matches
torch's zero gradient w.r.t. the grid for out-of-range samples.

Implementation: one flattened gather per corner pair. XLA lowers this to TPU
gathers; the op is dominated by the 4 gathers + VPU lerps. A fused Pallas
version lives in ``ops.pallas`` for the hot loss path.
"""

import jax
import jax.numpy as jnp

from .coords import pixel_coords


def grid_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img`` at continuous pixel coordinates.

    Args:
      img: ``[B, H, W, C]`` source.
      coords: ``[B, H', W', 2]`` sample positions in pixel units ``(x, y)``.

    Returns:
      ``[B, H', W', C]`` bilinearly interpolated samples, border-clamped.
    """
    _, h, w, _ = img.shape

    x = jnp.clip(coords[..., 0], 0.0, w - 1.0)
    y = jnp.clip(coords[..., 1], 0.0, h - 1.0)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    # Corner weights from the *clamped* continuous coordinate.
    wx = x - x0
    wy = y - y0

    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    ix1 = jnp.minimum(ix0 + 1, w - 1)
    iy1 = jnp.minimum(iy0 + 1, h - 1)

    def gather_one(img_b, iy, ix):
        # img_b: [H, W, C]; iy/ix: [H', W'] int32
        flat = img_b.reshape(h * w, -1)
        idx = (iy * w + ix).reshape(-1)
        return jnp.take(flat, idx, axis=0).reshape(ix.shape + (img_b.shape[-1],))

    gather = jax.vmap(gather_one)

    v00 = gather(img, iy0, ix0)
    v01 = gather(img, iy0, ix1)
    v10 = gather(img, iy1, ix0)
    v11 = gather(img, iy1, ix1)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def backward_warp(buffer: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp ``buffer`` by ``flow`` (reference: BackwardWarp,
    losses/scene_flow_projection.py:281-307).

    Args:
      buffer: ``[B, H, W, C]``.
      flow: ``[B, H, W, 2]`` with channels ``(dx, dy)``.
    """
    _, h, w, _ = buffer.shape
    coords = pixel_coords(h, w, dtype=flow.dtype)[None] + flow
    return grid_sample(buffer, coords)
