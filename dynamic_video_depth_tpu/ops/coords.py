"""Pixel coordinate grids.

The reference builds an (x, y, 1) homogeneous pixel grid where x is the
column index and y the row index (reference: losses/scene_flow_projection.py:31-34).
We generate the same grid channel-last and let XLA constant-fold it inside
jit, so there is no cached buffer state.
"""

import jax.numpy as jnp


def pixel_coords(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Return a ``[H, W, 2]`` grid of (x, y) pixel coordinates."""
    xx = jnp.arange(w, dtype=dtype)[None, :].repeat(h, axis=0)
    yy = jnp.arange(h, dtype=dtype)[:, None].repeat(w, axis=1)
    return jnp.stack([xx, yy], axis=-1)


def pixel_coords_homogeneous(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Return a ``[H, W, 3]`` grid of (x, y, 1) homogeneous pixel coordinates."""
    xy = pixel_coords(h, w, dtype)
    ones = jnp.ones((h, w, 1), dtype=dtype)
    return jnp.concatenate([xy, ones], axis=-1)
