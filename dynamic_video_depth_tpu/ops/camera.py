"""Camera pytree and conversion from the reference's packed pose format.

The reference's preprocessed datafiles store row-vector convention matrices:
``R = R_c2w.T``, ``R_T = R_c2w``, ``K = K.T``, ``K_inv = inv(K).T`` shaped
``[1, 1, 1, 3, 3]`` and ``t`` shaped ``[1, 1, 1, 1, 3]`` so that points can be
multiplied as row vectors (reference: scripts/preprocess/davis/
generate_sequence_midas.py:49-87, datasets/davis_sequence.py:136-151).

Internally we store plain column-vector matrices ``R_c2w [B, 3, 3]``,
``t [B, 3]``, ``K [B, 3, 3]``, ``K_inv [B, 3, 3]`` and use einsum; this keeps
the math readable and lets XLA pick layouts freely.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    """A camera-to-world pose plus intrinsics, batched ``[B, ...]``."""

    R_c2w: jnp.ndarray  # [B, 3, 3]
    t: jnp.ndarray      # [B, 3]
    K: jnp.ndarray      # [B, 3, 3]
    K_inv: jnp.ndarray  # [B, 3, 3]


def camera_from_packed(R, t, K, K_inv) -> Camera:
    """Build a :class:`Camera` from the reference's packed (transposed) format.

    Accepts the exact shapes found in the packed batches — ``R``/``K``/
    ``K_inv`` as ``[B, 1, 1, 3, 3]`` (or ``[B, 1, 3, 3]``/``[B, 3, 3]``)
    holding *transposed* matrices, and ``t`` as ``[B, 1, 1, 1, 3]`` (or any
    shape reducible to ``[B, 3]``).
    """
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    K = jnp.asarray(K)
    K_inv = jnp.asarray(K_inv)

    R = _as_b33(R)
    K = _as_b33(K)
    K_inv = _as_b33(K_inv)
    t = t.reshape(t.shape[0], -1)[:, :3] if t.ndim > 2 else t.reshape(-1, 3)

    # Packed matrices are transposed for row-vector multiplication; undo it.
    return Camera(
        R_c2w=jnp.swapaxes(R, -1, -2),
        t=t,
        K=jnp.swapaxes(K, -1, -2),
        K_inv=jnp.swapaxes(K_inv, -1, -2),
    )


def packed_from_camera(cam: Camera):
    """Inverse of :func:`camera_from_packed` (for writing reference-format files)."""
    b = cam.R_c2w.shape[0]
    R = jnp.swapaxes(cam.R_c2w, -1, -2).reshape(b, 1, 1, 3, 3)
    R_T = cam.R_c2w.reshape(b, 1, 1, 3, 3)
    K = jnp.swapaxes(cam.K, -1, -2).reshape(b, 1, 1, 3, 3)
    K_inv = jnp.swapaxes(cam.K_inv, -1, -2).reshape(b, 1, 1, 3, 3)
    t = cam.t.reshape(b, 1, 1, 1, 3)
    return R, R_T, t, K, K_inv


def _as_b33(m: jnp.ndarray) -> jnp.ndarray:
    if m.ndim == 2:
        m = m[None]
    return m.reshape(m.shape[0], 3, 3)
