"""Pure-function Fourier embedding matching ``models.blocks.PeriodicEmbed``
(reference: networks/blocks.py:19-34). Used by the fused scene-flow kernel
path where the MLP body runs in Pallas and the (cheap, elementwise)
embedding stays in XLA."""

from __future__ import annotations

import jax.numpy as jnp


def periodic_embed(x: jnp.ndarray, max_freq: int, n_freq: int,
                   linspace: bool = True) -> jnp.ndarray:
    """``[..., C] -> [..., C * (1 + 2 * n_freq)]`` with channel order
    ``[x, cos(f1 x)..cos(fN x), sin(f1 x)..sin(fN x)]`` (freq-major within
    each function block), identical to PeriodicEmbed."""
    if n_freq == 0:
        return x
    if linspace:
        freqs = jnp.linspace(1.0, max_freq + 1.0, n_freq).astype(x.dtype)
    else:
        freqs = (2.0 ** jnp.arange(n_freq)).astype(x.dtype)
    ang = x[..., None, :] * freqs[:, None]
    flat = x.shape[:-1] + (n_freq * x.shape[-1],)
    return jnp.concatenate(
        [x, jnp.cos(ang).reshape(flat), jnp.sin(ang).reshape(flat)], axis=-1
    )


def sceneflow_features(pts: jnp.ndarray, ts: jnp.ndarray | None,
                       n_freq_xyz: int, n_freq_t: int,
                       time_dependent: bool) -> jnp.ndarray:
    """Input features of SceneFlowFieldNet: ``concat([t_emb, xyz_emb], -1)``
    (reference: networks/sceneflow_field.py:43-53)."""
    xyz_emb = periodic_embed(pts, n_freq_xyz, n_freq_xyz) if n_freq_xyz else pts
    if not time_dependent:
        return xyz_emb
    t_emb = periodic_embed(ts, n_freq_t, n_freq_t) if n_freq_t else ts
    return jnp.concatenate([t_emb, xyz_emb], axis=-1)
