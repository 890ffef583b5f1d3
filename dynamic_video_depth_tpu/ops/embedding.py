"""Pure-function Fourier embedding matching ``models.blocks.PeriodicEmbed``
(reference: networks/blocks.py:19-34). Used by the fused scene-flow kernel
path where the MLP body runs in Pallas and the (cheap, elementwise)
embedding stays in XLA."""

from __future__ import annotations

import functools

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


def _linspace_f32(start: float, stop: float, num: int):
    """Pure-numpy replica of ``jnp.linspace`` in float32
    (``start*(1-step) + stop*step`` with ``step = iota(div)/div`` and the
    endpoint appended exactly) — equal to within a few ulps of jax's; the only
    divergence is XLA's backend-dependent FMA contraction
    (tests/test_pallas_mlp.py pins the <=4-ulp match). Pure numpy so the
    embed-consts builder never launches eager device ops when first called
    under a jit trace."""
    import numpy as np

    start, stop = np.float32(start), np.float32(stop)
    if num == 1:
        return np.array([start], np.float32)
    div = num - 1
    step = np.arange(div, dtype=np.float32) / np.float32(div)
    out = start * (np.float32(1.0) - step) + stop * step
    return np.append(out, stop).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _embed_block(n_in: int, n_freq: int):
    """Linearized constants for one ``periodic_embed(x, n_freq, n_freq)``
    block: returns ``(F [n_in, width], raw, cos, sin [width])`` such that
    with ``ang = x @ F`` the embedding equals
    ``raw * ang + cos * cos(ang) + sin * sin(ang)`` column-wise. Every
    column of F has exactly one nonzero, so the dot adds only structural
    zeros and is bit-exact."""
    import numpy as np

    if n_freq == 0:
        return (np.eye(n_in, dtype=np.float32), np.ones(n_in, np.float32),
                np.zeros(n_in, np.float32), np.zeros(n_in, np.float32))
    freqs = _linspace_f32(1.0, n_freq + 1.0, n_freq)
    width = n_in * (1 + 2 * n_freq)
    F = np.zeros((n_in, width), np.float32)
    raw = np.zeros(width, np.float32)
    cosm = np.zeros(width, np.float32)
    sinm = np.zeros(width, np.float32)
    for c in range(n_in):
        F[c, c] = 1.0
        raw[c] = 1.0
    for i, f in enumerate(freqs):
        for c in range(n_in):  # freq-major within each function block
            col = n_in + i * n_in + c
            F[c, col] = f
            cosm[col] = 1.0
            col = n_in + (n_freq + i) * n_in + c
            F[c, col] = f
            sinm[col] = 1.0
    return F, raw, cosm, sinm


def sceneflow_embed_consts(n_freq_xyz: int, n_freq_t: int,
                           time_dependent: bool):
    """Constants that linearize ``sceneflow_features`` for the fused Pallas
    kernel (ops/pallas/mlp_kernel.py::fused_mlp_embed):

        ang  = pts @ f_xyz + ts @ f_t
        feat = raw * ang + cos_m * cos(ang) + sin_m * sin(ang)

    Returns ``(f_xyz [3, C], f_t [1, C], raw, cos_m, sin_m [1, C])`` numpy
    float32 arrays with C and channel order identical to
    ``sceneflow_features``. For ``time_dependent=False`` the t matrix is
    all-zero and a zero ts input leaves the features untouched."""
    import numpy as np

    fx, raw_x, cos_x, sin_x = _embed_block(3, n_freq_xyz)
    if not time_dependent:
        f_t = np.zeros((1, fx.shape[1]), np.float32)
        return (fx, f_t, raw_x[None], cos_x[None], sin_x[None])
    ft, raw_t, cos_t, sin_t = _embed_block(1, n_freq_t)
    ct, cx = ft.shape[1], fx.shape[1]
    f_t = np.concatenate([ft, np.zeros((1, cx), np.float32)], axis=1)
    f_xyz = np.concatenate([np.zeros((3, ct), np.float32), fx], axis=1)
    cat = lambda a, b: np.concatenate([a, b])[None]
    return (f_xyz, f_t, cat(raw_t, raw_x), cat(cos_t, cos_x),
            cat(sin_t, sin_x))
