"""Fused RAFT correlation-pyramid lookup (Pallas, forward-only).

Per RAFT iteration, every 1/8-res pixel samples a (2r+1)^2 bilinear window
from each level of the all-pairs correlation pyramid (reference:
scripts/preprocess/davis/generate_flows.py uses the official RAFT;
models/raft.py:113-144 is our XLA formulation with dense tent-weight
einsums). The XLA path materializes [B, N, K, Hl] / [B, N, K, Wl] tent
tensors in HBM per level per iteration; this kernel fuses the whole chain —
coordinate math, corner indexing, the 4 bilinear corner gathers and the
lerp, for ALL pyramid levels — into one VMEM-resident pass per point tile.

Gather strategy: Mosaic's dynamic lane gather (``take_along_axis(axis=1)``)
only operates within a single 128-lane vector register, so the flat
per-point correlation row (H*W lanes, zero-padded to a multiple of 128) is
gathered per 128-lane chunk and combined with equality masks on the chunk
index — dynamic indexing decomposed into vreg-local shuffles + selects,
which is exactly what the VPU supports natively.

Forward-only by design: the lookup feeds RAFT inference (preprocessing);
nothing in this pipeline differentiates through it. The XLA path in
models/raft.py remains the differentiable/CPU fallback.

Measured on this hardware (288x512 working res, scan probe): 3.23 ms vs
the XLA tent-einsum path's 1.44 ms — the per-vreg select sweep costs
T x M VPU work per corner while the einsums ride the MXU, so models/raft.py
keeps the XLA formulation as its default. This kernel is the parity-tested
alternative for backends where VPU shuffles beat small batched einsums.

Window semantics match models/raft.py lookup_correlation exactly: sample
positions ``clip(c/2^l + offset)`` per axis (border clamp of the continuous
coordinate), window index dy-major, levels concatenated channel-last.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _pad_to(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _vreg_gather(a: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``a [T, M]`` (M a multiple of 128) gathered at ``idx [T, G]``
    (G a multiple of 128) via per-vreg lane shuffles + selects."""
    t, m = a.shape
    out = jnp.zeros(idx.shape, a.dtype)
    hi = idx // _LANES
    lo = idx % _LANES
    for v in range(m // _LANES):
        sub = jnp.take_along_axis(a[:, v * _LANES:(v + 1) * _LANES], lo,
                                  axis=1)
        out = jnp.where(hi == v, sub, out)
    return out


def _lookup_kernel(shapes, radius, n_pad, coords_ref, *refs):
    """shapes: tuple of (Hl, Wl, Mp_l) per level. refs = level volume refs
    (each [1, T, Mp_l]) + out_ref [1, T, L*K*K]."""
    k = 2 * radius + 1
    g = k * k
    gp = _pad_to(g, _LANES)
    level_refs = refs[:-1]
    out_ref = refs[-1]
    t = coords_ref.shape[1]

    cx = coords_ref[0, :, 0:1]  # [T, 1]
    cy = coords_ref[0, :, 1:2]

    i_g = jax.lax.broadcasted_iota(jnp.int32, (t, gp), 1)
    kk = (i_g // k).astype(jnp.float32)  # dy index (dy-major ordering)
    jj = (i_g % k).astype(jnp.float32)   # padded lanes (>= g) carry garbage
    wins = []
    for lvl, (hl, wl, _) in enumerate(shapes):
        scale = float(2 ** lvl)
        # border-clamp the continuous sample coordinate (matches the XLA
        # tent construction in models/raft.py:135-136)
        y = jnp.clip(cy / scale + kk - radius, 0.0, hl - 1.0)
        x = jnp.clip(cx / scale + jj - radius, 0.0, wl - 1.0)
        y0f = jnp.floor(y)
        x0f = jnp.floor(x)
        fy = y - y0f
        fx = x - x0f
        y0 = y0f.astype(jnp.int32)
        x0 = x0f.astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, hl - 1)
        x1 = jnp.minimum(x0 + 1, wl - 1)

        a = level_refs[lvl][0]  # [T, Mp_l]
        v00 = _vreg_gather(a, y0 * wl + x0)
        v01 = _vreg_gather(a, y0 * wl + x1)
        v10 = _vreg_gather(a, y1 * wl + x0)
        v11 = _vreg_gather(a, y1 * wl + x1)
        win = (
            (1.0 - fy) * (1.0 - fx) * v00
            + (1.0 - fy) * fx * v01
            + fy * (1.0 - fx) * v10
            + fy * fx * v11
        )
        wins.append(win[:, :g])
    # one aligned store of the concatenated level windows
    out_ref[0, :, :] = jnp.concatenate(wins, axis=1).astype(out_ref.dtype)


def fused_lookup_correlation(
    pyramid: Sequence[jnp.ndarray], coords: jnp.ndarray, radius: int = 4,
    tile: int = 256,
) -> jnp.ndarray:
    """Drop-in fused replacement for ``models.raft.lookup_correlation``.

    Args:
      pyramid: per-level all-pairs volumes ``[B, N, Hl, Wl]`` (N = H*W of
        the 1/8-res source grid).
      coords: ``[B, H, W, 2]`` sample positions at 1/8 res.
    Returns:
      ``[B, H, W, L*(2r+1)^2]``, window index dy-major (official ordering).
    """
    b, h, w, _ = coords.shape
    n = h * w
    k = 2 * radius + 1
    g = k * k
    n_levels = len(pyramid)

    t = min(tile, _pad_to(n, 8))
    n_pad = _pad_to(n, t)

    shapes: Tuple = ()
    flat_levels = []
    for corr in pyramid:
        _, _, hl, wl = corr.shape
        mp = _pad_to(hl * wl, _LANES)
        a = corr.reshape(b, n, hl * wl)
        a = jnp.pad(a, ((0, 0), (0, n_pad - n), (0, mp - hl * wl)))
        flat_levels.append(a)
        shapes += ((hl, wl, mp),)

    coords_flat = coords.reshape(b, n, 2)
    coords_flat = jnp.pad(coords_flat, ((0, 0), (0, n_pad - n), (0, 0)))

    in_specs = [
        pl.BlockSpec((1, t, 2), lambda bi, ti: (bi, ti, 0),
                     memory_space=pltpu.VMEM)
    ]
    for (_, _, mp) in shapes:
        in_specs.append(
            pl.BlockSpec((1, t, mp), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM)
        )
    out = pl.pallas_call(
        functools.partial(_lookup_kernel, shapes, radius, n_pad),
        grid=(b, n_pad // t),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, t, n_levels * g),
                               lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, n_levels * g),
                                       coords.dtype),
    )(coords_flat, *flat_levels)
    return out[:, :n].reshape(b, h, w, n_levels * g)
