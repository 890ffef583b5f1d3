"""Fused pointwise-MLP Pallas kernel (forward + custom VJP).

The scene-flow field is a NeRF-style MLP evaluated at every pixel
(reference: networks/sceneflow_field.py — canonical 132 -> 256 -> 256 x4 ->
3 with leaky-relu 0.2). Per evaluation at 224x384 that is ~50 GFLOP and,
unfused, ~0.5 GB of HBM traffic for inter-layer activations; one train step
runs 3-10 evaluations forward plus their backward. This kernel keeps the
whole layer chain (weights ~1.2 MB + one activation tile) resident in VMEM
and streams point tiles through the MXU, reducing HBM traffic to the input
features and output vectors only.

Backward: custom VJP. The backward kernel re-materializes the forward
activations per tile in VMEM (cheaper than writing them to HBM) and
accumulates weight/bias gradients in resident output blocks across the
sequential grid iterations; input gradients stream out per tile.

All matmuls run with float32 accumulation (``preferred_element_type``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SLOPE = 0.2  # leaky-relu negative slope (reference: networks/blocks.py:86)


def _leaky(x):
    return jnp.where(x >= 0, x, _SLOPE * x)


def _leaky_grad(z):
    return jnp.where(z >= 0, 1.0, _SLOPE).astype(z.dtype)


def fused_mlp_reference(feat, weights, biases):
    """Plain-XLA reference implementation (also the CPU fallback)."""
    h = feat
    n = len(weights)
    for i, (w, b) in enumerate(zip(weights, biases)):
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if i < n - 1:
            h = _leaky(h)
    return h


def _fwd_kernel(n_layers, feat_ref, *refs):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    out_ref = refs[2 * n_layers]
    h = feat_ref[:]
    for i in range(n_layers):
        h = jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32)
        h = h + b_refs[i][:]
        if i < n_layers - 1:
            h = _leaky(h)
    out_ref[:] = h.astype(out_ref.dtype)


def _bwd_kernel(n_layers, feat_ref, g_ref, *refs):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    dfeat_ref = refs[2 * n_layers]
    dw_refs = refs[2 * n_layers + 1:3 * n_layers + 1]
    db_refs = refs[3 * n_layers + 1:4 * n_layers + 1]

    step = pl.program_id(0)

    # re-materialize forward activations (inputs a_i and pre-activations z_i)
    acts = [feat_ref[:]]
    h = feat_ref[:]
    zs = []
    for i in range(n_layers):
        z = jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32)
        z = z + b_refs[i][:]
        zs.append(z)
        h = _leaky(z) if i < n_layers - 1 else z
        if i < n_layers - 1:
            acts.append(h)

    @pl.when(step == 0)
    def _init():
        for i in range(n_layers):
            dw_refs[i][:] = jnp.zeros_like(dw_refs[i])
            db_refs[i][:] = jnp.zeros_like(db_refs[i])

    g = g_ref[:].astype(jnp.float32)
    for i in reversed(range(n_layers)):
        # bias has no pre-activation nonlinearity on the last layer
        dz = g if i == n_layers - 1 else g * _leaky_grad(zs[i])
        dw_refs[i][:] += jnp.dot(
            acts[i].T, dz, preferred_element_type=jnp.float32
        ).astype(dw_refs[i].dtype)
        db_refs[i][:] += jnp.sum(dz, axis=0, keepdims=True).astype(db_refs[i].dtype)
        g = jnp.dot(dz, w_refs[i][:].T, preferred_element_type=jnp.float32)
    dfeat_ref[:] = g.astype(dfeat_ref.dtype)


def _pad_to(n, m):
    return (n + m - 1) // m * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_mlp(feat: jnp.ndarray, weights: Tuple[jnp.ndarray, ...],
              biases: Tuple[jnp.ndarray, ...], tile: int = 512) -> jnp.ndarray:
    """Fused MLP chain: ``feat [N, C0] -> [N, C_out]`` with leaky-relu
    between layers (none after the last)."""
    return _fused_mlp_fwd(feat, weights, biases, tile)[0]


def _run_fwd(feat, weights, biases, tile):
    n, c0 = feat.shape
    n_layers = len(weights)
    c_out = weights[-1].shape[1]
    n_pad = _pad_to(max(n, 1), tile)
    feat_p = jnp.pad(feat, ((0, n_pad - n), (0, 0)))
    biases2d = [b.reshape(1, -1) for b in biases]

    grid = (n_pad // tile,)
    in_specs = [pl.BlockSpec((tile, c0), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for b in biases2d:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_layers),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, c_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, c_out), feat.dtype),
    )(feat_p, *weights, *biases2d)
    return out[:n]


def _fused_mlp_fwd(feat, weights, biases, tile):
    out = _run_fwd(feat, tuple(weights), tuple(biases), tile)
    return out, (feat, tuple(weights), tuple(biases))


def _fused_mlp_bwd(tile, residuals, g):
    feat, weights, biases = residuals
    n, c0 = feat.shape
    n_layers = len(weights)
    c_out = weights[-1].shape[1]
    n_pad = _pad_to(max(n, 1), tile)
    feat_p = jnp.pad(feat, ((0, n_pad - n), (0, 0)))
    g_p = jnp.pad(g, ((0, n_pad - n), (0, 0)))
    biases2d = [b.reshape(1, -1) for b in biases]

    grid = (n_pad // tile,)
    in_specs = [
        pl.BlockSpec((tile, c0), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, c_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for b in biases2d:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    out_shapes = [jax.ShapeDtypeStruct((n_pad, c0), feat.dtype)]
    out_specs = [pl.BlockSpec((tile, c0), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    for w in weights:
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
    for b in biases:
        out_shapes.append(jax.ShapeDtypeStruct((1, b.shape[0]), jnp.float32))
        out_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_layers),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
    )(feat_p, g_p, *weights, *biases2d)

    dfeat = outs[0][:n]
    dws = tuple(outs[1 + i].astype(weights[i].dtype) for i in range(n_layers))
    dbs = tuple(
        outs[1 + n_layers + i][0].astype(biases[i].dtype)
        for i in range(n_layers)
    )
    return dfeat, dws, dbs


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


# ---------------------------------------------------------------------------
# Embedding-fused variant: the Fourier embedding moves INSIDE the kernel.
#
# The angle computation is linear — ``ang = pts @ f_xyz + ts @ f_t`` for
# constant frequency matrices (ops/embedding.py::sceneflow_embed_consts);
# each angle column depends on exactly one input lane, so the combine adds
# only structural zeros and the features match the XLA
# ``sceneflow_features`` path exactly (frequencies to a few ulps — see
# _linspace_f32). Fusing it removes, per field evaluation, the
# XLA sine/concatenate fusions and the [N, C_feat] HBM round-trip (~45 MB at
# 224x384): the kernel reads [N, 3]+[N, 1] and writes [N, 3].
# ---------------------------------------------------------------------------

def _embed_ang(pts, ts, fx_ref, ft_ref):
    # VPU broadcast multiply-adds, NOT an MXU dot: each angle column
    # depends on exactly one input lane, and [tile,1]x[1,C] broadcasts are
    # exact f32 (tiny-K dots also compile an order of magnitude slower in
    # Mosaic at HIGHEST precision)
    ang = ts * ft_ref[0:1, :]
    for c in range(3):
        ang = ang + pts[:, c:c + 1] * fx_ref[c:c + 1, :]
    return ang


def _embed_feat(ang, raw_ref, cos_ref, sin_ref):
    return (raw_ref[:] * ang + cos_ref[:] * jnp.cos(ang)
            + sin_ref[:] * jnp.sin(ang))


def _fwd_embed_kernel(n_layers, pts_ref, ts_ref, fx_ref, ft_ref, raw_ref,
                      cos_ref, sin_ref, *refs):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    out_ref = refs[2 * n_layers]
    ang = _embed_ang(pts_ref[:], ts_ref[:], fx_ref, ft_ref)
    h = _embed_feat(ang, raw_ref, cos_ref, sin_ref)
    for i in range(n_layers):
        h = jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32)
        h = h + b_refs[i][:]
        if i < n_layers - 1:
            h = _leaky(h)
    out_ref[:] = h.astype(out_ref.dtype)


def _bwd_embed_kernel(n_layers, pts_ref, ts_ref, fx_ref, ft_ref, raw_ref,
                      cos_ref, sin_ref, g_ref, *refs):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    dpts_ref = refs[2 * n_layers]
    dts_ref = refs[2 * n_layers + 1]
    dw_refs = refs[2 * n_layers + 2:3 * n_layers + 2]
    db_refs = refs[3 * n_layers + 2:4 * n_layers + 2]

    step = pl.program_id(0)

    ang = _embed_ang(pts_ref[:], ts_ref[:], fx_ref, ft_ref)
    feat = _embed_feat(ang, raw_ref, cos_ref, sin_ref)
    acts = [feat]
    h = feat
    zs = []
    for i in range(n_layers):
        z = jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32)
        z = z + b_refs[i][:]
        zs.append(z)
        h = _leaky(z) if i < n_layers - 1 else z
        if i < n_layers - 1:
            acts.append(h)

    @pl.when(step == 0)
    def _init():
        for i in range(n_layers):
            dw_refs[i][:] = jnp.zeros_like(dw_refs[i])
            db_refs[i][:] = jnp.zeros_like(db_refs[i])

    g = g_ref[:].astype(jnp.float32)
    for i in reversed(range(n_layers)):
        dz = g if i == n_layers - 1 else g * _leaky_grad(zs[i])
        dw_refs[i][:] += jnp.dot(
            acts[i].T, dz, preferred_element_type=jnp.float32
        ).astype(dw_refs[i].dtype)
        db_refs[i][:] += jnp.sum(dz, axis=0, keepdims=True).astype(db_refs[i].dtype)
        g = jnp.dot(dz, w_refs[i][:].T, preferred_element_type=jnp.float32)
    # through the embedding: d ang = (raw - cos_m*sin(ang) + sin_m*cos(ang)) * g
    dang = (raw_ref[:] - cos_ref[:] * jnp.sin(ang)
            + sin_ref[:] * jnp.cos(ang)) * g
    # lane reductions per input channel (VPU; see _embed_ang for why no dots)
    dts_ref[:] = jnp.sum(dang * ft_ref[0:1, :], axis=1,
                         keepdims=True).astype(dts_ref.dtype)
    for c in range(3):
        dpts_ref[:, c:c + 1] = jnp.sum(
            dang * fx_ref[c:c + 1, :], axis=1, keepdims=True
        ).astype(dpts_ref.dtype)


def _const_specs(fx, ft, raw_m):
    return [
        pl.BlockSpec(fx.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(ft.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(raw_m.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    ] * 3


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def fused_mlp_embed(pts: jnp.ndarray, ts: jnp.ndarray, fx: jnp.ndarray,
                    ft: jnp.ndarray, raw_m: jnp.ndarray, cos_m: jnp.ndarray,
                    sin_m: jnp.ndarray, weights: Tuple[jnp.ndarray, ...],
                    biases: Tuple[jnp.ndarray, ...],
                    tile: int = 512) -> jnp.ndarray:
    """Fourier-embedding + MLP chain in one kernel:
    ``pts [N, 3], ts [N, 1] -> [N, C_out]``. The embedding constants come
    from ``ops.embedding.sceneflow_embed_consts`` (zero grads — they are
    frequency tables, not parameters)."""
    return _fused_mlp_embed_fwd(pts, ts, fx, ft, raw_m, cos_m, sin_m,
                                weights, biases, tile)[0]


def _run_fwd_embed(pts, ts, fx, ft, raw_m, cos_m, sin_m, weights, biases,
                   tile):
    n = pts.shape[0]
    n_layers = len(weights)
    c_out = weights[-1].shape[1]
    n_pad = _pad_to(max(n, 1), tile)
    pts_p = jnp.pad(pts, ((0, n_pad - n), (0, 0)))
    ts_p = jnp.pad(ts, ((0, n_pad - n), (0, 0)))
    biases2d = [b.reshape(1, -1) for b in biases]

    grid = (n_pad // tile,)
    in_specs = [
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + _const_specs(fx, ft, raw_m)
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for b in biases2d:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_fwd_embed_kernel, n_layers),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, c_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, c_out), pts.dtype),
    )(pts_p, ts_p, fx, ft, raw_m, cos_m, sin_m, *weights, *biases2d)
    return out[:n]


def _fused_mlp_embed_fwd(pts, ts, fx, ft, raw_m, cos_m, sin_m, weights,
                         biases, tile):
    out = _run_fwd_embed(pts, ts, fx, ft, raw_m, cos_m, sin_m,
                         tuple(weights), tuple(biases), tile)
    return out, (pts, ts, fx, ft, raw_m, cos_m, sin_m, tuple(weights),
                 tuple(biases))


def _fused_mlp_embed_bwd(tile, residuals, g):
    pts, ts, fx, ft, raw_m, cos_m, sin_m, weights, biases = residuals
    n = pts.shape[0]
    n_layers = len(weights)
    c_out = weights[-1].shape[1]
    n_pad = _pad_to(max(n, 1), tile)
    pts_p = jnp.pad(pts, ((0, n_pad - n), (0, 0)))
    ts_p = jnp.pad(ts, ((0, n_pad - n), (0, 0)))
    g_p = jnp.pad(g, ((0, n_pad - n), (0, 0)))
    biases2d = [b.reshape(1, -1) for b in biases]

    grid = (n_pad // tile,)
    in_specs = [
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + _const_specs(fx, ft, raw_m) + [
        pl.BlockSpec((tile, c_out), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for b in biases2d:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    out_shapes = [
        jax.ShapeDtypeStruct((n_pad, 3), pts.dtype),
        jax.ShapeDtypeStruct((n_pad, 1), ts.dtype),
    ]
    out_specs = [
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for w in weights:
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
    for b in biases:
        out_shapes.append(jax.ShapeDtypeStruct((1, b.shape[0]), jnp.float32))
        out_specs.append(pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        functools.partial(_bwd_embed_kernel, n_layers),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
    )(pts_p, ts_p, fx, ft, raw_m, cos_m, sin_m, g_p, *weights, *biases2d)

    dpts = outs[0][:n]
    dts = outs[1][:n]
    dws = tuple(outs[2 + i].astype(weights[i].dtype) for i in range(n_layers))
    dbs = tuple(
        outs[2 + n_layers + i][0].astype(biases[i].dtype)
        for i in range(n_layers)
    )
    zero = jax.tree.map(jnp.zeros_like, (fx, ft, raw_m, cos_m, sin_m))
    return (dpts, dts) + zero + (dws, dbs)


fused_mlp_embed.defvjp(_fused_mlp_embed_fwd, _fused_mlp_embed_bwd)
