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

# ---------------------------------------------------------------------------
# Euler-chain hybrid: the WHOLE multi-step scene-flow integration
# (reference: forward_sf_net_multi_step, models/scene_flow_motion_field.py:
# 360-367) as unrolled XLA FORWARD + one Pallas BACKWARD megakernel.
#
# The split follows hardware measurement (224x384, gap 8, v5e):
#   - forward: XLA's full-M [N, 256] matmuls + fused transcendentals beat a
#     tile-256 Pallas forward 2x (7.8 vs 15.7 ms wall) — the forward is
#     compute-shaped work XLA already schedules well, and the advected
#     points the backward needs fall out of it for free;
#   - backward: XLA's chain backward stores/streams every eval's
#     activations through HBM (~0.4 GB per eval at canonical shape) and
#     loses 10+ ms to bandwidth; the Pallas backward keeps one point tile
#     resident in VMEM and RE-MATERIALIZES each eval's activations in the
#     reverse sweep (classic BPTT-with-remat, O(K) extra forwards,
#     O(K * tile * 3) memory instead of O(K * tile * width)).
#
# It also returns the first TWO field evaluations, because the acceleration
# regularizer queries the field at exactly (p0, t0) and (p0 + sf0, t0 + dt)
# (reference: _opt_reg, models/scene_flow_motion_field.py:326-344) — with
# `n_evals = max(2, n_steps)` the regularizer's second evaluation joins the
# chain as a "phantom" step that advects but does not accumulate, so even a
# gap-1 step gets the regularizer without a separate kernel launch.
#
# VMEM discipline (round-4 rewrite; the round-3 version OOMed the 16 MB
# scoped-VMEM budget at the canonical 224x384 shape): every narrow
# per-point array rides PACKED into a single <=128-lane buffer — separate
# [tile, 3]/[tile, 1] blocks each pad to 128 lanes, so the old design's
# pts/ts/dt/gacc/g0/g1/stash/grads cost 16 lane-padded buffers (double-
# buffered) where the new one costs three. The backward also derives the
# leaky-relu mask from the ACTIVATION sign (leaky preserves sign) instead
# of keeping all pre-activations live, and recomputes the affine time
# chain t_k = ((t0 + dt) + dt)... per step instead of storing it. The
# footprint is a closed-form function of (tile, widths, n_evals) —
# ``chain_bwd_vmem_bytes`` — and ``pick_chain_tile`` selects the largest
# tile that fits the budget, so 'auto' can never select an OOMing config
# (tests/test_pallas_chain.py pins canonical shapes under the limit).
#
# The in-kernel remat math is the exact op sequence of the forward (same
# f32 adds, same divisions) — parity is pinned by tests/test_pallas_chain.py
# and, against a torch-f64 ground truth on hardware, by
# scripts/hw_kernel_parity.py (measured: the remat backward is 2-5x MORE
# accurate than XLA's stored-activation backward, which truncates matmul
# operands to bf16 on the much larger stored tensors).
# ---------------------------------------------------------------------------

_VREG_LANES = 128
_VMEM_LIMIT_BYTES = 16 * 1024 * 1024  # scoped-VMEM budget per kernel
_CHAIN_VMEM_BUDGET = 12 * 1024 * 1024  # headroom for compiler slop


def _lanes(c: int) -> int:
    return _pad_to(c, _VREG_LANES)


def chain_bwd_vmem_bytes(tile: int, c0: int, widths: Tuple[int, ...],
                         n_evals: int) -> int:
    """Closed-form VMEM footprint model of the chain BACKWARD kernel (the
    max of fwd/bwd) at a given point-tile size. Counts lane/sublane-padded
    f32 buffers: streamed blocks double-buffered, weight/grad blocks, and
    the kernel's peak live value set (remat activations + packed stash).
    Conservative by construction (+25% slop) — used by ``pick_chain_tile``
    and pinned < 16 MB for canonical configs in tests."""
    f = 4  # f32
    t = _pad_to(tile, 8)
    stash_w = 3 * max(n_evals - 1, 1)
    # streamed I/O blocks (double-buffered): packed input
    # [tile, 14 + stash] and packed grad output [tile, 5]
    io = 2 * f * t * (_lanes(14 + stash_w) + _lanes(5))
    # weights in + dw out (+ biases/db, sublane-padded to 8); count x2 to
    # be safe about block double-buffering
    wb = 0
    cin = c0
    for w in widths:
        wb += _pad_to(cin, 8) * _lanes(w) * f      # weight block
        wb += 8 * _lanes(w) * f                    # bias block
        cin = w
    wb *= 2 * 2  # (weights + grads) x conservative double-buffer
    # peak live values during one remat+backprop step: acts (feat + all
    # hidden), ang/dang at embed width, g/dz at max width, plus the loop
    # carries (pbar/tbar/ddt/dt/t_k ~ 5 narrow values, each one vreg-lane
    # padded)
    wmax = max([c0] + list(widths))
    acts = f * t * (_lanes(c0) + sum(_lanes(w) for w in widths[:-1]))
    emb = 2 * f * t * _lanes(c0)
    flow = 2 * f * t * _lanes(wmax)
    narrow = 6 * f * t * _VREG_LANES
    scratch = acts + emb + flow + narrow
    total = io + wb + scratch
    return int(total * 1.25)


def pick_chain_tile(c0: int, widths: Tuple[int, ...], n_evals: int,
                    budget: int = _CHAIN_VMEM_BUDGET):
    """Largest point-tile whose modeled backward footprint fits ``budget``;
    None if even the smallest tile does not fit (caller falls back to the
    per-eval XLA path)."""
    for tile in (1024, 512, 256, 128):
        if chain_bwd_vmem_bytes(tile, c0, tuple(widths), n_evals) <= budget:
            return tile
    return None


def _chain_eval(p, t, fx_ref, ft_ref, raw_ref, cos_ref, sin_ref, w_refs,
                b_refs, n_layers, sf_div):
    """One embed+MLP field evaluation; returns sf (already / sf_div)."""
    ang = _embed_ang(p, t, fx_ref, ft_ref)
    h = _embed_feat(ang, raw_ref, cos_ref, sin_ref)
    for i in range(n_layers):
        h = jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32)
        h = h + b_refs[i][:]
        if i < n_layers - 1:
            h = _leaky(h)
    return h / sf_div


def _bwd_chain_kernel(n_layers, n_steps, n_evals, sf_div, x_ref, fx_ref,
                      ft_ref, raw_ref, cos_ref, sin_ref, *refs):
    """x_ref packs [pts(3) | ts(1) | dt(1) | gacc(3) | g0(3) | g1(3) |
    p_1..p_{n_evals-1} (3 each)]; the grad output packs
    [dpts(3) | dts(1) | ddt(1)]."""
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    d_ref = refs[2 * n_layers]
    dw_refs = refs[2 * n_layers + 1:3 * n_layers + 1]
    db_refs = refs[3 * n_layers + 1:4 * n_layers + 1]

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for i in range(n_layers):
            dw_refs[i][:] = jnp.zeros_like(dw_refs[i])
            db_refs[i][:] = jnp.zeros_like(db_refs[i])

    t0 = x_ref[:, 3:4]
    dt = x_ref[:, 4:5]
    gacc = x_ref[:, 5:8].astype(jnp.float32)
    g0 = x_ref[:, 8:11].astype(jnp.float32)
    g1 = x_ref[:, 11:14].astype(jnp.float32)

    def p_at(k):
        if k == 0:
            return x_ref[:, 0:3]
        off = 14 + 3 * (k - 1)
        return x_ref[:, off:off + 3]

    def t_at(k):
        # the affine chain t_k = ((t0 + dt) + dt)... — recomputed with the
        # forward's sequential f32 adds (bit-identical), O(K^2) one-vreg
        # VPU adds total instead of K stored lane-padded buffers
        t = t0
        for _ in range(k):
            t = t + dt
        return t

    pbar = jnp.zeros_like(gacc)          # grad wrt p_{k+1}
    tbar = jnp.zeros_like(t0)            # grad wrt t_{k+1}
    ddt = jnp.zeros_like(t0)
    for k in reversed(range(n_evals)):
        advanced = k + 1 < n_evals  # this eval's sf fed p_{k+1}
        fbar = pbar if advanced else jnp.zeros_like(gacc)
        if k < n_steps:
            fbar = fbar + gacc
        if k == 0:
            fbar = fbar + g0
        if k == 1:
            fbar = fbar + g1
        g = fbar / sf_div

        # re-materialize this step's activations at (p_k, t_k); only the
        # post-activation values are kept — the leaky-relu gradient mask is
        # recovered from the activation's sign (leaky preserves sign, so
        # act >= 0 iff its pre-activation >= 0)
        ang = _embed_ang(p_at(k), t_at(k), fx_ref, ft_ref)
        feat = _embed_feat(ang, raw_ref, cos_ref, sin_ref)
        acts = [feat]
        h = feat
        for i in range(n_layers - 1):
            z = jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32)
            h = _leaky(z + b_refs[i][:])
            acts.append(h)

        for i in reversed(range(n_layers)):
            if i == n_layers - 1:
                dz = g
            else:
                dz = g * jnp.where(acts[i + 1] >= 0, 1.0, _SLOPE)
            dw_refs[i][:] += jnp.dot(
                acts[i].T, dz, preferred_element_type=jnp.float32
            ).astype(dw_refs[i].dtype)
            db_refs[i][:] += jnp.sum(dz, axis=0,
                                     keepdims=True).astype(db_refs[i].dtype)
            g = jnp.dot(dz, w_refs[i][:].T, preferred_element_type=jnp.float32)

        dang = (raw_ref[:] - cos_ref[:] * jnp.sin(ang)
                + sin_ref[:] * jnp.cos(ang)) * g
        dt_local = jnp.sum(dang * ft_ref[0:1, :], axis=1, keepdims=True)
        dp_cols = [
            jnp.sum(dang * fx_ref[c:c + 1, :], axis=1, keepdims=True)
            for c in range(3)
        ]
        dp_local = jnp.concatenate(dp_cols, axis=1)

        # the advance p_{k+1} = p_k + sf_k / t_{k+1} = t_k + dt is identity
        # in p_k/t_k and feeds dt
        if advanced:
            ddt = ddt + tbar
            pbar = pbar + dp_local
            tbar = tbar + dt_local
        else:
            pbar = dp_local
            tbar = dt_local

    d_ref[:, 0:3] = pbar.astype(d_ref.dtype)
    d_ref[:, 3:4] = tbar.astype(d_ref.dtype)
    d_ref[:, 4:5] = ddt.astype(d_ref.dtype)


def _chain_xla(pts, ts, dt, fx, ft, raw_m, cos_m, sin_m, weights,
               biases, n_steps, n_evals, sf_div):
    """Unrolled-XLA chain forward; also returns the advected points
    ``p_1..p_{n_evals-1}`` (the backward kernel's remat stash — they fall
    out of the forward for free)."""
    p, t = pts, ts
    acc = jnp.zeros_like(p)
    f0 = f1 = None
    stash = []
    for k in range(n_evals):
        ang = t * ft + p @ fx
        feat = raw_m * ang + cos_m * jnp.cos(ang) + sin_m * jnp.sin(ang)
        sf = fused_mlp_reference(feat, weights, biases) / sf_div
        if k == 0:
            f0 = sf
        if k == 1:
            f1 = sf
        if k < n_steps:
            acc = acc + sf
        if k + 1 < n_evals:
            p = p + sf
            t = t + dt
            stash.append(p)
    if f1 is None:
        f1 = jnp.zeros_like(acc)
    stash = (jnp.concatenate(stash, axis=1) if stash
             else jnp.zeros((pts.shape[0], 0), pts.dtype))
    return (acc, f0, f1), stash


def chain_reference(pts, ts, dt, fx, ft, raw_m, cos_m, sin_m, weights,
                    biases, n_steps, n_evals, sf_div):
    """Plain-XLA reference of the chain (the unrolled per-eval path)."""
    return _chain_xla(pts, ts, dt, fx, ft, raw_m, cos_m, sin_m, weights,
                      biases, n_steps, n_evals, sf_div)[0]


def _resolve_chain_tile(tile, c0, widths, n_evals):
    if tile is not None:
        return tile
    picked = pick_chain_tile(c0, widths, n_evals)
    if picked is None:
        raise ValueError(
            f"no chain tile fits the VMEM budget for widths={widths}, "
            f"n_evals={n_evals}; use the per-eval path")
    return picked


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def fused_mlp_embed_chain(pts: jnp.ndarray, ts: jnp.ndarray, dt: jnp.ndarray,
                          fx: jnp.ndarray, ft: jnp.ndarray,
                          raw_m: jnp.ndarray, cos_m: jnp.ndarray,
                          sin_m: jnp.ndarray,
                          weights: Tuple[jnp.ndarray, ...],
                          biases: Tuple[jnp.ndarray, ...],
                          n_steps: int, n_evals: int, sf_div: float,
                          tile: int = None):
    """Euler-integrate the scene-flow field ``n_evals`` evaluations:
    ``pts [N, 3], ts/dt [N, 1] -> (sf_acc, first_sf, second_sf)``, each
    ``[N, 3]``. Forward = unrolled XLA (fastest measured); backward = ONE
    Pallas remat megakernel (see the module comment for the measured
    rationale). The first ``n_steps`` evaluations accumulate into
    ``sf_acc``; every non-final evaluation advects ``p += sf, t += dt``.
    ``second_sf`` is zeros when ``n_evals < 2``. ``sf_div`` divides each
    evaluation (reference: forward_sf_net, scene_flow_motion_field.py:358).
    ``tile=None`` picks the largest point tile whose modeled backward VMEM
    footprint fits the scoped budget (``pick_chain_tile``)."""
    return _chain_fwd(pts, ts, dt, fx, ft, raw_m, cos_m, sin_m, weights,
                      biases, n_steps, n_evals, sf_div, tile)[0]


def _chain_pack(arrs, n_pad):
    n = arrs[0].shape[0]
    x = jnp.concatenate(arrs, axis=1)
    return jnp.pad(x, ((0, n_pad - n), (0, 0)))


def _chain_fwd(pts, ts, dt, fx, ft, raw_m, cos_m, sin_m, weights, biases,
               n_steps, n_evals, sf_div, tile):
    # validate the tile up front so an un-fittable config fails at the
    # forward (trace time), not deep inside the transpose rule
    _resolve_chain_tile(tile, raw_m.shape[1],
                        [w.shape[1] for w in weights], n_evals)
    out, stash = _chain_xla(pts, ts, dt, fx, ft, raw_m, cos_m, sin_m,
                            tuple(weights), tuple(biases), n_steps,
                            n_evals, sf_div)
    return out, (pts, ts, dt, fx, ft, raw_m, cos_m, sin_m, tuple(weights),
                 tuple(biases), stash)


def _chain_bwd(n_steps, n_evals, sf_div, tile, residuals, gs):
    (pts, ts, dt, fx, ft, raw_m, cos_m, sin_m, weights, biases,
     stash) = residuals
    tile = _resolve_chain_tile(tile, raw_m.shape[1],
                               [w.shape[1] for w in weights], n_evals)
    g_acc, g0, g1 = gs
    n = pts.shape[0]
    n_layers = len(weights)
    n_pad = _pad_to(max(n, 1), tile)
    stash_cols = stash[:, :3 * max(n_evals - 1, 0)]
    x = _chain_pack((pts, ts, dt, g_acc, g0, g1, stash_cols), n_pad)
    x_w = x.shape[1]  # 14 + 3*(n_evals-1)
    biases2d = [b.reshape(1, -1) for b in biases]

    grid = (n_pad // tile,)
    in_specs = [
        pl.BlockSpec((tile, x_w), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + _const_specs(fx, ft, raw_m)
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for b in biases2d:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    out_shapes = [jax.ShapeDtypeStruct((n_pad, 5), pts.dtype)]
    out_specs = [pl.BlockSpec((tile, 5), lambda i: (i, 0),
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
        functools.partial(_bwd_chain_kernel, n_layers, n_steps, n_evals,
                          sf_div),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
    )(x, fx, ft, raw_m, cos_m, sin_m, *weights, *biases2d)

    d = outs[0]
    dpts = d[:n, 0:3]
    dts = d[:n, 3:4]
    ddt = d[:n, 4:5]
    dws = tuple(outs[1 + i].astype(weights[i].dtype) for i in range(n_layers))
    dbs = tuple(
        outs[1 + n_layers + i][0].astype(biases[i].dtype)
        for i in range(n_layers)
    )
    zero = jax.tree.map(jnp.zeros_like, (fx, ft, raw_m, cos_m, sin_m))
    return (dpts, dts, ddt) + zero + (dws, dbs)


fused_mlp_embed_chain.defvjp(_chain_fwd, _chain_bwd)
