"""Fused scene-flow projection + consistency-loss Pallas kernel.

The last stage of the training loss graph (reference:
losses/scene_flow_projection.py:222-278 ``scene_flow_projection_slack`` and
models/scene_flow_motion_field.py:285-324 ``_calc_loss``) is a long chain of
per-pixel geometry — advect world points by the scene flow, rotate into the
second camera, project, compare against the observed flow / warped depth /
flow-implied scene flow — followed by occlusion-masked global reductions.

This kernel runs that whole chain in ONE VMEM-resident pass per row block:
every intermediate (advected points, camera-frame points, projected pixels,
residuals) lives in vector registers and only four partial sums per block
ever reach HBM. Together with the fused backward warp
(ops/pallas/warp_kernel.py) and the fused scene-flow MLP
(ops/pallas/mlp_kernel.py), the full loss graph between the depth CNN and
the scalar losses is Pallas end-to-end.

Inputs (channel-last, ``[B, H, W, C]``):
  - ``global_p1``  [B,H,W,3]  frame-1 world points (differentiable)
  - ``warped_p2c2``[B,H,W,3]  frame-2 camera-frame points backward-warped
                              into frame 1 (differentiable, typically the
                              output of the fused warp kernel)
  - ``sf``         [B,H,W,3]  integrated scene flow (differentiable)
  - ``flow_gt``    [B,H,W,2]  observed flow (data)
  - ``mask``       [B,H,W]    soft non-occlusion mask (data)
  - ``depth_1``    [B,H,W]    frame-1 depth, only for the MiDaS far-field
                              mask (data; thresholds carry no gradient)
  - ``cam2``       [B,24]     packed second camera: R_c2w row-major (9),
                              t (3), K row-major (9), 3 pad — see
                              :func:`pack_camera`. Read from SMEM.

Returns ``[4]`` f32 partial sums over the whole batch:
  ``[flow_resid_sum, disp_resid_sum, sf_resid_sum, occ_mass]``
from which the caller forms the reference's masked means
(``sum / (occ_mass + 1e-8)``).

Custom VJP: gradients flow to ``global_p1``, ``warped_p2c2`` and ``sf``
only (the flow/mask/depth thresholds are data). The backward kernel
recomputes the per-pixel forward chain (cheaper than storing it) and emits
the three per-pixel cotangent fields in one pass.

Mosaic constraints honored (see CLAUDE.md): per-point values live in lanes
(``[1, N]`` slices of flattened row blocks), no transposes, no gathers, no
batched dots; camera entries are SMEM scalars broadcast into vector ops;
width is padded to whole 128-lane vregs (padded pixels carry ``mask = 0``
and are algebraically inert).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .warp_kernel import _pad_to, _row_blocked

_EPS_PROJ = 1e-8
_Z_DEGENERATE = 1e-3
_CLIP_MIN = 1e-3
_MIDAS_FAR = 100.0


def pack_camera(cam) -> jnp.ndarray:
    """Pack a Camera pytree into the kernel's ``[B, 24]`` SMEM layout."""
    b = cam.t.shape[0]
    return jnp.concatenate(
        [
            cam.R_c2w.reshape(b, 9).astype(jnp.float32),
            cam.t.reshape(b, 3).astype(jnp.float32),
            cam.K.reshape(b, 9).astype(jnp.float32),
            jnp.zeros((b, 3), jnp.float32),
        ],
        axis=-1,
    )


def _cam_scalars(cam_ref):
    # whole [B, 24] array rides in SMEM (a [1, 24] block would violate the
    # Mosaic block-shape rule for B > 1); the grid id picks this batch row
    bi = pl.program_id(0)
    R = [[cam_ref[bi, 3 * i + j] for j in range(3)] for i in range(3)]
    t = [cam_ref[bi, 9 + i] for i in range(3)]
    K = [[cam_ref[bi, 12 + 3 * i + j] for j in range(3)] for i in range(3)]
    return R, t, K


def _base_coords(rows, wp, n):
    row0 = pl.program_id(1) * rows
    bx = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 1)
    by = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 0) + row0
    return (bx.astype(jnp.float32).reshape(1, n),
            by.astype(jnp.float32).reshape(1, n))


def _pixel_chain(R, t, K, gp1, w3, sf, data, base_x, base_y,
                 midas, use_disp, use_disp_ratio, warm):
    """Shared per-pixel forward chain; every value is a ``[1, N]`` lane
    vector. Mirrors ops/geometry.py projection_stage + train/losses.py
    consistency_losses exactly (same op order, f32)."""
    fgx, fgy = data[0], data[1]
    m, d1 = data[2], data[3]

    # occlusion mask (losses.py: consistency_losses)
    occ = m
    if midas:
        occ = occ * (d1 < _MIDAS_FAR).astype(jnp.float32)
        occ = occ * (w3[2] < _MIDAS_FAR).astype(jnp.float32)

    # warped global p2 = R @ w + t ; sf_by_depth = wg - global_p1
    wg = [R[i][0] * w3[0] + R[i][1] * w3[1] + R[i][2] * w3[2] + t[i]
          for i in range(3)]
    q = [wg[i] - gp1[i] - sf[i] for i in range(3)]  # sf_by_depth - sf

    # advect + world->camera2: p1c2 = R^T (advected - t)
    rel = [gp1[i] + sf[i] - t[i] for i in range(3)]
    p1c2 = [R[0][i] * rel[0] + R[1][i] * rel[1] + R[2][i] * rel[2]
            for i in range(3)]
    img = [K[i][0] * p1c2[0] + K[i][1] * p1c2[1] + K[i][2] * p1c2[2]
           for i in range(3)]
    z = img[2]
    live = (z >= _Z_DEGENERATE).astype(jnp.float32)  # degenerate guard
    # Safe reciprocal: dead pixels can have z + eps ~ 0, and inf * 0 = NaN;
    # their contribution is zeroed by `live` anyway.
    inv_z = jnp.where(live > 0.0, 1.0 / (z + _EPS_PROJ), 0.0)
    pix_x = img[0] * inv_z
    pix_y = img[1] * inv_z
    # dflow = where(degenerate, 0, pix - base)
    rx = (pix_x - base_x) * live - fgx
    ry = (pix_y - base_y) * live - fgy

    # disparity residual operands (losses.py: disp_residual)
    c1, c2 = p1c2[2], w3[2]
    return dict(occ=occ, wg=wg, q=q, rel=rel, p1c2=p1c2, img=img, z=z,
                inv_z=inv_z, live=live, rx=rx, ry=ry, c1=c1, c2=c2)


def _disp_residual(c1, c2, use_disp, use_disp_ratio):
    if use_disp:
        t1 = jnp.maximum(c1, _CLIP_MIN)
        t2 = jnp.maximum(c2, _CLIP_MIN)
        return 100.0 * jnp.abs(1.0 / t1 - 1.0 / t2)
    if use_disp_ratio:
        t1 = jnp.maximum(c1, _CLIP_MIN)
        t2 = jnp.maximum(c2, _CLIP_MIN)
        return jnp.maximum(t1, t2) / jnp.minimum(t1, t2) - 1.0
    return jnp.abs(c1 - c2)


def _fwd_kernel(rows, wp, midas, use_disp, use_disp_ratio, warm,
                gp1_ref, w3_ref, sf_ref, data_ref, cam_ref, out_ref):
    n = rows * wp
    base_x, base_y = _base_coords(rows, wp, n)
    R, t, K = _cam_scalars(cam_ref)
    gp1 = [gp1_ref[0, 0, i:i + 1, :] for i in range(3)]
    w3 = [w3_ref[0, 0, i:i + 1, :] for i in range(3)]
    sf = [sf_ref[0, 0, i:i + 1, :] for i in range(3)]
    data = [data_ref[0, 0, i:i + 1, :] for i in range(4)]

    v = _pixel_chain(R, t, K, gp1, w3, sf, data, base_x, base_y,
                     midas, use_disp, use_disp_ratio, warm)
    occ = v["occ"]
    if warm:
        flow_resid = v["rx"] * v["rx"] + v["ry"] * v["ry"]
    else:
        flow_resid = jnp.abs(v["rx"]) + jnp.abs(v["ry"])
    disp_resid = _disp_residual(v["c1"], v["c2"], use_disp, use_disp_ratio)
    sf_resid = jnp.abs(v["q"][0]) + jnp.abs(v["q"][1]) + jnp.abs(v["q"][2])

    sums = [jnp.sum(occ * flow_resid), jnp.sum(occ * disp_resid),
            jnp.sum(occ * sf_resid), jnp.sum(occ)]
    zero = jnp.zeros((), jnp.float32)
    out_ref[0, 0] = jnp.concatenate(
        [jnp.full((1, 128), s, jnp.float32) for s in sums]
        + [jnp.full((1, 128), zero, jnp.float32)] * 4,
        axis=0,
    )


def _bwd_kernel(rows, wp, midas, use_disp, use_disp_ratio, warm,
                gp1_ref, w3_ref, sf_ref, data_ref, cam_ref, cot_ref,
                dgp1_ref, dw3_ref, dsf_ref):
    n = rows * wp
    base_x, base_y = _base_coords(rows, wp, n)
    R, t, K = _cam_scalars(cam_ref)
    gp1 = [gp1_ref[0, 0, i:i + 1, :] for i in range(3)]
    w3 = [w3_ref[0, 0, i:i + 1, :] for i in range(3)]
    sf = [sf_ref[0, 0, i:i + 1, :] for i in range(3)]
    data = [data_ref[0, 0, i:i + 1, :] for i in range(4)]
    a, b, c = cot_ref[0, 0], cot_ref[0, 1], cot_ref[0, 2]  # occ_mass: no grad

    v = _pixel_chain(R, t, K, gp1, w3, sf, data, base_x, base_y,
                     midas, use_disp, use_disp_ratio, warm)
    occ, live, inv_z = v["occ"], v["live"], v["inv_z"]

    # --- scene-flow residual path: resid = sum_i |q_i|, q = wg - gp1 - sf
    gq = [c * occ * jnp.sign(v["q"][i]) for i in range(3)]
    # wg_i = sum_j R[i][j] w_j + t_i  ->  d w_j = sum_i R[i][j] gq_i
    dw = [R[0][j] * gq[0] + R[1][j] * gq[1] + R[2][j] * gq[2]
          for j in range(3)]
    dgp1 = [-gq[i] for i in range(3)]
    dsf = [-gq[i] for i in range(3)]

    # --- flow residual path
    if warm:
        grx = a * occ * 2.0 * v["rx"]
        gry = a * occ * 2.0 * v["ry"]
    else:
        grx = a * occ * jnp.sign(v["rx"])
        gry = a * occ * jnp.sign(v["ry"])
    gpix_x = grx * live
    gpix_y = gry * live
    dimg0 = gpix_x * inv_z
    dimg1 = gpix_y * inv_z
    dimg2 = -(gpix_x * v["img"][0] + gpix_y * v["img"][1]) * inv_z * inv_z

    # --- disparity residual path -> d c1 (p1c2 z), d c2 (warped z)
    c1, c2 = v["c1"], v["c2"]
    if use_disp:
        t1 = jnp.maximum(c1, _CLIP_MIN)
        t2 = jnp.maximum(c2, _CLIP_MIN)
        s = jnp.sign(1.0 / t1 - 1.0 / t2)
        pass1 = (c1 > _CLIP_MIN).astype(jnp.float32)
        pass2 = (c2 > _CLIP_MIN).astype(jnp.float32)
        dc1 = b * occ * 100.0 * s * (-1.0 / (t1 * t1)) * pass1
        dc2 = b * occ * 100.0 * s * (1.0 / (t2 * t2)) * pass2
    elif use_disp_ratio:
        t1 = jnp.maximum(c1, _CLIP_MIN)
        t2 = jnp.maximum(c2, _CLIP_MIN)
        hi = jnp.maximum(t1, t2)
        lo = jnp.minimum(t1, t2)
        dhi = b * occ / lo
        dlo = -b * occ * hi / (lo * lo)
        one_is_hi = (t1 >= t2).astype(jnp.float32)
        pass1 = (c1 > _CLIP_MIN).astype(jnp.float32)
        pass2 = (c2 > _CLIP_MIN).astype(jnp.float32)
        dc1 = (one_is_hi * dhi + (1.0 - one_is_hi) * dlo) * pass1
        dc2 = ((1.0 - one_is_hi) * dhi + one_is_hi * dlo) * pass2
    else:
        s = jnp.sign(c1 - c2)
        dc1 = b * occ * s
        dc2 = -b * occ * s
    dw[2] = dw[2] + dc2

    # img = K @ p1c2 -> d p1c2_j = sum_i K[i][j] dimg_i ; plus dc1 on z
    dimg = [dimg0, dimg1, dimg2]
    dp1c2 = [K[0][j] * dimg[0] + K[1][j] * dimg[1] + K[2][j] * dimg[2]
             for j in range(3)]
    dp1c2[2] = dp1c2[2] + dc1
    # p1c2 = R^T rel -> d rel = R @ dp1c2 ; advected = gp1 + sf
    for i in range(3):
        dadv = (R[i][0] * dp1c2[0] + R[i][1] * dp1c2[1]
                + R[i][2] * dp1c2[2])
        dgp1[i] = dgp1[i] + dadv
        dsf[i] = dsf[i] + dadv

    for i in range(3):
        dgp1_ref[0, 0, i:i + 1, :] = dgp1[i]
        dw3_ref[0, 0, i:i + 1, :] = dw[i]
        dsf_ref[0, 0, i:i + 1, :] = dsf[i]


def _prep(x, hp, wp, rows):
    """[B, H, W, C] -> [B, NBLK, C, rows*WP] flattened row blocks."""
    b, h, w, _ = x.shape
    cf = jnp.transpose(x, (0, 3, 1, 2))
    cf = jnp.pad(cf, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
    return _row_blocked(cf, hp, rows)


def _unblock(x, hp, wp, h, w, rows):
    """[B, NBLK, C, rows*WP] -> [B, H, W, C]."""
    b, nblk, c, _ = x.shape
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, c, hp, wp)
    return jnp.transpose(x[:, :, :h, :w], (0, 2, 3, 1))


_ROWS = 8


def _shapes(gp1):
    b, h, w, _ = gp1.shape
    hp = _pad_to(h, _ROWS)
    wp = _pad_to(w, 128)
    return b, h, w, hp, wp, hp // _ROWS, _ROWS * wp


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_projection_loss(global_p1, warped_p2c2, sf, flow_gt, mask,
                          depth_1, cam2,
                          use_disp: bool = False,
                          use_disp_ratio: bool = False,
                          midas: bool = False,
                          warm: bool = False) -> jnp.ndarray:
    """One-pass projection + masked loss reductions (see module docstring).

    Returns ``[flow_sum, disp_sum, sf_sum, occ_mass]`` (f32 ``[4]``);
    the caller divides by ``occ_mass + 1e-8`` for the reference's masked
    means. Differentiable w.r.t. the first three arguments only.
    """
    return _loss_fwd(global_p1, warped_p2c2, sf, flow_gt, mask, depth_1,
                     cam2, use_disp, use_disp_ratio, midas, warm)[0]


def _run_fwd(gp1, w3, sf, flow_gt, mask, depth_1, cam2,
             use_disp, use_disp_ratio, midas, warm):
    b, h, w, hp, wp, nblk, n = _shapes(gp1)
    data = jnp.concatenate(
        [flow_gt, mask[..., None], depth_1[..., None]], axis=-1
    ).astype(jnp.float32)
    blocks = [_prep(x.astype(jnp.float32), hp, wp, _ROWS)
              for x in (gp1, w3, sf, data)]
    spec = lambda ch: pl.BlockSpec((1, 1, ch, n), lambda bi, ri: (bi, ri, 0, 0),
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, _ROWS, wp, midas, use_disp,
                          use_disp_ratio, warm),
        grid=(b, nblk),
        in_specs=[spec(3), spec(3), spec(3), spec(4),
                  pl.BlockSpec((b, 24), lambda bi, ri: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nblk, 8, 128), jnp.float32),
    )(*blocks, cam2.astype(jnp.float32))
    return jnp.sum(out[:, :, :4, 0], axis=(0, 1))


def _loss_fwd(gp1, w3, sf, flow_gt, mask, depth_1, cam2,
              use_disp, use_disp_ratio, midas, warm):
    sums = _run_fwd(gp1, w3, sf, flow_gt, mask, depth_1, cam2,
                    use_disp, use_disp_ratio, midas, warm)
    return sums, (gp1, w3, sf, flow_gt, mask, depth_1, cam2)


def _loss_bwd(use_disp, use_disp_ratio, midas, warm, res, g):
    gp1, w3, sf, flow_gt, mask, depth_1, cam2 = res
    b, h, w, hp, wp, nblk, n = _shapes(gp1)
    data = jnp.concatenate(
        [flow_gt, mask[..., None], depth_1[..., None]], axis=-1
    ).astype(jnp.float32)
    blocks = [_prep(x.astype(jnp.float32), hp, wp, _ROWS)
              for x in (gp1, w3, sf, data)]
    cot = jnp.broadcast_to(g[None, :].astype(jnp.float32), (1, 4))
    spec = lambda ch: pl.BlockSpec((1, 1, ch, n), lambda bi, ri: (bi, ri, 0, 0),
                                   memory_space=pltpu.VMEM)
    smem = lambda cols: pl.BlockSpec((1, cols), lambda bi, ri: (0, 0),
                                     memory_space=pltpu.SMEM)
    cam_spec = pl.BlockSpec((b, 24), lambda bi, ri: (0, 0),
                            memory_space=pltpu.SMEM)
    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, _ROWS, wp, midas, use_disp,
                          use_disp_ratio, warm),
        grid=(b, nblk),
        in_specs=[spec(3), spec(3), spec(3), spec(4), cam_spec, smem(4)],
        out_specs=[
            pl.BlockSpec((1, 1, 3, n), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        out_shape=[jax.ShapeDtypeStruct((b, nblk, 3, n), jnp.float32)] * 3,
    )(*blocks, cam2.astype(jnp.float32), cot)
    dgp1, dw3, dsf = [_unblock(x, hp, wp, h, w, _ROWS) for x in grads]
    return (dgp1.astype(gp1.dtype), dw3.astype(w3.dtype),
            dsf.astype(sf.dtype), jnp.zeros_like(flow_gt),
            jnp.zeros_like(mask), jnp.zeros_like(depth_1),
            jnp.zeros_like(cam2))


fused_projection_loss.defvjp(_loss_fwd, _loss_bwd)
