"""Camera geometry: unprojection, projection, depth-induced flow and the
scene-flow projection used by the consistency losses.

Re-derivations of the reference's stateless modules (reference:
losses/scene_flow_projection.py — ``unproject_ptcld`` :48-67,
``project_ptcld`` :21-44, ``flow_by_depth`` :95-153,
``scene_flow_projection_slack`` :204-278, ``calc_rigidity_loss`` :156-201).

All tensors are channel-last: depth ``[B, H, W]``, flow ``[B, H, W, 2]``,
world/camera points ``[B, H, W, 3]``. Cameras are :class:`~.camera.Camera`
pytrees with plain column-vector matrices. The einsum contractions below map
onto the MXU as small batched matmuls fused with their producers by XLA.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from jax.lax import Precision

from .camera import Camera
from .coords import pixel_coords, pixel_coords_homogeneous
from .grid_sample import backward_warp

_EPS_PROJ = 1e-8
_Z_DEGENERATE = 1e-3


def unproject(depth: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """Depth map -> world-space point cloud.

    ``world = R_c2w @ (d * K^-1 [x, y, 1]) + t``
    (reference: unproject_ptcld, losses/scene_flow_projection.py:48-67).

    Args:
      depth: ``[B, H, W]``.
    Returns:
      ``[B, H, W, 3]`` world points.
    """
    b, h, w = depth.shape
    pix = pixel_coords_homogeneous(h, w, dtype=depth.dtype)  # [H, W, 3]
    cam_pts = depth[..., None] * jnp.einsum("bij,hwj->bhwi", cam.K_inv, pix, precision=Precision.HIGHEST)
    return jnp.einsum("bij,bhwj->bhwi", cam.R_c2w, cam_pts, precision=Precision.HIGHEST) + cam.t[:, None, None, :]


def world_to_camera(points: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """World points -> camera-frame points: ``R_c2w^T @ (p - t)``."""
    rel = points - cam.t[:, None, None, :]
    return jnp.einsum("bji,bhwj->bhwi", cam.R_c2w, rel, precision=Precision.HIGHEST)


def project(points: jnp.ndarray, cam: Camera):
    """World points -> pixel coordinates (+ camera-frame points).

    Degenerate points with projected z < 1e-3 fall back to their own pixel
    coordinate so they contribute zero displacement (reference:
    losses/scene_flow_projection.py:253-263).

    Returns:
      (pix ``[B, H, W, 2]``, cam_pts ``[B, H, W, 3]``)
    """
    b, h, w, _ = points.shape
    cam_pts = world_to_camera(points, cam)
    img = jnp.einsum("bij,bhwj->bhwi", cam.K, cam_pts, precision=Precision.HIGHEST)
    pix = img[..., :2] / (img[..., 2:3] + _EPS_PROJ)
    base = pixel_coords(h, w, dtype=points.dtype)[None]
    pix = jnp.where(img[..., 2:3] < _Z_DEGENERATE, base, pix)
    return pix, cam_pts


def project_displacement(points: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """World points -> displacement field from each point's own pixel
    (reference: project_ptcld, losses/scene_flow_projection.py:21-44)."""
    b, h, w, _ = points.shape
    pix, _ = project(points, cam)
    return pix - pixel_coords(h, w, dtype=points.dtype)[None]


def flow_by_depth(
    depth_1: jnp.ndarray,
    depth_2: jnp.ndarray,
    flow_1_2: jnp.ndarray,
    cam_1: Camera,
    cam_2: Camera,
) -> Dict[str, jnp.ndarray]:
    """Depth-induced flow and observed-flow-implied scene flow.

    (reference: flow_by_depth, losses/scene_flow_projection.py:95-153)

    Returns dict with:
      - ``dflow_1_2`` ``[B, H, W, 2]``: flow implied by depth_1 + egomotion,
      - ``sf_by_depth`` ``[B, H, W, 3]``: scene flow implied by the observed
        flow (backward-warped frame-2 world points minus frame-1 points),
      - ``warped_global_p2`` ``[B, H, W, 3]``,
      - ``global_p1`` ``[B, H, W, 3]``.
    """
    b, h, w = depth_1.shape
    global_p1 = unproject(depth_1, cam_1)
    global_p2 = unproject(depth_2, cam_2)

    warped_global_p2 = backward_warp(global_p2, flow_1_2)
    sf_by_depth = warped_global_p2 - global_p1

    pix_1_in_2, _ = project(global_p1, cam_2)
    dflow_1_2 = pix_1_in_2 - pixel_coords(h, w, dtype=depth_1.dtype)[None]

    return {
        "dflow_1_2": dflow_1_2,
        "sf_by_depth": sf_by_depth,
        "warped_global_p2": warped_global_p2,
        "global_p1": global_p1,
    }


def scene_flow_projection(
    depth_1: jnp.ndarray,
    depth_2: jnp.ndarray,
    flow_1_2: jnp.ndarray,
    cam_1: Camera,
    cam_2: Camera,
    sflow_1_2: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """The main consistency op: unproject, advect by scene flow, reproject.

    (reference: scene_flow_projection_slack, losses/scene_flow_projection.py:
    204-278). The reference also computes the 2->1 projection but never
    returns or uses it (its ``coord_image_1`` is dead); we skip that work.

    Returns dict with (shapes channel-last, depths ``[B, H, W]``):
      ``dflow_1_2``, ``staticflow_1_2`` ``[B, H, W, 2]``;
      ``depth_image_1_2``, ``depth_warp_1_2``, ``depth_1``, ``depth_2``
      ``[B, H, W]``; ``global_p1``, ``p1_camera_2``, ``warped_p2_camera_2``,
      ``scenef_1_2`` ``[B, H, W, 3]``.
    """
    b, h, w = depth_1.shape
    base = pixel_coords(h, w, dtype=depth_1.dtype)[None]
    pix_h = pixel_coords_homogeneous(h, w, dtype=depth_1.dtype)

    p1_camera_1 = depth_1[..., None] * jnp.einsum("bij,hwj->bhwi", cam_1.K_inv, pix_h, precision=Precision.HIGHEST)
    p2_camera_2 = depth_2[..., None] * jnp.einsum("bij,hwj->bhwi", cam_2.K_inv, pix_h, precision=Precision.HIGHEST)
    global_p1 = (
        jnp.einsum("bij,bhwj->bhwi", cam_1.R_c2w, p1_camera_1, precision=Precision.HIGHEST)
        + cam_1.t[:, None, None, :]
    )

    # Frame-2 camera-frame points warped into frame 1 by the observed flow,
    # together with the warped depth (two channels of one fused warp).
    warp_src = jnp.concatenate([p2_camera_2, depth_2[..., None]], axis=-1)
    warped = backward_warp(warp_src, flow_1_2)
    warped_p2_camera_2 = warped[..., :3]
    depth_warp_1_2 = warped[..., 3]

    advected = global_p1 + sflow_1_2
    pix_1_in_2, p1_camera_2 = project(advected, cam_2)
    dflow_1_2 = pix_1_in_2 - base

    pix_static, _ = project(global_p1, cam_2)
    staticflow_1_2 = pix_static - base

    # z of K @ cam_pts; with a standard intrinsics last row this equals cam z.
    depth_image_1_2 = jnp.einsum("bj,bhwj->bhw", cam_2.K[:, 2, :], p1_camera_2, precision=Precision.HIGHEST)

    return {
        "dflow_1_2": dflow_1_2,
        "staticflow_1_2": staticflow_1_2,
        "depth_image_1_2": depth_image_1_2,
        "depth_warp_1_2": depth_warp_1_2,
        "depth_1": depth_1,
        "depth_2": depth_2,
        "scenef_1_2": sflow_1_2,
        "global_p1": global_p1,
        "p1_camera_2": p1_camera_2,
        "warped_p2_camera_2": warped_p2_camera_2,
    }


def unproject_camera(depth: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """Depth map -> camera-frame point cloud ``d * K^-1 [x, y, 1]``."""
    _, h, w = depth.shape
    pix = pixel_coords_homogeneous(h, w, dtype=depth.dtype)
    return depth[..., None] * jnp.einsum(
        "bij,hwj->bhwi", cam.K_inv, pix, precision=Precision.HIGHEST
    )


def camera_to_world(cam_pts: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """Camera-frame points -> world points ``R_c2w @ p + t``."""
    return (
        jnp.einsum("bij,bhwj->bhwi", cam.R_c2w, cam_pts,
                   precision=Precision.HIGHEST)
        + cam.t[:, None, None, :]
    )


def depth_warp_stage(
    depth_1: jnp.ndarray,
    depth_2: jnp.ndarray,
    flow_1_2: jnp.ndarray,
    cam_1: Camera,
    cam_2: Camera,
    warp_fn=None,
) -> Dict[str, jnp.ndarray]:
    """Everything the train step needs BEFORE the scene-flow field query:
    unprojections + the single fused warp + the flow-implied scene flow.

    Merges the shared work of ``flow_by_depth`` (reference:
    losses/scene_flow_projection.py:95-153) and
    ``scene_flow_projection_slack`` (:204-278): the reference warps BOTH
    ``global_p2`` (3ch) and ``[p2_camera_2, depth_2]`` (4ch) by the same
    flow, but the warp is linear with partition-of-unity weights, so
    ``warp(global_p2) = R_2 @ warp(p2_camera_2) + t_2`` exactly — one
    4-channel warp replaces both (half the gather traffic, one kernel).

    ``warp_fn(buffer, flow) -> warped`` defaults to the XLA grid-sample
    path; the TPU path passes the fused Pallas kernel.
    """
    if warp_fn is None:
        warp_fn = backward_warp
    p1_camera_1 = unproject_camera(depth_1, cam_1)
    p2_camera_2 = unproject_camera(depth_2, cam_2)
    global_p1 = camera_to_world(p1_camera_1, cam_1)

    warp_src = jnp.concatenate([p2_camera_2, depth_2[..., None]], axis=-1)
    warped = warp_fn(warp_src, flow_1_2)
    warped_p2_camera_2 = warped[..., :3]
    depth_warp_1_2 = warped[..., 3]
    warped_global_p2 = camera_to_world(warped_p2_camera_2, cam_2)
    sf_by_depth = warped_global_p2 - global_p1

    return {
        "global_p1": global_p1,
        "sf_by_depth": sf_by_depth,
        "warped_p2_camera_2": warped_p2_camera_2,
        "depth_warp_1_2": depth_warp_1_2,
    }


def projection_stage(
    depth_1: jnp.ndarray,
    depth_2: jnp.ndarray,
    cam_2: Camera,
    sflow_1_2: jnp.ndarray,
    stage: Dict[str, jnp.ndarray],
) -> Dict[str, jnp.ndarray]:
    """Advect + reproject, completing ``scene_flow_projection`` from a
    ``depth_warp_stage`` result (reference: scene_flow_projection_slack,
    losses/scene_flow_projection.py:222-278). Returns the same dict schema
    as :func:`scene_flow_projection`."""
    b, h, w = depth_1.shape
    base = pixel_coords(h, w, dtype=depth_1.dtype)[None]
    global_p1 = stage["global_p1"]

    advected = global_p1 + sflow_1_2
    pix_1_in_2, p1_camera_2 = project(advected, cam_2)
    dflow_1_2 = pix_1_in_2 - base

    pix_static, _ = project(global_p1, cam_2)
    staticflow_1_2 = pix_static - base

    depth_image_1_2 = jnp.einsum(
        "bj,bhwj->bhw", cam_2.K[:, 2, :], p1_camera_2,
        precision=Precision.HIGHEST,
    )
    return {
        "dflow_1_2": dflow_1_2,
        "staticflow_1_2": staticflow_1_2,
        "depth_image_1_2": depth_image_1_2,
        "depth_warp_1_2": stage["depth_warp_1_2"],
        "depth_1": depth_1,
        "depth_2": depth_2,
        "scenef_1_2": sflow_1_2,
        "global_p1": global_p1,
        "p1_camera_2": p1_camera_2,
        "warped_p2_camera_2": stage["warped_p2_camera_2"],
    }


def rigidity_loss(global_p1: jnp.ndarray, sf: jnp.ndarray, depth_1: jnp.ndarray, s: float = 1.0):
    """Edge-aware local-rigidity loss (reference: calc_rigidity_loss,
    losses/scene_flow_projection.py:156-201 — defined but not wired into the
    reference's canonical model; provided for capability parity).

    Args:
      global_p1: ``[B, H, W, 3]`` world points.
      sf: ``[B, H, W, 3]`` scene flow.
      depth_1: ``[B, H, W]``.
    Returns:
      (total ``[B, H-2, W-2]``, dict of per-direction terms)
    """

    def shifts(x):
        c = x[:, 1:-1, 1:-1]
        u = x[:, :-2, 1:-1]
        d = x[:, 2:, 1:-1]
        l = x[:, 1:-1, :-2]
        r = x[:, 1:-1, 2:]
        return u, d, c, l, r

    p_u, p_d, p_c, p_l, p_r = shifts(global_p1)
    s_u, s_d, s_c, s_l, s_r = shifts(sf)
    d_u, d_d, d_c, d_l, d_r = shifts(depth_1)

    def norm(x):
        return jnp.linalg.norm(x, axis=-1)

    def maxpool3(x):
        # 3x3 max pool, stride 1, same padding — matches nn.MaxPool2d(3, 1, 1).
        pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="constant",
                      constant_values=-jnp.inf)
        stacked = jnp.stack(
            [pad[:, i : i + x.shape[1], j : j + x.shape[2]]
             for i in range(3) for j in range(3)],
            axis=0,
        )
        return jnp.max(stacked, axis=0)

    terms = {}
    total = 0.0
    for name, p_n, s_n, d_n in (
        ("u", p_u, s_u, d_u),
        ("d", p_d, s_d, d_d),
        ("l", p_l, s_l, d_l),
        ("r", p_r, s_r, d_r),
    ):
        l_n = jnp.abs(norm(p_n - p_c) - norm(s_n - s_c))
        w_n = jnp.exp(-s * maxpool3(jnp.abs(d_n - d_c)))
        terms["l" + name] = l_n
        terms["weight_" + name] = w_n
        total = total + w_n * l_n
    return total, terms
