"""Geometry op tests.

Two layers of checking:
1. Self-consistency properties (unproject∘project identity, zero flow for a
   static camera) that hold by construction.
2. Numerical parity against the reference torch implementation, used purely
   as a test oracle (imported from /root/reference when present; skipped
   otherwise). No reference code is vendored here.
"""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from dynamic_video_depth_tpu.ops import (
    Camera,
    camera_from_packed,
    packed_from_camera,
    unproject,
    project,
    flow_by_depth,
    scene_flow_projection,
)

REFERENCE = "/root/reference"


def random_camera(rng, b=1):
    # proper rotation via QR with positive determinant
    rs, ts, ks = [], [], []
    for _ in range(b):
        q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        rs.append(q)
        ts.append(rng.randn(3) * 0.1)
        f = 50 + rng.rand() * 50
        ks.append(np.array([[f, 0, 8.0], [0, f, 6.0], [0, 0, 1.0]]))
    R = np.stack(rs).astype(np.float32)
    t = np.stack(ts).astype(np.float32)
    K = np.stack(ks).astype(np.float32)
    K_inv = np.linalg.inv(K).astype(np.float32)
    return Camera(
        R_c2w=jnp.asarray(R), t=jnp.asarray(t),
        K=jnp.asarray(K), K_inv=jnp.asarray(K_inv),
    )


def test_unproject_project_roundtrip(rng):
    b, h, w = 2, 12, 16
    cam = random_camera(rng, b)
    depth = (1.0 + rng.rand(b, h, w) * 5).astype(np.float32)
    pts = unproject(jnp.asarray(depth), cam)
    pix, cam_pts = project(pts, cam)
    # projecting into the same camera must give back the pixel grid
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    expected = np.stack([xx, yy], axis=-1)[None].repeat(b, 0).astype(np.float32)
    np.testing.assert_allclose(np.asarray(pix), expected, atol=2e-2)
    # and the camera-frame z must equal the input depth
    np.testing.assert_allclose(np.asarray(cam_pts[..., 2]), depth, rtol=1e-4, atol=1e-4)


def test_static_scene_zero_flow(rng):
    """Same camera in both frames, equal depths, zero scene flow =>
    depth-induced flow and projected flow are exactly zero."""
    b, h, w = 1, 10, 14
    cam = random_camera(rng, b)
    depth = (1.0 + rng.rand(b, h, w) * 3).astype(np.float32)
    zero_flow = np.zeros((b, h, w, 2), np.float32)

    out = flow_by_depth(
        jnp.asarray(depth), jnp.asarray(depth), jnp.asarray(zero_flow), cam, cam
    )
    np.testing.assert_allclose(np.asarray(out["dflow_1_2"]), 0, atol=2e-2)
    np.testing.assert_allclose(np.asarray(out["sf_by_depth"]), 0, atol=2e-2)

    proj = scene_flow_projection(
        jnp.asarray(depth), jnp.asarray(depth), jnp.asarray(zero_flow),
        cam, cam, jnp.zeros((b, h, w, 3), jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(proj["dflow_1_2"]), 0, atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(proj["depth_warp_1_2"]), depth, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(proj["p1_camera_2"][..., 2]), depth, rtol=1e-4, atol=1e-4
    )


def test_packed_roundtrip(rng):
    cam = random_camera(rng, 2)
    R, R_T, t, K, K_inv = packed_from_camera(cam)
    cam2 = camera_from_packed(R, t, K, K_inv)
    for a, b_ in zip(cam, cam2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-6)


# ---------------------------------------------------------------------------
# Oracle parity vs the reference torch implementation (skipped when absent).
# ---------------------------------------------------------------------------

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not available"
)


def _reference_modules():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from losses import scene_flow_projection as ref  # noqa: PLC0415

    return ref


def _packed_numpy(cam):
    R, R_T, t, K, K_inv = packed_from_camera(cam)
    return tuple(np.asarray(x) for x in (R, R_T, t, K, K_inv))


def share_intrinsics(cam_a, cam_b):
    """The reference passes a single K/K_inv for both frames of a pair
    (losses/scene_flow_projection.py:114, :222) — same-video constant
    intrinsics. Align the oracle tests with that contract."""
    return Camera(R_c2w=cam_b.R_c2w, t=cam_b.t, K=cam_a.K, K_inv=cam_a.K_inv)


@needs_reference
def test_flow_by_depth_matches_reference(rng):
    import torch

    ref = _reference_modules()
    b, h, w = 2, 11, 15
    cam1 = random_camera(rng, b)
    cam2 = share_intrinsics(cam1, random_camera(rng, b))
    depth1 = (1 + rng.rand(b, h, w) * 4).astype(np.float32)
    depth2 = (1 + rng.rand(b, h, w) * 4).astype(np.float32)
    flow = (rng.randn(b, h, w, 2) * 2).astype(np.float32)

    ours = flow_by_depth(
        jnp.asarray(depth1), jnp.asarray(depth2), jnp.asarray(flow), cam1, cam2
    )

    R1, R1T, t1, K, Kinv = _packed_numpy(cam1)
    R2, R2T, t2, _, _ = _packed_numpy(cam2)
    mod = ref.flow_by_depth()
    tt = lambda x: torch.from_numpy(np.ascontiguousarray(x))
    out = mod(
        tt(depth1[:, None]), tt(depth2[:, None]), tt(flow),
        tt(R1), tt(R2), tt(R1T), tt(R2T), tt(t1), tt(t2), tt(K), tt(Kinv),
    )
    np.testing.assert_allclose(
        np.asarray(ours["dflow_1_2"]), out["dflow_1_2"].numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours["sf_by_depth"]),
        out["sf_by_depth"].numpy().squeeze(3),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["global_p1"]),
        out["global_p1"].numpy().squeeze(3),
        rtol=1e-4, atol=1e-4,
    )


@needs_reference
def test_scene_flow_projection_matches_reference(rng):
    import torch

    ref = _reference_modules()
    b, h, w = 1, 12, 10
    cam1 = random_camera(rng, b)
    cam2 = share_intrinsics(cam1, random_camera(rng, b))
    depth1 = (1 + rng.rand(b, h, w) * 4).astype(np.float32)
    depth2 = (1 + rng.rand(b, h, w) * 4).astype(np.float32)
    flow12 = (rng.randn(b, h, w, 2) * 2).astype(np.float32)
    flow21 = (rng.randn(b, h, w, 2) * 2).astype(np.float32)
    sf = (rng.randn(b, h, w, 3) * 0.05).astype(np.float32)

    ours = scene_flow_projection(
        jnp.asarray(depth1), jnp.asarray(depth2), jnp.asarray(flow12),
        cam1, cam2, jnp.asarray(sf),
    )

    R1, R1T, t1, K, Kinv = _packed_numpy(cam1)
    R2, R2T, t2, _, _ = _packed_numpy(cam2)
    mod = ref.scene_flow_projection_slack()
    tt = lambda x: torch.from_numpy(np.ascontiguousarray(x))
    out = mod(
        tt(depth1[:, None]), tt(depth2[:, None]), tt(flow12), tt(flow21),
        tt(R1), tt(R2), tt(R1T), tt(R2T), tt(t1), tt(t2), tt(K), tt(Kinv),
        tt(sf[:, :, :, None, :]), tt(sf[:, :, :, None, :]),
    )
    checks = [
        ("dflow_1_2", ours["dflow_1_2"], out["dflow_1_2"].numpy()),
        ("staticflow_1_2", ours["staticflow_1_2"], out["staticflow_1_2"].numpy()),
        ("depth_warp_1_2", ours["depth_warp_1_2"], out["depth_warp_1_2"].numpy().squeeze(1)),
        ("p1_camera_2", ours["p1_camera_2"], out["p1_camera_2"].numpy().squeeze(3)),
        (
            "warped_p2_camera_2",
            ours["warped_p2_camera_2"],
            out["warped_p2_camera_2"].numpy().squeeze(3),
        ),
        (
            "depth_image_1_2",
            ours["depth_image_1_2"],
            out["depth_image_1_2"].numpy().squeeze(1),
        ),
    ]
    for name, mine, theirs in checks:
        np.testing.assert_allclose(
            np.asarray(mine), theirs, rtol=1e-4, atol=1e-4, err_msg=name
        )


def test_merged_stages_match_composition(rng):
    """depth_warp_stage + projection_stage (one shared 4-channel warp, the
    warp-linearity identity warp(R p + t) = R warp(p) + t) must reproduce
    flow_by_depth + scene_flow_projection exactly — values AND gradients
    w.r.t. both depths."""
    import jax

    from dynamic_video_depth_tpu.ops import depth_warp_stage, projection_stage

    b, h, w = 1, 12, 16
    cam_1 = random_camera(rng, b)
    cam_2 = random_camera(rng, b)
    depth_1 = jnp.asarray((1.0 + rng.rand(b, h, w) * 5).astype(np.float32))
    depth_2 = jnp.asarray((1.0 + rng.rand(b, h, w) * 5).astype(np.float32))
    flow = jnp.asarray((rng.randn(b, h, w, 2) * 2).astype(np.float32))
    sf = jnp.asarray((rng.randn(b, h, w, 3) * 0.05).astype(np.float32))

    old_fbd = flow_by_depth(depth_1, depth_2, flow, cam_1, cam_2)
    old_proj = scene_flow_projection(depth_1, depth_2, flow, cam_1, cam_2, sf)

    stage = depth_warp_stage(depth_1, depth_2, flow, cam_1, cam_2)
    new_proj = projection_stage(depth_1, depth_2, cam_2, sf, stage)

    np.testing.assert_allclose(np.asarray(stage["global_p1"]),
                               np.asarray(old_fbd["global_p1"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stage["sf_by_depth"]),
                               np.asarray(old_fbd["sf_by_depth"]),
                               rtol=1e-4, atol=1e-5)
    for k in old_proj:
        np.testing.assert_allclose(
            np.asarray(new_proj[k]), np.asarray(old_proj[k]),
            rtol=1e-4, atol=1e-5, err_msg=k,
        )

    # gradient parity through the warp (depth_2 feeds the warped buffer)
    def loss_old(d1, d2):
        fbd = flow_by_depth(d1, d2, flow, cam_1, cam_2)
        pr = scene_flow_projection(d1, d2, flow, cam_1, cam_2, sf)
        return (jnp.sum(jnp.abs(fbd["sf_by_depth"]))
                + jnp.sum(jnp.abs(pr["dflow_1_2"]))
                + jnp.sum(jnp.abs(pr["depth_warp_1_2"])))

    def loss_new(d1, d2):
        st = depth_warp_stage(d1, d2, flow, cam_1, cam_2)
        pr = projection_stage(d1, d2, cam_2, sf, st)
        return (jnp.sum(jnp.abs(st["sf_by_depth"]))
                + jnp.sum(jnp.abs(pr["dflow_1_2"]))
                + jnp.sum(jnp.abs(pr["depth_warp_1_2"])))

    g_old = jax.grad(loss_old, argnums=(0, 1))(depth_1, depth_2)
    g_new = jax.grad(loss_new, argnums=(0, 1))(depth_1, depth_2)
    for a, b_ in zip(g_old, g_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)
