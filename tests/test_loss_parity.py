"""End-to-end loss parity: our consistency_losses over our
scene_flow_projection must match the reference's _calc_loss semantics
computed with the reference's own geometry module
(models/scene_flow_motion_field.py:285-324), for identical inputs.

The torch side reconstructs the documented reductions (occlusion-masked
sums normalized by mask mass, disp on clamped z, channel-summed sf
residual) on top of the imported reference scene_flow_projection_slack —
exercising both the op and the reduction layer."""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

REFERENCE = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not available"
)
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

from dynamic_video_depth_tpu.ops import packed_from_camera, scene_flow_projection
from dynamic_video_depth_tpu.train.losses import LossConfig, consistency_losses

from test_geometry import random_camera, share_intrinsics  # noqa: E402


@needs_reference
@pytest.mark.parametrize("warm,use_disp,midas", [
    (False, True, True),   # canonical post-warm-up configuration
    (True, True, False),   # warm-up: L2 criterion
    (False, False, False),  # sf-loss branch
])
def test_loss_matches_reference_semantics(rng, warm, use_disp, midas):
    import torch
    from losses.scene_flow_projection import scene_flow_projection_slack

    b, h, w = 1, 10, 14
    cam1 = random_camera(rng, b)
    cam2 = share_intrinsics(cam1, random_camera(rng, b))
    depth1 = (1 + rng.rand(b, h, w) * 4).astype(np.float32)
    depth2 = (1 + rng.rand(b, h, w) * 4).astype(np.float32)
    flow12 = (rng.randn(b, h, w, 2) * 1.5).astype(np.float32)
    sf = (rng.randn(b, h, w, 3) * 0.05).astype(np.float32)
    sf_by_depth = (rng.randn(b, h, w, 3) * 0.05).astype(np.float32)
    mask2 = (rng.rand(b, h, w) > 0.3).astype(np.float32)

    cfg = LossConfig(flow_mul=1.0, disp_mul=1.0, use_disp=use_disp,
                     midas=midas)
    pred = scene_flow_projection(
        jnp.asarray(depth1), jnp.asarray(depth2), jnp.asarray(flow12),
        cam1, cam2, jnp.asarray(sf),
    )
    pred = dict(pred)
    pred["sf_1_2"] = jnp.asarray(sf)
    pred["sf_by_dep_1_2"] = jnp.asarray(sf_by_depth)
    loss, logs = consistency_losses(pred, jnp.asarray(flow12),
                                    jnp.asarray(mask2), cfg, warm=warm)

    # ------------------------------------------------- torch reference side
    tt = lambda x: torch.from_numpy(np.ascontiguousarray(x))
    R1, R1T, t1, K, Kinv = (np.asarray(x) for x in packed_from_camera(cam1))
    R2, R2T, t2, _, _ = (np.asarray(x) for x in packed_from_camera(cam2))
    mod = scene_flow_projection_slack()
    out = mod(
        tt(depth1[:, None]), tt(depth2[:, None]), tt(flow12), tt(flow12),
        tt(R1), tt(R2), tt(R1T), tt(R2T), tt(t1), tt(t2), tt(K), tt(Kinv),
        tt(sf[:, :, :, None, :]), tt(sf[:, :, :, None, :]),
    )
    # _calc_loss reductions (models/scene_flow_motion_field.py:285-324)
    mask = tt(mask2[..., None, None])  # [B,H,W,1,1]
    if midas:
        mask = (tt(depth1[:, None]) < 100).float().squeeze(1)[..., None, None] * mask
        mask = (out["warped_p2_camera_2"][..., 2] < 100).float().squeeze(3)[..., None, None] * mask
    crit = (lambda a, b_: (a - b_) ** 2) if warm else (lambda a, b_: (a - b_).abs())
    occ = mask[:, None, ..., 0, 0].permute([0, 2, 3, 1])
    fl = crit(out["dflow_1_2"], tt(flow12))
    flow_loss = (occ * fl.squeeze(3)).sum() / (occ.sum() + 1e-8)

    if use_disp:
        z1 = out["p1_camera_2"][..., -1].clamp(min=1e-3)
        z2 = out["warped_p2_camera_2"][..., -1].clamp(min=1e-3)
        dl = (100 * (1 / z1 - 1 / z2).abs()).permute([0, 3, 1, 2])
    else:
        # reference disp_loss falls back to |d1 - d2| without --use_disp
        # (models/scene_flow_motion_field.py:140-150)
        dl = (out["p1_camera_2"][..., -1]
              - out["warped_p2_camera_2"][..., -1]).abs().permute([0, 3, 1, 2])
    disp_loss = (occ[:, None, ..., 0] * dl[:, 0:1]).sum() / (occ.sum() + 1e-8)

    sf_pp = (tt(sf_by_depth).permute(0, 3, 1, 2)
             - tt(sf).permute(0, 3, 1, 2)).abs()
    sf_loss = (occ[:, None, ..., 0] * sf_pp).sum() / (occ.sum() + 1e-8)

    second = disp_loss if use_disp else sf_loss
    ref_loss = flow_loss * cfg.flow_mul + second * cfg.disp_mul

    np.testing.assert_allclose(float(logs["flow_loss_1_2"]),
                               float(flow_loss), rtol=1e-4)
    np.testing.assert_allclose(float(logs["disp_loss_1_2"]),
                               float(disp_loss), rtol=1e-4)
    np.testing.assert_allclose(float(logs["sf_loss"]), float(sf_loss),
                               rtol=1e-4)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
