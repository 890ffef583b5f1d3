"""Consistency losses (reference: models/scene_flow_motion_field.py:285-324,
:140-150, :326-344; models/video_base.py:30-36, :66-74).

All reductions reproduce the reference's exact normalizations: occlusion-
masked sums divided by the mask mass (channel sums ride the broadcast, so a
K-channel residual is summed over channels but normalized by the scalar mask
mass, exactly like the torch code)."""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp

_MASK_EPS = 1e-8
_MIDAS_FAR = 100.0


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss hyperparameters (reference flags:
    models/scene_flow_motion_field.py:33-67)."""

    flow_mul: float = 10.0
    disp_mul: float = 10.0
    acc_mul: float = 100.0
    sf_mag_div: float = 100.0
    use_disp: bool = False
    use_disp_ratio: bool = False
    midas: bool = False
    weight_steps: bool = False
    warm_reg: bool = False
    interp_steps: int = 5


def _masked_mean(x: jnp.ndarray, occ_mask: jnp.ndarray) -> jnp.ndarray:
    """sum(occ * x) / (sum(occ) + eps); channels of x sum into the numerator
    (the reference broadcasts the [B,H,W,1] mask over residual channels)."""
    return jnp.sum(occ_mask * x) / (jnp.sum(occ_mask) + _MASK_EPS)


def disp_residual(d1: jnp.ndarray, d2: jnp.ndarray, cfg: LossConfig) -> jnp.ndarray:
    """(reference: Model.disp_loss, models/scene_flow_motion_field.py:140-150)."""
    if cfg.use_disp:
        t1 = jnp.clip(d1, min=1e-3)
        t2 = jnp.clip(d2, min=1e-3)
        return 100.0 * jnp.abs(1.0 / t1 - 1.0 / t2)
    if cfg.use_disp_ratio:
        t1 = jnp.clip(d1, min=1e-3)
        t2 = jnp.clip(d2, min=1e-3)
        return jnp.maximum(t1, t2) / jnp.minimum(t1, t2) - 1.0
    return jnp.abs(d1 - d2)


def consistency_losses(
    pred: Dict[str, jnp.ndarray],
    flow_gt_1_2: jnp.ndarray,
    mask_2: jnp.ndarray,
    cfg: LossConfig,
    warm: bool,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Flow / disparity / scene-flow consistency losses
    (reference: _calc_loss, models/scene_flow_motion_field.py:285-324).

    Args:
      pred: outputs of ``ops.scene_flow_projection`` plus ``sf_1_2`` and
        ``sf_by_dep_1_2`` ``[B, H, W, 3]``, ``depth_1`` ``[B, H, W]``.
      flow_gt_1_2: ``[B, H, W, 2]`` observed flow.
      mask_2: ``[B, H, W]`` soft non-occlusion mask (already inverted by the
        preprocessing: 1 = valid).
      warm: warm-up phase -> L2 criterion, else L1.

    Returns:
      (total loss scalar, dict of logged scalars)
    """
    occ = mask_2[..., None]  # [B, H, W, 1]
    if cfg.midas:
        occ = occ * (pred["depth_1"][..., None] < _MIDAS_FAR).astype(occ.dtype)
        occ = occ * (
            pred["warped_p2_camera_2"][..., 2:3] < _MIDAS_FAR
        ).astype(occ.dtype)

    resid = pred["dflow_1_2"] - flow_gt_1_2
    flow_resid = resid**2 if warm else jnp.abs(resid)
    flow_loss_1_2 = _masked_mean(flow_resid, occ)

    disp = disp_residual(
        pred["p1_camera_2"][..., 2], pred["warped_p2_camera_2"][..., 2], cfg
    )
    disp_loss_1_2 = _masked_mean(disp[..., None], occ)

    sf_resid = jnp.abs(pred["sf_by_dep_1_2"] - pred["sf_1_2"])
    sf_loss = _masked_mean(sf_resid, occ)

    second = disp_loss_1_2 if cfg.use_disp else sf_loss
    loss = flow_loss_1_2 * cfg.flow_mul + second * cfg.disp_mul

    logs = {
        "loss": loss,
        "flow_loss_1_2": flow_loss_1_2,
        "disp_loss_1_2": disp_loss_1_2,
        "sf_loss": sf_loss,
    }
    return loss, logs


def acceleration_reg(sf_t0: jnp.ndarray, sf_t1: jnp.ndarray, cfg: LossConfig) -> jnp.ndarray:
    """Acceleration regularizer: the scene-flow field queried at the advected
    point one time step later should match (reference: _opt_reg,
    models/scene_flow_motion_field.py:326-344).

    Both inputs are ``[B, H, W, 3]``; returns ``acc_mul * mean |sf_t1 - sf_t0|``.
    """
    return cfg.acc_mul * jnp.mean(jnp.abs(sf_t1 - sf_t0))


def disparity_vali_loss(depth_pred: jnp.ndarray, depth_gt: jnp.ndarray) -> jnp.ndarray:
    """Masked disparity MSE used for model selection
    (reference: models/video_base.py:66-74).
    """

    def depth2disp(d):
        valid = (d > 1e-2).astype(d.dtype)
        return (1.0 / (d + (1.0 - valid) * 1e-8)) * valid

    valid_gt = (depth_gt > 1e-2).astype(depth_gt.dtype)
    a = depth2disp(depth_pred) * valid_gt
    b = depth2disp(depth_gt) * valid_gt
    return jnp.mean((a - b) ** 2)
