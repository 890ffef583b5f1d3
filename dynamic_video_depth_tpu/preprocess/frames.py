"""Preprocessing stage 1: per-frame depth init + scale calibration
(reference: scripts/preprocess/davis/generate_frame_midas.py,
scripts/preprocess/shutterstock/generate_frame_midas.py).

Pipeline per track:
1. run the (pretrained) MiDaS depth net over every frame on TPU,
2. project the triangulated sparse points into each frame and compute the
   per-track scale ``s = mean_over_frames(median(depth_net / depth_mvs))``
   (reference: davis generate_frame_midas.py:106-112),
3. flip the world->cam pose convention to cam->world with the y/z sign flip
   and scale the translations by ``s`` (reference: :55, :131),
4. resize images/depths to <=``max_width`` wide with height a multiple of
   ``multiple_of`` (64 for DAVIS, 32 for shutterstock; reference: :118-126),
5. save ``frame_%05d.npz`` with {img, pose_c2w, intrinsics, depth_pred,
   depth_mvs, img_orig, motion_seg}.
"""

from __future__ import annotations

import os
from os.path import join
from typing import Callable, Dict, List, Optional

import numpy as np


def flip_world_to_cam(pose_w2c: np.ndarray) -> np.ndarray:
    """w2c pose with graphics y/z axes -> c2w pose with vision axes
    (reference: davis generate_frame_midas.py:55 ``pose[1:3] *= -1`` then
    invert)."""
    flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float64)
    p = flip @ np.asarray(pose_w2c, np.float64)
    return np.linalg.inv(p).astype(np.float32)


def working_resolution(h: int, w: int, max_width: int = 384,
                       multiple_of: int = 64):
    """(reference: davis generate_frame_midas.py:118-126)."""
    scale = min(max_width / w, 1.0)
    nw = int(round(w * scale / multiple_of) * multiple_of) or multiple_of
    nh = int(round(h * scale / multiple_of) * multiple_of) or multiple_of
    return nh, nw


def calibration_scale(depth_pred_list: List[np.ndarray],
                      depth_mvs_list: List[np.ndarray]) -> float:
    """Per-track scale: mean over frames of the median prediction/MVS ratio
    on valid pixels (reference: davis generate_frame_midas.py:106-112)."""
    ratios = []
    for pred, mvs in zip(depth_pred_list, depth_mvs_list):
        valid = mvs > 1e-6
        if valid.sum() == 0:
            continue
        ratios.append(np.median(pred[valid] / mvs[valid]))
    return float(np.mean(ratios)) if ratios else 1.0


def resize_frame(img: np.ndarray, out_hw) -> np.ndarray:
    """Bilinear host-side resize (area-equivalent for mild downscales)."""
    import jax.numpy as jnp

    from ..ops.resize import resize_bilinear

    out = resize_bilinear(jnp.asarray(img[None], jnp.float32), out_hw, False)
    return np.asarray(out[0])


def scale_intrinsics(K: np.ndarray, sy: float, sx: float) -> np.ndarray:
    K = np.asarray(K, np.float32).copy()
    K[0, :] *= sx
    K[1, :] *= sy
    return K


def process_track(
    frames: List[Dict[str, np.ndarray]],
    out_dir: str,
    depth_fn: Callable[[np.ndarray], np.ndarray],
    max_width: int = 384,
    multiple_of: int = 64,
    batch_size: int = 4,
) -> float:
    """Run stage 1 for one track.

    Args:
      frames: list of dicts with ``img [H, W, 3]`` float in [0, 1],
        ``pose_w2c [4, 4]`` (graphics convention), ``intrinsics [3, 3]``,
        optional ``depth_mvs [H, W]`` sparse/dense metric depth and
        ``motion_seg [H, W]``.
      depth_fn: batched depth predictor ``[B, H', W', 3] -> [B, H', W']``
        (typically the ported-MiDaS apply fn running on TPU).

    Returns the calibration scale applied to the camera translations.
    """
    os.makedirs(out_dir, exist_ok=True)
    h, w = frames[0]["img"].shape[:2]
    nh, nw = working_resolution(h, w, max_width, multiple_of)

    # batched TPU inference over resized frames
    imgs_rs = np.stack([resize_frame(f["img"], (nh, nw)) for f in frames])
    preds = []
    for i in range(0, len(frames), batch_size):
        preds.append(np.asarray(depth_fn(imgs_rs[i:i + batch_size])))
    depth_pred = np.concatenate(preds, axis=0)

    mvs_rs = []
    for f in frames:
        mvs = f.get("depth_mvs")
        if mvs is None:
            mvs_rs.append(np.zeros((nh, nw), np.float32))
        else:
            mvs_rs.append(resize_frame(mvs[..., None], (nh, nw))[..., 0])
    mvs_rs = np.stack(mvs_rs)

    s = calibration_scale(list(depth_pred), list(mvs_rs))

    for i, f in enumerate(frames):
        pose_c2w = flip_world_to_cam(f["pose_w2c"])
        pose_c2w[:3, 3] *= s
        K = scale_intrinsics(f["intrinsics"], nh / h, nw / w)
        seg = f.get("motion_seg")
        seg = (resize_frame(seg[..., None].astype(np.float32), (nh, nw))[..., 0]
               if seg is not None else np.ones((nh, nw), np.float32))
        np.savez(
            join(out_dir, "frame_%05d.npz" % i),
            img=imgs_rs[i].astype(np.float32),
            pose_c2w=pose_c2w.astype(np.float32),
            intrinsics=K,
            depth_pred=depth_pred[i].astype(np.float32),
            depth_mvs=(mvs_rs[i] * s).astype(np.float32)
            if f.get("depth_mvs") is not None else depth_pred[i].astype(np.float32),
            img_orig=f["img"].astype(np.float32),
            motion_seg=seg,
        )
    return s


def make_midas_depth_fn(resize: Optional[tuple] = None):
    """Build a TPU depth predictor from the pretrained MiDaS checkpoint."""
    import jax
    import jax.numpy as jnp

    from ..models import MidasNet
    from ..models.torch_port import load_torch_state_dict, port_torch_variables
    from ..train.scene_flow_motion_field import MIDAS_PRETRAIN_PATH

    net = MidasNet(non_negative=True, normalize_input=True, resize=resize)

    variables = None

    @jax.jit
    def apply(v, imgs):
        return net.apply(v, imgs)

    def depth_fn(imgs: np.ndarray) -> np.ndarray:
        nonlocal variables
        if variables is None:
            variables = net.init(jax.random.PRNGKey(0), jnp.asarray(imgs[:1]))
            if os.path.isfile(MIDAS_PRETRAIN_PATH):
                sd = load_torch_state_dict(MIDAS_PRETRAIN_PATH)
                variables = port_torch_variables(variables, sd)
        return np.asarray(apply(variables, jnp.asarray(imgs)))

    return depth_fn
