"""Synthetic video fixture generator.

Writes a miniature dataset in the exact reference datafile layout
(frames_midas/<track>/frame_XXXXX.npz + sequences_select_pairs_midas/<track>/
001/shuffle_False_gap_GG_sequence_CCCCC.pt) so the loaders, trainer and
benchmarks can run without the real DAVIS artifacts. The scene is a textured
fronto-parallel plane + moving blob with a slowly translating camera; flows
are the exact depth-induced flows, so the optimization has a consistent
geometric solution.
"""

from __future__ import annotations

import os
from os.path import join
from typing import Optional

import numpy as np


def _sample_mask(mask: np.ndarray, ys: np.ndarray, xs: np.ndarray) -> np.ndarray:
    """Nearest-neighbor boolean mask lookup with border clamp."""
    h, w = mask.shape
    iy = np.clip(np.round(ys).astype(int), 0, h - 1)
    ix = np.clip(np.round(xs).astype(int), 0, w - 1)
    return mask[iy, ix]


def _smooth_noise(rng, h, w, scale=4):
    small = rng.rand(h // scale + 2, w // scale + 2)
    ys = np.linspace(0, small.shape[0] - 1.001, h)
    xs = np.linspace(0, small.shape[1] - 1.001, w)
    yi, xi = np.floor(ys).astype(int), np.floor(xs).astype(int)
    fy, fx = (ys - yi)[:, None], (xs - xi)[None, :]
    a = small[yi][:, xi]
    b = small[yi][:, xi + 1]
    c = small[yi + 1][:, xi]
    d = small[yi + 1][:, xi + 1]
    return a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx + c * fy * (1 - fx) + d * fy * fx


def make_track(
    root: str,
    track: str = "dog",
    n_frames: int = 12,
    h: int = 64,
    w: int = 96,
    gaps=(1, 2),
    seed: int = 0,
    torch_save: Optional[bool] = None,
    moving_object: bool = False,
    object_velocity=(0.08, 0.0, 0.0),
):
    """Generate a synthetic track under ``root`` in reference layout.

    With ``moving_object`` a foreground square at a nearer depth translates
    with constant world velocity; depths, flows, occlusion and motion
    segmentation are all EXACT two-layer geometry, so the scene-flow field
    has a known ground-truth solution (``object_velocity`` per frame).
    """
    import torch

    rng = np.random.RandomState(seed)
    frame_dir = join(root, "frames_midas", track)
    seq_dir = join(root, "sequences_select_pairs_midas", track, "001")
    os.makedirs(frame_dir, exist_ok=True)
    os.makedirs(seq_dir, exist_ok=True)

    f = 0.8 * w
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    K_inv = np.linalg.inv(K).astype(np.float32)

    texture = _smooth_noise(rng, h, w, 8)
    base_depth = 2.0 + 2.0 * _smooth_noise(rng, h, w, 16)

    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    pix_h = np.stack([xx, yy, np.ones_like(xx)], -1)  # [H, W, 3]

    vel = np.asarray(object_velocity, np.float32)
    fg_depth = 1.2  # in front of the 2..4 background
    # foreground world square at frame 0, centered mid-image
    cx0, cy0 = w * 0.35, h * 0.4
    half = min(h, w) * 0.15

    def fg_region(i):
        """Pixel mask of the moving square in frame i (exact projection)."""
        if not moving_object:
            return np.zeros((h, w), bool)
        pose = frame_pose(i)
        # square corners in world space at time i
        c0 = np.array([(cx0 - w / 2) / f * fg_depth,
                       (cy0 - h / 2) / f * fg_depth, fg_depth])
        c0 = c0 + vel * i
        # project center + extent into frame i
        rel = c0 - pose[:3, 3]
        cam = pose[:3, :3].T @ rel
        pix = (K @ cam)[:2] / cam[2]
        half_px = half * fg_depth / cam[2]
        return ((np.abs(xx - pix[0]) < half_px)
                & (np.abs(yy - pix[1]) < half_px))

    def frame_pose(i):
        t = np.array([0.02 * i, 0.005 * i, -0.01 * i], np.float32)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = t
        return pose

    frames = []
    for i in range(n_frames):
        pose = frame_pose(i)
        img = np.stack(
            [texture, np.roll(texture, i, axis=1), 1 - texture], axis=-1
        ).astype(np.float32)
        depth = base_depth.astype(np.float32).copy()
        region = fg_region(i)
        if moving_object:
            # camera-frame depth of the fg plane (z = fg_depth in world,
            # camera z offset by pose z)
            depth[region] = fg_depth - pose[2, 3]
            img[region] = np.array([1.0, 0.2, 0.1], np.float32)

        np.savez(
            join(frame_dir, "frame_%05d.npz" % i),
            img=img,
            pose_c2w=pose,
            intrinsics=K,
            depth_pred=depth,
            depth_mvs=depth,
            img_orig=img,
            motion_seg=region.astype(np.float32) if moving_object
            else np.ones((h, w), np.float32),
        )
        frames.append(dict(img=img, pose=pose, depth=depth, region=region))

    # exact depth-induced flow between frames: static background + the
    # foreground layer advected by the object velocity
    def flow_1_2(i, j):
        d = frames[i]["depth"]
        cam = d[..., None] * (pix_h @ K_inv.T)
        world = cam @ frames[i]["pose"][:3, :3].T + frames[i]["pose"][:3, 3]
        if moving_object:
            world = world + frames[i]["region"][..., None] * vel * (j - i)
        rel = world - frames[j]["pose"][:3, 3]
        cam2 = rel @ frames[j]["pose"][:3, :3]  # R^T rows
        img2 = cam2 @ K.T
        pix2 = img2[..., :2] / img2[..., 2:3]
        return (pix2 - pix_h[..., :2]).astype(np.float32)

    def occlusion(i, j):
        """1 where a frame-i pixel is covered/invalid in frame j: background
        pixels whose target lands inside frame j's foreground square."""
        if not moving_object:
            return np.zeros((h, w), np.float32)
        fl = flow_1_2(i, j)
        tx = xx + fl[..., 0]
        ty = yy + fl[..., 1]
        target_in_fg = _sample_mask(frames[j]["region"], ty, tx)
        bg = ~frames[i]["region"]
        return (bg & target_in_fg).astype(np.float32)

    for g in gaps:
        cnt = 0
        for i in range(n_frames - 1 - g):
            j = i + g
            f12 = flow_1_2(i, j)
            f21 = flow_1_2(j, i)
            # reference stage-2 convention (generate_flows.py:139-148):
            # mask_2 lives on the FRAME-1 pixel grid (validity toward frame
            # 2, used by the losses); mask_1 on the frame-2 grid.
            mask_2 = torch.from_numpy(
                1.0 - occlusion(i, j)
            ).reshape(1, h, w, 1, 1).float()
            mask_1 = torch.from_numpy(
                1.0 - occlusion(j, i)
            ).reshape(1, h, w, 1, 1).float()
            mseg = torch.from_numpy(
                frames[i]["region"].astype(np.float32)
            ).reshape(1, h, w, 1, 1) if moving_object else torch.ones(1, h, w, 1, 1)
            sample = {
                "R_1": torch.from_numpy(frames[i]["pose"][:3, :3].T.copy()).reshape(1, 1, 1, 3, 3),
                "R_2": torch.from_numpy(frames[j]["pose"][:3, :3].T.copy()).reshape(1, 1, 1, 3, 3),
                "R_1_T": torch.from_numpy(frames[i]["pose"][:3, :3].copy()).reshape(1, 1, 1, 3, 3),
                "R_2_T": torch.from_numpy(frames[j]["pose"][:3, :3].copy()).reshape(1, 1, 1, 3, 3),
                "t_1": torch.from_numpy(frames[i]["pose"][:3, 3].copy()).reshape(1, 1, 1, 1, 3),
                "t_2": torch.from_numpy(frames[j]["pose"][:3, 3].copy()).reshape(1, 1, 1, 1, 3),
                "K": torch.from_numpy(K.T.copy()).reshape(1, 1, 1, 3, 3),
                "K_inv": torch.from_numpy(K_inv.T.copy()).reshape(1, 1, 1, 3, 3),
                "img_1": torch.from_numpy(frames[i]["img"])[None],
                "img_2": torch.from_numpy(frames[j]["img"])[None],
                "depth_1": torch.from_numpy(frames[i]["depth"])[None, None],
                "depth_pred_1": torch.from_numpy(frames[i]["depth"])[None, None],
                "flow_1_2": torch.from_numpy(f12)[None],
                "flow_2_1": torch.from_numpy(f21)[None],
                "mask_1": mask_1,
                "mask_2": mask_2,
                "motion_seg_1": mseg,
                "fid_1": torch.FloatTensor([i]),
                "fid_2": torch.FloatTensor([j]),
            }
            torch.save(
                sample,
                join(seq_dir, f"shuffle_False_gap_{g:02d}_sequence_{cnt:05d}.pt"),
            )
            cnt += 1
    return frame_dir, seq_dir
