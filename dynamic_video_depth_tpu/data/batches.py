"""Batch schema conversion: reference datafile layouts -> channel-last arrays.

The reference packs per-pair training batches as torch ``.pt`` dicts
(reference: scripts/preprocess/davis/generate_sequence_midas.py:117-193):

  R_1/R_2/R_1_T/R_2_T [1,1,1,3,3] (transposed row-vector mats), t_* [1,1,1,1,3],
  K/K_inv [1,1,1,3,3], img_1/img_2 [B,H,W,3] float HWC, flow_1_2/flow_2_1
  [B,H,W,2], mask_1/mask_2 [B,H,W,1,1] (1-ceil(occlusion)), motion_seg_1
  [B,H,W,1,1], depth_1/depth_pred_1 [B,1,H,W], fid_1/fid_2 [B].

and per-frame validation files as ``.npz``
(reference: scripts/preprocess/davis/generate_frame_midas.py:146-147):
  img [H,W,3], pose_c2w [4,4] (or [3,4]), intrinsics [3,3], depth_pred,
  depth_mvs [H,W], (motion_seg).

This module converts both into our flat numpy batch dict:
  img_1/img_2 [B,H,W,3], flow_1_2/flow_2_1 [B,H,W,2], mask_1/mask_2 [B,H,W],
  motion_seg_1 [B,H,W,1], R_1/R_2 [B,3,3] (plain R_c2w), t_1/t_2 [B,3],
  K/K_inv [B,3,3], time_stamp_1/2 [B,H,W,1], time_step [], frame_id_1/2 [B],
  depth_gt_1/depth_pred_1 [B,H,W].
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def load_packed_pt(path: str) -> Dict[str, np.ndarray]:
    """Load a reference packed ``.pt`` pair batch into numpy (torch is used
    purely as a deserializer on CPU)."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    for k, v in data.items():
        if isinstance(v, torch.Tensor):
            out[k] = v.numpy()
        else:
            out[k] = v
    return out


def _unpack_rot(m: np.ndarray) -> np.ndarray:
    """[1,1,1,3,3] packed transposed matrix -> [B,3,3] plain matrix."""
    m = np.asarray(m, np.float32).reshape(-1, 3, 3)
    return np.swapaxes(m, -1, -2)


def pair_batch_from_packed(
    raw: Dict[str, np.ndarray], n_frames: float, unit: float = 1.0
) -> Dict[str, np.ndarray]:
    """Packed pair dict -> training batch (reference time-stamp synthesis:
    datasets/davis_sequence.py:105-115)."""
    img_1 = np.asarray(raw["img_1"], np.float32)
    b, h, w, _ = img_1.shape

    fid_1 = np.asarray(raw["fid_1"], np.float32).reshape(b)
    fid_2 = np.asarray(raw["fid_2"], np.float32).reshape(b)
    ts1 = np.broadcast_to(
        (fid_1 / n_frames)[:, None, None, None], (b, h, w, 1)
    ).astype(np.float32)
    ts2 = np.broadcast_to(
        (fid_2 / n_frames)[:, None, None, None], (b, h, w, 1)
    ).astype(np.float32)

    def rep(m):
        """Broadcast pose mats stored with leading 1 to the batch size."""
        return np.broadcast_to(m, (b,) + m.shape[1:]).copy() if m.shape[0] != b else m

    batch = {
        "img_1": img_1,
        "img_2": np.asarray(raw["img_2"], np.float32),
        "flow_1_2": np.asarray(raw["flow_1_2"], np.float32),
        "flow_2_1": np.asarray(raw["flow_2_1"], np.float32),
        "mask_1": np.asarray(raw["mask_1"], np.float32).reshape(b, h, w),
        "mask_2": np.asarray(raw["mask_2"], np.float32).reshape(b, h, w),
        "motion_seg_1": np.asarray(raw["motion_seg_1"], np.float32).reshape(b, h, w, 1),
        "R_1": rep(_unpack_rot(raw["R_1"])),
        "R_2": rep(_unpack_rot(raw["R_2"])),
        "K": rep(_unpack_rot(raw["K"])),
        "K_inv": rep(_unpack_rot(raw["K_inv"])),
        "t_1": rep(np.asarray(raw["t_1"], np.float32).reshape(-1, 3)),
        "t_2": rep(np.asarray(raw["t_2"], np.float32).reshape(-1, 3)),
        "time_stamp_1": ts1,
        "time_stamp_2": ts2,
        "time_step": np.float32(unit / n_frames),
        "frame_id_1": fid_1,
        "frame_id_2": fid_2,
        "depth_gt_1": np.asarray(raw["depth_1"], np.float32).reshape(b, h, w),
        "depth_pred_1": np.asarray(raw["depth_pred_1"], np.float32).reshape(b, h, w),
    }
    return batch


# Host-side batch keys with non-array collation semantics. Every path that
# combines samples (grouped batches here, the chunked view in train/loop.py,
# the fleet assembly in train_fleet.py / data/prefetch.py) consults this
# table, so a new host-side key is added in ONE place:
SPECIAL_COLLATORS = {
    # bookkeeping strings stay a list
    "pair_path": lambda vals: [v for v in vals],
    # exactness bound for the fused warp: the combined batch needs the max
    "warp_window": lambda vals: max(int(v) for v in vals),
}


def collate_batches(samples) -> Dict[str, np.ndarray]:
    """Concatenate same-gap pair batches along the batch axis (the TPU
    analog of the reference's DataLoader batching; all samples must share
    the frame gap so the Euler step count stays static)."""
    out = {}
    first = samples[0]
    for key, v0 in first.items():
        special = SPECIAL_COLLATORS.get(key)
        if special is not None:
            out[key] = special([s[key] for s in samples])
        elif np.ndim(v0) == 0:
            out[key] = v0
        else:
            out[key] = np.concatenate([np.asarray(s[key]) for s in samples], 0)
    return out


def frame_batch_from_npz(
    raw: Dict[str, np.ndarray], idx: int, n_frames: float, unit: float = 1.0
) -> Dict[str, np.ndarray]:
    """Per-frame npz -> validation/test batch (reference:
    datasets/davis_sequence.py:117-152)."""
    img = np.asarray(raw["img"], np.float32)
    h, w, _ = img.shape
    pose = np.asarray(raw["pose_c2w"], np.float32)
    R = pose[:3, :3]
    t = pose[:3, 3]
    K = np.asarray(raw["intrinsics"], np.float32)

    batch = {
        "img": img[None],
        "time_stamp_1": np.full((1, h, w, 1), idx / n_frames, np.float32),
        "time_step": np.float32(unit / n_frames),
        "frame_id_1": np.asarray([idx], np.float32),
        "depth_pred": np.asarray(raw["depth_pred"], np.float32)[None],
        "depth_mvs": np.asarray(raw["depth_mvs"], np.float32)[None],
        "cam_c2w": pose[None],
        "R_1": R[None].astype(np.float32),
        "t_1": t[None].astype(np.float32),
        "K": K[None],
        "K_inv": np.linalg.inv(K)[None].astype(np.float32),
    }
    if "motion_seg" in raw:
        batch["motion_seg_1"] = np.asarray(raw["motion_seg"], np.float32).reshape(1, h, w, 1)
    return batch
