"""Preprocessing stage 2: RAFT flow + fwd/bwd-consistency occlusion masks
(reference: scripts/preprocess/davis/generate_flows.py).

Per (frame, gap) pair:
1. RAFT fwd and bwd flow at 288x512 (20 iters) on TPU — both directions in
   one batched call,
2. bicubic-resize flows to the working resolution with per-axis magnitude
   scaling (reference :44-54),
3. occlusion mask = (fwd/bwd consistency error > 1px) OR out-of-bounds
   (reference :139-148),
4. save ``flowpair_xxxxx_yyyyy.npz {flow_1_2, flow_2_1, mask_1, mask_2,
   frame_id_1, frame_id_2}``.
"""

from __future__ import annotations

import os
from glob import glob
from os.path import join
from typing import Callable, Sequence

import numpy as np

RAFT_RES = (288, 512)
RAFT_ITERS = 20


def resize_flow(flow: np.ndarray, out_hw) -> np.ndarray:
    """Bicubic flow resize with magnitude scaling (reference :44-54)."""
    import jax.numpy as jnp

    from ..ops.resize import resize_bicubic

    h, w = flow.shape[:2]
    nh, nw = out_hw
    out = np.array(
        resize_bicubic(jnp.asarray(flow[None], jnp.float32), (nh, nw), False)[0]
    )
    out[..., 0] *= nw / float(w)
    out[..., 1] *= nh / float(h)
    return out


def oob_mask(flow: np.ndarray) -> np.ndarray:
    """Targets leaving the frame (reference :57-66)."""
    h, w = flow.shape[:2]
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    tx = xx + flow[..., 0]
    ty = yy + flow[..., 1]
    m = (tx < 0) | (tx > w - 1) | (ty < 0) | (ty > h - 1)
    return m.astype(np.float32)


def backward_flow_warp(field: np.ndarray, flow_1_2: np.ndarray) -> np.ndarray:
    """Sample ``field`` at pixel+flow (border clamp, bilinear)."""
    import jax.numpy as jnp

    from ..ops.grid_sample import backward_warp

    out = backward_warp(
        jnp.asarray(field[None], jnp.float32), jnp.asarray(flow_1_2[None])
    )
    return np.asarray(out[0])


def occlusion_masks(flow_1_2: np.ndarray, flow_2_1: np.ndarray, thresh=1.0):
    """(reference :139-148): mask_k = 1 where pixel of frame k is occluded."""
    warp_f12 = backward_flow_warp(flow_1_2, flow_2_1)
    err_1 = np.linalg.norm(warp_f12 + flow_2_1, axis=-1)
    mask_1 = np.clip((err_1 > thresh) + oob_mask(flow_2_1), 0, 1)
    warp_f21 = backward_flow_warp(flow_2_1, flow_1_2)
    err_2 = np.linalg.norm(warp_f21 + flow_1_2, axis=-1)
    mask_2 = np.clip((err_2 > thresh) + oob_mask(flow_1_2), 0, 1)
    return mask_1.astype(np.uint8), mask_2.astype(np.uint8)


def make_raft_flow_fn(ckpt_path: str | None = None) -> Callable:
    """Build a TPU RAFT flow predictor ``(im1, im2) -> flow [H, W, 2]``
    batching fwd+bwd directions into one call."""
    import jax
    import jax.numpy as jnp

    from ..models.raft import RAFT
    from ..models.torch_port import load_torch_state_dict, port_torch_variables

    net = RAFT()
    variables = None

    @jax.jit
    def apply(v, im1, im2):
        _, flow_up = net.apply(v, im1, im2, iters=RAFT_ITERS)
        return flow_up

    def flow_fn(im1: np.ndarray, im2: np.ndarray) -> np.ndarray:
        """im1/im2 [H, W, 3] in [0, 255] at RAFT_RES; returns fwd+bwd flows."""
        nonlocal variables
        a = jnp.asarray(np.stack([im1, im2]), jnp.float32)
        b = jnp.asarray(np.stack([im2, im1]), jnp.float32)
        if variables is None:
            variables = net.init(jax.random.PRNGKey(0), a[:1], b[:1], iters=1)
            if ckpt_path and os.path.isfile(ckpt_path):
                from ..models.torch_port import unused_torch_keys

                sd = load_torch_state_dict(ckpt_path)
                # official raft-sintel.pth is saved from nn.DataParallel
                # (reference: generate_flows.py:96-98)
                sd = {k.removeprefix("module."): v for k, v in sd.items()}
                variables = port_torch_variables(variables, sd)
                leftovers = [k for k in unused_torch_keys(variables, sd)
                             if "num_batches" not in k]
                if leftovers:
                    raise KeyError(
                        f"RAFT checkpoint keys not consumed by the port "
                        f"(layout drift?): {leftovers[:5]}"
                    )
        out = np.asarray(apply(variables, a, b))
        return out[0], out[1]

    return flow_fn


def generate_pair(flow_fn, im1_data: dict, im2_data: dict):
    """One pair's flows + masks at the frame working resolution."""
    import jax.numpy as jnp

    from ..ops.resize import resize_bilinear

    h, w = im1_data["img"].shape[:2]

    def prep(d):
        img = np.asarray(d["img_orig"], np.float32) * 255.0
        img_rs = np.asarray(resize_bilinear(
            jnp.asarray(img[None]), RAFT_RES, False
        )[0])
        return img_rs

    f12, f21 = flow_fn(prep(im1_data), prep(im2_data))
    flow_1_2 = resize_flow(f12, (h, w))
    flow_2_1 = resize_flow(f21, (h, w))
    mask_1, mask_2 = occlusion_masks(flow_1_2, flow_2_1)
    return {
        "flow_1_2": flow_1_2.astype(np.float32),
        "flow_2_1": flow_2_1.astype(np.float32),
        "mask_1": mask_1,
        "mask_2": mask_2,
    }


def process_track(frame_dir: str, out_dir: str,
                  gaps: Sequence[int] = (1, 2, 3, 4, 5, 6, 7, 8),
                  ckpt_path: str | None = None):
    """(reference :165-178)."""
    os.makedirs(out_dir, exist_ok=True)
    files = sorted(glob(join(frame_dir, "frame_*.npz")))
    flow_fn = make_raft_flow_fn(ckpt_path)

    def load(i):
        return dict(np.load(files[i], allow_pickle=True))

    for g in gaps:
        for k in range(len(files) - g):
            out = generate_pair(flow_fn, load(k), load(k + g))
            out["frame_id_1"] = k
            out["frame_id_2"] = k + g
            np.savez(join(out_dir, f"flowpair_{k:05d}_{k + g:05d}.npz"), **out)
