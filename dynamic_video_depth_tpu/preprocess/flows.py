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


def _init_raft_variables(net, sample, ckpt_path: str | None):
    """Init RAFT params, then port the official sintel checkpoint when given
    (module.-prefixed nn.DataParallel layout, reference:
    generate_flows.py:96-98). Raises if any official key goes unconsumed."""
    import jax

    variables = net.init(jax.random.PRNGKey(0), sample, sample, iters=1)
    if ckpt_path and os.path.isfile(ckpt_path):
        from ..models.torch_port import (
            load_torch_state_dict,
            port_torch_variables,
            unused_torch_keys,
        )

        sd = load_torch_state_dict(ckpt_path)
        sd = {k.removeprefix("module."): v for k, v in sd.items()}
        variables = port_torch_variables(variables, sd)
        leftovers = [k for k in unused_torch_keys(variables, sd)
                     if "num_batches" not in k]
        if leftovers:
            raise KeyError(
                f"RAFT checkpoint keys not consumed by the port "
                f"(layout drift?): {leftovers[:5]}"
            )
    return variables


def make_raft_flow_fn(ckpt_path: str | None = None,
                      iters: int | None = None) -> Callable:
    """Build a TPU RAFT flow predictor ``(im1, im2) -> flow [H, W, 2]``
    batching fwd+bwd directions into one call."""
    import jax
    import jax.numpy as jnp

    from ..models.raft import RAFT

    net = RAFT()
    variables = None

    @jax.jit
    def apply(v, im1, im2):
        # None -> the module global, resolved at trace time so tests (and
        # callers) may override RAFT_ITERS after import
        _, flow_up = net.apply(v, im1, im2,
                               iters=RAFT_ITERS if iters is None else iters)
        return flow_up

    def flow_fn(im1: np.ndarray, im2: np.ndarray) -> np.ndarray:
        """im1/im2 [H, W, 3] in [0, 255] at RAFT_RES; returns fwd+bwd flows."""
        nonlocal variables
        a = jnp.asarray(np.stack([im1, im2]), jnp.float32)
        b = jnp.asarray(np.stack([im2, im1]), jnp.float32)
        if variables is None:
            variables = _init_raft_variables(net, a[:1], ckpt_path)
        out = np.asarray(apply(variables, a, b))
        return out[0], out[1]

    return flow_fn


def make_raft_flow_batch_fn(ckpt_path: str | None = None, mesh=None,
                            iters: int | None = None) -> Callable:
    """Batched RAFT predictor ``(im1s, im2s) [N, H, W, 3] -> (f12s, f21s)``.

    With a :class:`jax.sharding.Mesh` (axis ``'data'``), the ``2N``-image
    batch (both directions of every pair) shards across the mesh so stage-2
    preprocessing scales over a chip fleet the same way training does
    (BASELINE config #4): params replicate, each chip runs RAFT on its
    slice, no cross-chip traffic. ``N`` is padded up to the axis size.
    """
    import jax
    import jax.numpy as jnp

    from ..models.raft import RAFT

    net = RAFT()
    variables = None
    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P("data"))

    @jax.jit
    def apply(v, a, b):
        _, flow_up = net.apply(v, a, b,
                               iters=RAFT_ITERS if iters is None else iters)
        return flow_up

    def flow_fn(im1s: np.ndarray, im2s: np.ndarray):
        nonlocal variables
        n = im1s.shape[0]
        # both directions ride one batch: [fwd pairs; bwd pairs]
        a = np.concatenate([im1s, im2s], axis=0).astype(np.float32)
        b = np.concatenate([im2s, im1s], axis=0).astype(np.float32)
        if shard is not None:
            d = mesh.devices.size
            pad = (-a.shape[0]) % d
            if pad:
                # cycle rows: the final chunk can be smaller than the pad
                total = a.shape[0] + pad
                reps = -(-total // a.shape[0])
                a = np.concatenate([a] * reps, axis=0)[:total]
                b = np.concatenate([b] * reps, axis=0)[:total]
            a = jax.device_put(jnp.asarray(a), shard)
            b = jax.device_put(jnp.asarray(b), shard)
        else:
            a = jnp.asarray(a)
            b = jnp.asarray(b)
        if variables is None:
            variables = _init_raft_variables(net, a[:1], ckpt_path)
        out = np.asarray(apply(variables, a, b))
        # rows [0, n) are forward flows, rows [n, 2n) backward flows
        # (padding rows, if any, sit past 2n and are dropped)
        return out[:n], out[n:2 * n]

    return flow_fn


def _prep_raft_input(frame_data: dict, raft_res=None) -> np.ndarray:
    """Original-resolution frame -> [H, W, 3] float image in [0, 255] at the
    RAFT inference resolution (reference: generate_flows.py:120-122)."""
    import jax.numpy as jnp

    from ..ops.resize import resize_bilinear

    raft_res = RAFT_RES if raft_res is None else raft_res
    img = np.asarray(frame_data["img_orig"], np.float32) * 255.0
    return np.asarray(resize_bilinear(jnp.asarray(img[None]), raft_res,
                                      False)[0])


def postprocess_pair(f12: np.ndarray, f21: np.ndarray, out_hw) -> dict:
    """RAFT-resolution flows -> working-resolution flows + occlusion masks."""
    flow_1_2 = resize_flow(f12, out_hw)
    flow_2_1 = resize_flow(f21, out_hw)
    mask_1, mask_2 = occlusion_masks(flow_1_2, flow_2_1)
    return {
        "flow_1_2": flow_1_2.astype(np.float32),
        "flow_2_1": flow_2_1.astype(np.float32),
        "mask_1": mask_1,
        "mask_2": mask_2,
    }


def generate_pair(flow_fn, im1_data: dict, im2_data: dict,
                  raft_res=None):
    """One pair's flows + masks at the frame working resolution."""
    h, w = im1_data["img"].shape[:2]
    f12, f21 = flow_fn(_prep_raft_input(im1_data, raft_res),
                       _prep_raft_input(im2_data, raft_res))
    return postprocess_pair(f12, f21, (h, w))


def process_track(frame_dir: str, out_dir: str,
                  gaps: Sequence[int] = (1, 2, 3, 4, 5, 6, 7, 8),
                  ckpt_path: str | None = None, mesh=None,
                  batch_pairs: int | None = None, raft_res=None,
                  iters: int | None = None):
    """(reference :165-178). All (frame, gap) pairs of the track.

    ``mesh``: a jax Mesh with a ``'data'`` axis shards the RAFT batch across
    chips — the fleet analog of training's one-video-per-chip strategy (the
    reference's shutterstock variant batches one source frame's gap targets
    into one GPU call, generate_flows.py:112-163; here every chip takes a
    slice of the full pair list). ``batch_pairs`` pairs go into each
    dispatch (default: the mesh axis size, or 1 serially).
    """
    os.makedirs(out_dir, exist_ok=True)
    files = sorted(glob(join(frame_dir, "frame_*.npz")))
    if batch_pairs is None:
        batch_pairs = int(mesh.devices.size) if mesh is not None else 1
    flow_fn = make_raft_flow_batch_fn(ckpt_path, mesh, iters)

    def load(i):
        return dict(np.load(files[i], allow_pickle=True))

    h, w = load(0)["img"].shape[:2] if files else (0, 0)
    # bounded LRU of RAFT-resolution frames: pairs reference each frame
    # across all gaps, but an unbounded cache holds the whole track in host
    # RAM (~1 GB for a reference-scale track)
    from collections import OrderedDict

    prepped: OrderedDict = OrderedDict()
    max_cached = max(64, 4 * batch_pairs)

    def prep(i):
        if i in prepped:
            prepped.move_to_end(i)
        else:
            prepped[i] = _prep_raft_input(load(i), raft_res)
            while len(prepped) > max_cached:
                prepped.popitem(last=False)
        return prepped[i]

    pair_list = [(k, k + g) for g in gaps for k in range(len(files) - g)]
    for lo in range(0, len(pair_list), batch_pairs):
        chunk = pair_list[lo:lo + batch_pairs]
        im1s = np.stack([prep(i) for i, _ in chunk])
        im2s = np.stack([prep(j) for _, j in chunk])
        f12s, f21s = flow_fn(im1s, im2s)
        for (i, j), f12, f21 in zip(chunk, f12s, f21s):
            out = postprocess_pair(f12, f21, (h, w))
            out["frame_id_1"] = i
            out["frame_id_2"] = j
            np.savez(join(out_dir, f"flowpair_{i:05d}_{j:05d}.npz"), **out)
