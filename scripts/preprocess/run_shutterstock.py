#!/usr/bin/env python
"""ShutterStock preprocessing driver: stages 1-3 on TPU (reference:
scripts/preprocess/shutterstock/*). Stage-1 inputs are per-frame h5 files
with {prediction/img, prediction/mvs_depth, prediction/T_1_G,
prediction/K}; unlike DAVIS, the true (scaled) MVS depth is stored as
``depth_mvs``. Resolution rule: longest side <= 384, multiples of 32
(reference: shutterstock generate_frame_midas.py:85-105).
"""

import argparse
import os
import sys
from glob import glob
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def get_im_size(h, w, dim_max=384, multiple=32):
    """(reference: shutterstock generate_frame_midas.py:85-105)."""
    if w > h:
        if w > dim_max:
            sc, tw = dim_max / w, dim_max
        else:
            tw = int(np.floor(w / multiple) * multiple)
            sc = tw / w
        th = int(np.round((h * sc) / multiple) * multiple)
    else:
        if h > dim_max:
            sc, th = dim_max / h, dim_max
        else:
            th = int(np.floor(h / multiple) * multiple)
            sc = th / h
        tw = int(np.round((w * sc) / multiple) * multiple)
    return th, tw


def process_track_h5(h5_files, out_dir, depth_fn, depth_batch=4):
    import h5py

    from dynamic_video_depth_tpu.preprocess.frames import (
        recenter_intrinsics,
        resize_frame,
    )

    os.makedirs(out_dir, exist_ok=True)
    handles = [h5py.File(f, "r") for f in h5_files]

    imgs, mvs = [], []
    for hf in handles:
        imgs.append(np.asarray(hf["prediction/img"], np.float32))
        mvs.append(np.asarray(hf["prediction/mvs_depth"], np.float32))
    # batch the depth dispatches (frames of one track share a shape; a
    # sharded depth_fn splits each batch over its mesh)
    preds = []
    for i in range(0, len(imgs), depth_batch):
        preds.extend(np.asarray(depth_fn(np.stack(imgs[i:i + depth_batch]))))

    # scale from dense mvs validity (reference :154-161)
    scales = []
    for p, m in zip(preds, mvs):
        iy, ix = np.where(m > 1e-3)
        if iy.size:
            scales.append(np.median(p[iy, ix] / m[iy, ix]))
    s = float(np.mean(scales)) if scales else 1.0

    for i, hf in enumerate(handles):
        h, w = imgs[i].shape[:2]
        th, tw = get_im_size(h, w)
        t_g1 = np.asarray(hf["prediction/T_1_G"], np.float64).copy()
        t_g1[:3, 3] *= s
        pose_c2w = np.linalg.inv(t_g1).astype(np.float32)
        K = np.asarray(hf["prediction/K"], np.float32)
        np.savez(
            join(out_dir, "frame_%05d.npz" % i),
            img=resize_frame(imgs[i], (th, tw)).astype(np.float32),
            pose_c2w=pose_c2w,
            intrinsics=recenter_intrinsics(K, (h, w), (th, tw)),
            depth_pred=resize_frame(preds[i][..., None], (th, tw))[..., 0],
            depth_mvs=resize_frame((mvs[i] * s)[..., None], (th, tw))[..., 0],
            img_orig=imgs[i],
        )
    return s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw_root", required=True,
                    help="dir of <track>/*.h5 frame files")
    ap.add_argument("--track", required=True)
    ap.add_argument("--out_root", default="./datafiles/shutterstock")
    ap.add_argument("--gaps", default="1,2,3,4,5,6,7,8")
    ap.add_argument("--raft_ckpt", default="./third_party/RAFT/models/raft-sintel.pth")
    ap.add_argument("--stage", default="all", choices=["all", "frames", "flows", "pairs"])
    ap.add_argument("--n_chips", type=int, default=0,
                    help="shard stage-1 MiDaS / stage-2 RAFT batches over this many devices "
                         "(0 = serial single-device)")
    args = ap.parse_args()

    from dynamic_video_depth_tpu.preprocess import flows, frames as frames_mod, pairs

    frame_dir = join(args.out_root, "frames_midas", args.track)
    flow_dir = join(args.out_root, "flow_pairs", args.track)
    seq_dir = join(args.out_root, "sequences_select_pairs_midas", args.track, "001")
    gaps = [int(g) for g in args.gaps.split(",")]

    mesh = None
    if args.n_chips > 1:
        from dynamic_video_depth_tpu.parallel.mesh import make_mesh

        mesh = make_mesh([("data", args.n_chips)])

    if args.stage in ("all", "frames"):
        files = sorted(
            glob(join(args.raw_root, args.track, "*.h5")),
            key=lambda f: int(f.split("_")[-1].split(".")[0]),
        )
        depth_fn = frames_mod.make_midas_depth_fn(mesh=mesh)
        s = process_track_h5(files, frame_dir, depth_fn,
                             depth_batch=max(args.n_chips, 4))
        print(f"stage 1 done: {len(files)} frames, scale {s:.4f}")

    if args.stage in ("all", "flows"):
        flows.process_track(frame_dir, flow_dir, gaps=gaps,
                            ckpt_path=args.raft_ckpt, mesh=mesh)
        print("stage 2 done")

    if args.stage in ("all", "pairs"):
        pairs.pack_track(frame_dir, flow_dir, seq_dir, gaps=gaps)
        print("stage 3 done")


if __name__ == "__main__":
    main()
