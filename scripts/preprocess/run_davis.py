#!/usr/bin/env python
"""DAVIS preprocessing driver: stages 1-3 on TPU
(reference: scripts/preprocess/davis/{generate_frame_midas,generate_flows,
generate_sequence_midas}.py).

Expects raw inputs:
  <raw_root>/JPEGImages/1080p/<track>/*.jpg        (frames)
  <raw_root>/triangulation/<track>.intrinsics.txt  (fx fy cx cy per frame)
  <raw_root>/triangulation/<track>.matrices.txt    (4x4 w2c poses per frame)
  <raw_root>/triangulation/<track>.obj             (triangulated points)

Produces ./datafiles/davis_processed/{frames_midas,flow_pairs,
sequences_select_pairs_midas}/<track>/... in the reference layout.
"""

import argparse
import os
import sys
from glob import glob
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def load_davis_track(raw_root, track):
    """Raw DAVIS inputs in the reference layout (reference: scripts/
    preprocess/davis/generate_frame_midas.py:40-56): frames, per-frame
    moving-object masks, triangulation intrinsics/matrices/obj."""
    from PIL import Image

    frame_files = sorted(glob(join(raw_root, "JPEGImages", "1080p", track, "*.jpg")))
    mask_files = sorted(glob(join(raw_root, "Annotations", "1080p", track, "*.png")))
    tri = join(raw_root, "triangulation")
    fx, fy, cx, cy = np.loadtxt(join(tri, f"{track}.intrinsics.txt"))[0][1:]
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
    matrices = np.loadtxt(join(tri, f"{track}.matrices.txt"))[:, 1:]
    matrices = matrices.reshape(-1, 4, 4)

    from dynamic_video_depth_tpu.preprocess.frames import load_obj_vertices

    points_3d = load_obj_vertices(join(tri, f"{track}.obj"))

    imgs = [np.asarray(Image.open(f), np.float32) / 255.0 for f in frame_files]
    masks = [
        np.asarray(Image.open(f).convert("RGB"), np.float32)[:, :, 0] / 255.0
        for f in mask_files
    ]
    return imgs, matrices, K, points_3d, masks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw_root", required=True)
    ap.add_argument("--track", required=True)
    ap.add_argument("--out_root", default="./datafiles/davis_processed")
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
        imgs, matrices, K, points_3d, masks = load_davis_track(
            args.raw_root, args.track
        )
        depth_fn = frames_mod.make_midas_depth_fn(mesh=mesh)
        s = frames_mod.process_davis_track(
            imgs, matrices, K, points_3d, masks, frame_dir, depth_fn,
            max_width=384, multiple_of=64,
            depth_batch=max(args.n_chips, 4),
        )
        print(f"stage 1 done: {len(imgs)} frames, scale {s:.4f}")

    if args.stage in ("all", "flows"):
        flows.process_track(frame_dir, flow_dir, gaps=gaps,
                            ckpt_path=args.raft_ckpt, mesh=mesh)
        print("stage 2 done")

    if args.stage in ("all", "pairs"):
        pairs.pack_track(frame_dir, flow_dir, seq_dir, gaps=gaps)
        print("stage 3 done")


if __name__ == "__main__":
    main()
