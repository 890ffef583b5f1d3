#!/usr/bin/env python
"""RAFT golden-parity harness for the official raft-sintel.pth checkpoint.

The official artifact is not present in every environment (it ships via the
reference's download scripts); this harness freezes the full verification
protocol so that the day the checkpoint is available, proving parity is ONE
command:

    python scripts/raft_golden_check.py --ckpt raft-sintel.pth --freeze
    python scripts/raft_golden_check.py --ckpt raft-sintel.pth

Protocol (the reference's official flow-generation settings: 288x512
working resolution, 20 refinement iterations —
/root/reference/scripts/preprocess/davis/generate_flows.py:96,127,134):

1. sha256 the checkpoint; with an existing golden file, refuse to compare
   against outputs of a DIFFERENT artifact (checksum mismatch aborts).
2. Run a fixed, seeded synthetic frame pair (given real frames via
   --frames a.png b.png, those are used instead) through
   a. the Flax RAFT with the checkpoint ported by the REAL loader
      (preprocess/flows.py make_raft_flow_fn — handles the module. prefix
      of the nn.DataParallel save and raises on unconsumed keys), and
   b. the torch replica (tests/torch_raft_replica.py) with the same
      weights loaded strict.
3. Assert end-point-error between the two < --tol px (default 0.05 — far
   below the reference's own 1 px occlusion threshold).
4. --freeze stores {flow, checksum, protocol} as the golden npz; later
   runs additionally assert EPE vs the stored flow < --tol, pinning the
   port against regressions.

Exit code 0 = parity proven; any assertion prints the failing EPE.
"""

import argparse
import hashlib
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

RAFT_RES = (288, 512)  # official protocol (generate_flows.py:127)
RAFT_ITERS = 20        # official protocol (generate_flows.py:134)


def sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def protocol_inputs(frames, res):
    """Deterministic 288x512 frame pair (or user-supplied real frames)."""
    h, w = res
    if frames:
        from PIL import Image

        ims = []
        for p in frames:
            im = np.asarray(Image.open(p).convert("RGB"), np.float32)
            import jax.numpy as jnp

            from dynamic_video_depth_tpu.ops.resize import resize_bilinear

            ims.append(np.asarray(
                resize_bilinear(jnp.asarray(im[None]), (h, w))[0]))
        return ims[0], ims[1]
    rng = np.random.RandomState(1234)
    base = rng.rand(h + 8, w + 8, 3).astype(np.float32) * 255.0
    im1 = base[:h, :w]
    im2 = base[3:3 + h, 2:2 + w]  # a rigid 2-3 px shift: realistic flow
    return im1, im2


def epe(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean(np.linalg.norm(a - b, axis=-1)))


def run(ckpt: str, golden: str, freeze: bool, tol: float, frames=None,
        res=RAFT_RES, iters=RAFT_ITERS) -> int:
    import torch

    checksum = sha256(ckpt)
    print(f"checkpoint sha256: {checksum}")

    if os.path.isfile(golden) and not freeze:
        gd = np.load(golden, allow_pickle=True)
        stored = str(gd["checksum"])
        if stored != checksum:
            print(f"FAIL: golden was frozen for checksum {stored}; "
                  f"this artifact differs — refusing to compare")
            return 2

    im1, im2 = protocol_inputs(frames, res)

    # (a) Flax RAFT through the production loader
    from dynamic_video_depth_tpu.preprocess import flows as flows_mod

    flows_mod.RAFT_RES = res
    flows_mod.RAFT_ITERS = iters
    flow_fn = flows_mod.make_raft_flow_fn(ckpt)
    fwd, _ = flow_fn(im1, im2)
    fwd = np.asarray(fwd)

    # (b) torch replica with the same weights, strict load
    from torch_raft_replica import RAFT as TorchRAFT

    sd = torch.load(ckpt, map_location="cpu", weights_only=False)
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    tnet = TorchRAFT()
    tnet.load_state_dict(sd, strict=True)
    tnet.eval()
    with torch.no_grad():
        _, t_up = tnet(
            torch.from_numpy(im1[None]).permute(0, 3, 1, 2),
            torch.from_numpy(im2[None]).permute(0, 3, 1, 2),
            iters=iters,
        )
    ref = t_up.permute(0, 2, 3, 1).numpy()[0]

    e = epe(fwd, ref)
    print(f"EPE flax-vs-torch-replica @ {res[0]}x{res[1]}/{iters} iters: "
          f"{e:.5f} px (tol {tol})")
    if e > tol:
        print("FAIL: port does not reproduce the torch replica")
        return 1

    if freeze:
        os.makedirs(os.path.dirname(os.path.abspath(golden)), exist_ok=True)
        np.savez(golden, flow=fwd, checksum=checksum,
                 res=np.asarray(res), iters=iters)
        print(f"froze golden -> {golden}")
        return 0

    if os.path.isfile(golden):
        gd = np.load(golden, allow_pickle=True)
        e_g = epe(fwd, gd["flow"])
        print(f"EPE vs frozen golden: {e_g:.5f} px (tol {tol})")
        if e_g > tol:
            print("FAIL: port drifted from the frozen golden")
            return 1
    else:
        print("note: no golden file yet; run with --freeze to store one")
    print("PASS")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="path to raft-sintel.pth")
    ap.add_argument("--golden",
                    default=os.path.join(REPO, "tests", "goldens",
                                         "raft_sintel_golden.npz"))
    ap.add_argument("--freeze", action="store_true",
                    help="store the golden instead of checking against it")
    ap.add_argument("--tol", type=float, default=0.05, help="EPE tol (px)")
    ap.add_argument("--frames", nargs=2, default=None,
                    help="two image files to use instead of synthetic input")
    ap.add_argument("--res", type=int, nargs=2, default=list(RAFT_RES))
    ap.add_argument("--iters", type=int, default=RAFT_ITERS)
    a = ap.parse_args()
    sys.exit(run(a.ckpt, a.golden, a.freeze, a.tol, a.frames,
                 tuple(a.res), a.iters))


if __name__ == "__main__":
    main()
