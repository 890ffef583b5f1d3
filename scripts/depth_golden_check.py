#!/usr/bin/env python
"""Depth-net golden-parity harness for the official pretrained checkpoints
(MiDaS `midas_cpkt.pt` and hourglass
`best_depth_Ours_Bilinear_inc_3_net_G.pth` —
/root/reference/configs/__init__.py:15-16). Companion to
scripts/raft_golden_check.py: the artifacts are not present in every
environment, so this freezes the verification protocol to ONE command for
the day they are:

    python scripts/depth_golden_check.py --net midas --ckpt midas_cpkt.pt --freeze
    python scripts/depth_golden_check.py --net midas --ckpt midas_cpkt.pt

Protocol:

1. sha256 the checkpoint; with an existing golden file, refuse to compare
   against a DIFFERENT artifact (checksum mismatch aborts).
2. Run a fixed, seeded synthetic image (or real frames via --image) at the
   reference working resolution 224x384 through
   a. OUR Flax net with the checkpoint ported by the PRODUCTION loader
      (train/scene_flow_motion_field.py::Model.init_from_sample — the same
      path train.py takes), and
   b. the reference's own torch net loaded from the same file
      (third_party.MiDaS.MidasNet(path=ckpt, non_negative=True,
      normalize_input=True) / third_party.hourglass.HourglassModel_Embed
      with net_depth.load_state_dict — exactly how
      /root/reference/models/scene_flow_motion_field.py:94,121 builds
      them). The MiDaS backbone hub fetch is satisfied by the local
      ResNeXt101 replica (tests/torch_replicas.py); its weights are then
      overwritten by the checkpoint load, so the oracle is checkpoint-
      exact.
3. Assert the relative error between the two predictions < --tol
   (default 1e-3 — same bar as the in-suite random-weight parity tests).
4. --freeze stores {prediction, checksum, protocol} as the golden npz;
   later runs additionally assert drift vs the stored prediction < --tol.

Exit code 0 = parity proven. In-suite coverage on FAKE (random-weight)
checkpoints: tests/test_pretrained_load.py::test_depth_golden_check_*.
"""

import argparse
import hashlib
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
REFERENCE = os.environ.get("DVD_REFERENCE", "/root/reference")

RES = (224, 384)  # reference working resolution (<=384 wide, mult of 32)


def sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def protocol_image(image, res):
    h, w = res
    if image:
        from PIL import Image

        import jax.numpy as jnp

        from dynamic_video_depth_tpu.ops.resize import resize_bilinear

        im = np.asarray(Image.open(image).convert("RGB"), np.float32) / 255.0
        return np.asarray(resize_bilinear(jnp.asarray(im[None]), (h, w), align_corners=False))[0]
    rng = np.random.RandomState(1234)
    # smooth low-frequency field: depth nets see natural images, not noise
    base = rng.rand(h // 16 + 1, w // 16 + 1, 3).astype(np.float32)
    import jax.numpy as jnp

    from dynamic_video_depth_tpu.ops.resize import resize_bilinear

    return np.asarray(resize_bilinear(jnp.asarray(base[None]), (h, w), align_corners=False))[0]


def rel_err(a: np.ndarray, b: np.ndarray) -> float:
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12))


def flax_prediction(net: str, ckpt: str, img: np.ndarray) -> np.ndarray:
    """Prediction through the production port (the train.py path)."""
    import jax.numpy as jnp

    from dynamic_video_depth_tpu.train import scene_flow_motion_field as sfm

    if net == "midas":
        sfm.MIDAS_PRETRAIN_PATH = ckpt
    else:
        sfm.DEPTH_PRETRAIN_PATH = ckpt
    opt = argparse.Namespace(
        lr=1e-4, scene_lr_mul=10.0, adam_beta1=0.5, adam_beta2=0.9,
        midas=(net == "midas"), use_cnn=False, use_embedding=False,
        time_dependent=True, n_freq_xyz=16, n_freq_t=16, n_down=3,
        flow_mul=1.0, disp_mul=1.0, acc_mul=1.0, sf_mag_div=100.0,
        use_disp=True, use_disp_ratio=False, weight_steps=False,
        warm_reg=False, interp_steps=5, use_motion_seg=False, warm_sf=0,
        depth_net="", mixed_precision_training=False, full_precision=True,
    )
    model = sfm.Model(opt)
    used = model.init_from_sample(img[None], seed=0)
    if not used:
        raise RuntimeError(f"production loader did not consume {ckpt}")
    return np.asarray(model.step._apply_depth(
        model.state.params_depth, model.state.stats_depth,
        jnp.asarray(img[None])))[0]


def torch_prediction(net: str, ckpt: str, img: np.ndarray) -> np.ndarray:
    """The reference's own torch net, loaded exactly as its trainer does."""
    import torch

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    x = torch.from_numpy(img[None]).permute(0, 3, 1, 2)
    with torch.no_grad():
        if net == "midas":
            from torch_replicas import ResNeXt101

            torch.hub.load = lambda *a, **k: ResNeXt101()
            from third_party.MiDaS import MidasNet

            tnet = MidasNet(path=ckpt, non_negative=True,
                            normalize_input=True).eval()
            out = tnet(x)
        else:
            from third_party.hourglass import HourglassModel_Embed

            tnet = HourglassModel_Embed(noexp=False, use_embedding=False)
            tnet.net_depth.load_state_dict(
                torch.load(ckpt, map_location="cpu", weights_only=False))
            tnet.eval()
            out = tnet(x)
            if isinstance(out, (tuple, list)):
                out = out[0]
    out = out.numpy()
    if out.ndim == 4:
        out = out[:, 0]
    return out[0]


def run(net: str, ckpt: str, golden: str, freeze: bool, tol: float,
        image=None, res=RES) -> int:
    checksum = sha256(ckpt)
    print(f"checkpoint sha256: {checksum}")

    if os.path.isfile(golden) and not freeze:
        gd = np.load(golden, allow_pickle=True)
        stored = str(gd["checksum"])
        if stored != checksum:
            print(f"FAIL: golden was frozen for checksum {stored}; "
                  f"this artifact differs — refusing to compare")
            return 2

    img = protocol_image(image, res)
    ours = flax_prediction(net, ckpt, img)
    ref = torch_prediction(net, ckpt, img)

    e = rel_err(ours, ref)
    print(f"rel_err flax-vs-torch @ {res[0]}x{res[1]}: {e:.2e} (tol {tol})")
    if e > tol:
        print("FAIL: port does not reproduce the reference torch net")
        return 1

    if freeze:
        os.makedirs(os.path.dirname(os.path.abspath(golden)), exist_ok=True)
        np.savez(golden, prediction=ours, checksum=checksum,
                 res=np.asarray(res), net=net)
        print(f"froze golden -> {golden}")
        return 0

    if os.path.isfile(golden):
        gd = np.load(golden, allow_pickle=True)
        e_g = rel_err(ours, gd["prediction"])
        print(f"rel_err vs frozen golden: {e_g:.2e} (tol {tol})")
        if e_g > tol:
            print("FAIL: port drifted from the frozen golden")
            return 1
    else:
        print("note: no golden file yet; run with --freeze to store one")
    print("PASS")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", choices=("midas", "hourglass"), required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--golden", default=None)
    ap.add_argument("--freeze", action="store_true")
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--image", default=None,
                    help="real image file instead of the synthetic input")
    a = ap.parse_args()
    golden = a.golden or os.path.join(
        REPO, "tests", "goldens", f"depth_{a.net}_golden.npz")
    sys.exit(run(a.net, a.ckpt, golden, a.freeze, a.tol, a.image))


if __name__ == "__main__":
    main()
