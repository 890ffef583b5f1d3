#!/usr/bin/env python
"""On-hardware parity spot-check for the Pallas kernels.

Interpret-mode CPU tests (tests/test_pallas_*.py) validate kernel MATH, but
this backend's Mosaic has known silent-miscompile classes (transposes,
certain reshapes/gathers — CLAUDE.md round-2 notes), which only real
compilation exposes. This script runs the fused kernels AND their XLA
references on the actual device and compares:

  1. fused_mlp_embed (in-kernel Fourier embedding + MLP chain) fwd + grads
     vs sceneflow_features + fused_mlp_reference,
  2. the fully fused train step (warp + MLP + projection/loss kernels) loss
     + a gradient-norm fingerprint vs the pure-XLA step.

Tolerances are loose (bf16 MXU operand truncation, see
ops/pallas/mlp_kernel.py precision note); what this catches is structural
wrongness (garbage lanes, wrong channels), not ulps.

Usage: python scripts/hw_kernel_parity.py   (on the TPU host)
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12))


def rel_err_p999(a, b):
    """99.9th-percentile relative error: robust to leaky-relu boundary
    flips — two numerically different f32 paths disagree on the slope of
    the handful of activations within ulps of 0, a discrete jump in a few
    input-grad entries (measured: p99.9 ~7e-7 while max ~2e-2 with 0.012%
    of entries affected). Max-error would flag that as failure; what a
    Mosaic miscompile produces instead is broad garbage, which p99.9
    catches."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    d = np.abs(a - b).ravel()
    return float(np.percentile(d, 99.9) / (np.max(np.abs(b)) + 1e-12))


def check_mlp_embed():
    import jax
    import jax.numpy as jnp

    from dynamic_video_depth_tpu.ops.embedding import (
        sceneflow_embed_consts,
        sceneflow_features,
    )
    from dynamic_video_depth_tpu.ops.pallas.mlp_kernel import (
        fused_mlp_embed,
        fused_mlp_reference,
    )

    rng = np.random.RandomState(0)
    n, nx, nt = 8192, 16, 16
    pts = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    ts = jnp.asarray(rng.rand(n, 1).astype(np.float32))
    consts = tuple(jnp.asarray(c)
                   for c in sceneflow_embed_consts(nx, nt, True))
    feat = sceneflow_features(pts, ts, nx, nt, True)
    dims = [feat.shape[1], 256, 256, 256, 256, 3]
    ws = tuple(jnp.asarray((rng.randn(a, b) * 0.05).astype(np.float32))
               for a, b in zip(dims[:-1], dims[1:]))
    bs = tuple(jnp.asarray((rng.randn(b) * 0.01).astype(np.float32))
               for b in dims[1:])

    def f_kernel(pts, ts, ws, bs):
        return jnp.sum(fused_mlp_embed(pts, ts, *consts, ws, bs) ** 2)

    def f_ref(pts, ts, ws, bs):
        feat = sceneflow_features(pts, ts, nx, nt, True)
        return jnp.sum(fused_mlp_reference(feat, ws, bs) ** 2)

    out_k = jax.jit(fused_mlp_embed, static_argnames=())(
        pts, ts, *consts, ws, bs)
    out_r = fused_mlp_reference(feat, ws, bs)
    e_fwd = rel_err(out_k, out_r)

    gk = jax.jit(jax.grad(f_kernel, argnums=(0, 1, 2, 3)))(pts, ts, ws, bs)
    gr = jax.jit(jax.grad(f_ref, argnums=(0, 1, 2, 3)))(pts, ts, ws, bs)
    errs = [rel_err_p999(a, b) for a, b in
            zip(jax.tree.leaves(gk), jax.tree.leaves(gr))]
    print(f"fused_mlp_embed: fwd rel_err={e_fwd:.2e}, "
          f"grad rel_err_p999 max={max(errs):.2e}")
    assert e_fwd < 3e-2 and max(errs) < 3e-2, (e_fwd, errs)


def check_full_step():
    import jax

    from __graft_entry__ import _synthetic_batch
    from dynamic_video_depth_tpu.train import LossConfig, TrainStepConfig
    from dynamic_video_depth_tpu.train.step import SceneFlowMotionFieldStep

    rng = np.random.RandomState(1)
    batch = _synthetic_batch(1, 96, 160, rng)

    losses = {}
    for mode in ("on", "off"):
        cfg = TrainStepConfig(
            lr=1e-6, scene_lr_mul=1000.0, midas=True,
            # loss.midas=False: with no pretrained ckpt the MiDaS far-field
            # mask has zero mass and the loss is identically 0 on BOTH legs
            # (a vacuous comparison); the plain mask keeps the losses alive
            loss=LossConfig(flow_mul=1.0, disp_mul=1.0, acc_mul=1.0,
                            sf_mag_div=100.0, use_disp=True, midas=False,
                            interp_steps=5),
            compute_dtype="bfloat16",
            use_pallas_sf=mode, use_pallas_warp=mode, use_pallas_loss=mode,
        )
        step = SceneFlowMotionFieldStep(cfg)
        state = step.init_state(jax.random.PRNGKey(0), batch["img_1"])
        state, logs = step.train_step(state, batch, steps=2, warm=False)
        state, logs = step.train_step(state, batch, steps=2, warm=False)
        losses[mode] = float(logs["loss"])
    assert losses["off"] != 0.0, "XLA loss is exactly 0 — vacuous parity"
    err = abs(losses["on"] - losses["off"]) / (abs(losses["off"]) + 1e-12)
    print(f"full step: pallas loss={losses['on']:.6f} "
          f"xla loss={losses['off']:.6f} rel_err={err:.2e}")
    assert err < 1e-2, losses


def main():
    import jax

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    check_mlp_embed()
    check_full_step()
    print("hw kernel parity OK")


if __name__ == "__main__":
    main()
