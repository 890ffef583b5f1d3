"""Pretrained checkpoint loading through the Model facade: a random torch
hourglass checkpoint saved to disk must port into the hourglass path and
reproduce the torch forward."""

import argparse
import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

REFERENCE = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not available"
)
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)


def model_opt(**kw):
    base = dict(
        lr=1e-4, scene_lr_mul=10.0, adam_beta1=0.5, adam_beta2=0.9,
        midas=False, use_cnn=False, use_embedding=False, time_dependent=True,
        n_freq_xyz=2, n_freq_t=1, n_down=3, flow_mul=1.0, disp_mul=1.0,
        acc_mul=1.0, sf_mag_div=100.0, use_disp=True, use_disp_ratio=False,
        weight_steps=False, warm_reg=False, interp_steps=5,
        use_motion_seg=False, warm_sf=0, depth_net="",
        mixed_precision_training=False, full_precision=True,
    )
    base.update(kw)
    return argparse.Namespace(**base)


@needs_reference
def test_hourglass_checkpoint_load(tmp_path, rng, monkeypatch):
    import torch
    from third_party.hourglass import HourglassModel as TorchHG

    from dynamic_video_depth_tpu.train import scene_flow_motion_field as sfm

    torch.manual_seed(0)
    tnet = TorchHG(num_input=3).eval()
    ckpt = str(tmp_path / "hourglass.pth")
    torch.save(tnet.state_dict(), ckpt)

    monkeypatch.setattr(sfm, "DEPTH_PRETRAIN_PATH", ckpt)
    model = sfm.Model(model_opt(midas=False))
    img = rng.rand(1, 32, 48, 3).astype(np.float32)
    used = model.init_from_sample(img, seed=0)
    assert used, "pretrained hourglass checkpoint was not loaded"

    depth = np.asarray(model.step._apply_depth(
        model.state.params_depth, model.state.stats_depth, jnp.asarray(img)
    ))
    with torch.no_grad():
        ref = tnet(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()[:, 0]
    np.testing.assert_allclose(depth, ref, rtol=1e-3, atol=1e-4)

    # and a full train step runs on the hourglass path
    import __graft_entry__ as g

    batch = g._synthetic_batch(1, 32, 48, rng)
    state, logs = model.step.train_step(model.state, batch, steps=1, warm=False)
    assert np.isfinite(float(logs["loss"]))
