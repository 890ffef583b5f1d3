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


def _golden_mod():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "depth_golden_check",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "depth_golden_check.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@needs_reference
def test_depth_golden_check_hourglass(tmp_path, rng):
    """scripts/depth_golden_check.py end to end on a fake (random-weight)
    hourglass checkpoint in the official layout: checksum recording,
    flax-vs-torch parity through the PRODUCTION loader, --freeze, golden
    recheck, and the different-artifact refusal (VERDICT r3 item 5)."""
    import torch
    from third_party.hourglass import HourglassModel as TorchHG
    from torch_replicas import randomize_bn_stats

    mod = _golden_mod()

    torch.manual_seed(0)
    tnet = TorchHG(num_input=3).eval()
    randomize_bn_stats(tnet, np.random.RandomState(0))
    ckpt = str(tmp_path / "best_depth_Ours_Bilinear_inc_3_net_G.pth")
    torch.save(tnet.state_dict(), ckpt)
    golden = str(tmp_path / "golden.npz")

    kw = dict(tol=1e-3, res=(64, 96))  # CI scale; CLI defaults to 224x384
    assert mod.run("hourglass", ckpt, golden, freeze=True, **kw) == 0
    assert os.path.isfile(golden)
    assert mod.run("hourglass", ckpt, golden, freeze=False, **kw) == 0

    torch.manual_seed(1)
    other = str(tmp_path / "other.pth")
    torch.save(TorchHG(num_input=3).state_dict(), other)
    assert mod.run("hourglass", other, golden, freeze=False, **kw) == 2


@needs_reference
def test_depth_golden_check_midas(tmp_path, rng):
    """Same harness on a fake full-size MiDaS checkpoint (ResNeXt101
    backbone via the local replica standing in for the torch.hub fetch)."""
    import torch
    from torch_replicas import ResNeXt101, randomize_bn_stats

    mod = _golden_mod()

    torch.manual_seed(2)
    backbone = ResNeXt101()
    torch.hub.load = lambda *a, **k: backbone
    from third_party.MiDaS import MidasNet

    tnet = MidasNet(path=None, non_negative=True, normalize_input=True)
    randomize_bn_stats(tnet, np.random.RandomState(2))
    ckpt = str(tmp_path / "midas_cpkt.pt")
    torch.save(tnet.state_dict(), ckpt)

    golden = str(tmp_path / "golden.npz")
    assert mod.run("midas", ckpt, golden, freeze=True,
                   tol=1e-3, res=(64, 96)) == 0
