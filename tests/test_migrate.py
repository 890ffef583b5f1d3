"""Mid-run migration from the reference: import a reference-format training
checkpoint ({'nets': [...], 'optimizers': [...], 'epoch': N}, reference:
models/netinterface.py:528-536) built by the REFERENCE'S OWN modules and
torch Adam, then verify (a) weights/BN stats ported, (b) Adam moments +
step count ported, by taking ONE more optimization step with an identical
gradient in both frameworks and requiring identical parameters."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax
import torch

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

from dynamic_video_depth_tpu.models.torch_port import port_torch_variables
from dynamic_video_depth_tpu.runtime.migrate import import_reference_checkpoint
from dynamic_video_depth_tpu.train import LossConfig, TrainStepConfig
from dynamic_video_depth_tpu.train.step import SceneFlowMotionFieldStep

LR, SF_MUL, BETAS = 1e-4, 10.0, (0.5, 0.9)


def build_torch_side(n_steps=3):
    from networks.sceneflow_field import SceneFlowFieldNet as TorchSF
    from third_party.hourglass import HourglassModel_Embed

    torch.manual_seed(0)
    net_d = HourglassModel_Embed(noexp=False)
    net_sf = TorchSF(net_width=16, n_layers=1, N_freq_xyz=2, N_freq_t=1,
                     time_dependent=True)
    opt_d = torch.optim.Adam(net_d.parameters(), lr=LR, betas=BETAS)
    opt_sf = torch.optim.Adam(net_sf.parameters(), lr=LR * SF_MUL,
                              betas=BETAS)
    net_d.eval()  # the reference trains with depth nets in eval()
    x = torch.randn(1, 3, 32, 48)
    p = torch.randn(1, 3, 8, 8)
    t = torch.randn(1, 1, 8, 8)
    for _ in range(n_steps):
        opt_d.zero_grad()
        opt_sf.zero_grad()
        loss = net_d(x).mean() + (net_sf(p, t) ** 2).mean()
        loss.backward()
        opt_d.step()
        opt_sf.step()
    return net_d, net_sf, opt_d, opt_sf


def our_step(tmp_path):
    cfg = TrainStepConfig(
        lr=LR, scene_lr_mul=SF_MUL, adam_beta1=BETAS[0], adam_beta2=BETAS[1],
        midas=False, net_width=16, n_layers=1, n_freq_xyz=2, n_freq_t=1,
        time_dependent=True, compute_dtype="float32",
        loss=LossConfig(use_disp=True),
    )
    step = SceneFlowMotionFieldStep(cfg)
    state = step.init_state(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 48, 3), jnp.float32))
    return step, state


def grads_to_tree(params, named_grads):
    """Torch {name: grad} -> our params-shaped gradient pytree (same layout
    transforms as the weights)."""
    sd = {k: v.detach().numpy() for k, v in named_grads.items()}
    return port_torch_variables(
        {"params": jax.tree.map(jnp.zeros_like, params)}, sd, strict=False
    )["params"]


def test_reference_checkpoint_migration(tmp_path):
    net_d, net_sf, opt_d, opt_sf = build_torch_side()
    path = str(tmp_path / "checkpoint.pt")
    torch.save(
        {
            "nets": [net_d.state_dict(), net_sf.state_dict()],
            "optimizers": [opt_d.state_dict(), opt_sf.state_dict()],
            "epoch": 7,
        },
        path,
    )

    step, state = our_step(tmp_path)
    state2, extras = import_reference_checkpoint(path, step, state)
    assert int(extras["epoch"]) == 7

    # (a) weights ported: spot-check a conv kernel and a BN running mean
    w_t = net_sf.state_dict()["convs.0.conv.weight"].numpy()  # [out,in,1,1]
    w_j = np.asarray(state2.params_sf["convs__0__conv"]["kernel"])
    np.testing.assert_allclose(w_j, w_t[:, :, 0, 0].transpose(1, 0),
                               rtol=1e-6)  # ours: Dense [in, out]

    # (b) Adam state ported: ONE more step with identical gradients must
    # produce identical parameters (bias correction uses the step count,
    # the update uses mu/nu — all must have carried over)
    g_d = {k: torch.randn_like(v) for k, v in net_d.named_parameters()}
    g_sf = {k: torch.randn_like(v) for k, v in net_sf.named_parameters()}
    for k, v in net_d.named_parameters():
        v.grad = g_d[k].clone()
    for k, v in net_sf.named_parameters():
        v.grad = g_sf[k].clone()
    opt_d.step()
    opt_sf.step()

    gd_tree = grads_to_tree(state2.params_depth, g_d)
    gsf_tree = grads_to_tree(state2.params_sf, g_sf)
    upd_d, _ = step.tx_depth.update(gd_tree, state2.opt_depth,
                                    state2.params_depth)
    upd_sf, _ = step.tx_sf.update(gsf_tree, state2.opt_sf, state2.params_sf)
    new_d = optax.apply_updates(state2.params_depth, upd_d)
    new_sf = optax.apply_updates(state2.params_sf, upd_sf)

    want_d = port_torch_variables(
        {"params": state2.params_depth},
        {k: v.detach().numpy() for k, v in net_d.state_dict().items()},
        strict=False,
    )["params"]
    want_sf = port_torch_variables(
        {"params": state2.params_sf},
        {k: v.detach().numpy() for k, v in net_sf.state_dict().items()},
    )["params"]
    for got, want in ((new_d, want_d), (new_sf, want_sf)):
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


def test_migration_without_optimizer_state(tmp_path, capsys):
    """A params-only reference checkpoint loads with a warning and a fresh
    optimizer (reference: load_state_dict's 'auto' behavior)."""
    net_d, net_sf, _, _ = build_torch_side(n_steps=1)
    path = str(tmp_path / "nets_only.pt")
    torch.save({"nets": [net_d.state_dict(), net_sf.state_dict()],
                "epoch": 3}, path)
    step, state = our_step(tmp_path)
    state2, extras = import_reference_checkpoint(path, step, state)
    assert "no optimizer states" in capsys.readouterr().out
    assert int(extras["epoch"]) == 3
    # optimizer untouched (fresh zeros)
    adam = state2.opt_depth[0]
    assert int(adam.count) == 0
    assert all(float(jnp.abs(m).max()) == 0.0
               for m in jax.tree.leaves(adam.mu))


def test_export_round_trips_to_reference_format(tmp_path):
    """import -> export must reproduce the reference checkpoint exactly
    (transposes are lossless), and the exported file must load into the
    reference's own modules with strict=True."""
    from dynamic_video_depth_tpu.runtime.migrate import (
        export_reference_checkpoint,
    )

    net_d, net_sf, opt_d, opt_sf = build_torch_side()
    path = str(tmp_path / "checkpoint.pt")
    torch.save({"nets": [net_d.state_dict(), net_sf.state_dict()],
                "optimizers": [opt_d.state_dict(), opt_sf.state_dict()],
                "epoch": 7}, path)

    step, state = our_step(tmp_path)
    state2, extras = import_reference_checkpoint(path, step, state)
    out = str(tmp_path / "exported.pt")
    export_reference_checkpoint(state2, path, out, extras=extras)

    exported = torch.load(out, weights_only=False)
    assert int(exported["epoch"]) == 7

    # strict load into FRESH reference modules
    from networks.sceneflow_field import SceneFlowFieldNet as TorchSF
    from third_party.hourglass import HourglassModel_Embed

    torch.manual_seed(123)
    fresh_d = HourglassModel_Embed(noexp=False)
    fresh_sf = TorchSF(net_width=16, n_layers=1, N_freq_xyz=2, N_freq_t=1,
                       time_dependent=True)
    fresh_d.load_state_dict(exported["nets"][0], strict=True)
    fresh_sf.load_state_dict(exported["nets"][1], strict=True)

    # exact round trip of every tensor we model
    for orig_net, got_sd in ((net_d, exported["nets"][0]),
                             (net_sf, exported["nets"][1])):
        for k, v in orig_net.state_dict().items():
            np.testing.assert_allclose(
                got_sd[k].numpy() if hasattr(got_sd[k], "numpy") else got_sd[k],
                v.numpy(), rtol=0, atol=0, err_msg=k)
    # Adam moments round trip
    for orig_opt, got in ((opt_d, exported["optimizers"][0]),
                          (opt_sf, exported["optimizers"][1])):
        o = orig_opt.state_dict()["state"]
        for pid, entry in got["state"].items():
            for f in ("exp_avg", "exp_avg_sq"):
                np.testing.assert_allclose(entry[f].numpy(),
                                           o[pid][f].numpy(),
                                           rtol=0, atol=0)
            assert int(entry["step"]) == int(o[pid]["step"])
