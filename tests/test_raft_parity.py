"""Full-network RAFT parity: the Flax RAFT with weights ported from a
randomly initialized torch replica must reproduce the torch forward
(validates conv layouts, the instance/batch norms, GRU, correlation lookup
and convex upsampling end to end — the same port path raft-sintel.pth
takes)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from dynamic_video_depth_tpu.models.raft import RAFT as FlaxRAFT
from dynamic_video_depth_tpu.models.torch_port import (
    port_torch_variables,
    unused_torch_keys,
)
from torch_raft_replica import RAFT as TorchRAFT


def test_raft_full_network_parity(rng):
    torch.manual_seed(0)
    tnet = TorchRAFT().eval()
    # batch-norm context encoder: randomize running stats so eval-mode
    # parity exercises the ported statistics
    for m in tnet.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.data.normal_(0, 0.05)
            m.running_var.data.uniform_(0.7, 1.3)

    h, w = 64, 96
    im1 = (rng.rand(1, h, w, 3) * 255).astype(np.float32)
    im2 = (rng.rand(1, h, w, 3) * 255).astype(np.float32)

    net = FlaxRAFT()
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(im1),
                         jnp.asarray(im2), iters=1)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = port_torch_variables(variables, sd)
    leftovers = unused_torch_keys(variables, sd)
    assert all("num_batches" in k for k in leftovers), leftovers[:5]

    flow8, flow_up = net.apply(variables, jnp.asarray(im1), jnp.asarray(im2),
                               iters=3)

    with torch.no_grad():
        tf8, tf_up = tnet(
            torch.from_numpy(im1).permute(0, 3, 1, 2),
            torch.from_numpy(im2).permute(0, 3, 1, 2),
            iters=3,
        )
    np.testing.assert_allclose(
        np.asarray(flow8), tf8.permute(0, 2, 3, 1).numpy(),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(flow_up), tf_up.permute(0, 2, 3, 1).numpy(),
        rtol=1e-3, atol=1e-4,
    )


def test_raft_golden_harness_end_to_end(tmp_path, rng):
    """scripts/raft_golden_check.py — the one-command parity check for the
    real raft-sintel.pth (VERDICT r2 item 5) — proven green end to end on a
    checkpoint in the official nn.DataParallel layout: checksum recording,
    flax-vs-replica EPE, --freeze, golden recheck, and the
    different-artifact refusal."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "raft_golden_check",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "raft_golden_check.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(3)
    tnet = TorchRAFT().eval()
    dp_sd = {"module." + k: v for k, v in tnet.state_dict().items()}
    ckpt = str(tmp_path / "raft-sintel.pth")
    torch.save(dp_sd, ckpt)
    golden = str(tmp_path / "golden.npz")

    # small res/iters: the protocol scales down for CI, the command line
    # defaults to the official 288x512/20
    kw = dict(res=(64, 96), iters=3, tol=0.05)
    assert mod.run(ckpt, golden, freeze=True, **kw) == 0
    assert os.path.isfile(golden)
    assert mod.run(ckpt, golden, freeze=False, **kw) == 0

    # a different artifact must be refused (checksum pin)
    torch.manual_seed(4)
    other = str(tmp_path / "other.pth")
    torch.save({"module." + k: v for k, v in
                TorchRAFT().state_dict().items()}, other)
    assert mod.run(other, golden, freeze=False, **kw) == 2


def test_official_ckpt_format_loads_through_flow_fn(tmp_path, rng, monkeypatch):
    """The official raft-sintel.pth is saved from nn.DataParallel — every
    key carries a 'module.' prefix (reference: generate_flows.py:96-98).
    make_raft_flow_fn must consume EVERY key of that layout (it raises on
    leftovers), and the resulting flow must match the torch replica."""
    from dynamic_video_depth_tpu.preprocess import flows as flows_mod

    torch.manual_seed(1)
    tnet = TorchRAFT().eval()
    dp_sd = {"module." + k: v for k, v in tnet.state_dict().items()}
    ckpt = str(tmp_path / "raft-sintel.pth")
    torch.save(dp_sd, ckpt)

    # small working resolution for the test (multiple of 8, large
    # enough for the 4-level pyramid pooling)
    monkeypatch.setattr(flows_mod, "RAFT_RES", (64, 96))
    monkeypatch.setattr(flows_mod, "RAFT_ITERS", 2)
    flow_fn = flows_mod.make_raft_flow_fn(ckpt)

    im1 = (rng.rand(64, 96, 3) * 255).astype(np.float32)
    im2 = (rng.rand(64, 96, 3) * 255).astype(np.float32)
    fwd, bwd = flow_fn(im1, im2)
    assert fwd.shape == (64, 96, 2) and bwd.shape == (64, 96, 2)

    with torch.no_grad():
        _, ref = tnet(
            torch.from_numpy(im1[None]).permute(0, 3, 1, 2),
            torch.from_numpy(im2[None]).permute(0, 3, 1, 2),
            iters=2,
        )
    np.testing.assert_allclose(
        fwd, ref.permute(0, 2, 3, 1).numpy()[0], rtol=1e-3, atol=1e-3
    )

    # a checkpoint with an extra (would-be silently dropped) key must fail
    bad_sd = dict(dp_sd)
    bad_sd["module.update_block.phantom.weight"] = torch.zeros(1)
    bad = str(tmp_path / "bad.pth")
    torch.save(bad_sd, bad)
    flow_fn_bad = flows_mod.make_raft_flow_fn(bad)
    import pytest as _pytest
    with _pytest.raises(KeyError, match="not consumed"):
        flow_fn_bad(im1, im2)
