"""Oracle tests for the library MLPs and the rigidity loss."""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not available"
)
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)


@needs_reference
def test_mlp_matches_reference(rng):
    import torch
    from networks.MLP import MLP as TorchMLP

    from dynamic_video_depth_tpu.models import MLP
    from dynamic_video_depth_tpu.models.torch_port import port_torch_variables

    torch.manual_seed(0)
    tnet = TorchMLP(in_ch=8, out_ch=3, depth=3, width=16).eval()
    net = MLP(out_ch=3, depth=3, width=16, activation="relu")
    x = rng.randn(10, 8).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    variables = port_torch_variables(variables, sd)
    ours = np.asarray(net.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tnet(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


@needs_reference
def test_embedded_mlp_matches_reference(rng):
    import torch
    from networks.MLP import EmbededMLP as TorchEMLP

    from dynamic_video_depth_tpu.models import EmbeddedMLP
    from dynamic_video_depth_tpu.models.torch_port import port_torch_variables

    torch.manual_seed(1)
    tnet = TorchEMLP(in_ch=3, out_ch=3, depth=6, width=16, N_freq=4,
                     skip=3).eval()
    net = EmbeddedMLP(out_ch=3, depth=6, width=16, n_freq=4, skip=3)
    x = rng.randn(10, 3).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    variables = port_torch_variables(variables, sd)
    ours = np.asarray(net.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tnet(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@needs_reference
def test_rigidity_loss_matches_reference(rng):
    import torch
    from losses.scene_flow_projection import calc_rigidity_loss

    from dynamic_video_depth_tpu.ops import rigidity_loss

    b, h, w = 1, 8, 10
    p = rng.randn(b, h, w, 3).astype(np.float32)
    sf = (rng.randn(b, h, w, 3) * 0.1).astype(np.float32)
    d = (1 + rng.rand(b, h, w)).astype(np.float32)

    total, terms = rigidity_loss(jnp.asarray(p), jnp.asarray(sf), jnp.asarray(d))

    tt = torch.from_numpy
    ref_total, ref_terms = calc_rigidity_loss(
        tt(p[:, :, :, None, :]), tt(sf[:, :, :, None, :]), tt(d[:, None])
    )
    np.testing.assert_allclose(
        np.asarray(total), ref_total.numpy(), rtol=1e-4, atol=1e-5
    )
