"""Network parity tests: Flax modules vs the reference torch implementations
with ported weights (reference imported as an oracle from /root/reference,
never vendored)."""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dynamic_video_depth_tpu.models import (
    SceneFlowFieldNet,
    HourglassModel,
    MidasNet,
    FCNUnet,
)
from dynamic_video_depth_tpu.models.torch_port import (
    port_torch_variables,
    unused_torch_keys,
)

REFERENCE = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not available"
)

if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)


def _state_numpy(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


@needs_reference
def test_sceneflow_field_matches_reference(rng):
    import torch
    from networks.sceneflow_field import SceneFlowFieldNet as TorchSF

    torch.manual_seed(0)
    tnet = TorchSF(
        net_width=32, n_layers=2, time_dependent=True, N_freq_xyz=4, N_freq_t=2
    ).eval()

    net = SceneFlowFieldNet(
        net_width=32, n_layers=2, time_dependent=True, n_freq_xyz=4, n_freq_t=2
    )
    b, h, w = 2, 6, 8
    x = rng.randn(b, h, w, 3).astype(np.float32)
    t = rng.rand(b, h, w, 1).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t))
    variables = port_torch_variables(variables, _state_numpy(tnet))

    ours = np.asarray(net.apply(variables, jnp.asarray(x), jnp.asarray(t)))

    with torch.no_grad():
        theirs = tnet(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(t).permute(0, 3, 1, 2),
        )
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@needs_reference
def test_hourglass_matches_reference(rng):
    import torch
    from third_party.hourglass import HourglassModel as TorchHG

    from torch_replicas import randomize_bn_stats

    torch.manual_seed(1)
    tnet = TorchHG(num_input=3).eval()
    randomize_bn_stats(tnet, rng)

    net = HourglassModel()
    b, h, w = 1, 32, 48
    x = rng.rand(b, h, w, 3).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # uncertainty_layer exists in the torch net but is unused in forward.
    sd = _state_numpy(tnet)
    variables = port_torch_variables(variables, sd)
    leftovers = unused_torch_keys(variables, sd)
    assert all("uncertainty" in k or "num_batches" in k for k in leftovers), leftovers

    ours = np.asarray(net.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tnet(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        ours, theirs.numpy()[:, 0], rtol=1e-3, atol=1e-4
    )


@needs_reference
def test_midas_matches_reference(rng):
    import torch

    from torch_replicas import ResNeXt101, randomize_bn_stats

    # The reference MidasNet fetches its backbone via torch.hub; patch the
    # hub loader to return our locally built ResNeXt101-32x8d.
    torch.manual_seed(2)
    backbone = ResNeXt101()
    torch.hub.load = lambda *a, **k: backbone
    from third_party.MiDaS import MidasNet as TorchMidas

    tnet = TorchMidas(path=None, normalize_input=True).eval()
    randomize_bn_stats(tnet, rng)
    # Random-init decoder weights are ~N(0, small); scale up so the output
    # path is non-degenerate after the ReLUs.
    sd = _state_numpy(tnet)

    net = MidasNet(normalize_input=True)
    b, h, w = 1, 64, 96
    x = rng.rand(b, h, w, 3).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = port_torch_variables(variables, sd)
    leftovers = unused_torch_keys(variables, sd)
    # num_batches_tracked is torch bookkeeping; refinenet4.resConfUnit1 is
    # constructed but never called by the reference (its forward gets one
    # input, third_party/midas_blocks.py:152-160).
    assert all(
        "num_batches" in k or "refinenet4.resConfUnit1" in k for k in leftovers
    ), [k for k in leftovers if "num_batches" not in k]

    ours = np.asarray(net.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tnet(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        ours, theirs.numpy()[:, 0], rtol=2e-3, atol=1e-2
    )


@needs_reference
def test_midas_mod_mask_branch_matches_reference(rng):
    import torch

    from torch_replicas import ResNeXt101, randomize_bn_stats

    torch.manual_seed(5)
    backbone = ResNeXt101()
    torch.hub.load = lambda *a, **k: backbone
    from third_party.MiDaS import MidasNet_mod

    tnet = MidasNet_mod(path=None, normalize_input=True, mask_branch=True).eval()
    randomize_bn_stats(tnet, rng)
    sd = _state_numpy(tnet)

    net = MidasNet(normalize_input=True, mask_branch=True)
    b, h, w = 1, 64, 96
    x = rng.rand(b, h, w, 3).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = port_torch_variables(variables, sd)

    ours_d, ours_m = net.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        theirs_d, theirs_m = tnet(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(ours_m), theirs_m.numpy()[:, 0],
                               rtol=2e-3, atol=1e-3)
    # mask output is bounded [0,1]; depth compared loosely (random init)
    inv_ours = 10000.0 / np.asarray(ours_d)
    inv_theirs = 10000.0 / theirs_d.numpy()[:, 0]
    np.testing.assert_allclose(inv_ours, inv_theirs, rtol=2e-3, atol=1e-2)


@needs_reference
def test_fcn_unet_matches_reference(rng):
    import torch
    from networks.FCNUnet import FCNUnet as TorchUnet

    torch.manual_seed(3)
    conv_setup = {"norm": "none", "activation": "lrelu", "pad_type": "reflect", "stride": 1}
    tnet = TorchUnet(
        dict(conv_setup), n_down=3, feat=8, block_type="double_conv",
        in_channel=4, out_channel=3,
    ).eval()

    net = FCNUnet(
        n_down=3, feat=8, block_type="double_conv", out_channel=3,
        norm="none", activation="lrelu", pad_type="reflect",
    )
    b, h, w = 1, 32, 40
    x = rng.randn(b, h, w, 4).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = port_torch_variables(variables, _state_numpy(tnet))

    ours = np.asarray(net.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tnet(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        ours, theirs.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4
    )


def test_sceneflow_field_shapes(rng):
    """Canonical instantiation shape check (works without the reference)."""
    net = SceneFlowFieldNet(
        net_width=256, n_layers=4, time_dependent=True, n_freq_xyz=16, n_freq_t=16
    )
    x = jnp.asarray(rng.randn(1, 4, 6, 3).astype(np.float32))
    t = jnp.asarray(rng.rand(1, 4, 6, 1).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x, t)
    out = net.apply(variables, x, t)
    assert out.shape == (1, 4, 6, 3)
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    # embed: xyz 99 + t 33 = 132 inputs; 132*256 + 4*256*256 + 256*3 + biases
    assert n_params > 290_000


@pytest.mark.parametrize("widths", [(16, 0), (0, 128)],
                         ids=["full-dense<=16", "merged-128-lane"])
def test_dense_grouped_conv_matches_grouped(rng, widths):
    """The block-diagonal densified grouped conv (models/midas.py
    _DenseGroupedConv, used for the ResNeXt backbone on TPU) is numerically
    equivalent to the grouped form: identical param tree, matching forward
    and parameter/input gradients. Covers full densification (stages 1-2
    default) and merged 128-lane blocks (A/B option for stages 3-4)."""
    from dynamic_video_depth_tpu.models.midas import ResNeXt101Backbone

    dgw, mgw = widths
    # 2 blocks per stage keeps it fast while covering both densified widths
    # (8, 16) and both grouped widths (32, 64)
    dense = ResNeXt101Backbone(layers=(2, 2, 2, 2), dense_group_width=dgw,
                               merge_group_width=mgw)
    grouped = ResNeXt101Backbone(layers=(2, 2, 2, 2), dense_group_width=0,
                                 merge_group_width=0)

    x = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    variables = grouped.init(jax.random.PRNGKey(3), x)
    v2 = dense.init(jax.random.PRNGKey(3), x)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(v2)

    def loss(net, variables, x):
        feats = net.apply(variables, x)
        return sum(jnp.sum(f ** 2) for f in feats), feats

    (l_g, f_g), grads_g = jax.value_and_grad(
        lambda v, x: loss(grouped, v, x), argnums=(0, 1), has_aux=True
    )(variables, x)
    (l_d, f_d), grads_d = jax.value_and_grad(
        lambda v, x: loss(dense, v, x), argnums=(0, 1), has_aux=True
    )(variables, x)

    for a, b in zip(f_g, f_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(l_g), float(l_d), rtol=1e-6)
    flat_g = jax.tree_util.tree_leaves_with_path(grads_g)
    flat_d = jax.tree_util.tree_leaves_with_path(grads_d)
    assert len(flat_g) == len(flat_d)
    for (pg, g), (pd, d) in zip(flat_g, flat_d):
        assert pg == pd
        scale = max(1.0, float(np.max(np.abs(g))))
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(d), rtol=1e-5, atol=1e-5 * scale,
            err_msg=jax.tree_util.keystr(pg))
