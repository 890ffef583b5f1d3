"""Blocks library: weight-norm, learnable PReLU, ResConv2DBlock, and the
torch-init registry (reference: networks/blocks.py:37-123,
models/netinterface.py:55-84)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dynamic_video_depth_tpu.models.blocks import (
    ConvBlock,
    PReLU,
    ResConv2DBlock,
    get_initializer,
)


def test_weight_norm_conv_matches_torch(rng):
    """norm='weight' must reproduce torch nn.utils.weight_norm(Conv2d):
    w = g * v / ||v|| with the norm per output channel."""
    torch = pytest.importorskip("torch")

    cin, cout, k = 3, 5, 3
    x = rng.randn(1, 8, 10, cin).astype(np.float32)

    conv = torch.nn.Conv2d(cin, cout, k, padding=0)
    wn = torch.nn.utils.weight_norm(conv)
    with torch.no_grad():
        ref = wn(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    blk = ConvBlock(features=cout, kernel_size=k, norm="weight",
                    activation="none")
    variables = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # port the torch weight-norm params: v [cout,cin,k,k] -> [k,k,cin,cout],
    # g [cout,1,1,1] -> [cout]
    v = wn.weight_v.detach().numpy().transpose(2, 3, 1, 0)
    g = wn.weight_g.detach().numpy().reshape(-1)
    params = jax.tree.map(lambda p: p, variables["params"])
    params["conv"]["kernel"] = jnp.asarray(v)
    params["conv"]["bias"] = jnp.asarray(conv.bias.detach().numpy())
    params["wn"]["conv/kernel/scale"] = jnp.asarray(g)
    out = blk.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out), ref.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )


def test_prelu_learnable(rng):
    x = jnp.asarray(rng.randn(4, 6).astype(np.float32))
    mod = PReLU()
    v = mod.init(jax.random.PRNGKey(0), x)
    assert float(v["params"]["weight"][0]) == 0.25
    out = mod.apply(v, x)
    expected = np.where(np.asarray(x) >= 0, np.asarray(x), 0.25 * np.asarray(x))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)
    # the slope is a parameter: gradients flow into it
    g = jax.grad(lambda p: jnp.sum(mod.apply(p, x) ** 2))(v)
    assert abs(float(g["params"]["weight"][0])) > 0


def test_prelu_inside_conv_block(rng):
    x = jnp.asarray(rng.randn(1, 6, 6, 3).astype(np.float32))
    blk = ConvBlock(features=4, kernel_size=3, padding=1, activation="prelu")
    v = blk.init(jax.random.PRNGKey(0), x)
    assert "act" in v["params"]
    out = blk.apply(v, x)
    assert out.shape == (1, 6, 6, 4)


@pytest.mark.parametrize("cin,cout", [(8, 8), (8, 16)])
def test_res_conv_block(rng, cin, cout):
    """out = convs(x) + skip(x); identity skip when channels match, learned
    1x1 otherwise (the reference version is unused and broken; this tests
    our working equivalent of its intent)."""
    x = jnp.asarray(rng.randn(1, 8, 8, cin).astype(np.float32))
    blk = ResConv2DBlock(features=cout, kernel_size=3, padding=1)
    v = blk.init(jax.random.PRNGKey(0), x)
    out = blk.apply(v, x)
    assert out.shape == (1, 8, 8, cout)
    assert ("skip" in v["params"]) == (cin != cout)
    if cin == cout:
        # zeroing the conv path must leave pure identity
        zeroed = jax.tree.map(jnp.zeros_like, v)
        np.testing.assert_allclose(np.asarray(blk.apply(zeroed, x)),
                                   np.asarray(x), atol=1e-6)


def test_init_registry_statistics():
    """Each init_type must reproduce the torch init statistics the
    reference's init_weight produces (models/netinterface.py:55-84)."""
    key = jax.random.PRNGKey(0)
    shape = (3, 3, 64, 128)  # [kh, kw, cin, cout]; fan_in = 3*3*64
    fan_in, fan_out = 3 * 3 * 64, 3 * 3 * 128

    w = get_initializer("kaiming", a=0.2)(key, shape, jnp.float32)
    expect = np.sqrt(2.0 / (1 + 0.2 ** 2) / fan_in)
    np.testing.assert_allclose(float(jnp.std(w)), expect, rtol=0.05)

    w = get_initializer("normal", init_param=0.02)(key, shape, jnp.float32)
    np.testing.assert_allclose(float(jnp.std(w)), 0.02, rtol=0.05)

    w = get_initializer("xavier", init_param=1.5)(key, shape, jnp.float32)
    expect = 1.5 * np.sqrt(2.0 / (fan_in + fan_out))
    np.testing.assert_allclose(float(jnp.std(w)), expect, rtol=0.05)

    w = get_initializer("orth", init_param=2.0)(key, shape, jnp.float32)
    # orthogonal with gain: singular values all equal the gain
    m = np.asarray(w).reshape(-1, shape[-1])
    s = np.linalg.svd(m, compute_uv=False)
    np.testing.assert_allclose(s, 2.0, rtol=1e-4)

    with pytest.raises(NotImplementedError):
        get_initializer("bogus")


def test_sceneflow_net_honors_init_type(rng):
    from dynamic_video_depth_tpu.models.sceneflow_field import SceneFlowFieldNet

    pts = jnp.zeros((1, 4, 6, 3), jnp.float32)
    ts = jnp.zeros((1, 4, 6, 1), jnp.float32)
    net_k = SceneFlowFieldNet(net_width=64, n_layers=2, n_freq_xyz=2,
                              n_freq_t=1, init_type="kaiming")
    net_n = SceneFlowFieldNet(net_width=64, n_layers=2, n_freq_xyz=2,
                              n_freq_t=1, init_type="normal",
                              init_param=0.02)
    vk = net_k.init(jax.random.PRNGKey(0), pts, ts)
    vn = net_n.init(jax.random.PRNGKey(0), pts, ts)
    k_std = float(jnp.std(vk["params"]["convs__1__conv"]["kernel"]))
    n_std = float(jnp.std(vn["params"]["convs__1__conv"]["kernel"]))
    np.testing.assert_allclose(n_std, 0.02, rtol=0.1)
    expect_k = np.sqrt(2.0 / (1 + 0.2 ** 2) / 64)
    np.testing.assert_allclose(k_std, expect_k, rtol=0.1)
