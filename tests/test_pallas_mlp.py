"""Fused scene-flow MLP kernel: value + gradient parity vs the XLA
reference and vs the Flax SceneFlowFieldNet. Runs in Pallas interpret mode
on CPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dynamic_video_depth_tpu.ops.embedding import sceneflow_features
from dynamic_video_depth_tpu.ops.pallas.mlp_kernel import (
    fused_mlp,
    fused_mlp_reference,
)


@pytest.fixture(autouse=True)
def interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def make_params(rng, dims):
    ws, bs = [], []
    for cin, cout in zip(dims[:-1], dims[1:]):
        ws.append((rng.randn(cin, cout) * 0.05).astype(np.float32))
        bs.append((rng.randn(cout) * 0.01).astype(np.float32))
    return tuple(jnp.asarray(w) for w in ws), tuple(jnp.asarray(b) for b in bs)


def test_fused_mlp_forward_matches_reference(rng):
    dims = [132, 64, 64, 3]
    ws, bs = make_params(rng, dims)
    feat = jnp.asarray(rng.randn(700, 132).astype(np.float32))  # non-multiple of tile
    out = fused_mlp(feat, ws, bs, 256)
    ref = fused_mlp_reference(feat, ws, bs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_mlp_gradients_match_reference(rng):
    dims = [20, 32, 32, 3]
    ws, bs = make_params(rng, dims)
    feat = jnp.asarray(rng.randn(300, 20).astype(np.float32))
    cotangent = jnp.asarray(rng.randn(300, 3).astype(np.float32))

    def loss_fused(feat, ws, bs):
        return jnp.sum(fused_mlp(feat, ws, bs, 128) * cotangent)

    def loss_ref(feat, ws, bs):
        return jnp.sum(fused_mlp_reference(feat, ws, bs) * cotangent)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(feat, ws, bs)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(feat, ws, bs)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_path_matches_flax_sceneflow_net(rng):
    """embedding + fused_mlp == SceneFlowFieldNet.apply."""
    from dynamic_video_depth_tpu.models import SceneFlowFieldNet

    net = SceneFlowFieldNet(net_width=32, n_layers=2, time_dependent=True,
                            n_freq_xyz=4, n_freq_t=2)
    b, h, w = 1, 6, 8
    pts = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    ts = jnp.asarray(rng.rand(b, h, w, 1).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), pts, ts)
    ref = net.apply(variables, pts, ts)

    feat = sceneflow_features(pts, ts, 4, 2, True).reshape(b * h * w, -1)
    p = variables["params"]
    names = sorted(p.keys(), key=lambda s: int(s.split("__")[1]))
    ws = tuple(p[n]["kernel"] for n in names)
    bs = tuple(p[n]["bias"] for n in names)
    out = fused_mlp(feat, ws, bs, 64).reshape(b, h, w, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
