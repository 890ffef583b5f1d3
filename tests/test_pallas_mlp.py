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


def test_linspace_f32_replica_matches_jnp_to_a_few_ulp():
    """The pure-numpy linspace in the embed-consts builder (kept numpy so
    tracing never launches eager device ops) matches jnp.linspace to a few
    ulps — the only divergence is XLA's backend-dependent FMA contraction
    of ``start*(1-step) + stop*step``. A few-ulp frequency difference is a
    ~1e-6 relative angle error, orders below the chain's bf16 matmul
    noise (the kernel parity tests above bound the end-to-end effect)."""
    from dynamic_video_depth_tpu.ops.embedding import _linspace_f32

    for n in range(1, 65):
        j = np.asarray(jnp.linspace(1.0, n + 1.0, n))
        a = _linspace_f32(1.0, n + 1.0, n)
        assert j.dtype == a.dtype == np.float32
        ulps = np.abs(j.view(np.int32) - a.view(np.int32))
        assert ulps.max() <= 4, (n, j, a)


def _embed_args(rng, n, n_freq_xyz, n_freq_t, time_dependent):
    from dynamic_video_depth_tpu.ops.embedding import sceneflow_embed_consts

    pts = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    ts = jnp.asarray(rng.rand(n, 1).astype(np.float32))
    consts = tuple(jnp.asarray(c) for c in sceneflow_embed_consts(
        n_freq_xyz, n_freq_t, time_dependent))
    return pts, ts, consts


@pytest.mark.parametrize("freqs", [(4, 2, True), (3, 0, True), (0, 0, True),
                                   (4, 0, False)],
                         ids=["xyz+t", "xyz-only-t-raw", "all-raw", "no-t"])
def test_fused_mlp_embed_forward_matches_reference(rng, freqs):
    """In-kernel linearized Fourier embedding == sceneflow_features + MLP."""
    from dynamic_video_depth_tpu.ops.embedding import sceneflow_features
    from dynamic_video_depth_tpu.ops.pallas.mlp_kernel import fused_mlp_embed

    nx, nt, td = freqs
    pts, ts, consts = _embed_args(rng, 700, nx, nt, td)
    feat = sceneflow_features(pts, ts if td else None, nx, nt, td)
    dims = [feat.shape[1], 64, 64, 3]
    ws, bs = make_params(rng, dims)
    ts_in = ts if td else jnp.zeros_like(ts)
    out = fused_mlp_embed(pts, ts_in, *consts, ws, bs, 256)
    ref = fused_mlp_reference(feat, ws, bs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_mlp_embed_gradients_match_reference(rng):
    """d/d(pts, ts, weights, biases) through the in-kernel embedding matches
    the XLA embedding + reference MLP chain."""
    from dynamic_video_depth_tpu.ops.embedding import sceneflow_features
    from dynamic_video_depth_tpu.ops.pallas.mlp_kernel import fused_mlp_embed

    nx, nt = 4, 2
    pts, ts, consts = _embed_args(rng, 300, nx, nt, True)
    c0 = 3 * (1 + 2 * nx) + 1 + 2 * nt
    ws, bs = make_params(rng, [c0, 32, 32, 3])
    cotangent = jnp.asarray(rng.randn(300, 3).astype(np.float32))

    def loss_fused(pts, ts, ws, bs):
        return jnp.sum(fused_mlp_embed(pts, ts, *consts, ws, bs, 128)
                       * cotangent)

    def loss_ref(pts, ts, ws, bs):
        feat = sceneflow_features(pts, ts, nx, nt, True)
        return jnp.sum(fused_mlp_reference(feat, ws, bs) * cotangent)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(pts, ts, ws, bs)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(pts, ts, ws, bs)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_embed_path_matches_flax_sceneflow_net(rng):
    """fused_mlp_embed on raw points == SceneFlowFieldNet.apply (the
    production _apply_sf dispatch, train/step.py)."""
    from dynamic_video_depth_tpu.models import SceneFlowFieldNet
    from dynamic_video_depth_tpu.ops.pallas.mlp_kernel import fused_mlp_embed

    net = SceneFlowFieldNet(net_width=32, n_layers=2, time_dependent=True,
                            n_freq_xyz=4, n_freq_t=2)
    b, h, w = 1, 6, 8
    pts = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    ts = jnp.asarray(rng.rand(b, h, w, 1).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), pts, ts)
    ref = net.apply(variables, pts, ts)

    _, _, consts = _embed_args(rng, 1, 4, 2, True)
    p = variables["params"]
    names = sorted(p.keys(), key=lambda s: int(s.split("__")[1]))
    ws = tuple(p[n]["kernel"] for n in names)
    bs = tuple(p[n]["bias"] for n in names)
    out = fused_mlp_embed(pts.reshape(-1, 3), ts.reshape(-1, 1), *consts,
                          ws, bs, 64).reshape(b, h, w, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("td", [True, False], ids=["time-dep", "xyz-only"])
def test_embed_consts_linearization_sweep(rng, td):
    """Pure-XLA identity sweep (no kernel): for every (n_freq_xyz,
    n_freq_t) in a grid, ``raw*ang + cos_m*cos(ang) + sin_m*sin(ang)`` with
    ``ang = pts@f_xyz + ts@f_t`` must equal ``sceneflow_features``
    column-for-column — pinning the channel ORDER the fused kernel bakes
    in (reference layout: [t_raw, t_cos..., t_sin..., xyz_raw, xyz_cos...,
    xyz_sin...], networks/sceneflow_field.py:28-38 via blocks.py:19-34)."""
    from dynamic_video_depth_tpu.ops.embedding import sceneflow_embed_consts

    pts = jnp.asarray(rng.randn(37, 3).astype(np.float32))
    ts = jnp.asarray(rng.rand(37, 1).astype(np.float32))
    for nx in (0, 1, 2, 5, 16):
        for nt in (0, 1, 3, 16):
            ref = sceneflow_features(pts, ts if td else None, nx, nt, td)
            fx, ft, raw_m, cos_m, sin_m = (
                jnp.asarray(c) for c in sceneflow_embed_consts(nx, nt, td))
            ang = pts @ fx + (ts if td else jnp.zeros_like(ts)) @ ft
            feat = raw_m * ang + cos_m * jnp.cos(ang) + sin_m * jnp.sin(ang)
            # atol: the <=4-ulp linspace frequency divergence (see
            # _linspace_f32) scales by |x| through the angle and lands in
            # sin/cos as ~1e-5 abs at n_freq=16
            np.testing.assert_allclose(
                np.asarray(feat), np.asarray(ref), rtol=1e-6, atol=2e-5,
                err_msg=f"nx={nx} nt={nt} td={td}")
