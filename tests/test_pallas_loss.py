"""Fused projection+loss kernel: value + gradient parity vs the XLA path
(ops/geometry.py projection_stage + train/losses.py consistency_losses,
which are themselves oracle-tested against the reference). Runs in Pallas
interpret mode on CPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dynamic_video_depth_tpu.ops import Camera
from dynamic_video_depth_tpu.ops.camera import Camera as _Camera
from dynamic_video_depth_tpu.ops.coords import pixel_coords
from dynamic_video_depth_tpu.ops.geometry import camera_to_world, project
from dynamic_video_depth_tpu.ops.pallas import (
    fused_projection_loss,
    pack_camera,
)
from dynamic_video_depth_tpu.train.losses import LossConfig, consistency_losses

_MASK_EPS = 1e-8


@pytest.fixture(autouse=True)
def interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def make_camera(rng, b):
    # a realistic-ish camera: small rotation, modest intrinsics
    def rot(a):
        c, s = np.cos(a), np.sin(a)
        return np.array(
            [[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32
        ) @ np.array([[1, 0, 0], [0, c, s], [0, -s, c]], np.float32)

    R = np.stack([rot(0.1 * (i + 1)) for i in range(b)]).astype(np.float32)
    t = rng.randn(b, 3).astype(np.float32) * 0.1
    K = np.tile(
        np.array([[50.0, 0, 12.0], [0, 50.0, 10.0], [0, 0, 1.0]], np.float32),
        (b, 1, 1),
    )
    K_inv = np.linalg.inv(K).astype(np.float32)
    return _Camera(jnp.asarray(R), jnp.asarray(t), jnp.asarray(K),
                   jnp.asarray(K_inv))


def make_inputs(rng, b=1, h=12, w=20):
    # world points a couple of meters out, flows/sf of plausible magnitude
    gp1 = (rng.randn(b, h, w, 3) * 0.5 + np.array([0, 0, 3.0])).astype(
        np.float32
    )
    w3 = (rng.randn(b, h, w, 3) * 0.5 + np.array([0, 0, 3.0])).astype(
        np.float32
    )
    sf = (rng.randn(b, h, w, 3) * 0.05).astype(np.float32)
    flow_gt = (rng.randn(b, h, w, 2) * 2.0).astype(np.float32)
    mask = rng.rand(b, h, w).astype(np.float32)
    depth_1 = (rng.rand(b, h, w) * 5.0 + 0.5).astype(np.float32)
    cam = make_camera(rng, b)
    return (jnp.asarray(gp1), jnp.asarray(w3), jnp.asarray(sf),
            jnp.asarray(flow_gt), jnp.asarray(mask), jnp.asarray(depth_1),
            cam)


def xla_losses(gp1, w3, sf, flow_gt, mask, depth_1, cam2, cfg, warm):
    """The existing (oracle-tested) XLA formulation on the same inputs."""
    b, h, w_, _ = gp1.shape
    base = pixel_coords(h, w_, dtype=gp1.dtype)[None]
    advected = gp1 + sf
    pix, p1c2 = project(advected, cam2)
    dflow = pix - base
    wg = camera_to_world(w3, cam2)
    pred = {
        "dflow_1_2": dflow,
        "p1_camera_2": p1c2,
        "warped_p2_camera_2": w3,
        "sf_by_dep_1_2": wg - gp1,
        "sf_1_2": sf,
        "depth_1": depth_1,
    }
    return consistency_losses(pred, flow_gt, mask, cfg, warm)


def kernel_losses(gp1, w3, sf, flow_gt, mask, depth_1, cam2, cfg, warm):
    sums = fused_projection_loss(
        gp1, w3, sf, flow_gt, mask, depth_1, pack_camera(cam2),
        cfg.use_disp, cfg.use_disp_ratio, cfg.midas, warm,
    )
    denom = sums[3] + _MASK_EPS
    flow_loss, disp_loss, sf_loss = sums[0] / denom, sums[1] / denom, sums[2] / denom
    second = disp_loss if cfg.use_disp else sf_loss
    loss = flow_loss * cfg.flow_mul + second * cfg.disp_mul
    return loss, {
        "loss": loss,
        "flow_loss_1_2": flow_loss,
        "disp_loss_1_2": disp_loss,
        "sf_loss": sf_loss,
    }


VARIANTS = [
    dict(use_disp=True, use_disp_ratio=False, midas=True, warm=False),
    dict(use_disp=True, use_disp_ratio=False, midas=True, warm=True),
    dict(use_disp=False, use_disp_ratio=True, midas=False, warm=False),
    dict(use_disp=False, use_disp_ratio=False, midas=False, warm=False),
]


@pytest.mark.parametrize("variant", VARIANTS)
def test_forward_matches_xla(rng, variant):
    variant = dict(variant)  # never mutate the shared parametrize dicts
    warm = variant.pop("warm", False)
    cfg = LossConfig(flow_mul=1.0, disp_mul=1.0, **variant)
    args = make_inputs(rng)
    _, logs_ref = xla_losses(*args, cfg, warm)
    _, logs_ker = kernel_losses(*args, cfg, warm)
    for k in ("loss", "flow_loss_1_2", "disp_loss_1_2", "sf_loss"):
        np.testing.assert_allclose(
            np.asarray(logs_ker[k]), np.asarray(logs_ref[k]),
            rtol=2e-5, atol=1e-6, err_msg=k,
        )


@pytest.mark.parametrize("variant", VARIANTS)
def test_gradients_match_xla(rng, variant):
    variant = dict(variant)
    warm = variant.pop("warm")
    cfg = LossConfig(flow_mul=1.0, disp_mul=1.0, **variant)
    args = make_inputs(rng)

    def scalar_ref(gp1, w3, sf):
        return xla_losses(gp1, w3, sf, *args[3:], cfg, warm)[0]

    def scalar_ker(gp1, w3, sf):
        return kernel_losses(gp1, w3, sf, *args[3:], cfg, warm)[0]

    g_ref = jax.grad(scalar_ref, argnums=(0, 1, 2))(*args[:3])
    g_ker = jax.grad(scalar_ker, argnums=(0, 1, 2))(*args[:3])
    for name, a, b in zip(("global_p1", "warped", "sf"), g_ker, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=name,
        )


def test_degenerate_depth_guard(rng):
    """Points projecting to z < 1e-3 contribute zero displacement and zero
    gradient through the flow term (reference guard:
    losses/scene_flow_projection.py:253-263)."""
    cfg = LossConfig(flow_mul=1.0, disp_mul=1.0, use_disp=True, midas=False)
    gp1, w3, sf, flow_gt, mask, depth_1, cam = make_inputs(rng)
    # drag a block of advected points behind the camera
    gp1 = gp1.at[:, :4, :4, 2].set(-5.0)
    sf = sf.at[:, :4, :4, 2].set(0.0)
    args = (gp1, w3, sf, flow_gt, mask, depth_1, cam)
    _, logs_ref = xla_losses(*args, cfg, False)
    _, logs_ker = kernel_losses(*args, cfg, False)
    np.testing.assert_allclose(
        np.asarray(logs_ker["loss"]), np.asarray(logs_ref["loss"]),
        rtol=2e-5, atol=1e-6,
    )
    g_ref = jax.grad(lambda *a: xla_losses(*a, cfg, False)[0], argnums=(0, 1, 2))(*args)
    g_ker = jax.grad(lambda *a: kernel_losses(*a, cfg, False)[0], argnums=(0, 1, 2))(*args)
    for a, b in zip(g_ker, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
        assert np.isfinite(np.asarray(a)).all()


def test_batched(rng):
    cfg = LossConfig(flow_mul=1.0, disp_mul=1.0, use_disp=True, midas=True)
    args = make_inputs(rng, b=3, h=9, w=17)  # odd shapes exercise padding
    _, logs_ref = xla_losses(*args, cfg, False)
    _, logs_ker = kernel_losses(*args, cfg, False)
    np.testing.assert_allclose(
        np.asarray(logs_ker["loss"]), np.asarray(logs_ref["loss"]),
        rtol=2e-5, atol=1e-6,
    )


@pytest.mark.parametrize("seed,scale", [(1, 100.0), (2, 1e-4), (3, 1e4)])
def test_fuzz_extremes_match_xla(seed, scale):
    """Extreme regimes — huge/tiny coordinates, saturated flows, points
    behind the camera, near-zero mask mass — must stay finite and match
    the XLA path (values AND gradients)."""
    rng = np.random.RandomState(seed)
    cfg = LossConfig(flow_mul=1.0, disp_mul=1.0, use_disp=True, midas=True)
    b, h, w = 1, 12, 20
    gp1 = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) * scale)
    w3 = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) * scale)
    sf = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) * scale * 0.1)
    fgt = jnp.asarray(rng.randn(b, h, w, 2).astype(np.float32) * 50.0)
    mask = jnp.asarray(
        (rng.rand(b, h, w) > 0.95).astype(np.float32))  # ~5% mass
    d1 = jnp.asarray(np.abs(rng.randn(b, h, w)).astype(np.float32) * scale)
    cam = make_camera(rng, b)
    args = (gp1, w3, sf, fgt, mask, d1, cam)

    _, logs_ref = xla_losses(*args, cfg, False)
    _, logs_ker = kernel_losses(*args, cfg, False)
    for k in ("loss", "flow_loss_1_2", "disp_loss_1_2", "sf_loss"):
        a, r = float(logs_ker[k]), float(logs_ref[k])
        assert np.isfinite(a), (k, scale)
        np.testing.assert_allclose(a, r, rtol=5e-4, atol=1e-6, err_msg=k)

    g_ref = jax.grad(lambda *x: xla_losses(*x, cfg, False)[0],
                     argnums=(0, 1, 2))(*args)
    g_ker = jax.grad(lambda *x: kernel_losses(*x, cfg, False)[0],
                     argnums=(0, 1, 2))(*args)
    for a, r in zip(g_ker, g_ref):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=5e-4, atol=1e-7)


def test_zero_mask_mass(rng):
    """mask == 0 everywhere: losses are exactly 0 (0 / (0 + eps)) and all
    gradients are zero — no NaN from the empty denominator."""
    cfg = LossConfig(flow_mul=1.0, disp_mul=1.0, use_disp=True, midas=True)
    gp1, w3, sf, fgt, _, d1, cam = make_inputs(rng)
    mask = jnp.zeros(d1.shape, jnp.float32)
    args = (gp1, w3, sf, fgt, mask, d1, cam)
    loss, logs = kernel_losses(*args, cfg, False)
    assert float(loss) == 0.0
    g = jax.grad(lambda *x: kernel_losses(*x, cfg, False)[0],
                 argnums=(0, 1, 2))(*args)
    for a in g:
        assert float(jnp.abs(a).max()) == 0.0
