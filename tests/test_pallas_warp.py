"""Fused backward-warp kernel: value + source-gradient parity vs the XLA
grid-sample path (which itself is exact-match tested against
F.grid_sample(align_corners=True, padding_mode='border') in
tests/test_grid_sample.py). Runs in Pallas interpret mode on CPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dynamic_video_depth_tpu.ops.grid_sample import backward_warp
from dynamic_video_depth_tpu.ops.pallas.warp_kernel import fused_backward_warp


@pytest.fixture(autouse=True)
def interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def make_inputs(rng, b=1, h=20, w=24, c=4, scale=3.0):
    src = rng.randn(b, h, w, c).astype(np.float32)
    flow = (rng.randn(b, h, w, 2) * scale).astype(np.float32)
    return jnp.asarray(src), jnp.asarray(flow)


@pytest.mark.parametrize("window,rows", [(None, 4), (None, 8)])
def test_forward_matches_xla(rng, window, rows):
    src, flow = make_inputs(rng)
    out = fused_backward_warp(src, flow, window, rows)
    ref = backward_warp(src, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_windowed_exact_for_bounded_flow(rng):
    """A finite window is exact whenever each block's source-row span fits:
    |fy| <= 2 with 8-row blocks (rows always normalizes to a multiple of 8)
    spans <= 12 source rows; +7 for the offset's sublane alignment = 19,
    covered by window 24."""
    src = jnp.asarray(rng.randn(1, 32, 24, 4).astype(np.float32))
    flow = jnp.asarray(
        np.clip(rng.randn(1, 32, 24, 2) * 1.5, -2, 2).astype(np.float32)
    )
    out = fused_backward_warp(src, flow, 24, 8)
    ref = backward_warp(src, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_large_flow_out_of_bounds(rng):
    """Flows far outside the image must border-clamp exactly like the XLA
    path (window=None is exact for any flow)."""
    src, flow = make_inputs(rng, h=12, w=16, c=2, scale=30.0)
    out = fused_backward_warp(src, flow, None, 4)
    ref = backward_warp(src, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_nonmultiple_height(rng):
    src, flow = make_inputs(rng, h=11, w=16, c=3)
    out = fused_backward_warp(src, flow, None, 4)
    ref = backward_warp(src, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_source_gradient_matches_xla(rng):
    src, flow = make_inputs(rng, b=2, h=16, w=24, c=4)
    cot = jnp.asarray(rng.randn(2, 16, 24, 4).astype(np.float32))

    def loss_fused(s):
        return jnp.sum(fused_backward_warp(s, flow, None, 4) * cot)

    def loss_ref(s):
        return jnp.sum(backward_warp(s, flow) * cot)

    g_fused = jax.grad(loss_fused)(src)
    g_ref = jax.grad(loss_ref)(src)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_windowed_gradient_matches_windowed_forward(rng):
    """With a finite window the VJP must be the exact adjoint of the
    (windowed) forward: finite differences check."""
    src, flow = make_inputs(rng, h=16, w=8, c=1, scale=2.0)
    cot = jnp.asarray(rng.randn(1, 16, 8, 1).astype(np.float32))

    def loss(s):
        return jnp.sum(fused_backward_warp(s, flow, 8, 4) * cot)

    g = np.asarray(jax.grad(loss)(src))
    eps = 1e-3
    for probe in [(0, 3, 2, 0), (0, 10, 5, 0), (0, 15, 7, 0)]:
        e = np.zeros(src.shape, np.float32)
        e[probe] = eps
        fd = (float(loss(src + e)) - float(loss(src - e))) / (2 * eps)
        np.testing.assert_allclose(g[probe], fd, rtol=2e-2, atol=1e-3)


def test_flow_cotangent_is_zero(rng):
    """Documented contract: the kernel does not produce coordinate
    gradients (flow is observed data in this model)."""
    src, flow = make_inputs(rng, h=8, w=8, c=1)
    g = jax.grad(
        lambda f: jnp.sum(fused_backward_warp(src, f, None, 4))
    )(flow)
    np.testing.assert_array_equal(np.asarray(g), 0.0)
