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


def test_required_window_is_tight_and_exact(rng):
    """required_window computes the minimal exact window for a violating
    flow: the kernel at that window matches the XLA path exactly, while a
    smaller window does not (VERDICT r2 item 4: no silent approximation)."""
    from dynamic_video_depth_tpu.ops.pallas.warp_kernel import required_window

    h, w = 64, 24
    src = jnp.asarray(rng.randn(1, h, w, 2).astype(np.float32))
    # vertical flow varying +-30 px WITHIN single 8-row blocks: violates
    # the 48-px-per-block bound of window 64 at this scale
    fy = 30.0 * np.sin(np.arange(h * w).reshape(1, h, w) * 2.1)
    flow_np = np.stack([rng.randn(1, h, w) * 0.5, fy], axis=-1)
    flow = jnp.asarray(flow_np.astype(np.float32))

    win = required_window(flow_np)
    assert win % 8 == 0
    ref = backward_warp(src, flow)
    out = fused_backward_warp(src, flow, win, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    if win > 8:
        bad = fused_backward_warp(src, flow, win - 8, 8)
        assert not np.allclose(np.asarray(bad), np.asarray(ref),
                               rtol=1e-5, atol=1e-5), (
            "window below the computed bound should clamp (else the bound "
            "is not tight and the fallback never engages)")


@pytest.mark.parametrize("fy", [30.0, -30.0])
def test_required_window_exact_at_nonmultiple_width_coherent_flow(rng, fy):
    """Regression: at widths not a multiple of 128, the kernel's zero-flow
    padded lane columns used to drag each block's window offset up to the
    block's own row (their iy0 = own row), silently clamping COHERENT
    vertical flow even at the window required_window declared exact. The
    offset min must ignore padded columns (value + gradient parity)."""
    from dynamic_video_depth_tpu.ops.pallas.warp_kernel import required_window

    h, w = 64, 24  # wp = 128 > w: padded lanes present
    src = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
    flow_np = np.stack([rng.randn(1, h, w) * 3.0,
                        np.full((1, h, w), fy) + rng.randn(1, h, w) * 2.0],
                       axis=-1).astype(np.float32)
    flow = jnp.asarray(flow_np)
    win = required_window(flow_np)
    assert win < h, "coherent flow must not force the full-height window"
    out = fused_backward_warp(src, flow, win, 8)
    ref = backward_warp(src, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    g = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
    dsrc = jax.grad(
        lambda s: jnp.sum(fused_backward_warp(s, flow, win, 8) * g))(src)
    dref = jax.grad(lambda s: jnp.sum(backward_warp(s, flow) * g))(src)
    np.testing.assert_allclose(np.asarray(dsrc), np.asarray(dref),
                               rtol=1e-5, atol=1e-5)


def test_required_window_small_flow_is_small(rng):
    from dynamic_video_depth_tpu.ops.pallas.warp_kernel import required_window

    flow = (rng.randn(1, 224, 384, 2) * 3.0).astype(np.float32)
    # |dy| <= ~12 px: an 8-row block spans <= ~34 source rows; well under 64
    flow[..., 1] = np.clip(flow[..., 1], -12, 12)
    assert required_window(flow) <= 64


def test_step_full_warp_fallback_decision():
    """Model._full_warp engages exactly when the data-computed bound
    exceeds the configured window."""
    from types import SimpleNamespace

    from dynamic_video_depth_tpu.train.scene_flow_motion_field import Model

    opt = SimpleNamespace(
        lr=1e-4, scene_lr_mul=1.0, midas=False, depth_net="tiny",
        use_cnn=False, use_embedding=False, time_dependent=True,
        n_freq_xyz=2, n_freq_t=1, n_down=1, flow_mul=1.0, disp_mul=1.0,
        acc_mul=0.0, sf_mag_div=100.0, use_disp=True, use_disp_ratio=False,
        weight_steps=False, warm_reg=False, interp_steps=0,
        use_motion_seg=False,
    )
    m = Model(opt)
    assert m.cfg.pallas_warp_window == 64
    assert not m._full_warp(None)       # no data bound -> configured window
    assert not m._full_warp(64)         # bound met -> windowed (exact)
    assert m._full_warp(72)             # violated -> full-height fallback

    # visualization must escalate with the SAME decision, so dumped maps
    # match the losses actually optimized on escalated batches
    seen = {}

    def fake_forward_vis(state, batch, steps, full_warp=False):
        seen["full_warp"] = full_warp
        return {}

    m.step.forward_vis = fake_forward_vis
    m.state = None
    m.vis_on_batch({"time_stamp_1": np.zeros((1, 1, 1, 1)),
                    "time_stamp_2": np.full((1, 1, 1, 1), 0.125),
                    "time_step": np.float32(0.125)}, warp_window=72)
    assert seen["full_warp"] is True
    m.vis_on_batch({"time_stamp_1": np.zeros((1, 1, 1, 1)),
                    "time_stamp_2": np.full((1, 1, 1, 1), 0.125),
                    "time_step": np.float32(0.125)}, warp_window=64)
    assert seen["full_warp"] is False


def test_dataset_emits_warp_window(tmp_path):
    """The data boundary computes the per-sample exactness bound."""
    from dynamic_video_depth_tpu.data.synthetic import make_track
    from dynamic_video_depth_tpu.data import get_dataset
    from types import SimpleNamespace

    make_track(str(tmp_path / "datafiles" / "davis_processed"), track="dog",
               n_frames=4, h=32, w=48, gaps=(1,))
    opt = SimpleNamespace(track_id="dog", gaps="1", repeat=1, overfit=False,
                          data_root=str(tmp_path / "datafiles" /
                                        "davis_processed"), subsample=False,
                          cache_batches=False)
    ds = get_dataset("davis_sequence")(opt, mode="train")
    s = ds[0]
    assert s["warp_window"] % 8 == 0 and 8 <= s["warp_window"] <= 32
    # host/device split keeps it off-device
    from dynamic_video_depth_tpu.data.prefetch import split_host_device

    dev, host = split_host_device(s)
    assert "warp_window" in host and "warp_window" not in dev


def test_flow_cotangent_is_zero(rng):
    """Documented contract: the kernel does not produce coordinate
    gradients (flow is observed data in this model)."""
    src, flow = make_inputs(rng, h=8, w=8, c=1)
    g = jax.grad(
        lambda f: jnp.sum(fused_backward_warp(src, f, None, 4))
    )(flow)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


@pytest.mark.parametrize("seed,scale", [(0, 5.0), (1, 20.0), (2, 60.0)])
def test_required_window_property_fuzz(seed, scale):
    """Property: for ANY flow, the window computed by required_window makes
    the fused warp exact (the data-boundary guarantee the trainer's
    full-height fallback relies on)."""
    from dynamic_video_depth_tpu.ops.pallas.warp_kernel import required_window

    rng = np.random.RandomState(seed)
    h, w = 40, 16
    src = jnp.asarray(rng.randn(1, h, w, 2).astype(np.float32))
    flow = jnp.asarray((rng.randn(1, h, w, 2) * scale).astype(np.float32))
    win = required_window(np.asarray(flow))
    out = fused_backward_warp(src, flow, win, 8)
    ref = backward_warp(src, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
