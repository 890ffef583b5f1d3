"""RAFT smoke + component tests (full-checkpoint parity requires the
raft-sintel artifact, which isn't shipped; these verify shapes, finiteness
and the correlation/upsampling math against numpy references)."""

import numpy as np
import jax
import jax.numpy as jnp

from dynamic_video_depth_tpu.models.raft import (
    RAFT,
    convex_upsample,
    correlation_pyramid,
    lookup_correlation,
)


def test_correlation_pyramid_values(rng):
    b, h, w, c = 1, 4, 6, 8
    f1 = rng.randn(b, h, w, c).astype(np.float32)
    f2 = rng.randn(b, h, w, c).astype(np.float32)
    pyr = correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2))
    assert len(pyr) == 4
    # level 0 is the exact all-pairs dot product / sqrt(c)
    ref = np.einsum("bhwc,bijc->bhwij", f1, f2).reshape(b, h * w, h, w)
    ref = ref / np.sqrt(c)
    np.testing.assert_allclose(np.asarray(pyr[0]), ref, rtol=1e-4, atol=1e-5)
    assert pyr[1].shape == (b, h * w, h // 2, w // 2)


def test_lookup_correlation_center(rng):
    """Looking up at the identity coords with radius 0-window center must
    return the self-correlation diagonal at level 0."""
    b, h, w, c = 1, 4, 4, 4
    f1 = rng.randn(b, h, w, c).astype(np.float32)
    pyr = correlation_pyramid(jnp.asarray(f1), jnp.asarray(f1), num_levels=1)
    xx, yy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    coords = jnp.asarray(np.stack([xx, yy], -1)[None])
    out = np.asarray(lookup_correlation(pyr, coords, radius=1))
    # center of the 3x3 window (index 4) == corr of pixel with itself
    self_corr = (f1 * f1).sum(-1) / np.sqrt(c)
    np.testing.assert_allclose(out[0, ..., 4], self_corr[0], rtol=1e-4, atol=1e-5)


def test_lookup_matches_grid_sample(rng):
    """The separable tent-weight lookup must equal direct border-clamped
    bilinear sampling of each pixel's correlation map."""
    from dynamic_video_depth_tpu.ops.grid_sample import grid_sample

    b, h, w, c = 1, 4, 6, 5
    f1 = rng.randn(b, h, w, c).astype(np.float32)
    f2 = rng.randn(b, h, w, c).astype(np.float32)
    pyr = correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=2)
    coords = jnp.asarray((rng.rand(b, h, w, 2) * 8 - 2).astype(np.float32))
    r = 2
    ours = np.asarray(lookup_correlation(pyr, coords, radius=r))

    # direct sampling oracle
    k = 2 * r + 1
    dx = np.arange(-r, r + 1, dtype=np.float32)
    delta = np.stack(np.meshgrid(dx, dx, indexing="xy"), -1).reshape(-1, 2)
    outs = []
    for lvl, corr in enumerate(pyr):
        _, n, hl, wl = corr.shape
        cmap = jnp.asarray(corr).reshape(b * h * w, hl, wl, 1)
        cc = np.asarray(coords).reshape(b * h * w, 1, 1, 2) / (2.0 ** lvl)
        pts = jnp.asarray(cc + delta.reshape(1, 1, k * k, 2))
        outs.append(np.asarray(grid_sample(cmap, pts)).reshape(b, h, w, k * k))
    ref = np.concatenate(outs, -1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_convex_upsample_uniform_mask(rng):
    """With a uniform mask, upsampling averages the 3x3 neighborhood of the
    scaled coarse flow; constant flow must stay constant * 8."""
    b, h, w = 1, 3, 5
    flow = np.full((b, h, w, 2), 0.5, np.float32)
    mask = np.zeros((b, h, w, 64 * 9), np.float32)  # softmax -> uniform
    up = np.asarray(convex_upsample(jnp.asarray(flow), jnp.asarray(mask)))
    assert up.shape == (b, h * 8, w * 8, 2)
    # interior pixels average 9 identical values = 8 * 0.5
    np.testing.assert_allclose(up[0, 8:-8, 8:-8], 4.0, rtol=1e-5)


def test_raft_forward_shapes(rng):
    net = RAFT()
    # H/8, W/8 must be >= 8 for the 4-level correlation pyramid
    im1 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32) * 255)
    im2 = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32) * 255)
    variables = net.init(jax.random.PRNGKey(0), im1, im2, iters=1)
    flow8, flow_up = net.apply(variables, im1, im2, iters=2)
    assert flow8.shape == (1, 8, 12, 2)
    assert flow_up.shape == (1, 64, 96, 2)
    assert np.isfinite(np.asarray(flow_up)).all()

    # checkpoint-name contract: every param path maps to an official key
    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables["params"])
    keys = {".".join(p[:-1]).replace("__", ".") for p in flat}
    for expected in [
        "fnet.conv1", "fnet.layer2.0.conv1", "fnet.layer3.1.conv2",
        "cnet.conv2", "update_block.encoder.convc1",
        "update_block.gru.convz1", "update_block.gru.convq2",
        "update_block.flow_head.conv2", "update_block.mask.0",
        "fnet.layer2.0.downsample.0",
    ]:
        assert expected in keys, expected
