"""Golden tests: grid_sample parity vs torch.nn.functional.grid_sample
(align_corners=True, padding_mode='border'), the exact configuration of the
reference's backward_warp (reference: losses/scene_flow_projection.py:212-220).
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from dynamic_video_depth_tpu.ops import grid_sample, backward_warp
from dynamic_video_depth_tpu.ops.coords import pixel_coords


def torch_warp(buffer_bchw, flow_bhw2):
    """The reference's warp, reconstructed from its documented semantics:
    grid = (pixel + flow) normalized to [-1, 1], align_corners border sample."""
    b, _, h, w = buffer_bchw.shape
    yy, xx = torch.meshgrid(
        torch.arange(h).float(), torch.arange(w).float(), indexing="ij"
    )
    coord = torch.stack([xx, yy], dim=-1)[None].expand(b, h, w, 2)
    grids = coord + flow_bhw2
    gx = grids[..., 0] / ((w - 1) / 2) - 1
    gy = grids[..., 1] / ((h - 1) / 2) - 1
    grids = torch.stack([gx, gy], dim=-1)
    return F.grid_sample(
        buffer_bchw, grids, align_corners=True, padding_mode="border"
    )


def test_backward_warp_matches_torch(rng):
    b, h, w, c = 2, 13, 17, 3
    buf = rng.randn(b, h, w, c).astype(np.float32)
    # flows large enough to push samples out of range on all sides
    flow = (rng.randn(b, h, w, 2) * 5).astype(np.float32)

    ours = np.asarray(backward_warp(jnp.asarray(buf), jnp.asarray(flow)))

    ref = torch_warp(
        torch.from_numpy(buf).permute(0, 3, 1, 2), torch.from_numpy(flow)
    )
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_identity(rng):
    b, h, w, c = 1, 8, 9, 2
    buf = rng.randn(b, h, w, c).astype(np.float32)
    coords = np.broadcast_to(
        np.asarray(pixel_coords(h, w)), (b, h, w, 2)
    ).astype(np.float32)
    out = np.asarray(grid_sample(jnp.asarray(buf), jnp.asarray(coords)))
    np.testing.assert_allclose(out, buf, rtol=1e-6, atol=1e-6)


def test_grid_sample_border_clamp(rng):
    b, h, w, c = 1, 6, 7, 1
    buf = rng.randn(b, h, w, c).astype(np.float32)
    # all samples far outside -> must equal the nearest border pixel
    coords = np.stack(
        [np.full((b, h, w), 100.0), np.full((b, h, w), -50.0)], axis=-1
    ).astype(np.float32)
    out = np.asarray(grid_sample(jnp.asarray(buf), jnp.asarray(coords)))
    expected = np.broadcast_to(buf[:, 0:1, -1:, :], out.shape)
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_grid_sample_gradients_match_torch(rng):
    """Gradients w.r.t. both the buffer and the flow must match torch."""
    b, h, w, c = 1, 7, 8, 2
    buf = rng.randn(b, h, w, c).astype(np.float32)
    flow = (rng.randn(b, h, w, 2) * 3).astype(np.float32)

    def loss_jax(buf_j, flow_j):
        return jnp.sum(backward_warp(buf_j, flow_j) ** 2)

    g_buf, g_flow = jax.grad(loss_jax, argnums=(0, 1))(
        jnp.asarray(buf), jnp.asarray(flow)
    )

    tb = torch.from_numpy(buf).permute(0, 3, 1, 2).requires_grad_(True)
    tf = torch.from_numpy(flow).requires_grad_(True)
    loss_t = (torch_warp(tb, tf) ** 2).sum()
    loss_t.backward()

    np.testing.assert_allclose(
        np.asarray(g_buf),
        tb.grad.permute(0, 2, 3, 1).numpy(),
        rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(g_flow), tf.grad.numpy(), rtol=1e-4, atol=1e-4
    )
