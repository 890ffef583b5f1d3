"""Space-to-depth densified conv (ops/s2d.py) and its hourglass policy.

The s2d form must be numerically the same conv (same params, same output,
same gradients) — only the compute layout changes. Reference behavior being
reproduced: third_party/hourglass.py:21-57 inception branch convs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_video_depth_tpu.models.hourglass import (
    HourglassModel, _S2DConv, _branch_conv)
from dynamic_video_depth_tpu.ops.s2d import (
    depth_to_space, s2d_same_conv, space_to_depth)


def _ref_conv(x, k_arr, b_arr, k):
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, k_arr, (1, 1), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b_arr


@pytest.mark.parametrize("s", [2, 4])
@pytest.mark.parametrize("k", [3, 5, 7, 11])
def test_s2d_conv_matches_direct_conv(k, s):
    rng = np.random.RandomState(k)
    x = jnp.asarray(rng.randn(2, 16, 24, 5).astype(np.float32))
    kern = jnp.asarray(rng.randn(k, k, 5, 3).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(3).astype(np.float32))

    ref = _ref_conv(x, kern, bias, k)
    out = s2d_same_conv(x, kern, bias, s=s)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)

    cot = jnp.asarray(rng.randn(*ref.shape).astype(np.float32))
    g_ref = jax.grad(
        lambda K, b, xx: (_ref_conv(xx, K, b, k) * cot).sum(),
        argnums=(0, 1, 2))(kern, bias, x)
    g_new = jax.grad(
        lambda K, b, xx: (s2d_same_conv(xx, K, b, s=s) * cot).sum(),
        argnums=(0, 1, 2))(kern, bias, x)
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(a, b, atol=3e-4, rtol=1e-4)


@pytest.mark.parametrize("order", ["phase", "ci"])
def test_s2d_roundtrip(order):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    np.testing.assert_array_equal(
        depth_to_space(space_to_depth(x, order=order), order=order), x)


def test_s2d_ci_order_channel_slices_are_contiguous():
    """The ci-major layout's defining property: original channels [0, k)
    occupy s2d channels [0, s*s*k) — what lets an inception share one s2d
    transform and slice per branch."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 12, 7).astype(np.float32))
    ys = space_to_depth(x, order="ci")
    np.testing.assert_array_equal(
        ys[..., : 4 * 3], space_to_depth(x[..., :3], order="ci"))
    np.testing.assert_array_equal(
        ys[..., 4 * 3:], space_to_depth(x[..., 3:], order="ci"))


def test_s2d_fused_1x1_kernel_matches_conv_then_s2d():
    """A stride-2 conv with the expanded kernel = 1x1 conv then ci-major
    s2d, bit-for-bit (each output value computed once; zeros elsewhere)."""
    from dynamic_video_depth_tpu.ops.s2d import s2d_fused_1x1_kernel

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(1, 1, 5, 3).astype(np.float32))
    ref = space_to_depth(
        jax.lax.conv_general_dilated(
            x, w, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")), order="ci")
    out = jax.lax.conv_general_dilated(
        x, s2d_fused_1x1_kernel(w), (2, 2), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(out, ref, atol=1e-6, rtol=1e-6)


def test_d2s_conv_is_exact_depth_to_space():
    from dynamic_video_depth_tpu.ops.s2d import d2s_conv

    rng = np.random.RandomState(6)
    y = jnp.asarray(rng.randn(2, 4, 6, 20).astype(np.float32))
    np.testing.assert_array_equal(
        d2s_conv(y), depth_to_space(y, order="ci"))


def test_s2d_fused_1x1_kernel_branch_phase_blocks():
    """widths= emits branch-contiguous blocks, each exactly order='phase'
    over its own channels (the round-5 fused-region layout)."""
    from dynamic_video_depth_tpu.ops.s2d import s2d_fused_1x1_kernel

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(1, 1, 5, 9).astype(np.float32))
    widths = [3, 2, 4]
    out = jax.lax.conv_general_dilated(
        x, s2d_fused_1x1_kernel(w, widths=widths), (2, 2), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    conv = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    off = 0
    pieces = []
    for wd in widths:
        pieces.append(space_to_depth(conv[..., off:off + wd], order="phase"))
        off += wd
    np.testing.assert_allclose(out, jnp.concatenate(pieces, axis=-1),
                               atol=1e-6, rtol=1e-6)


def test_d2s_conv_branch_phase_blocks():
    from dynamic_video_depth_tpu.ops.s2d import d2s_conv

    rng = np.random.RandomState(8)
    widths = [3, 2, 4]
    blocks = [jnp.asarray(rng.randn(2, 4, 6, 4 * wd).astype(np.float32))
              for wd in widths]
    y = jnp.concatenate(blocks, axis=-1)
    expected = jnp.concatenate(
        [depth_to_space(b, order="phase") for b in blocks], axis=-1)
    np.testing.assert_array_equal(d2s_conv(y, widths=widths), expected)


@pytest.mark.parametrize("order", ["phase", "ci"])
@pytest.mark.parametrize("k", [3, 7, 11])
def test_s2d_space_conv_matches_direct(k, order):
    """Conv on an already-s2d input (the fused-inception building block)."""
    from dynamic_video_depth_tpu.ops.s2d import s2d_space_conv

    rng = np.random.RandomState(k)
    x = jnp.asarray(rng.randn(2, 16, 24, 5).astype(np.float32))
    kern = jnp.asarray(rng.randn(k, k, 5, 3).astype(np.float32) * 0.1)
    ref = _ref_conv(x, kern, jnp.zeros((3,)), k)
    out = depth_to_space(
        s2d_space_conv(space_to_depth(x, order=order), kern, 2, order),
        order=order)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_branch_conv_policy():
    # full-res narrow branch -> s2d; small maps / wide outputs -> direct
    assert isinstance(_branch_conv(16, 11, 224, 384, 16384, "a"), _S2DConv)
    assert isinstance(_branch_conv(32, 7, 112, 192, 16384, "b"), _S2DConv)
    assert not isinstance(_branch_conv(16, 11, 56, 96, 16384, "c"), _S2DConv)
    assert not isinstance(_branch_conv(64, 7, 224, 384, 16384, "d"), _S2DConv)
    assert not isinstance(_branch_conv(16, 11, 224, 384, 0, "e"), _S2DConv)
    # odd spatial extent cannot space-to-depth
    assert not isinstance(_branch_conv(16, 3, 225, 384, 16384, "f"), _S2DConv)


def test_hourglass_s2d_path_matches_direct():
    """Same params -> same depth map with the s2d policy on vs off, at a
    resolution where the full-res branches engage (128x192 >= 16384 px)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 128, 192, 3).astype(np.float32))
    direct = HourglassModel(s2d_min_pixels=0)
    s2d = HourglassModel(s2d_min_pixels=16384)

    v_direct = direct.init(jax.random.PRNGKey(0), x)
    v_s2d = s2d.init(jax.random.PRNGKey(0), x)
    # identical parameter trees (structure AND values): the s2d module holds
    # the plain nn.Conv parameterization
    jax.tree.map(np.testing.assert_array_equal, v_direct, v_s2d)

    y_direct = direct.apply(v_direct, x)
    y_s2d = s2d.apply(v_direct, x)
    np.testing.assert_allclose(y_s2d, y_direct, atol=1e-4, rtol=1e-4)


def test_hourglass_merged_reducers_matches_unmerged():
    """merge_reducers computes the four parallel 1x1 reducer convs + BNs as
    one concatenated conv + one elementwise stage. Same params (incl.
    nontrivial running stats) -> same depth map and same input gradient,
    and the fresh-init trees are bit-identical (same RNG paths)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    merged = HourglassModel(merge_reducers=True)
    plain = HourglassModel(merge_reducers=False)

    v_merged = merged.init(jax.random.PRNGKey(0), x)
    v_plain = plain.init(jax.random.PRNGKey(0), x)
    jax.tree.map(np.testing.assert_array_equal, v_merged, v_plain)

    # nontrivial running stats so the merged BN stage is actually exercised
    stats = jax.tree.map(
        lambda s: jnp.asarray(
            0.5 + rng.rand(*s.shape).astype(np.float32)),
        v_plain["batch_stats"])
    v = {"params": v_plain["params"], "batch_stats": stats}

    def f_merged(xx):
        return jnp.sum(merged.apply(v, xx) ** 2)

    def f_plain(xx):
        return jnp.sum(plain.apply(v, xx) ** 2)

    y_m, g_m = jax.value_and_grad(f_merged)(x)
    y_p, g_p = jax.value_and_grad(f_plain)(x)
    np.testing.assert_allclose(y_m, y_p, rtol=2e-5)
    np.testing.assert_allclose(g_m, g_p, atol=1e-4, rtol=1e-3)


def test_hourglass_fused_s2d_inception_matches_plain():
    """The fully fused inception (one shared ci-major s2d region: merged
    reducers -> in-s2d branch convs/BNs/relu/concat -> one d2s) matches the
    plain path (no merge, no s2d) — value, input grad, and PARAM grads —
    with nontrivial running stats, at a resolution where the fused region
    engages (128x192 >= 16384 px)."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(1, 128, 192, 3).astype(np.float32))
    fused = HourglassModel(merge_reducers=True, s2d_min_pixels=16384)
    plain = HourglassModel(merge_reducers=False, s2d_min_pixels=0)

    v_fused = fused.init(jax.random.PRNGKey(0), x)
    v_plain = plain.init(jax.random.PRNGKey(0), x)
    jax.tree.map(np.testing.assert_array_equal, v_fused, v_plain)

    stats = jax.tree.map(
        lambda s: jnp.asarray(0.5 + rng.rand(*s.shape).astype(np.float32)),
        v_plain["batch_stats"])

    def f(model, params, xx):
        return jnp.sum(
            model.apply({"params": params, "batch_stats": stats}, xx) ** 2)

    y_f, (gp_f, gx_f) = jax.value_and_grad(
        lambda p, xx: f(fused, p, xx), argnums=(0, 1))(
            v_plain["params"], x)
    y_p, (gp_p, gx_p) = jax.value_and_grad(
        lambda p, xx: f(plain, p, xx), argnums=(0, 1))(
            v_plain["params"], x)
    np.testing.assert_allclose(y_f, y_p, rtol=3e-5)
    np.testing.assert_allclose(gx_f, gx_p, atol=1e-4, rtol=1e-3)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-3),
        gp_f, gp_p)
