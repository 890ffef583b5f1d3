"""MannequinChallenge inception-hourglass depth net, TPU-native.

(reference: third_party/hourglass.py:21-212). Channel-last Flax. All
batch-norms run in inference mode: the reference calls ``net_depth.eval()``
in both ``freeze()`` and ``defrost()`` (third_party/hourglass.py:200-208), so
running stats are frozen constants for the whole per-video optimization. The
inception BNs are affine-free (``affine=False``); the stem BN has
scale/bias.

Module names encode the torch checkpoint paths of
``best_depth_Ours_Bilinear_inc_3_net_G.pth`` with ``.`` -> ``__`` so the
generic porter in ``models.torch_port`` can load them.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import upsample2x_bilinear
from ..ops.s2d import (d2s_conv, s2d_fused_1x1_kernel, s2d_same_conv,
                       s2d_space_conv)

# Inception branch configs (reference: third_party/hourglass.py:60-158).
_E = ((64,), (3, 32, 64), (5, 32, 64), (7, 32, 64))        # 256 out
_F = ((64,), (3, 64, 64), (7, 64, 64), (11, 64, 64))       # 256 out
_G = ((32,), (3, 32, 32), (5, 32, 32), (7, 32, 32))        # 128 out
_BC2 = ((32,), (3, 64, 32), (7, 64, 32), (11, 64, 32))     # 128 out
_A4 = ((32,), (3, 64, 32), (5, 64, 32), (7, 64, 32))       # 128 out
_A16 = ((16,), (3, 32, 16), (7, 32, 16), (11, 32, 16))     # 64 out
_A = ((16,), (3, 64, 16), (7, 64, 16), (11, 64, 16))       # 64 out

# Per-level branch programs: ('pool',), ('up',), ('inc', cfg), ('stage', lvl).
# branch order follows the reference's ModuleList append order.
_STAGES = {
    1: (
        (("inc", _E), ("inc", _E)),
        (("pool",), ("inc", _E), ("inc", _E), ("inc", _E), ("up",)),
    ),
    2: (
        (("inc", _E), ("inc", _F)),
        (("pool",), ("inc", _E), ("inc", _E), ("stage", 1), ("inc", _E), ("inc", _F), ("up",)),
    ),
    3: (
        (("pool",), ("inc", _G), ("inc", _E), ("stage", 2), ("inc", _E), ("inc", _G), ("up",)),
        (("inc", _G), ("inc", _BC2)),
    ),
    4: (
        (("pool",), ("inc", _G), ("inc", _G), ("stage", 3), ("inc", _A4), ("inc", _A16), ("up",)),
        (("inc", _A),),
    ),
}


def _conv(features, kernel, padding=0, name=None):
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        padding=[(padding, padding), (padding, padding)],
        name=name,
    )


class _S2DConv(nn.Module):
    """Stride-1 ``same`` conv computed in 2x2 space-to-depth space
    (ops/s2d.py). Parameter names, shapes, and init match nn.Conv exactly,
    so checkpoint porting and fresh-init parity are untouched; only the
    compute layout changes (exact — see the derivation in ops/s2d.py)."""

    features: int
    kernel: int
    s: int = 2

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, x.shape[-1], self.features),
        )
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return s2d_same_conv(x, w, b, s=self.s)


def _branch_conv(features, kernel, h, w, s2d_min_pixels, name):
    """``same`` k x k conv; s2d-densified when the shape is MXU-starved.

    Policy (measured on v5e, scripts/step_profile.py --depth-net hourglass):
    narrow outputs (4*cout <= 128 keeps the widened form within one MXU
    lane pass) at large spatial extent are lane-starved (4 TF/s for the
    full-res 64->16 branches); s2d trades 4*k'^2/k^2 FLOPs for 4x lanes and
    a 4x deeper contraction. Small feature maps and wide outputs keep the
    direct form.
    """
    if (
        s2d_min_pixels > 0
        and h % 2 == 0 and w % 2 == 0
        and h * w >= s2d_min_pixels
        and kernel >= 3
        and 4 * features <= 128
    ):
        # measured dead ends on v5e (kept out deliberately): 4x4 s2d on the
        # k>=7 narrow branches (3.3x FLOPs at k=11 beats the extra lanes:
        # 33.7 -> 35.5 ms), and s2d on the 7x7 cin=3 stem (no change).
        return _S2DConv(features=features, kernel=kernel, name=name)
    return _conv(features, kernel, padding=(kernel - 1) // 2, name=name)


def _bn_noaffine(name):
    return nn.BatchNorm(
        use_running_average=True, use_bias=False, use_scale=False,
        epsilon=1e-5, name=name,
    )


class _ConvParams(nn.Module):
    """Parameter container with nn.Conv's names/shapes/inits. Used by the
    merged-reducer path so checkpoint porting (models/torch_port.py) and
    fresh-init RNG paths are bit-identical to the unmerged nn.Conv modules
    at the same scope names."""

    shape: Tuple[int, int, int, int]  # (kh, kw, cin, cout)

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.shape[-1],))
        return k, b


class _BNStats(nn.Module):
    """Running-stat container matching affine-free nn.BatchNorm's variable
    names, shapes, and float32 init."""

    features: int

    @nn.compact
    def __call__(self):
        m = self.variable("batch_stats", "mean",
                          lambda: jnp.zeros((self.features,), jnp.float32))
        v = self.variable("batch_stats", "var",
                          lambda: jnp.ones((self.features,), jnp.float32))
        return m.value, v.value


class Inception(nn.Module):
    """Inception module (reference: third_party/hourglass.py:21-57):
    a 1x1 branch plus (1x1 -> kxk) branches, concatenated channel-last.

    ``merge_reducers`` computes the four parallel 1x1 reducer convs (and
    their affine-free BNs + relu) as ONE concatenated conv + one
    elementwise stage, then slices the result per branch. Exact: each
    output channel's contraction over the (shared) input is unchanged;
    only the launch granularity widens (e.g. 4x32 -> one 128-lane output
    block, a full MXU lane pass instead of four quarter passes). Parameters
    keep the per-branch checkpoint layout via _ConvParams/_BNStats.

    When every k-branch qualifies for s2d densification (and the reducers
    are merged), the whole inception runs as ONE s2d region: the merged
    reducer output is space-to-depth'd once in the BRANCH-BLOCKED
    PHASE-MAJOR layout (ops/s2d.py ``s2d_fused_1x1_kernel(widths=...)`` —
    branch channel slices stay contiguous, and within a block the channel
    is phase-major, which keeps the dense-kernel expansion einsum's minor
    dim on the cout axis: round 4's ci-major order padded the (8,128)
    tile 32x and cost ~4 ms/step of expansion formatting), every branch
    conv + BN + relu and the output concat happen in s2d space, and one
    depth-to-space closes the region (``d2s_conv(widths=...)``). Exact
    per branch (the same s2d conv as _S2DConv); hourglass step 31.9 ->
    28.27 ms busy (scripts/step_profile.py --depth-net hourglass,
    round 5).
    """

    config: Tuple[Tuple[int, ...], ...]
    s2d_min_pixels: int = 16384
    merge_reducers: bool = True

    def _qualifies_s2d(self, h, w, kernel, features):
        """Mirror of _branch_conv's s2d policy (one source of truth for the
        thresholds would hide which path a config takes; keep in sync)."""
        return (
            self.s2d_min_pixels > 0
            and h % 2 == 0 and w % 2 == 0
            and h * w >= self.s2d_min_pixels
            and kernel >= 3
            and 4 * features <= 128
        )

    @nn.compact
    def __call__(self, x):
        _, h, w, cin = x.shape
        widths = [cfg[0] if len(cfg) == 1 else cfg[1] for cfg in self.config]
        fuse_s2d = (
            self.merge_reducers
            and len(self.config) > 1
            and all(self._qualifies_s2d(h, w, filt, out_b)
                    for filt, _, out_b in self.config[1:])
        )
        if self.merge_reducers:
            ks, bs, ms, vs = [], [], [], []
            for i, wd in enumerate(widths):
                k, b = _ConvParams((1, 1, cin, wd), name=f"convs__{i}__0")()
                m, v = _BNStats(wd, name=f"convs__{i}__1")()
                ks.append(k), bs.append(b), ms.append(m), vs.append(v)
            wk = jnp.concatenate(ks, axis=-1).astype(x.dtype)
            wb = jnp.concatenate(bs, axis=-1).astype(x.dtype)
            mm = jnp.concatenate(ms, axis=-1).astype(x.dtype)
            vv = jnp.concatenate(vs, axis=-1).astype(x.dtype)
            offs = [0]
            for wd in widths:
                offs.append(offs[-1] + wd)
            if fuse_s2d:
                # s2d is fused INTO the reducer conv (stride-2, branch-
                # blocked PHASE-MAJOR output channels) and d2s into one
                # identity conv at the region end — no transpose op ever
                # materializes. Phase-major (vs round-4's ci-major) keeps
                # the dense-kernel expansion einsum's minor dim on the
                # cout axis instead of the 4-wide phase index: 4-8x less
                # lane padding on the expansion intermediates, measured
                # faster on every branch shape (scripts/probe_s2d_order.py).
                # Within a branch block the bias/BN broadcast is tile
                # (vec repeated per phase), not repeat.
                ys = jax.lax.conv_general_dilated(
                    x, s2d_fused_1x1_kernel(wk, widths=widths),
                    (2, 2), [(0, 0), (0, 0)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

                ys = ys + jnp.concatenate(
                    [jnp.tile(wb[offs[i]:offs[i + 1]], 4)
                     for i in range(len(widths))])
                mm_bp = jnp.concatenate(
                    [jnp.tile(mm[offs[i]:offs[i + 1]], 4)
                     for i in range(len(widths))])
                vv_bp = jnp.concatenate(
                    [jnp.tile(vv[offs[i]:offs[i + 1]], 4)
                     for i in range(len(widths))])
                ys = nn.relu((ys - mm_bp) * jax.lax.rsqrt(vv_bp + 1e-5))
                outs = [ys[..., : 4 * widths[0]]]
                out_widths = [widths[0]]
                for i, (filt, wd, out_b) in enumerate(self.config[1:],
                                                      start=1):
                    k, b = _ConvParams((filt, filt, wd, out_b),
                                       name=f"convs__{i}__3")()
                    m, v = _BNStats(out_b, name=f"convs__{i}__4")()
                    yb = s2d_space_conv(
                        ys[..., 4 * offs[i]:4 * offs[i + 1]], k, 2, "phase")
                    yb = yb + jnp.tile(b, 4).astype(yb.dtype)
                    yb = (yb - jnp.tile(m, 4).astype(yb.dtype)) \
                        * jax.lax.rsqrt(jnp.tile(v, 4).astype(yb.dtype)
                                        + 1e-5)
                    outs.append(nn.relu(yb))
                    out_widths.append(out_b)
                return d2s_conv(jnp.concatenate(outs, axis=-1), 2,
                                widths=out_widths)
            y = jax.lax.conv_general_dilated(
                x, wk, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + wb
            y = nn.relu((y - mm) * jax.lax.rsqrt(vv + 1e-5))
            reduced = [y[..., offs[i]:offs[i + 1]]
                       for i in range(len(widths))]
        else:
            reduced = []
            for i, wd in enumerate(widths):
                y = _conv(wd, 1, name=f"convs__{i}__0")(x)
                reduced.append(nn.relu(_bn_noaffine(f"convs__{i}__1")(y)))
        outs = [reduced[0]]
        for i, (filt, _, out_b) in enumerate(self.config[1:], start=1):
            y = _branch_conv(out_b, filt, h, w, self.s2d_min_pixels,
                             name=f"convs__{i}__3")(reduced[i])
            y = _bn_noaffine(f"convs__{i}__4")(y)
            outs.append(nn.relu(y))
        return jnp.concatenate(outs, axis=-1)


class Stage(nn.Module):
    """One hourglass level: sum of two branch programs
    (reference: Channels1..Channels4, third_party/hourglass.py:60-158)."""

    level: int
    s2d_min_pixels: int = 16384
    merge_reducers: bool = True

    @nn.compact
    def __call__(self, x):
        branch_outs = []
        for b, program in enumerate(_STAGES[self.level]):
            y = x
            for i, op in enumerate(program):
                if op[0] == "pool":
                    y = nn.avg_pool(y, (2, 2), strides=(2, 2))
                elif op[0] == "up":
                    y = upsample2x_bilinear(y, align_corners=True)
                elif op[0] == "inc":
                    y = Inception(op[1], s2d_min_pixels=self.s2d_min_pixels,
                                  merge_reducers=self.merge_reducers,
                                  name=f"list__{b}__{i}")(y)
                elif op[0] == "stage":
                    y = Stage(op[1], s2d_min_pixels=self.s2d_min_pixels,
                              merge_reducers=self.merge_reducers,
                              name=f"list__{b}__{i}")(y)
            branch_outs.append(y)
        return branch_outs[0] + branch_outs[1]


class HourglassModel(nn.Module):
    """(reference: third_party/hourglass.py:161-188).

    Input ``[B, H, W, 3]``; output depth ``[B, H, W]`` (= exp(logits) unless
    ``noexp``). H, W must be divisible by 16 (four 2x poolings).
    """

    noexp: bool = False
    # s2d-densify narrow branch convs on feature maps of at least this many
    # pixels (0 = off; see _branch_conv / ops/s2d.py)
    s2d_min_pixels: int = 16384
    # compute each inception's four 1x1 reducer convs as one concatenated
    # conv (exact; see Inception)
    merge_reducers: bool = True

    @nn.compact
    def __call__(self, x):
        y = _conv(128, 7, padding=3, name="seq__0")(x)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="seq__1")(y)
        y = nn.relu(y)
        y = Stage(4, s2d_min_pixels=self.s2d_min_pixels,
                  merge_reducers=self.merge_reducers, name="seq__3")(y)
        pred = _branch_conv(1, 3, y.shape[1], y.shape[2],
                            self.s2d_min_pixels, name="pred_layer")(y)
        depth = pred if self.noexp else jnp.exp(pred)
        return depth[..., 0]


class HourglassModelEmbed(nn.Module):
    """Wrapper matching the reference's HourglassModel_Embed
    (third_party/hourglass.py:191-212). The per-frame embedding is vestigial
    in the reference — ``forward`` ignores ``embed_index`` — and is kept only
    as a constructor flag for CLI parity.
    """

    noexp: bool = False
    use_embedding: bool = False
    n_embedding: int = 100
    s2d_min_pixels: int = 16384
    merge_reducers: bool = True

    @nn.compact
    def __call__(self, x, embed_index=None):
        return HourglassModel(noexp=self.noexp,
                              s2d_min_pixels=self.s2d_min_pixels,
                              merge_reducers=self.merge_reducers,
                              name="net_depth")(x)
