"""MiDaS monocular depth network, TPU-native.

ResNeXt101-32x8d-WSL encoder + RefineNet-style decoder (reference:
third_party/MiDaS.py:164-246, third_party/midas_blocks.py). Channel-last,
Flax. BatchNorm always runs in inference mode with stored running statistics
— the reference keeps the depth net in ``.eval()`` for the entire per-video
optimization (reference: models/scene_flow_motion_field.py:154-172), so the
stats are frozen constants here and only scale/bias receive gradients.

Naming convention: Flax module names are the torch checkpoint key paths with
``.`` replaced by ``__`` (e.g. ``pretrained__layer1__0`` for torch key prefix
``pretrained.layer1.0``), so ``models.torch_port`` can map the pretrained
MiDaS checkpoint (``midas_cpkt.pt``) mechanically.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_bicubic, upsample2x_bilinear

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)

# Measured dead end (round 5, do NOT retry without new evidence): s2d-
# densifying the decoder head's full-res 3x3 128->32 conv (the 15.5 TF/s
# op at 224x384, 13.7 at 320x576). A 3x3 kernel s2d-expands to 3x3 on the
# half-res layout — 4.0x the FLOPs for 4x the lanes — and the step got
# SLOWER at both resolutions (canonical 25.68 -> 26.45 ms busy, wide
# 63.16 -> 64.17). The hourglass branch convs win the same trade only
# because their k=7/11 kernels inflate just 1.6-2.0x and start from
# 4 TF/s, not 15.


def _conv(features, kernel, stride=1, padding=0, groups=1, use_bias=True, name=None):
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        feature_group_count=groups,
        use_bias=use_bias,
        name=name,
    )


class _DenseGroupedConv(nn.Module):
    """Grouped conv computed with block-diagonal-densified groups.

    The MXU contracts 128 lanes per pass; a grouped conv with few channels
    per group (ResNeXt-32x8d layer1/2: 8/16) runs at <2% MXU utilization and
    forces 5-D tiled layouts (``bf16[B,H,W,32,8]{4,0,3,2,1:T(2,128)(2,1)}``)
    with heavy relayout copies on both sides. Measured on v5e via
    scripts/step_profile.py: 0.2-1.6 TF/s for the grouped forms vs 120-190
    TF/s for dense convs in the same step.

    ``merge`` adjacent groups are fused into one dense group whose kernel is
    block-diagonal (``merge == groups`` -> one fully dense conv). This
    multiplies model FLOPs by ``merge`` but widens each contraction to
    ``merge * in_ch/groups`` lanes — a large net win while the per-group
    width is small relative to the MXU.

    Exact: the extra contraction terms are multiplied by structural zeros,
    so forward, input-grad, and (after the mask extracts the diagonal
    blocks) kernel-grad all match the grouped conv exactly.

    The parameter keeps nn.Conv's grouped ``kernel`` shape
    ``[kh, kw, in_ch // groups, features]`` and initializer, so checkpoint
    porting (models/torch_port.py) and fresh-init parity are unchanged.
    """

    features: int
    kernel: int
    stride: int
    padding: int
    groups: int
    merge: int  # adjacent groups per dense block; must divide `groups`

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        g = self.groups
        f = self.merge
        assert g % f == 0, (g, f)
        cig = cin // g
        cog = self.features // g
        kh = kw = self.kernel
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, cig, self.features),
        )
        w = w.astype(x.dtype)
        # [f*cig, features]: within each merged group the kernel is
        # block-diagonal over the f original groups; the pattern repeats
        # for every merged group along the feature axis.
        mask = jnp.tile(
            jnp.kron(jnp.eye(f), jnp.ones((cig, cog))), (1, g // f)
        ).astype(w.dtype)
        dense = jnp.broadcast_to(
            w[:, :, None, :, :], (kh, kw, f, cig, self.features)
        ).reshape(kh, kw, f * cig, self.features)
        dense = dense * mask[None, None]
        return jax.lax.conv_general_dilated(
            x,
            dense,
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=g // f,
        )


def _bn(name):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5, name=name)


class Bottleneck(nn.Module):
    """ResNeXt bottleneck block (groups=32, width_per_group=8)."""

    planes: int
    stride: int = 1
    groups: int = 32
    base_width: int = 8
    expansion: int = 4
    # densify grouped convs whose per-group width is <= this (see
    # _DenseGroupedConv; 16 covers ResNeXt101-32x8d stages 1-2, where the
    # grouped form is MXU-starved)
    dense_group_width: int = 16
    # for wider groups, merge adjacent groups into block-diagonal dense
    # groups of at least this many input lanes (0 = keep grouped; 128
    # merges stage 3 4-wide and stage 4 2-wide, filling the MXU's 128-lane
    # contraction — measured 35.1 -> 29.2 ms/step on v5e)
    merge_group_width: int = 128

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_feats = self.planes * self.expansion
        identity = x

        out = _conv(width, 1, use_bias=False, name="conv1")(x)
        out = nn.relu(_bn("bn1")(out))
        cig = width // self.groups
        if cig <= self.dense_group_width:
            merge = self.groups
        elif self.merge_group_width > cig:
            merge = min(self.groups, self.merge_group_width // cig)
        else:
            merge = 1
        if merge > 1:
            conv2 = _DenseGroupedConv(
                features=width, kernel=3, stride=self.stride, padding=1,
                groups=self.groups, merge=merge, name="conv2")
        else:
            conv2 = _conv(width, 3, stride=self.stride, padding=1,
                          groups=self.groups, use_bias=False, name="conv2")
        out = conv2(out)
        out = nn.relu(_bn("bn2")(out))
        out = _conv(out_feats, 1, use_bias=False, name="conv3")(out)
        out = _bn("bn3")(out)

        if self.stride != 1 or x.shape[-1] != out_feats:
            identity = _conv(out_feats, 1, stride=self.stride, use_bias=False,
                             name="downsample__0")(x)
            identity = _bn("downsample__1")(identity)
        return nn.relu(out + identity)


class ResNeXt101Backbone(nn.Module):
    """ResNeXt101-32x8d feature extractor returning the four stage outputs.

    Torch-key layout follows the reference's rewrap (reference:
    third_party/midas_blocks.py:35-46): the stem lives at ``layer1.0`` (conv)
    / ``layer1.1`` (bn), stage-1 blocks at ``layer1.4.<i>``, and stages 2-4
    at ``layer{l}.<i>``.
    """

    layers: Sequence[int] = (3, 4, 23, 3)
    dense_group_width: int = 16
    merge_group_width: int = 128

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        x = _conv(64, 7, stride=2, padding=3, use_bias=False, name="layer1__0")(x)
        x = nn.relu(_bn("layer1__1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = []
        planes = (64, 128, 256, 512)
        strides = (1, 2, 2, 2)
        for li, (n_blocks, p, s) in enumerate(zip(self.layers, planes, strides), 1):
            prefix = "layer1__4" if li == 1 else f"layer{li}"
            for bi in range(n_blocks):
                x = Bottleneck(
                    planes=p,
                    stride=s if bi == 0 else 1,
                    dense_group_width=self.dense_group_width,
                    merge_group_width=self.merge_group_width,
                    name=f"{prefix}__{bi}",
                )(x)
            feats.append(x)
        return tuple(feats)


class ResidualConvUnit(nn.Module):
    """(reference: third_party/midas_blocks.py:102-135)

    Note the skip connection adds ``relu(x)``, not ``x``: the torch original
    uses ``ReLU(inplace=True)``, so ``out = self.relu(x)`` mutates ``x``
    before ``out + x`` executes. The pretrained weights bake in this
    behavior, so we reproduce it."""

    features: int

    @nn.compact
    def __call__(self, x):
        res = nn.relu(x)
        out = _conv(self.features, 3, padding=1, name="conv1")(res)
        out = nn.relu(out)
        out = _conv(self.features, 3, padding=1, name="conv2")(out)
        return out + res


class FeatureFusionBlock(nn.Module):
    """(reference: third_party/midas_blocks.py:138-168)"""

    features: int

    @nn.compact
    def __call__(self, *xs):
        out = xs[0]
        if len(xs) == 2:
            out = out + ResidualConvUnit(self.features, name="resConfUnit1")(xs[1])
        out = ResidualConvUnit(self.features, name="resConfUnit2")(out)
        return upsample2x_bilinear(out, align_corners=True)


class MidasNet(nn.Module):
    """MiDaS v2.1-style depth net (reference: third_party/MiDaS.py:164-246).

    Input ``[B, H, W, 3]`` RGB in [0, 1]; output ``[B, H, W]`` depth via
    ``10000 / clamp(inv_depth, 1e-2)``. H and W must be multiples of 32
    (guaranteed by the preprocessing resize).

    ``mask_branch``/``freeze_backbone`` reproduce the MidasNet_mod variant
    (reference: third_party/MiDaS.py:44-161): an extra sigmoid mask head on
    the decoder, and a backbone behind stop_gradient (the functional analog
    of requires_grad=False). With ``mask_branch`` the module returns
    ``(depth, mask)``.
    """

    features: int = 256
    non_negative: bool = True
    normalize_input: bool = False
    resize: Optional[Tuple[int, int]] = None
    mask_branch: bool = False
    freeze_backbone: bool = False
    # per-group width threshold for densifying the backbone's grouped convs
    # (0 disables; see _DenseGroupedConv)
    dense_group_width: int = 16
    merge_group_width: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        if self.normalize_input:
            mean = jnp.asarray(_IMAGENET_MEAN, dtype=x.dtype)
            std = jnp.asarray(_IMAGENET_STD, dtype=x.dtype)
            x = (x - mean) / std

        orig_hw = x.shape[1:3]
        if self.resize is not None:
            x = resize_bicubic(x, self.resize, align_corners=True)

        l1, l2, l3, l4 = ResNeXt101Backbone(
            dense_group_width=self.dense_group_width,
            merge_group_width=self.merge_group_width,
            name="pretrained")(x)
        if self.freeze_backbone:
            l1, l2, l3, l4 = jax.lax.stop_gradient((l1, l2, l3, l4))

        f = self.features
        l1_rn = _conv(f, 3, padding=1, use_bias=False, name="scratch__layer1_rn")(l1)
        l2_rn = _conv(f, 3, padding=1, use_bias=False, name="scratch__layer2_rn")(l2)
        l3_rn = _conv(f, 3, padding=1, use_bias=False, name="scratch__layer3_rn")(l3)
        l4_rn = _conv(f, 3, padding=1, use_bias=False, name="scratch__layer4_rn")(l4)

        path4 = FeatureFusionBlock(f, name="scratch__refinenet4")(l4_rn)
        path3 = FeatureFusionBlock(f, name="scratch__refinenet3")(path4, l3_rn)
        path2 = FeatureFusionBlock(f, name="scratch__refinenet2")(path3, l2_rn)
        path1 = FeatureFusionBlock(f, name="scratch__refinenet1")(path2, l1_rn)

        out = _conv(128, 3, padding=1, name="scratch__output_conv__0")(path1)
        out = upsample2x_bilinear(out, align_corners=False)
        out = _conv(32, 3, padding=1, name="scratch__output_conv__2")(out)
        out = nn.relu(out)
        out = _conv(1, 1, name="scratch__output_conv__4")(out)
        if self.non_negative:
            out = nn.relu(out)

        out = jnp.clip(out, min=1e-2)
        out = 10000.0 / out

        if self.mask_branch:
            m = _conv(128, 3, padding=1, name="scratch__output_conv_mask__0")(path1)
            m = upsample2x_bilinear(m, align_corners=False)
            m = _conv(32, 3, padding=1, name="scratch__output_conv_mask__2")(m)
            m = nn.relu(m)
            m = _conv(1, 1, name="scratch__output_conv_mask__4")(m)
            mask = nn.sigmoid(m)
            if self.resize is not None:
                out = resize_bicubic(out, orig_hw, align_corners=True)
                mask = resize_bicubic(mask, orig_hw, align_corners=True)
            return out[..., 0], mask[..., 0]

        if self.resize is not None:
            out = resize_bicubic(out, orig_hw, align_corners=True)
        return out[..., 0]
