"""FCN-UNet scene-flow head (reference: networks/FCNUnet.py:21-92).

Optional CNN alternative to the coordinate-MLP scene-flow field
(``--use_cnn``). Channel-last Flax.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import upsample2x_bilinear
from .blocks import ConvBlock, DoubleConvBlock


class FCNUnet(nn.Module):
    """n_down avg-pool encoder, mid conv, bilinear-upsample skip-concat
    decoder, 1x1 output conv.

    Canonical instantiation (reference: models/scene_flow_motion_field.py:105):
    ``norm='none', activation='lrelu', pad_type='reflect', n_down=3, feat=32,
    block_type='double_conv', out_channel=3``.
    """

    n_down: int = 4
    feat: int = 32
    block_type: str = "conv"
    down_sample_type: str = "avgpool"
    out_channel: int = 64
    norm: str = "none"
    activation: str = "lrelu"
    pad_type: str = "reflect"
    output_activation: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        block_cls = {"conv": ConvBlock, "double_conv": DoubleConvBlock}[self.block_type]
        kw = dict(
            kernel_size=3, padding=1, norm=self.norm,
            activation=self.activation, pad_type=self.pad_type,
        )

        def pool(y):
            if self.down_sample_type == "avgpool":
                # torch AvgPool2d(3, 2, 1) counts padded zeros in the mean
                # (count_include_pad default True).
                yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
                return nn.avg_pool(yp, (3, 3), strides=(2, 2), padding="VALID")
            if self.down_sample_type == "maxpool":
                return nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
            return y

        skips = []
        ch_out = self.feat
        for k in range(self.n_down):
            x = block_cls(features=ch_out, name=f"down_{k:02d}", **kw)(x)
            skips.append(x)
            x = pool(x)
            ch_out = ch_out * 2
        ch_in = ch_out // 2
        x = block_cls(features=ch_in, name="mid_conv", **kw)(x)

        for k in range(self.n_down - 1):
            up = upsample2x_bilinear(x, align_corners=True)
            x = jnp.concatenate([skips[-(k + 1)], up], axis=-1)
            x = block_cls(features=ch_in // 2, name=f"up_{k:04d}", **kw)(x)
            ch_in = ch_in // 2
        up = upsample2x_bilinear(x, align_corners=True)
        x = jnp.concatenate([skips[0], up], axis=-1)
        x = block_cls(features=ch_in, name=f"up_{self.n_down - 1:04d}", **kw)(x)

        x = ConvBlock(
            features=self.out_channel, kernel_size=1, norm="none",
            activation="none", pad_type=self.pad_type, name="output_conv",
        )(x)
        if self.output_activation == "tanh":
            x = nn.tanh(x)
        elif self.output_activation == "sigmoid":
            x = nn.sigmoid(x)
        return x
