"""Reusable network blocks (reference: networks/blocks.py).

Channel-last Flax equivalents. 1x1 convolutions are expressed as Dense layers
over the channel axis — identical math, and XLA maps them straight onto the
MXU as ``[B*H*W, C_in] @ [C_in, C_out]`` matmuls.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


def kaiming_normal_torch(a: float = 0.0):
    """torch's ``kaiming_normal_(mode='fan_in')`` with leaky-relu slope ``a``
    (reference: models/netinterface.py:55-84 uses a=0.2, fan_in)."""
    return nn.initializers.variance_scaling(
        scale=2.0 / (1.0 + a * a), mode="fan_in", distribution="normal"
    )


def get_initializer(init_type: str, init_param: float = 0.02, a: float = 0.0):
    """torch weight-init registry (reference: models/netinterface.py:55-84
    ``init_weight``): 'normal' = N(0, init_param); 'xavier' =
    xavier_normal_(gain=init_param); 'kaiming' = kaiming_normal_(a, fan_in);
    'orth' = orthogonal_(gain=init_param)."""
    if init_type == "kaiming":
        return kaiming_normal_torch(a)
    if init_type == "normal":
        return nn.initializers.normal(stddev=init_param)
    if init_type == "xavier":
        # torch: std = gain*sqrt(2/(fan_in+fan_out)) -> var = gain^2/fan_avg
        return nn.initializers.variance_scaling(
            scale=init_param ** 2, mode="fan_avg", distribution="normal"
        )
    if init_type == "orth":
        return nn.initializers.orthogonal(scale=init_param)
    raise NotImplementedError(
        f"initialization method [{init_type}] is not implemented"
    )


class PReLU(nn.Module):
    """Learnable PReLU, torch ``nn.PReLU()`` semantics: ONE shared learnable
    slope, initialized 0.25 (reference: networks/blocks.py:90-91)."""

    init_slope: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = self.param(
            "weight", lambda key: jnp.full((1,), self.init_slope, jnp.float32)
        )
        return jnp.where(x >= 0, x, a * x)


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation registry matching reference: networks/blocks.py:83-96.
    'prelu' is handled by the ConvBlock itself (it needs a parameter)."""
    if name == "relu":
        return nn.relu
    if name == "lrelu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    if name.startswith("lrelu:"):  # parameterized slope, e.g. 'lrelu:0.01'
        slope = float(name.split(":", 1)[1])
        return lambda x: nn.leaky_relu(x, negative_slope=slope)
    if name == "selu":
        return nn.selu
    if name == "tanh":
        return nn.tanh
    if name == "none":
        return lambda x: x
    raise ValueError(f"Unsupported activation: {name}")


class PeriodicEmbed(nn.Module):
    """Fourier feature embedding (reference: networks/blocks.py:19-34).

    Output channel order matches the reference exactly:
    ``[x, cos(f_1 x), ..., cos(f_N x), sin(f_1 x), ..., sin(f_N x)]``
    with ``f = linspace(1, max_freq + 1, N_freq)`` (or powers of two when
    ``linspace=False``), applied per input channel, concatenated channel-last.
    """

    max_freq: int = 5
    n_freq: int = 4
    linspace: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.linspace:
            freqs = jnp.linspace(1.0, self.max_freq + 1.0, self.n_freq)
        else:
            freqs = 2.0 ** jnp.arange(self.n_freq, dtype=jnp.float32)
        # x: [..., C] -> angles [..., N, C] -> flatten freq-major per function
        ang = x[..., None, :] * freqs[:, None]
        parts = [x]
        for fn in (jnp.cos, jnp.sin):
            v = fn(ang)  # [..., N, C]
            parts.append(v.reshape(x.shape[:-1] + (self.n_freq * x.shape[-1],)))
        return jnp.concatenate(parts, axis=-1)


class ConvBlock(nn.Module):
    """conv + norm + activation (reference: Conv2dBlock, networks/blocks.py:50-102).

    Supported norms: 'none' (canonical path), 'batch' (eval-mode running
    stats), 'inst', 'ln', 'weight' (weight normalization on the conv kernel,
    the reference's default). Padding: 'reflect' or 'zero', applied pre-conv
    like the reference (conv itself is VALID). 'prelu' activation is a
    learnable torch-style PReLU.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    norm: str = "none"
    activation: str = "relu"
    pad_type: str = "zero"
    use_bias: bool = True
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.padding > 0:
            mode = {"reflect": "reflect", "zero": "constant"}[self.pad_type]
            p = self.padding
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode=mode)
        conv = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding="VALID",
            use_bias=self.use_bias,
            kernel_init=self.kernel_init or kaiming_normal_torch(0.2),
            name="conv",
        )
        if self.norm == "weight":
            # torch nn.utils.weight_norm: w = g * v/||v|| with the norm taken
            # per output channel (kernel's last axis here)
            x = nn.WeightNorm(conv, feature_axes=-1,
                              variable_filter={"kernel"}, name="wn")(x)
        else:
            x = conv(x)
        if self.norm == "batch":
            x = nn.BatchNorm(use_running_average=True, name="norm")(x)
        elif self.norm == "inst":
            x = nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                             use_scale=False, name="norm")(x)
        elif self.norm == "ln":
            x = nn.LayerNorm(name="norm")(x)
        elif self.norm not in ("none", "weight"):
            raise ValueError(f"Unsupported norm: {self.norm}")
        if self.activation == "prelu":
            return PReLU(name="act")(x)
        return get_activation(self.activation)(x)


class DoubleConvBlock(nn.Module):
    """Two stacked ConvBlocks (reference: DoubleConv2dBlock,
    networks/blocks.py:37-47)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    norm: str = "none"
    activation: str = "relu"
    pad_type: str = "zero"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            norm=self.norm,
            activation=self.activation,
            pad_type=self.pad_type,
            use_bias=self.use_bias,
        )
        x = ConvBlock(**kw, name="model__0")(x)
        return ConvBlock(**kw, name="model__1")(x)


class ResConv2DBlock(nn.Module):
    """Residual double-conv block with a learned 1x1 skip when the channel
    count changes (reference: ResConv2DBlock, networks/blocks.py:102-123).
    The reference version is unused AND broken (it never calls
    ``super().__init__`` and misspells ``nn.Identity``); this is the working
    channel-last equivalent of its intent: out = convs(x) + skip(x)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    norm: str = "none"
    activation: str = "relu"
    pad_type: str = "zero"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(
            stride=self.stride, padding=self.padding, dilation=self.dilation,
            norm=self.norm, activation=self.activation,
            pad_type=self.pad_type, use_bias=self.use_bias,
        )
        if x.shape[-1] != self.features:
            # 1x1 shape-preserving skip: no spatial padding (the reference
            # passes its padding through, which would change the size —
            # part of why its version never ran)
            skip_kw = dict(kw, padding=0)
            res = ConvBlock(features=self.features, kernel_size=1, **skip_kw,
                            name="skip")(x)
        else:
            res = x
        out = ConvBlock(features=self.features,
                        kernel_size=self.kernel_size, **kw,
                        name="model__0")(x)
        out = ConvBlock(features=self.features,
                        kernel_size=self.kernel_size, **kw,
                        name="model__1")(out)
        return out + res
