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


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation registry matching reference: networks/blocks.py:83-96."""
    if name == "relu":
        return nn.relu
    if name == "lrelu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    if name.startswith("lrelu:"):  # parameterized slope, e.g. 'lrelu:0.01'
        slope = float(name.split(":", 1)[1])
        return lambda x: nn.leaky_relu(x, negative_slope=slope)
    if name == "prelu":  # parameterless fallback: torch PReLU init slope 0.25
        return lambda x: nn.leaky_relu(x, negative_slope=0.25)
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
    stats), 'inst', 'ln'. Padding: 'reflect' or 'zero', applied pre-conv like
    the reference (conv itself is VALID).
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
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding="VALID",
            use_bias=self.use_bias,
            kernel_init=self.kernel_init or kaiming_normal_torch(0.2),
            name="conv",
        )(x)
        if self.norm == "batch":
            x = nn.BatchNorm(use_running_average=True, name="norm")(x)
        elif self.norm == "inst":
            x = nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                             use_scale=False, name="norm")(x)
        elif self.norm == "ln":
            x = nn.LayerNorm(name="norm")(x)
        elif self.norm != "none":
            raise ValueError(f"Unsupported norm: {self.norm}")
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
