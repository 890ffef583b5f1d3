"""Dense MLPs with Fourier embedding + periodic skip concat
(reference: networks/MLP.py:20-82 — library code, unused by the canonical
model but part of the API surface)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .blocks import PeriodicEmbed, get_activation


class MLP(nn.Module):
    """Plain MLP (reference: networks/MLP.py:52-63)."""

    out_ch: int = 3
    depth: int = 3
    width: int = 64
    activation: str = "relu"
    output_activation: str = "none"

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        x = act(nn.Dense(self.width, name="model__0__linear")(x))
        for d in range(self.depth - 1):
            x = act(nn.Dense(self.width, name=f"model__{d + 1}__linear")(x))
        x = nn.Dense(self.out_ch, name=f"model__{self.depth}__linear")(x)
        return get_activation(self.output_activation)(x)


class EmbeddedMLP(nn.Module):
    """Fourier-embedded MLP with skip re-concat every ``skip`` layers
    (reference: EmbededMLP, networks/MLP.py:20-49). Power-of-two frequencies
    (``linspace=False``)."""

    out_ch: int = 3
    depth: int = 3
    width: int = 64
    n_freq: int = 8
    skip: int = 3
    # torch F.leaky_relu default slope (reference: networks/MLP.py:21)
    activation: str = "lrelu:0.01"
    output_activation: str = "none"
    init_val: Optional[float] = None

    @nn.compact
    def __call__(self, x):
        x = PeriodicEmbed(max_freq=self.n_freq, n_freq=self.n_freq, linspace=False)(x)
        embed = x
        act = get_activation(self.activation)

        n_layers = self.depth + 1  # hidden stack + output, matching reference
        for idl in range(n_layers):
            is_last = idl == n_layers - 1
            if idl % self.skip == 0 and 0 < idl < n_layers - 1:
                x = jnp.concatenate([x, embed], axis=-1)
            if is_last:
                bias_init = (
                    nn.initializers.constant(self.init_val)
                    if self.init_val is not None
                    else nn.initializers.zeros_init()
                )
                x = nn.Dense(self.out_ch, bias_init=bias_init,
                             name=f"layer_{idl:03d}__linear")(x)
                x = get_activation(self.output_activation)(x)
            else:
                x = act(nn.Dense(self.width, name=f"layer_{idl:03d}__linear")(x))
        return x
