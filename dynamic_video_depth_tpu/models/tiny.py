"""A small convolutional depth net for tests and smoke runs.

Not part of the reference surface — used where the 105M-parameter MiDaS or
the hourglass would make CPU tests needlessly slow. Produces strictly
positive depths with the same output contract as the real depth nets.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class TinyDepthNet(nn.Module):
    width: int = 16
    base_depth: float = 3.0

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.width, (3, 3), padding="SAME")(x)
        y = nn.relu(y)
        y = nn.Conv(self.width, (3, 3), padding="SAME")(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1))(y)
        # softplus keeps depth positive and gradients alive
        return self.base_depth * jnp.exp(0.5 * jnp.tanh(y[..., 0]))
