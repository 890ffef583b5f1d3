"""Scene-flow field network (reference: networks/sceneflow_field.py:20-53).

A NeRF-style coordinate MLP: Fourier-embed the world position (and time for
the time-dependent variant), then a stack of 1x1 convolutions. Channel-last
here, so the 1x1 convs are Dense layers — on TPU this becomes a single chain
of ``[B*H*W, C] @ [C, C']`` MXU matmuls per step of the Euler integration.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .blocks import PeriodicEmbed, get_activation, get_initializer


class SceneFlowFieldNet(nn.Module):
    """Maps world points (+ time) to 3D scene-flow vectors.

    Canonical instantiation (reference: models/scene_flow_motion_field.py:107):
    ``net_width=256, n_layers=4, time_dependent=True, N_freq_xyz=16,
    N_freq_t=16``.

    Input: ``x [B, H, W, 3]`` world points, ``t [B, H, W, 1]`` time stamps.
    Output: ``[B, H, W, output_dim]``.
    """

    time_dependent: bool = True
    n_freq_xyz: int = 0
    n_freq_t: int = 0
    output_dim: int = 3
    net_width: int = 32
    n_layers: int = 3
    activation: str = "lrelu"
    # weight init (reference hardcodes kaiming(0.01, a=0.2) for this net,
    # models/scene_flow_motion_field.py:123; --init_type overrides)
    init_type: str = "kaiming"
    init_param: float = 0.01

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if t is None and self.time_dependent:
            raise ValueError("time_dependent net requires a time input")

        if self.n_freq_xyz > 0:
            xyz_embedded = PeriodicEmbed(
                max_freq=self.n_freq_xyz, n_freq=self.n_freq_xyz
            )(x)
        else:
            xyz_embedded = x

        if self.time_dependent:
            if self.n_freq_t > 0:
                t_embedded = PeriodicEmbed(
                    max_freq=self.n_freq_t, n_freq=self.n_freq_t
                )(t)
            else:
                t_embedded = t
            feat = jnp.concatenate([t_embedded, xyz_embedded], axis=-1)
        else:
            feat = xyz_embedded

        act = get_activation(self.activation)
        init = get_initializer(self.init_type, self.init_param, a=0.2)
        # n_layers + 2 Dense layers total, matching the reference conv stack.
        # Names mirror the torch keys 'convs.<i>.conv.weight' for the porter.
        feat = act(nn.Dense(self.net_width, kernel_init=init, name="convs__0__conv")(feat))
        for i in range(self.n_layers):
            feat = act(
                nn.Dense(self.net_width, kernel_init=init, name=f"convs__{i + 1}__conv")(feat)
            )
        return nn.Dense(
            self.output_dim, kernel_init=init, name=f"convs__{self.n_layers + 1}__conv"
        )(feat)
