"""Space-to-depth densification of narrow convolutions.

The MXU contracts 128 lanes per pass; a full-resolution conv with few output
channels (the hourglass depth net's inception branches emit 16/32 channels,
reference: third_party/hourglass.py:21-57) runs at ~4 TF/s on v5e — 12.5%
lane utilization — and its 11x11 branch alone costs 10.5 ms/step (measured,
scripts/step_profile.py --depth-net hourglass).

The TPU-first fix, exact by construction: run the conv in 2x2
space-to-depth space. A stride-1 ``same`` conv ``k x k, cin -> cout``
becomes ``k' x k', 4*cin -> 4*cout`` on the half-resolution s2d layout,
where ``k' = 2*floor((k+1)/4) + 1`` and the dense s2d kernel contains each
original weight exactly once per output phase (structural zeros elsewhere).
FLOP inflation is ``4*k'^2/k^2`` (11x11 -> 7x7: 1.62x; 7x7 -> 5x5: 2.04x)
in exchange for 4x wider output lanes AND a 4x deeper contraction — the
same trade as models/midas.py::_DenseGroupedConv, in the spatial dims.

Derivation: with phases ``x[s*P + a, s*Q + b]`` and output phases (c, d),
    y[s*P+c, ...] = sum_{i,j} K[i, j] x[s*P + c + i - r, ...]
and writing ``c + i - r = s*I + a`` gives a unique (I, a) per (i, c), so
    K'[I+R, J+R, (a,b,ci), (c,d,co)] = K[i, j, ci, co],
        i = s*I + a - c + r,  j = s*J + b - d + r,
zero where i or j falls outside [0, k). Zero padding in s2d space is zero
padding of every phase in image space, so ``same`` boundary behavior is
preserved exactly (H and W must be divisible by s).

The gradient w.r.t. the original kernel flows through the (static-index)
gather that builds K', so parameters keep nn.Conv's ``[k, k, cin, cout]``
shape and checkpoint porting (models/torch_port.py) is untouched.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray, s: int = 2) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/s, W/s, s*s*C]; channel = (a*s + b)*C + ci."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // s, s, w // s, s, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // s, w // s, s * s * c)


def depth_to_space(y: jnp.ndarray, s: int = 2) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, hh, ww, cc = y.shape
    c = cc // (s * s)
    y = y.reshape(b, hh, ww, s, s, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh * s, ww * s, c)


@functools.lru_cache(maxsize=None)
def _tap_map(k: int, s: int):
    """Static index map for the s2d kernel gather.

    Returns ``(idx, R)`` where ``idx[k', s, s]`` maps (I_offset, phase_in a,
    phase_out c) to the original tap ``i`` — or to ``k`` (a structurally
    zero row of the padded kernel) when no tap exists — and ``R`` is the
    ``same`` padding of the s2d conv. Odd ``k``, stride 1 only.
    """
    if k % 2 != 1:
        raise ValueError(f"s2d conv requires odd kernel, got {k}")
    r = (k - 1) // 2
    taps = []
    for i_off in range(-(k // s + 2), k // s + 3):
        used = any(
            0 <= s * i_off + a - c + r < k
            for a in range(s) for c in range(s)
        )
        if used:
            taps.append(i_off)
    lo, hi = min(taps), max(taps)
    kp = hi - lo + 1
    idx = np.full((kp, s, s), k, dtype=np.int32)  # k = zero sentinel row
    for n, i_off in enumerate(range(lo, hi + 1)):
        for a in range(s):
            for c in range(s):
                i = s * i_off + a - c + r
                if 0 <= i < k:
                    idx[n, a, c] = i
    return idx, -lo


def s2d_dense_kernel(kernel: jnp.ndarray, s: int = 2) -> jnp.ndarray:
    """Embed ``[k, k, cin, cout]`` into the dense s2d form
    ``[k', k', s*s*cin, s*s*cout]`` (differentiable; static indices)."""
    k, _, cin, cout = kernel.shape
    idx, _ = _tap_map(k, s)
    kp = idx.shape[0]
    padded = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
    idx = jnp.asarray(idx)
    # [I, a, c, J, b, d, ci, co]
    dense = padded[idx[:, :, :, None, None, None],
                   idx[None, None, None, :, :, :]]
    # -> [I, J, a, b, ci, c, d, co]
    dense = dense.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    return dense.reshape(kp, kp, s * s * cin, s * s * cout)


def s2d_same_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                  bias: jnp.ndarray | None = None, s: int = 2) -> jnp.ndarray:
    """Stride-1 ``same`` conv of ``x`` [B, H, W, cin] with ``kernel``
    [k, k, cin, cout], computed in s2d space. Exact (up to float summation
    order) vs ``lax.conv`` with ``same`` padding; requires H % s == W % s == 0
    and odd k."""
    k = kernel.shape[0]
    _, r_pad = _tap_map(k, s)
    dense = s2d_dense_kernel(kernel.astype(x.dtype), s)
    y = jax.lax.conv_general_dilated(
        space_to_depth(x, s),
        dense,
        window_strides=(1, 1),
        padding=[(r_pad, r_pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = depth_to_space(y, s)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
