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


def space_to_depth(x: jnp.ndarray, s: int = 2,
                   order: str = "phase") -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/s, W/s, s*s*C].

    ``order='phase'``: channel = (a*s + b)*C + ci (phase-major).
    ``order='ci'``: channel = ci*s*s + (a*s + b) (channel-major) — a slice of
    the first ``k`` original channels stays a contiguous slice of the first
    ``s*s*k`` s2d channels. (The fused inception regions used ci-major in
    round 4 for exactly that slicing property; round 5 moved them to the
    branch-blocked phase-major layout of :func:`s2d_fused_1x1_kernel`
    ``widths=`` — contiguous branch slices AND phase-major within each
    block, which the dense-kernel expansion needs. Both plain orders
    remain for the standalone conv paths and tests.)
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // s, s, w // s, s, c)
    perm = (0, 1, 3, 2, 4, 5) if order == "phase" else (0, 1, 3, 5, 2, 4)
    return x.transpose(*perm).reshape(b, h // s, w // s, s * s * c)


def depth_to_space(y: jnp.ndarray, s: int = 2,
                   order: str = "phase") -> jnp.ndarray:
    """Inverse of :func:`space_to_depth` (same ``order``)."""
    b, hh, ww, cc = y.shape
    c = cc // (s * s)
    if order == "phase":
        y = y.reshape(b, hh, ww, s, s, c)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh * s, ww * s, c)
    y = y.reshape(b, hh, ww, c, s, s)
    return y.transpose(0, 1, 4, 2, 5, 3).reshape(b, hh * s, ww * s, c)


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


@functools.lru_cache(maxsize=None)
def _selector(k: int, s: int):
    """One-hot expansion tensor ``S[i, j, I, J, A, C]`` with phase indices
    ``A = a*s + b`` (input), ``C = c*s + d`` (output): 1 where the s2d tap
    ``(I, J, A, C)`` reads original tap ``(i, j)``. At most one ``(i, j)``
    per slot, so a contraction against it reproduces the gather exactly."""
    idx, _ = _tap_map(k, s)
    kp = idx.shape[0]
    sel = np.zeros((k, k, kp, kp, s * s, s * s), dtype=np.float32)
    for I in range(kp):
        for J in range(kp):
            for a in range(s):
                for b in range(s):
                    for c in range(s):
                        for d in range(s):
                            i, j = idx[I, a, c], idx[J, b, d]
                            if i < k and j < k:
                                sel[i, j, I, J, a * s + b, c * s + d] = 1.0
    return sel


def s2d_dense_kernel(kernel: jnp.ndarray, s: int = 2,
                     order: str = "phase") -> jnp.ndarray:
    """Embed ``[k, k, cin, cout]`` into the dense s2d form
    ``[k', k', s*s*cin, s*s*cout]`` (differentiable; exact — each output
    slot receives at most one original tap).
    ``order`` selects the s2d channel layout (see :func:`space_to_depth`).

    Implemented as ONE contraction against a constant one-hot selector
    rather than an advanced-indexing gather: the gather form lowered to 8-D
    minor-dim-2 transposes at ~1 GB/s on the forward AND scatter-adds on the
    backward — measured 4.5 ms/step of kernel-(re)expansion data formatting
    in the hourglass train step. The einsum's adjoint is another einsum
    (a dot, MXU work), so both directions stay off the data-formatting path.
    """
    k, _, cin, cout = kernel.shape
    sel = jnp.asarray(_selector(k, s), dtype=kernel.dtype)
    kp = sel.shape[2]
    if order == "phase":
        # channel = A*cin + ci (phase-major)
        dense = jnp.einsum("ijIJAC,ijxy->IJAxCy", sel, kernel,
                           precision=jax.lax.Precision.HIGHEST)
    else:
        # channel = ci*s*s + A (channel-major)
        dense = jnp.einsum("ijIJAC,ijxy->IJxAyC", sel, kernel,
                           precision=jax.lax.Precision.HIGHEST)
    return dense.reshape(kp, kp, s * s * cin, s * s * cout)


def s2d_space_conv(xs: jnp.ndarray, kernel: jnp.ndarray, s: int = 2,
                   order: str = "phase") -> jnp.ndarray:
    """Conv applied to an ALREADY space-to-depth'd input: ``xs``
    [B, H/s, W/s, s*s*cin] with original kernel [k, k, cin, cout] ->
    [B, H/s, W/s, s*s*cout] in the same s2d layout. No bias (the caller
    broadcasts it in s2d channel order)."""
    k = kernel.shape[0]
    _, r_pad = _tap_map(k, s)
    dense = s2d_dense_kernel(kernel.astype(xs.dtype), s, order)
    return jax.lax.conv_general_dilated(
        xs,
        dense,
        window_strides=(1, 1),
        padding=[(r_pad, r_pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _phase_eye(s: int, dtype) -> jnp.ndarray:
    """E[a, b, p] = 1 where p == a*s + b (the s2d phase indicator)."""
    return jnp.eye(s * s, dtype=dtype).reshape(s, s, s * s)


def s2d_fused_1x1_kernel(kernel: jnp.ndarray, s: int = 2,
                         widths=None) -> jnp.ndarray:
    """Expand a 1x1 conv kernel [1, 1, cin, cout] to [s, s, cin, s*s*cout]
    so that a stride-s conv with it computes ``conv1x1 then space-to-depth``
    in ONE MXU pass — the s2d relayout never exists as a transpose op
    (measured: explicit ci-major transposes run at ~0.4 GB/s on this
    backend's data-formatting path; the conv runs at MXU rate). Each
    original output value is computed exactly once (output channel (co, p)
    reads only input pixel p of its 2x2 block), so the result is the
    unfused conv's bit-for-bit values in a different layout.

    ``widths=None`` emits the ci-major layout (channel = co*s*s + p).
    ``widths=[w0, w1, ...]`` (summing to cout) emits the BRANCH-BLOCKED
    PHASE-MAJOR layout: branch blocks stay contiguous (block b spans
    channels [s*s*off_b, s*s*off_{b+1})) and within a block the channel is
    ``p*w_b + co_local`` — i.e. each block is exactly ``order='phase'`` over
    its own channels. Phase-major is what the dense s2d kernel expansion
    wants: its einsum minor dim becomes the cout axis instead of the
    4-wide phase index, cutting the (8,128)-tile lane padding of the
    expansion intermediates 4-8x (measured, scripts/probe_s2d_order.py:
    every hourglass branch shape is faster in phase order, up to 2.2x on
    the 11x11 half-res branches)."""
    w = kernel[0, 0]  # [cin, cout]
    e = _phase_eye(s, w.dtype)
    if widths is None:
        out = w[None, None, :, :, None] * e[:, :, None, None, :]
        return out.reshape(s, s, w.shape[0], w.shape[1] * s * s)
    blocks, off = [], 0
    for wd in widths:
        wb = w[:, off:off + wd]  # [cin, wd]
        # [s, s, cin, p, wd] -> channel p*wd + co_local
        blk = e[:, :, None, :, None] * wb[None, None, :, None, :]
        blocks.append(blk.reshape(s, s, w.shape[0], s * s * wd))
        off += wd
    return jnp.concatenate(blocks, axis=-1)


def d2s_conv(y: jnp.ndarray, s: int = 2, widths=None) -> jnp.ndarray:
    """Depth-to-space as an lhs-dilated identity conv ([B, H', W', s*s*C]
    -> [B, s*H', s*W', C]) — MXU data movement instead of a transpose op.
    Exact: each output pixel copies exactly one input value (identity
    kernel, structural zeros elsewhere); precision pinned HIGHEST so the
    copy never rounds f32 operands to bf16.

    ``widths=None``: input is ci-major (channel = ci*s*s + p) — equivalent
    to the branch-blocked phase-major layout with every block width 1.
    ``widths=[w0, ...]``: input is the branch-blocked phase-major layout of
    :func:`s2d_fused_1x1_kernel` (block b channel = p*w_b + ci_local)."""
    c = y.shape[-1] // (s * s)
    if widths is None:
        widths = [1] * c
    assert sum(widths) == c, (widths, c)
    # Per block: k[u, v, p*wd + ci_local, co_local] =
    #   delta(ci_local, co_local) * delta(p, (s-1-u)*s + (s-1-v)):
    # with lhs_dilation s and padding s-1, output pixel s*i + a reads
    # dilated position s*i through kernel tap u = (s-1) - a. Blocks
    # assemble block-diagonally over the channel axes.
    e = _phase_eye(s, y.dtype)[::-1, ::-1, :]
    parts = []
    off = 0
    for wd in widths:
        eye = jnp.eye(wd, dtype=y.dtype)
        # [s, s, p, ci_local, co_local] -> [s, s, s*s*wd, wd]
        blk = e[:, :, :, None, None] * eye[None, None, None, :, :]
        blk = blk.reshape(s, s, s * s * wd, wd)
        pad_before = s * s * off
        pad_after = c * s * s - pad_before - blk.shape[2]
        parts.append(jnp.pad(
            blk, ((0, 0), (0, 0), (pad_before, pad_after), (0, 0))))
        off += wd
    k = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    return jax.lax.conv_general_dilated(
        y, k,
        window_strides=(1, 1),
        padding=[(s - 1, s - 1)] * 2,
        lhs_dilation=(s, s),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )


def s2d_same_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                  bias: jnp.ndarray | None = None, s: int = 2) -> jnp.ndarray:
    """Stride-1 ``same`` conv of ``x`` [B, H, W, cin] with ``kernel``
    [k, k, cin, cout], computed in s2d space. Exact (up to float summation
    order) vs ``lax.conv`` with ``same`` padding; requires H % s == W % s == 0
    and odd k."""
    y = depth_to_space(s2d_space_conv(space_to_depth(x, s), kernel, s), s)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
