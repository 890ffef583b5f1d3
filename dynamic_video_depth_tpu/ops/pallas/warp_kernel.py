"""Fused backward-warp Pallas kernel (forward + custom VJP).

The reference's hot loss chain backward-warps frame-2 buffers by the
observed optical flow with ``F.grid_sample(align_corners=True,
padding_mode='border')`` (reference: losses/scene_flow_projection.py:
212-220, 281-307). The XLA path (ops/grid_sample.py) lowers to 4 corner
gathers + VPU lerps per warp; gathers are the one part of the loss graph
XLA cannot fuse into its neighbors.

TPU-native formulation — NO gathers at all:

  out[p] = sum_y sum_x  wy[p, y] * wx[p, x] * src[y, x]

with ``wy``/``wx`` the bilinear tent weights (two nonzeros per row, and the
rows sum to 1 by construction):

  1. row mixing   : ``tmp = wy_mat [N, WIN] @ window [WIN, W]`` — a dense
     matmul on the MXU. ``WIN`` is a per-block row window positioned by the
     block's minimum sample row (full image height when ``window=None``).
  2. column mixing: ``out[p] = sum_x wx_mat[p, x] * tmp[p, x]`` — a masked
     VPU reduction along lanes.

Dynamic gathers become structured dense linear algebra, which is exactly
what the MXU/VPU want; the whole warp for a row block stays VMEM-resident.

Custom VJP: this model only ever differentiates the warp w.r.t. the SOURCE
buffer (the flow is observed data, never a function of parameters), so the
backward kernel produces ``dsrc`` only — the transposed row-mix matmul
accumulated across row blocks — and a zero cotangent for the flow.
Callers that need flow gradients must use the XLA path.

Layout note: the kernel works channel-first ``[B, C, H, W]`` internally so
every 2D slice tiles cleanly onto (sublane, lane) vector registers; the
channel-last public API transposes at the boundary (fused by XLA).

Exactness: with ``window=None`` the kernel is exact for any flow. With a
finite ``window`` it is exact whenever each ``rows``-row output block
samples from a source-row span of at most ``window - 7`` rows (the window
offset is sublane-aligned downward by up to 7): the vertical flow may vary
by up to ``window - rows - 8`` pixels within a block. Rows outside the
window clamp to its edge.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_to(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def required_window(flow, rows: int = 8) -> int:
    """Minimal window (multiple of 8) for which :func:`fused_backward_warp`
    is EXACT for this flow, mirroring the kernel's clamping math. Host-side
    numpy (runs at the data boundary, where the observed flow is loaded);
    returns the padded full height when no smaller window is safe.

    The kernel positions each output row block's source window at
    ``off = floor8(clip(min(iy0), 0, h - win))`` and clamps source rows to
    ``[off, off + win - 1]``; exactness requires every sampled row
    ``iy0/iy1`` of the block to fall inside that span."""
    import numpy as np

    flow = np.asarray(flow)
    if flow.ndim == 3:
        flow = flow[None]
    b, h, w, _ = flow.shape
    rows = _pad_to(rows, 8)
    hp = _pad_to(h, rows)
    yy = np.arange(h, dtype=np.float32)[None, :, None]
    y = np.clip(yy + flow[..., 1], 0.0, h - 1.0)
    iy0 = np.floor(y).astype(np.int64)
    iy1 = np.minimum(iy0 + 1, h - 1)
    # zero-padded flow rows (h..hp) sample their clamped own row = h-1
    pad_rows = hp - h
    if pad_rows:
        iy0 = np.concatenate(
            [iy0, np.full((b, pad_rows, w), h - 1, np.int64)], axis=1)
        iy1 = np.concatenate(
            [iy1, np.full((b, pad_rows, w), h - 1, np.int64)], axis=1)
    lo = iy0.reshape(b, hp // rows, rows * w).min(axis=2)  # [B, nblk]
    hi = iy1.reshape(b, hp // rows, rows * w).max(axis=2)
    for win in range(8, _pad_to(h, 8) + 1, 8):
        off = (np.clip(lo, 0, max(h - win, 0)) // 8) * 8
        if (hi - off <= win - 1).all():
            return win
    return _pad_to(h, 8)


def _sample_coords(flow_ref, h, w, wp, rows):
    """Clamped bilinear corner indices/weights for the current output row
    block, in lane layout ``[1, N]`` (N = rows*wp). Mosaic supports the
    sublane->lane merge reshape ONLY for whole-vreg lane dims, so the width
    is zero-padded to a multiple of 128 (``wp``) by the wrapper; clamping
    uses the REAL width ``w``, and padded columns produce garbage that the
    wrapper slices off. The ``[N, 1]`` sublane layout and transposes are NOT
    reliable on this backend, so everything per-point lives in lanes.
    flow_ref block: [1, 1, 2, N] (flattened row block)."""
    n = rows * wp
    row0 = pl.program_id(1) * rows
    # Mosaic iota is integer-only; cast to float for the coordinate math.
    base_x = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 1).astype(jnp.float32).reshape(1, n)
    base_y = (jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 0) + row0).astype(jnp.float32).reshape(1, n)
    x = jnp.clip(base_x + flow_ref[0, 0, 0:1, :], 0.0, w - 1.0)
    y = jnp.clip(base_y + flow_ref[0, 0, 1:2, :], 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    ix1 = jnp.minimum(ix0 + 1, w - 1)
    iy1 = jnp.minimum(iy0 + 1, h - 1)
    return ix0, ix1, wx, iy0, iy1, wy


def _window_offset(iy0, h, w, wp, rows, win):
    """Sublane-aligned start row of the source window for this block.

    The min runs over REAL columns only: the zero-flow padded lane columns
    (w..wp) sample their own row, which would drag the window start up to
    the block's row and silently clamp genuine downward flow at any width
    that is not a multiple of 128. Padded points' outputs are sliced off by
    the wrapper (and carry zero cotangent in the backward), so excluding
    them never affects results — it keeps the window positioned by the
    flow the guard (:func:`required_window`) actually inspected."""
    n = rows * wp
    lane_x = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 1).reshape(1, n)
    iy0_real = jnp.where(lane_x < w, iy0, h - 1)
    off = jnp.clip(jnp.min(iy0_real), 0, max(h - win, 0))
    return (off // 8) * 8  # sublane alignment for the dynamic slice


def _tent_matrix_t(i0, i1, frac, size, n):
    """[size, N] with (1-frac) at row i0[p] and frac at row i1[p] per point
    column p. Columns sum to 1 even when i0 == i1 (border clamp)."""
    rows_idx = jax.lax.broadcasted_iota(jnp.int32, (size, n), 0)
    return (
        (rows_idx == i0).astype(jnp.float32) * (1.0 - frac)
        + (rows_idx == i1).astype(jnp.float32) * frac
    )


# Points processed per inner chunk: caps the [w, CHUNK] / [win, CHUNK]
# tent/matmul buffers so full-height windows fit VMEM alongside the source.
_CHUNK = 1024


def _chunks(n):
    if n <= _CHUNK:
        return [(0, n)]
    size = next(s for s in range(_CHUNK, 0, -1) if n % s == 0)
    return [(i * size, size) for i in range(n // size)]


def _tent_chunk(flow_ref, h, w, wp, rows, win, off, lo, size):
    """Tent matrices for point columns [lo, lo+size) of this row block.
    wx rows span the PADDED width (to match the source window); indices are
    clamped to the real width so padded rows carry zero weight."""
    ix0, ix1, wx, iy0, iy1, wy = _sample_coords(flow_ref, h, w, wp, rows)
    sl = lambda a: a[:, lo:lo + size]
    iy0r = jnp.clip(sl(iy0) - off, 0, win - 1)
    iy1r = jnp.clip(sl(iy1) - off, 0, win - 1)
    wy_mat_t = _tent_matrix_t(iy0r, iy1r, sl(wy), win, size)  # [win, size]
    wx_mat_t = _tent_matrix_t(sl(ix0), sl(ix1), sl(wx), wp, size)  # [wp, size]
    return wy_mat_t, wx_mat_t


def _fwd_kernel(h, w, wp, c, rows, win, src_ref, flow_ref, out_ref):
    n = rows * wp
    _, _, _, iy0, _, _ = _sample_coords(flow_ref, h, w, wp, rows)
    off = _window_offset(iy0, h, w, wp, rows, win)
    for lo, size in _chunks(n):
        wy_mat_t, wx_mat_t = _tent_chunk(flow_ref, h, w, wp, rows, win, off,
                                         lo, size)
        for ch in range(c):
            window = src_ref[0, ch, pl.ds(off, win), :]  # [win, wp]
            # column mix on the MXU: [win, wp] @ [wp, size] -> [win, size].
            # Geometry math pins full f32 matmul precision (the TPU default
            # truncates operands to bf16 — ~1e-2 error, unacceptable here).
            g1 = jnp.dot(window, wx_mat_t,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            # row mix on the VPU: tent-weighted sublane reduction
            out = jnp.sum(wy_mat_t * g1, axis=0, keepdims=True)
            out_ref[0, 0, ch:ch + 1, lo:lo + size] = out.astype(out_ref.dtype)


def _bwd_kernel(h, w, wp, c, rows, win, flow_ref, g_ref, dsrc_ref):
    n = rows * wp
    _, _, _, iy0, _, _ = _sample_coords(flow_ref, h, w, wp, rows)
    off = _window_offset(iy0, h, w, wp, rows, win)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dsrc_ref[...] = jnp.zeros_like(dsrc_ref)

    for lo, size in _chunks(n):
        wy_mat_t, wx_mat_t = _tent_chunk(flow_ref, h, w, wp, rows, win, off,
                                         lo, size)
        for ch in range(c):
            g = g_ref[0, 0, ch:ch + 1, lo:lo + size].astype(jnp.float32)
            dg1 = wy_mat_t * g  # [win, size]
            # [win, size] x [wp, size] contracted over the points -> [win, wp]
            # (no transposes: they are unreliable on this backend)
            dwin = jax.lax.dot_general(
                dg1, wx_mat_t,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            dsrc_ref[0, ch, pl.ds(off, win), :] += dwin.astype(dsrc_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_backward_warp(src: jnp.ndarray, flow: jnp.ndarray,
                        window: int | None = None,
                        rows: int = 4) -> jnp.ndarray:
    """Backward-warp ``src [B, H, W, C]`` by ``flow [B, H, W, 2]`` (dx, dy),
    border-clamped bilinear, matching ``ops.grid_sample.backward_warp``.

    Differentiable w.r.t. ``src`` only (flow cotangent is zero — the flow is
    observed data in this model); wrap the flow in ``stop_gradient`` at call
    sites for clarity.
    """
    return _warp_fwd(src, flow, window, rows)[0]


def _row_blocked(x_cf, hp, rows):
    """[B, K, HP, WP] channel-first -> [B, HP/rows, K, rows*WP] flattened
    row blocks (row-major, so each block is contiguous)."""
    b, k, _, wp = x_cf.shape
    x = x_cf.reshape(b, k, hp // rows, rows * wp)
    return jnp.transpose(x, (0, 2, 1, 3))


def _run_fwd(src, flow, window, rows):
    b, h, w, c = src.shape
    rows = _pad_to(rows, 8)  # Mosaic block sublane-dim constraint
    win = h if window is None else min(_pad_to(window, 8), h)
    hp = _pad_to(h, rows)
    wp = _pad_to(w, 128)  # whole-vreg lanes for the merge reshape
    n = rows * wp
    src_cf = jnp.transpose(src, (0, 3, 1, 2))          # [B, C, H, W]
    flow_cf = jnp.transpose(flow, (0, 3, 1, 2))        # [B, 2, H, W]
    src_cf = jnp.pad(src_cf, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
    flow_cf = jnp.pad(flow_cf,
                      ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
    nblk = hp // rows
    flow_blk = _row_blocked(flow_cf, hp, rows)         # [B, NBLK, 2, N]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, h, w, wp, c, rows, win),
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((1, c, h, wp), lambda bi, ri: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, n), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, c, n), lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nblk, c, n), src.dtype),
    )(src_cf, flow_blk)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, c, hp, wp)
    return jnp.transpose(out[:, :, :h, :w], (0, 2, 3, 1))


def _warp_fwd(src, flow, window, rows):
    return _run_fwd(src, flow, window, rows), flow


def _warp_bwd(window, rows, flow, g):
    # src has the same shape/dtype as the warped output
    b, h, w, c = g.shape
    src_dtype = g.dtype
    rows = _pad_to(rows, 8)  # Mosaic block sublane-dim constraint
    win = h if window is None else min(_pad_to(window, 8), h)
    hp = _pad_to(h, rows)
    wp = _pad_to(w, 128)  # whole-vreg lanes for the merge reshape
    n = rows * wp
    flow_cf = jnp.transpose(flow, (0, 3, 1, 2))
    g_cf = jnp.transpose(g, (0, 3, 1, 2))
    pad = ((0, 0), (0, 0), (0, hp - h), (0, wp - w))
    flow_cf = jnp.pad(flow_cf, pad)
    g_cf = jnp.pad(g_cf, pad)  # zero rows/cols contribute nothing
    nblk = hp // rows
    flow_blk = _row_blocked(flow_cf, hp, rows)  # [B, NBLK, 2, N]
    g_blk = _row_blocked(g_cf, hp, rows)        # [B, NBLK, C, N]
    dsrc = pl.pallas_call(
        functools.partial(_bwd_kernel, h, w, wp, c, rows, win),
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((1, 1, 2, n), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c, n), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, h, wp), lambda bi, ri: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h, wp), jnp.float32),
    )(flow_blk, g_blk)
    dsrc = jnp.transpose(dsrc[:, :, :, :w], (0, 2, 3, 1)).astype(src_dtype)
    return dsrc, jnp.zeros_like(flow)


fused_backward_warp.defvjp(_warp_fwd, _warp_bwd)
