"""Fused RAFT correlation-pyramid lookup: parity vs the XLA tent-einsum
path in models/raft.py (itself parity-tested against a torch replica of
the official RAFT). Runs in Pallas interpret mode on CPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dynamic_video_depth_tpu.models.raft import lookup_correlation
from dynamic_video_depth_tpu.ops.pallas.correlation import (
    fused_lookup_correlation,
)


@pytest.fixture(autouse=True)
def interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def make_pyramid(rng, b, h, w, levels=4):
    n = h * w
    pyr = []
    hl, wl = h, w
    for _ in range(levels):
        pyr.append(jnp.asarray(rng.randn(b, n, hl, wl).astype(np.float32)))
        hl //= 2
        wl //= 2
    return pyr


def test_fused_lookup_matches_xla(rng):
    b, h, w = 1, 16, 24
    pyr = make_pyramid(rng, b, h, w)
    # coords spread across the grid incl. out-of-bounds (border clamp)
    coords = jnp.asarray(
        (rng.rand(b, h, w, 2) * [w * 1.2, h * 1.2] - [w * 0.1, h * 0.1])
        .astype(np.float32)
    )
    out = fused_lookup_correlation(pyr, coords, radius=4)
    ref = lookup_correlation(pyr, coords, radius=4)
    assert out.shape == ref.shape == (b, h, w, 4 * 81)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_lookup_batched_and_radius(rng):
    b, h, w = 2, 8, 16
    pyr = make_pyramid(rng, b, h, w, levels=2)
    coords = jnp.asarray((rng.rand(b, h, w, 2) * [w, h]).astype(np.float32))
    out = fused_lookup_correlation(pyr, coords, radius=3)
    ref = lookup_correlation(pyr, coords, radius=3)
    assert out.shape == (b, h, w, 2 * 49)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
