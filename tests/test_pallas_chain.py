"""Parity of the Euler-chain megakernel (fused_mlp_embed_chain) vs the
unrolled XLA path, in Pallas interpret mode on CPU.

The chain runs the whole multi-step scene-flow integration (reference:
forward_sf_net_multi_step, models/scene_flow_motion_field.py:360-367) plus
the acceleration regularizer's second field query (reference: _opt_reg,
:326-344) in one kernel launch; these tests pin forward values AND the full
VJP (points, times, dt, weights, biases) against the per-eval composition.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from dynamic_video_depth_tpu.ops.embedding import sceneflow_embed_consts
from dynamic_video_depth_tpu.ops.pallas import fused_mlp_embed_chain
from dynamic_video_depth_tpu.ops.pallas.mlp_kernel import chain_reference


@pytest.fixture()
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def make_net(rng, c_feat, widths=(32, 32, 3)):
    ws, bs = [], []
    c = c_feat
    for w in widths:
        ws.append(jnp.asarray(rng.randn(c, w).astype(np.float32) * 0.2))
        bs.append(jnp.asarray(rng.randn(w).astype(np.float32) * 0.05))
        c = w
    return tuple(ws), tuple(bs)


def make_inputs(rng, n=300):
    pts = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    ts = jnp.asarray(rng.rand(n, 1).astype(np.float32))
    dt = jnp.full((n, 1), 0.02, jnp.float32)
    consts = tuple(
        jnp.asarray(c) for c in sceneflow_embed_consts(4, 2, True)
    )
    return pts, ts, dt, consts


CASES = [(1, 1), (1, 2), (2, 2), (3, 3), (5, 5), (8, 8)]


@pytest.mark.parametrize("n_steps,n_evals", CASES)
def test_chain_forward_matches_reference(rng, interpret_mode, n_steps,
                                         n_evals):
    pts, ts, dt, consts = make_inputs(rng)
    ws, bs = make_net(rng, consts[2].shape[1])
    got = fused_mlp_embed_chain(pts, ts, dt, *consts, ws, bs,
                                n_steps, n_evals, 100.0, tile=128)
    want = chain_reference(pts, ts, dt, *consts, ws, bs,
                           n_steps, n_evals, 100.0)
    for g, w, name in zip(got, want, ("acc", "first", "second")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=1e-6, err_msg=name)


@pytest.mark.parametrize("n_steps,n_evals", [(1, 2), (2, 2), (4, 4)])
def test_chain_gradients_match_reference(rng, interpret_mode, n_steps,
                                         n_evals):
    pts, ts, dt, consts = make_inputs(rng, n=200)
    ws, bs = make_net(rng, consts[2].shape[1])
    # distinct cotangents per output so each VJP input is pinned
    cots = tuple(
        jnp.asarray(rng.randn(200, 3).astype(np.float32)) for _ in range(3)
    )

    def scalar(fn, pts, ts, dt, ws, bs):
        outs = fn(pts, ts, dt, *consts, ws, bs, n_steps, n_evals, 100.0)
        return sum(jnp.sum(o * c) for o, c in zip(outs, cots))

    def kernel_fn(pts, ts, dt, *rest):
        return fused_mlp_embed_chain(pts, ts, dt, *rest, tile=128)

    g_ker = jax.grad(lambda *a: scalar(kernel_fn, *a),
                     argnums=(0, 1, 2, 3, 4))(pts, ts, dt, ws, bs)
    g_ref = jax.grad(lambda *a: scalar(chain_reference, *a),
                     argnums=(0, 1, 2, 3, 4))(pts, ts, dt, ws, bs)
    names = ("dpts", "dts", "ddt", "dws", "dbs")
    for a, b, name in zip(jax.tree.leaves(g_ker), jax.tree.leaves(g_ref),
                          range(99)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5,
                                   err_msg=f"leaf {name} of {names}")


def test_chain_reference_matches_pereval_composition(rng):
    """chain_reference itself must equal the literal per-eval loop the
    train step's XLA fallback runs (accumulate, advect, divide)."""
    pts, ts, dt, consts = make_inputs(rng, n=100)
    fx, ft, raw_m, cos_m, sin_m = consts
    ws, bs = make_net(rng, raw_m.shape[1])

    def one_eval(p, t):
        ang = t * ft + p @ fx
        feat = raw_m * ang + cos_m * jnp.cos(ang) + sin_m * jnp.sin(ang)
        h = feat
        for i, (w, b) in enumerate(zip(ws, bs)):
            h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
            if i < len(ws) - 1:
                h = jnp.where(h >= 0, h, 0.2 * h)
        return h / 100.0

    p, t = pts, ts
    acc = jnp.zeros_like(p)
    evals = []
    for _ in range(3):
        sf = one_eval(p, t)
        evals.append(sf)
        acc = acc + sf
        p = p + sf
        t = t + dt
    got = chain_reference(pts, ts, dt, *consts, ws, bs, 3, 3, 100.0)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(acc),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(evals[0]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(evals[1]),
                               rtol=1e-6, atol=1e-7)


def test_second_eval_is_zero_when_single_eval(rng, interpret_mode):
    pts, ts, dt, consts = make_inputs(rng, n=64)
    ws, bs = make_net(rng, consts[2].shape[1])
    _, _, f1 = fused_mlp_embed_chain(pts, ts, dt, *consts, ws, bs,
                                     1, 1, 100.0, tile=64)
    assert not np.asarray(f1).any()
