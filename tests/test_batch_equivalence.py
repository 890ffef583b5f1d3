"""Batched-pair exactness (the fast-recipe guarantee): a batch of B pairs
optimizes EXACTLY the union objective of its pairs — every loss component
of a batch-4 step is the mask-mass-weighted recombination of the per-pair
components, the acceleration regularizer is their plain mean, and the
parameter GRADIENT of the batched loss equals the gradient of that
recombined composite. Pairs are independent samples of the same
per-video objective (reference protocol: batch_size 1,
/root/reference/experiments/davis/train_sequence.sh), so batching changes
only MXU occupancy, not the math — the basis for
experiments/davis/train_sequence_fast.sh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import __graft_entry__ as g
from dynamic_video_depth_tpu.train import LossConfig, TrainStepConfig
from dynamic_video_depth_tpu.train.step import SceneFlowMotionFieldStep


def cfg():
    return TrainStepConfig(
        lr=1e-4, scene_lr_mul=10.0, depth_net="tiny",
        net_width=16, n_layers=1, n_freq_xyz=2, n_freq_t=1,
        loss=LossConfig(flow_mul=1.0, disp_mul=1.0, acc_mul=1.0,
                        use_disp=True, midas=False, interp_steps=5),
        compute_dtype="float32",
        use_pallas_sf="off", use_pallas_warp="off", use_pallas_loss="off",
    )


def tree_index(batch, i):
    return {k: v[i:i + 1] for k, v in batch.items()
            if k not in ("time_step",)} | {"time_step": batch["time_step"]}


@pytest.fixture
def setup(rng):
    step = SceneFlowMotionFieldStep(cfg())
    batch = {k: jnp.asarray(v)
             for k, v in g._synthetic_batch(4, 16, 24, rng).items()}
    # distinct soft occlusion masks per pair: the recombination must be
    # mass-WEIGHTED, which all-ones masks would degenerate to a plain mean
    batch["mask_2"] = jnp.asarray(
        (rng.rand(4, 16, 24) * np.linspace(0.4, 1.0, 4)[:, None, None])
        .astype(np.float32))
    state = step.init_state(jax.random.PRNGKey(0), batch["img_1"])
    return step, batch, state


def test_batch_loss_is_mass_weighted_recombination(setup):
    step, batch, state = setup
    _, logs_b = step.loss_and_logs(
        state.params_depth, state.params_sf, state.stats_depth, batch,
        steps=1, warm=False)

    masses, per = [], []
    for i in range(4):
        b_i = tree_index(batch, i)
        _, logs_i = step.loss_and_logs(
            state.params_depth, state.params_sf, state.stats_depth, b_i,
            steps=1, warm=False)
        masses.append(float(jnp.sum(b_i["mask_2"])))
        per.append({k: float(v) for k, v in logs_i.items() if k != "_packed"})

    m = np.asarray(masses)
    for key in ("flow_loss_1_2", "disp_loss_1_2", "sf_loss"):
        want = float(np.sum(m * np.asarray([p[key] for p in per])) / m.sum())
        np.testing.assert_allclose(float(logs_b[key]), want, rtol=1e-5,
                                   err_msg=key)
    # the regularizer is a plain pixel mean -> equal-weight mean over pairs
    want_reg = float(np.mean([p["acc_reg"] for p in per]))
    np.testing.assert_allclose(float(logs_b["acc_reg"]), want_reg, rtol=1e-5)


def test_batch_gradient_matches_recombined_composite(setup):
    step, batch, state = setup
    masses = [float(jnp.sum(batch["mask_2"][i])) for i in range(4)]
    m = jnp.asarray(masses)

    def batched(params_sf, params_depth):
        total, _ = step.loss_and_logs(
            params_depth, params_sf, state.stats_depth, batch,
            steps=1, warm=False)
        return total

    def recombined(params_sf, params_depth):
        flow = disp = reg = 0.0
        for i in range(4):
            _, logs = step.loss_and_logs(
                params_depth, params_sf, state.stats_depth,
                tree_index(batch, i), steps=1, warm=False)
            flow = flow + m[i] * logs["flow_loss_1_2"]
            disp = disp + m[i] * logs["disp_loss_1_2"]
            reg = reg + logs["acc_reg"] / 4.0
        c = step.cfg.loss
        return (flow * c.flow_mul + disp * c.disp_mul) / m.sum() + reg

    g_b = jax.grad(batched, argnums=(0, 1))(state.params_sf,
                                            state.params_depth)
    g_r = jax.grad(recombined, argnums=(0, 1))(state.params_sf,
                                               state.params_depth)
    for a, b in zip(jax.tree.leaves(g_b), jax.tree.leaves(g_r)):
        scale = np.max(np.abs(np.asarray(b))) + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=2e-4, atol=2e-5)
