"""Train-step variants beyond the canonical path: CNN scene-flow head,
non-time-dependent field, motion-seg gating, disp-ratio loss, weight_steps."""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "tests")

from dynamic_video_depth_tpu.train import LossConfig, TrainStepConfig
from dynamic_video_depth_tpu.train.step import SceneFlowMotionFieldStep


def batch16(rng):
    import __graft_entry__ as g

    return g._synthetic_batch(1, 16, 24, rng)


def run_one(cfg, rng):
    b = batch16(rng)
    step = SceneFlowMotionFieldStep(cfg)
    state = step.init_state(jax.random.PRNGKey(0), b["img_1"])
    state, logs = step.train_step(state, b, steps=2, warm=False)
    assert np.isfinite(float(logs["loss"])), cfg
    return float(logs["loss"])


def base_cfg(**kw):
    loss_kw = kw.pop("loss", {})
    loss = LossConfig(**{**dict(flow_mul=1.0, disp_mul=1.0, acc_mul=1.0,
                                use_disp=True, midas=False), **loss_kw})
    return TrainStepConfig(
        lr=1e-4, scene_lr_mul=10.0, depth_net="tiny", net_width=16,
        n_layers=1, n_freq_xyz=2, n_freq_t=1, loss=loss,
        compute_dtype="float32", **kw,
    )


def test_cnn_sceneflow_head(rng):
    run_one(base_cfg(use_cnn=True, n_down=2), rng)


def test_time_independent_field(rng):
    run_one(base_cfg(time_dependent=False), rng)


def test_motion_seg_gating(rng):
    run_one(base_cfg(use_motion_seg=True), rng)


def test_disp_ratio_loss(rng):
    run_one(base_cfg(loss=dict(use_disp=False, use_disp_ratio=True)), rng)


def test_weight_steps_scales_gradient(rng):
    """weight_steps multiplies the backward loss by the gap but logs the
    unscaled loss (reference: _train_on_batch :189-190 + batch_log quirk)."""
    b = batch16(rng)
    losses = {}
    states = {}
    for ws in (False, True):
        cfg = base_cfg(loss=dict(weight_steps=ws, acc_mul=0.0))
        step = SceneFlowMotionFieldStep(cfg)
        state = step.init_state(jax.random.PRNGKey(1), b["img_1"])
        state, logs = step.train_step(state, b, steps=2, warm=False)
        losses[ws] = float(logs["loss"])
        states[ws] = state
    # logged loss identical (pre-scaling), parameter updates differ
    np.testing.assert_allclose(losses[False], losses[True], rtol=1e-6)
    diff = any(
        not np.allclose(np.asarray(a), np.asarray(b_))
        for a, b_ in zip(jax.tree.leaves(states[False].params_sf),
                         jax.tree.leaves(states[True].params_sf))
    )
    assert diff


def test_warm_reg_enables_reg_during_warmup(rng):
    b = batch16(rng)
    cfg = base_cfg(loss=dict(warm_reg=True))
    step = SceneFlowMotionFieldStep(cfg)
    state = step.init_state(jax.random.PRNGKey(2), b["img_1"])
    _, logs = step.train_step(state, b, steps=1, warm=True)
    assert float(logs["acc_reg"]) > 0.0


def test_remat_depth_matches_plain(rng):
    """--remat_depth (jax.checkpoint around the depth forward) must not
    change values or updates — it only trades FLOPs for activation HBM."""
    import __graft_entry__ as g
    from dynamic_video_depth_tpu.train import LossConfig, TrainStepConfig
    from dynamic_video_depth_tpu.train.step import SceneFlowMotionFieldStep

    batch = g._synthetic_batch(1, 16, 24, rng)

    def cfg(remat):
        return TrainStepConfig(
            lr=1e-4, scene_lr_mul=10.0, depth_net="tiny", net_width=16,
            n_layers=1, n_freq_xyz=2, n_freq_t=1,
            loss=LossConfig(flow_mul=1.0, disp_mul=1.0, acc_mul=1.0,
                            use_disp=True, midas=False),
            compute_dtype="float32", remat_depth=remat,
        )

    s_ref = SceneFlowMotionFieldStep(cfg(False))
    state0 = s_ref.init_state(jax.random.PRNGKey(2), batch["img_1"])
    ref_state, ref_logs = s_ref.train_step(
        jax.tree.map(jnp.copy, state0), batch, steps=2, warm=False)
    s_rm = SceneFlowMotionFieldStep(cfg(True))
    rm_state, rm_logs = s_rm.train_step(
        jax.tree.map(jnp.copy, state0), batch, steps=2, warm=False)
    np.testing.assert_allclose(float(rm_logs["loss"]),
                               float(ref_logs["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(ref_state.params_depth),
                    jax.tree.leaves(rm_state.params_depth)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
