"""The fused-Pallas scene-flow path must produce the same training step as
the Flax path (values + parameter updates), in interpret mode on CPU."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from dynamic_video_depth_tpu.train import LossConfig, TrainStepConfig
from dynamic_video_depth_tpu.train.step import SceneFlowMotionFieldStep


def cfg(use_pallas, use_pallas_warp=False, warp_window=None,
        use_pallas_loss=False, midas_mask=False, sf_chain="auto"):
    return TrainStepConfig(
        lr=1e-4, scene_lr_mul=10.0, depth_net="tiny",
        net_width=32, n_layers=2, n_freq_xyz=4, n_freq_t=2,
        loss=LossConfig(flow_mul=1.0, disp_mul=1.0, acc_mul=1.0,
                        use_disp=True, midas=midas_mask),
        compute_dtype="float32",
        use_pallas_sf="on" if use_pallas else "off",
        use_pallas_warp="on" if use_pallas_warp else "off",
        use_pallas_loss="on" if use_pallas_loss else "off",
        pallas_warp_window=warp_window,
        use_pallas_sf_chain=sf_chain,
    )


def test_pallas_loss_auto_is_resolution_aware(monkeypatch):
    """'auto' must pick the measured-faster path per config: XLA at the
    canonical 224x384 (the kernel is a ~0.7 ms net cost there), the fused
    kernel from ~2^17 px up (where HBM residency wins — RESULTS.md round-3
    interleaved A/Bs)."""
    step = SceneFlowMotionFieldStep(cfg(True))
    auto = dataclasses.replace(step.cfg, use_pallas_loss="auto")
    step_auto = SceneFlowMotionFieldStep(auto)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert not step_auto._loss_use_pallas(224 * 384)
    assert step_auto._loss_use_pallas(320 * 576)
    # forced modes ignore resolution
    assert SceneFlowMotionFieldStep(
        dataclasses.replace(auto, use_pallas_loss="on")
    )._loss_use_pallas(224 * 384)
    assert not SceneFlowMotionFieldStep(
        dataclasses.replace(auto, use_pallas_loss="off")
    )._loss_use_pallas(320 * 576)

    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert not step_auto._loss_use_pallas(320 * 576)


def test_pallas_step_matches_flax_step(rng):
    from jax.experimental.pallas import tpu as pltpu

    import __graft_entry__ as g

    batch = g._synthetic_batch(1, 16, 24, rng)

    step_ref = SceneFlowMotionFieldStep(cfg(False))
    state0 = step_ref.init_state(jax.random.PRNGKey(3), batch["img_1"])
    ref_state, ref_logs = step_ref.train_step(
        jax.tree.map(jnp.copy, state0), batch, steps=2, warm=False
    )

    step_pl = SceneFlowMotionFieldStep(cfg(True))
    with pltpu.force_tpu_interpret_mode():
        pl_state, pl_logs = step_pl.train_step(
            jax.tree.map(jnp.copy, state0), batch, steps=2, warm=False
        )

    np.testing.assert_allclose(float(pl_logs["loss"]), float(ref_logs["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(pl_logs["acc_reg"]),
                               float(ref_logs["acc_reg"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(ref_state.params_sf),
                    jax.tree.leaves(pl_state.params_sf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(ref_state.params_depth),
                    jax.tree.leaves(pl_state.params_depth)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_fully_fused_step_matches_xla_step(rng):
    """The all-Pallas step — fused MLP + fused warp + fused projection+loss
    kernel (the whole loss graph between the depth CNN and the scalars in
    Pallas) — must produce the same loss, logs, AND parameter updates as the
    all-XLA step, in both warm-up and main phases."""
    from jax.experimental.pallas import tpu as pltpu

    import __graft_entry__ as g

    batch = g._synthetic_batch(1, 16, 24, rng)

    for warm in (False, True):
        step_ref = SceneFlowMotionFieldStep(cfg(False, midas_mask=True))
        state0 = step_ref.init_state(jax.random.PRNGKey(7), batch["img_1"])
        ref_state, ref_logs = step_ref.train_step(
            jax.tree.map(jnp.copy, state0), batch, steps=2, warm=warm
        )

        step_pl = SceneFlowMotionFieldStep(
            cfg(True, use_pallas_warp=True, use_pallas_loss=True,
                midas_mask=True)
        )
        with pltpu.force_tpu_interpret_mode():
            pl_state, pl_logs = step_pl.train_step(
                jax.tree.map(jnp.copy, state0), batch, steps=2, warm=warm
            )

        for k in ("loss", "flow_loss_1_2", "disp_loss_1_2", "sf_loss",
                  "acc_reg"):
            np.testing.assert_allclose(
                float(pl_logs[k]), float(ref_logs[k]), rtol=1e-4,
                atol=1e-7, err_msg=f"{k} warm={warm}",
            )
        for a, b in zip(jax.tree.leaves(ref_state.params_depth),
                        jax.tree.leaves(pl_state.params_depth)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
        for a, b in zip(jax.tree.leaves(ref_state.params_sf),
                        jax.tree.leaves(pl_state.params_sf)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


def test_pallas_warp_step_matches_xla_step(rng):
    """The fused-Pallas warp path (gather-free tent-matmul warp with a
    src-only VJP) must produce the same training step — same loss AND same
    parameter updates — as the XLA grid-sample path."""
    from jax.experimental.pallas import tpu as pltpu

    import __graft_entry__ as g

    batch = g._synthetic_batch(1, 16, 24, rng)

    step_ref = SceneFlowMotionFieldStep(cfg(False))
    state0 = step_ref.init_state(jax.random.PRNGKey(5), batch["img_1"])
    ref_state, ref_logs = step_ref.train_step(
        jax.tree.map(jnp.copy, state0), batch, steps=2, warm=False
    )

    step_pl = SceneFlowMotionFieldStep(cfg(False, use_pallas_warp=True))
    with pltpu.force_tpu_interpret_mode():
        pl_state, pl_logs = step_pl.train_step(
            jax.tree.map(jnp.copy, state0), batch, steps=2, warm=False
        )

    np.testing.assert_allclose(float(pl_logs["loss"]), float(ref_logs["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_state.params_depth),
                    jax.tree.leaves(pl_state.params_depth)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(ref_state.params_sf),
                    jax.tree.leaves(pl_state.params_sf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_chain_off_pereval_path_matches_flax_step(rng):
    """--use_pallas_sf_chain off must fall back to the per-eval fused MLP
    (one fused_mlp_embed launch per Euler step) and still match the Flax
    step — keeps the escape-hatch path covered now that 'auto' prefers the
    chain megakernel at steps >= 2."""
    from jax.experimental.pallas import tpu as pltpu

    import __graft_entry__ as g

    batch = g._synthetic_batch(1, 16, 24, rng)

    step_ref = SceneFlowMotionFieldStep(cfg(False))
    state0 = step_ref.init_state(jax.random.PRNGKey(11), batch["img_1"])
    ref_state, ref_logs = step_ref.train_step(
        jax.tree.map(jnp.copy, state0), batch, steps=2, warm=False
    )

    step_pl = SceneFlowMotionFieldStep(cfg(True, sf_chain="off"))
    with pltpu.force_tpu_interpret_mode():
        pl_state, pl_logs = step_pl.train_step(
            jax.tree.map(jnp.copy, state0), batch, steps=2, warm=False
        )

    np.testing.assert_allclose(float(pl_logs["loss"]), float(ref_logs["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_state.params_sf),
                    jax.tree.leaves(pl_state.params_sf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_chain_gap1_phantom_reg_eval_matches_flax_step(rng):
    """At steps == 1 with the acceleration regularizer on, the chain runs a
    phantom second evaluation for the regularizer's (p1 + sf0, t1 + dt)
    query (reference: _opt_reg, models/scene_flow_motion_field.py:326-344)
    instead of a separate kernel launch — values and updates must match."""
    from jax.experimental.pallas import tpu as pltpu

    import __graft_entry__ as g

    batch = g._synthetic_batch(1, 16, 24, rng)

    step_ref = SceneFlowMotionFieldStep(cfg(False))
    state0 = step_ref.init_state(jax.random.PRNGKey(13), batch["img_1"])
    ref_state, ref_logs = step_ref.train_step(
        jax.tree.map(jnp.copy, state0), batch, steps=1, warm=False
    )
    assert float(ref_logs["acc_reg"]) != 0.0

    step_pl = SceneFlowMotionFieldStep(cfg(True))
    with pltpu.force_tpu_interpret_mode():
        pl_state, pl_logs = step_pl.train_step(
            jax.tree.map(jnp.copy, state0), batch, steps=1, warm=False
        )

    np.testing.assert_allclose(float(pl_logs["loss"]), float(ref_logs["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(pl_logs["acc_reg"]),
                               float(ref_logs["acc_reg"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(ref_state.params_sf),
                    jax.tree.leaves(pl_state.params_sf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(ref_state.params_depth),
                    jax.tree.leaves(pl_state.params_depth)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
