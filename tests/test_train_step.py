"""End-to-end train step tests on a synthetic track in the reference
datafile format."""

import argparse

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dynamic_video_depth_tpu.data import get_dataset
from dynamic_video_depth_tpu.data.synthetic import make_track
from dynamic_video_depth_tpu.train import LossConfig, TrainStepConfig
from dynamic_video_depth_tpu.train.step import SceneFlowMotionFieldStep


@pytest.fixture(scope="module")
def track_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("datafiles")
    make_track(str(root), track="dog", n_frames=8, h=32, w=48, gaps=(1, 2))
    return str(root)


def make_opt(track_dir, **kw):
    opt = argparse.Namespace(
        track_id="dog", gaps="1,2", repeat=1, subsample=False, cache=True,
        overfit=False, capat=1, select=False, data_root=track_dir,
    )
    for k, v in kw.items():
        setattr(opt, k, v)
    return opt


def small_cfg(**kw):
    loss_kw = dict(
        flow_mul=1.0, disp_mul=1.0, acc_mul=1.0, sf_mag_div=100.0,
        use_disp=True, midas=False, interp_steps=5,
    )
    loss_kw.update(kw.pop("loss", {}))
    return TrainStepConfig(
        lr=1e-4, scene_lr_mul=10.0, depth_net="tiny",
        net_width=32, n_layers=2, n_freq_xyz=4, n_freq_t=2,
        loss=LossConfig(**loss_kw), compute_dtype="float32", **kw,
    )


def device_batch(batch):
    return {k: jnp.asarray(v) for k, v in batch.items() if k != "pair_path"}


def test_dataset_roundtrip(track_dir):
    ds = get_dataset("davis_sequence")(make_opt(track_dir), mode="train")
    assert len(ds) > 0
    b = ds[0]
    h, w = b["img_1"].shape[1:3]
    assert b["img_1"].shape == (1, h, w, 3)
    assert b["flow_1_2"].shape == (1, h, w, 2)
    assert b["mask_2"].shape == (1, h, w)
    assert b["R_1"].shape == (1, 3, 3)
    # synthetic flows are exact depth-induced flows; check consistency with
    # our geometry ops
    from dynamic_video_depth_tpu.ops import Camera, flow_by_depth

    cam1 = Camera(jnp.asarray(b["R_1"]), jnp.asarray(b["t_1"]),
                  jnp.asarray(b["K"]), jnp.asarray(b["K_inv"]))
    cam2 = Camera(jnp.asarray(b["R_2"]), jnp.asarray(b["t_2"]),
                  jnp.asarray(b["K"]), jnp.asarray(b["K_inv"]))
    out = flow_by_depth(
        jnp.asarray(b["depth_gt_1"]), jnp.asarray(b["depth_gt_1"]),
        jnp.asarray(b["flow_1_2"]), cam1, cam2,
    )
    # depth_2 here is frame-1 depth (static scene), dflow == packed flow
    np.testing.assert_allclose(
        np.asarray(out["dflow_1_2"]), b["flow_1_2"], atol=5e-2
    )

    ds_vali = get_dataset("davis_sequence")(make_opt(track_dir), mode="vali")
    bv = ds_vali[0]
    assert bv["img"].shape == (1, h, w, 3)
    assert bv["depth_mvs"].shape == (1, h, w)


def test_train_step_loss_decreases(track_dir):
    ds = get_dataset("davis_sequence")(make_opt(track_dir), mode="train")
    step = SceneFlowMotionFieldStep(small_cfg())
    b0 = device_batch(ds[0])
    state = step.init_state(jax.random.PRNGKey(0), b0["img_1"])

    losses = []
    for it in range(60):
        b = device_batch(ds[it % len(ds)])
        gap = int(b["frame_id_2"][0] - b["frame_id_1"][0])
        state, logs = step.train_step(state, b, steps=gap, warm=False)
        losses.append(float(logs["loss"]))
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert np.isfinite(losses).all()
    assert last < first, (first, last)


def test_warmup_freezes_depth(track_dir):
    ds = get_dataset("davis_sequence")(make_opt(track_dir), mode="train")
    step = SceneFlowMotionFieldStep(small_cfg())
    b = device_batch(ds[0])
    state = step.init_state(jax.random.PRNGKey(0), b["img_1"])
    d0 = jax.tree.map(lambda x: np.asarray(x).copy(), state.params_depth)
    s0 = jax.tree.map(lambda x: np.asarray(x).copy(), state.params_sf)

    state, logs = step.train_step(state, b, steps=1, warm=True)
    # warm phase: depth params frozen, no acc reg
    assert float(logs["acc_reg"]) == 0.0
    for a, b_ in zip(jax.tree.leaves(d0), jax.tree.leaves(state.params_depth)):
        np.testing.assert_array_equal(a, np.asarray(b_))
    changed = any(
        not np.allclose(a, np.asarray(b_))
        for a, b_ in zip(jax.tree.leaves(s0), jax.tree.leaves(state.params_sf))
    )
    assert changed

    # after warm-up both move and the regularizer is active
    state2, logs2 = step.train_step(state, b, steps=1, warm=False)
    assert float(logs2["acc_reg"]) > 0.0
    moved = any(
        not np.array_equal(a, np.asarray(b_))
        for a, b_ in zip(jax.tree.leaves(d0), jax.tree.leaves(state2.params_depth))
    )
    assert moved


def test_vali_step(track_dir):
    ds = get_dataset("davis_sequence")(make_opt(track_dir), mode="vali")
    step = SceneFlowMotionFieldStep(small_cfg())
    b = device_batch(ds[0])
    state = step.init_state(jax.random.PRNGKey(0), b["img"])
    pred, logs = step.vali_step(state, b)
    assert pred["depth"].shape == b["img"].shape[:3]
    assert np.isfinite(float(logs["loss"]))


def test_predict_output_shapes(track_dir):
    """Inference-path outputs must match the reference's test dump schema
    (reference: models/scene_flow_motion_field.py:266-275) — sf_1_2 is a
    single [B, H, W, 3] field, NOT the (sf_acc, first_sf) tuple that the
    multi-step integrator returns internally (round-1 regression)."""
    ds = get_dataset("davis_sequence")(make_opt(track_dir), mode="vali")
    step = SceneFlowMotionFieldStep(small_cfg())
    b = device_batch(ds[0])
    state = step.init_state(jax.random.PRNGKey(0), b["img"])
    pred = step.predict(state, b)
    bsz, h, w = b["img"].shape[:3]
    assert isinstance(pred["sf_1_2"], jax.Array)
    assert pred["sf_1_2"].shape == (bsz, h, w, 3)
    assert pred["depth"].shape == (bsz, h, w)
    # vali path shares predict_impl; npz serialization must round-trip
    pred_v, _ = step.vali_step(state, b)
    assert np.asarray(pred_v["sf_1_2"]).shape == (bsz, h, w, 3)


def test_gap_buckets_share_no_recompile_within_gap(track_dir):
    """Each (gap, warm) pair compiles once; repeated calls reuse the cache."""
    ds = get_dataset("davis_sequence")(make_opt(track_dir), mode="train")
    step = SceneFlowMotionFieldStep(small_cfg())
    b = device_batch(ds[0])
    state = step.init_state(jax.random.PRNGKey(0), b["img_1"])
    f = step.train_step
    before = f._cache_size() if hasattr(f, "_cache_size") else None
    state, _ = f(state, b, steps=1, warm=False)
    state, _ = f(state, b, steps=1, warm=False)
    state, _ = f(state, b, steps=2, warm=False)
    if before is not None:
        assert f._cache_size() - before == 2


def test_grad_stats_logging(track_dir):
    """log_grad_stats: per-net grad norms/max-abs ride the step logs
    (functional analog of the reference's grad-hook debug utilities,
    reference models/netinterface.py:362-411) and match the raw
    grad_snapshot pytrees."""
    import optax

    ds = get_dataset("davis_sequence")(make_opt(track_dir), mode="train")
    step = SceneFlowMotionFieldStep(small_cfg(log_grad_stats=True))
    batch = device_batch(ds[0])
    batch.pop("steps", None)
    batch.pop("warp_window", None)
    state = step.init_state(jax.random.PRNGKey(0), batch["img_1"])

    state2, logs = step.train_step(state, batch, steps=1, warm=False)
    for k in ("grad_norm_depth", "grad_norm_sf",
              "grad_max_depth", "grad_max_sf"):
        assert k in logs
    assert float(logs["grad_norm_sf"]) > 0
    assert float(logs["grad_norm_depth"]) > 0
    # warm phase: depth net frozen -> zero depth grads, live sf grads
    state3, logs_w = step.train_step(state2, batch, steps=1, warm=True)
    assert float(logs_w["grad_norm_depth"]) == 0.0
    assert float(logs_w["grad_norm_sf"]) > 0

    # the logged norm equals the norm of the raw snapshot pytree
    state4 = step.init_state(jax.random.PRNGKey(0), batch["img_1"])
    grads = step.grad_snapshot(state4, batch, steps=1, warm=False)
    _, logs4 = step.train_step(state4, batch, steps=1, warm=False)
    np.testing.assert_allclose(
        float(logs4["grad_norm_sf"]),
        float(optax.global_norm(grads["net_sceneflow"])), rtol=1e-5)
    np.testing.assert_allclose(
        float(logs4["grad_norm_depth"]),
        float(optax.global_norm(grads["net_depth"])), rtol=1e-5)


def test_acc_reg_reuses_second_euler_eval(track_dir):
    """At steps >= 2 the acceleration regularizer's second field query
    sf(p1 + sf0, t1 + dt) is the exact expression of Euler eval 2
    (reference recomputes it, models/scene_flow_motion_field.py:329-341);
    the step reuses it, saving one full MLP fwd+bwd per step. Pin that the
    reuse is exact: loss, logs and grads match a forced recompute."""
    ds = get_dataset("davis_sequence")(make_opt(track_dir), mode="train")
    step = SceneFlowMotionFieldStep(small_cfg())
    batches = [b for b in (ds[i] for i in range(len(ds)))
               if int(np.asarray(b["steps"]).reshape(-1)[0]) == 2]
    batch = device_batch(batches[0])
    batch.pop("steps", None)
    batch.pop("warp_window", None)
    state = step.init_state(jax.random.PRNGKey(0), batch["img_1"])

    def loss_with(reuse):
        def loss_fn(pd, ps):
            orig = step._sf_multi_step
            if not reuse:
                # drop the cached second eval -> _acc_reg recomputes sf1
                def no2(*a, **kw):
                    acc, sf0, _ = orig(*a, **kw)
                    return acc, sf0, None
                step._sf_multi_step = no2
            try:
                return step.loss_and_logs(pd, ps, state.stats_depth, batch,
                                          steps=2, warm=False)
            finally:
                step._sf_multi_step = orig
        return jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            state.params_depth, state.params_sf)

    (l_re, logs_re), g_re = loss_with(True)
    (l_rc, logs_rc), g_rc = loss_with(False)
    assert float(logs_re["acc_reg"]) > 0  # the regularizer is live
    np.testing.assert_array_equal(np.asarray(l_re), np.asarray(l_rc))
    np.testing.assert_array_equal(np.asarray(logs_re["acc_reg"]),
                                  np.asarray(logs_rc["acc_reg"]))
    for a, b in zip(jax.tree.leaves(g_re), jax.tree.leaves(g_rc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
