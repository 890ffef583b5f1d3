"""Multi-video mesh sharding tests on the 8-device virtual CPU mesh."""

import argparse

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dynamic_video_depth_tpu.data import get_dataset
from dynamic_video_depth_tpu.data.synthetic import make_track
from dynamic_video_depth_tpu.parallel import MultiVideoOptimizer, make_mesh
from dynamic_video_depth_tpu.parallel.multi_video import tree_stack, tree_index
from dynamic_video_depth_tpu.train import LossConfig, TrainStepConfig
from dynamic_video_depth_tpu.train.step import SceneFlowMotionFieldStep


def small_cfg():
    return TrainStepConfig(
        lr=1e-4, scene_lr_mul=10.0, depth_net="tiny",
        net_width=16, n_layers=1, n_freq_xyz=2, n_freq_t=1,
        loss=LossConfig(flow_mul=1.0, disp_mul=1.0, acc_mul=1.0,
                        use_disp=True, midas=False),
        compute_dtype="float32",
    )


@pytest.fixture(scope="module")
def tracks(tmp_path_factory):
    root = tmp_path_factory.mktemp("multivid")
    for i, name in enumerate(["vid_a", "vid_b", "vid_c", "vid_d"]):
        make_track(str(root), track=name, n_frames=6, h=16, w=24,
                   gaps=(1,), seed=i)
    return str(root)


def load_video_batches(root, names):
    batches = []
    for name in names:
        opt = argparse.Namespace(
            track_id=name, gaps="1", repeat=1, subsample=False, cache=False,
            overfit=False, capat=1, select=False, data_root=root,
        )
        ds = get_dataset("davis_sequence")(opt, mode="train")
        batches.append({k: jnp.asarray(v) for k, v in ds[0].items()
                        if k != "pair_path"})
    return batches


def test_multi_video_matches_single(tracks):
    """A 4-video sharded fleet step must produce the same result as 4
    independent single-video steps."""
    assert len(jax.devices()) >= 4
    names = ["vid_a", "vid_b", "vid_c", "vid_d"]
    batches = load_video_batches(tracks, names)
    step = SceneFlowMotionFieldStep(small_cfg())

    # independent single-video references
    singles = []
    for i, b in enumerate(batches):
        st = step.init_state(jax.random.PRNGKey(100 + i), b["img_1"])
        st2, logs = step.train_step(st, b, steps=1, warm=False)
        singles.append((st2, logs))

    # fleet
    mesh = make_mesh([("video", 4)])
    mv = MultiVideoOptimizer(step, mesh)
    states = tree_stack([
        step.init_state(jax.random.PRNGKey(100 + i), b["img_1"])
        for i, b in enumerate(batches)
    ])
    states = jax.device_put(states, mv.state_sharding())
    stacked_batches = tree_stack(batches)
    new_states, logs = mv.train_step(states, stacked_batches, steps=1, warm=False)

    for i in range(4):
        ref_state, ref_logs = singles[i]
        np.testing.assert_allclose(
            float(tree_index(logs, i)["loss"]), float(ref_logs["loss"]),
            rtol=1e-5,
        )
        for a, b_ in zip(jax.tree.leaves(ref_state.params_sf),
                         jax.tree.leaves(tree_index(new_states, i).params_sf)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-6)


def test_data_parallel_matches_single_device(tracks):
    """Same-video DP over a 4-way data mesh must equal the unsharded step."""
    from dynamic_video_depth_tpu.parallel import DataParallelStep

    batches = load_video_batches(tracks, ["vid_a"])
    # tile the pair batch to B=4 so the data axis has something to shard
    batch = jax.tree.map(
        lambda x: jnp.concatenate([x] * 4, 0)
        if getattr(x, "ndim", 0) >= 1 and x.shape and x.shape[0] == 1 else x,
        batches[0],
    )
    step = SceneFlowMotionFieldStep(small_cfg())
    state0 = step.init_state(jax.random.PRNGKey(7), batch["img_1"])

    ref_state, ref_logs = step.train_step(
        jax.tree.map(jnp.copy, state0), batch, steps=1, warm=False
    )

    mesh = make_mesh([("data", 4)])
    dp = DataParallelStep(step, mesh)
    st, bt = dp.place(jax.tree.map(jnp.copy, state0), batch)
    dp_state, dp_logs = dp.train_step(st, bt, steps=1, warm=False)

    np.testing.assert_allclose(
        float(dp_logs["loss"]), float(ref_logs["loss"]), rtol=1e-5
    )
    for a, b_ in zip(jax.tree.leaves(ref_state.params_sf),
                     jax.tree.leaves(dp_state.params_sf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)
