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


def test_fleet_batch_cache_matches_host_stack(tracks):
    """FleetBatchCache assembles the same [V, ...] fleet batch as the naive
    host-side stack + device_put, with shards resident on each video's
    device, and the fleet step consumes it identically."""
    from dynamic_video_depth_tpu.data.prefetch import FleetBatchCache

    names = ["vid_a", "vid_b", "vid_c", "vid_d"]
    opts = [argparse.Namespace(
        track_id=n, gaps="1", repeat=1, subsample=False, cache=False,
        overfit=False, capat=1, select=False, data_root=tracks,
    ) for n in names]
    datasets = [get_dataset("davis_sequence")(o, mode="train") for o in opts]
    mesh = make_mesh([("video", 4)])
    cache = FleetBatchCache(datasets, mesh)

    stacked = cache.stacked([0, 0, 0, 0])
    # second call must hit the device cache (no new bytes)
    bytes_before = list(cache._bytes)
    stacked2 = cache.stacked([0, 0, 0, 0])
    assert cache._bytes == bytes_before

    ref = tree_stack([
        {k: jnp.asarray(v) for k, v in ds[0].items()
         if k not in ("pair_path", "steps", "warp_window")}
        for ds in datasets
    ])
    assert set(stacked) == set(ref)
    for k in ref:
        assert stacked[k].shape == ref[k].shape, k
        np.testing.assert_array_equal(np.asarray(stacked[k]),
                                      np.asarray(ref[k]))
        # sharded over the video axis, one shard per device
        assert len(stacked[k].sharding.device_set) == 4, k

    # the fleet step accepts the cached batch and matches the host-stacked one
    step = SceneFlowMotionFieldStep(small_cfg())
    mv = MultiVideoOptimizer(step, mesh)
    states = tree_stack([
        step.init_state(jax.random.PRNGKey(i), np.asarray(ref["img_1"][i]))
        for i in range(4)
    ])
    s_a = jax.device_put(states, mv.state_sharding())
    _, logs_a = mv.train_step(s_a, stacked2, steps=1, warm=False)
    s_b = jax.device_put(states, mv.state_sharding())
    _, logs_b = mv.train_step(s_b, ref, steps=1, warm=False)
    np.testing.assert_allclose(np.asarray(logs_a["loss"]),
                               np.asarray(logs_b["loss"]), rtol=1e-6)


def test_data_parallel_place_rejects_indivisible(tracks):
    """A batch leaf with a leading dim not divisible by the data axis must
    raise, not silently train on replicated data."""
    from dynamic_video_depth_tpu.parallel import DataParallelStep

    batch = load_video_batches(tracks, ["vid_a"])[0]
    bad = dict(batch)
    bad["img_1"] = jnp.concatenate([batch["img_1"]] * 3, 0)  # B=3 on 4-way
    step = SceneFlowMotionFieldStep(small_cfg())
    state = step.init_state(jax.random.PRNGKey(7), batch["img_1"])
    dp = DataParallelStep(step, make_mesh([("data", 4)]))
    with pytest.raises(ValueError, match="not divisible"):
        dp.place(state, bad)


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


def test_fleet_cache_steady_state_no_host_transfers(tracks, monkeypatch):
    """After the first epoch touches every pair, fleet batch assembly must
    be zero-copy: no jax.device_put of host data at all (the VERDICT-r1
    fleet loop re-staged V full batches from host every step)."""
    from dynamic_video_depth_tpu.data import prefetch as prefetch_mod
    from dynamic_video_depth_tpu.data.prefetch import FleetBatchCache

    names = ["vid_a", "vid_b"]
    opts = [argparse.Namespace(
        track_id=n, gaps="1", repeat=1, subsample=False, cache=False,
        overfit=False, capat=1, select=False, data_root=tracks,
    ) for n in names]
    datasets = [get_dataset("davis_sequence")(o, mode="train") for o in opts]
    mesh = make_mesh([("video", 2)])
    cache = FleetBatchCache(datasets, mesh)
    for i in range(len(datasets[0])):
        cache.stacked([i, i])  # warm every pair into device memory

    calls = []
    real_put = jax.device_put
    monkeypatch.setattr(jax, "device_put", lambda *a, **k: (
        calls.append(a), real_put(*a, **k))[1])
    for i in range(len(datasets[0])):
        out = cache.stacked([i, i])
    assert not calls, f"steady-state fleet step staged {len(calls)} host transfers"
    assert out["img_1"].shape[0] == 2


def test_multi_video_data_parallel_2d_matches_single(tracks):
    """4 videos x 2-way same-video DP on a (video=4, data=2) 2D mesh must
    equal 4 independent full-batch single-device steps exactly (the data
    axis is left to XLA sharding propagation inside the manual-video
    shard_map, so the globally-normalized masked losses stay exact)."""
    from dynamic_video_depth_tpu.parallel import MultiVideoDataParallel

    assert len(jax.devices()) >= 8
    names = ["vid_a", "vid_b", "vid_c", "vid_d"]
    batches = load_video_batches(tracks, names)
    # tile every video's pair batch to B=2 so the data axis has work
    batches = [
        jax.tree.map(
            lambda x: jnp.concatenate([x] * 2, 0)
            if getattr(x, "ndim", 0) >= 1 and x.shape and x.shape[0] == 1
            else x, b)
        for b in batches
    ]
    step = SceneFlowMotionFieldStep(small_cfg())

    singles = []
    for i, b in enumerate(batches):
        st = step.init_state(jax.random.PRNGKey(200 + i), b["img_1"])
        st2, logs = step.train_step(st, b, steps=1, warm=False)
        singles.append((st2, logs))

    mesh = make_mesh([("video", 4), ("data", 2)])
    mv2d = MultiVideoDataParallel(step, mesh)
    states = tree_stack([
        step.init_state(jax.random.PRNGKey(200 + i), b["img_1"])
        for i, b in enumerate(batches)
    ])
    stacked = tree_stack(batches)
    states, stacked = mv2d.place(states, stacked)
    new_states, logs = mv2d.train_step(states, stacked, steps=1, warm=False)

    for i in range(4):
        ref_state, ref_logs = singles[i]
        np.testing.assert_allclose(
            float(np.asarray(logs["loss"])[i]), float(ref_logs["loss"]),
            rtol=1e-5,
        )
        for a, b_ in zip(jax.tree.leaves(ref_state.params_sf),
                         jax.tree.leaves(tree_index(new_states, i).params_sf)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-6)
        for a, b_ in zip(jax.tree.leaves(ref_state.params_depth),
                         jax.tree.leaves(tree_index(new_states, i).params_depth)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-6)


def test_multi_video_data_parallel_rejects_indivisible(tracks):
    from dynamic_video_depth_tpu.parallel import MultiVideoDataParallel

    names = ["vid_a", "vid_b", "vid_c", "vid_d"]
    batches = load_video_batches(tracks, names)  # B=1, data axis 2
    step = SceneFlowMotionFieldStep(small_cfg())
    mesh = make_mesh([("video", 4), ("data", 2)])
    mv2d = MultiVideoDataParallel(step, mesh)
    states = tree_stack([
        step.init_state(jax.random.PRNGKey(i), b["img_1"])
        for i, b in enumerate(batches)
    ])
    with pytest.raises(ValueError, match="not divisible"):
        mv2d.place(states, tree_stack(batches))


def test_fleet_scan_matches_sequential_steps(tracks):
    """K fleet steps in one dispatch (train_step_scan over a device-cached
    [K, V, ...] chunk) must equal K sequential fleet steps exactly."""
    from dynamic_video_depth_tpu.data.prefetch import FleetBatchCache

    names = ["vid_a", "vid_b", "vid_c", "vid_d"]
    opts = [argparse.Namespace(
        track_id=n, gaps="1", repeat=1, subsample=False, cache=False,
        overfit=False, capat=1, select=False, data_root=tracks,
    ) for n in names]
    datasets = [get_dataset("davis_sequence")(o, mode="train") for o in opts]
    mesh = make_mesh([("video", 4)])
    cache = FleetBatchCache(datasets, mesh)
    step = SceneFlowMotionFieldStep(small_cfg())
    mv = MultiVideoOptimizer(step, mesh)

    idx_lists = [[0, 1, 0, 2], [1, 0, 2, 0], [2, 2, 1, 1]]
    states0 = tree_stack([
        step.init_state(jax.random.PRNGKey(300 + i),
                        np.asarray(datasets[i][0]["img_1"]))
        for i in range(4)
    ])

    # sequential reference
    s_ref = jax.device_put(jax.tree.map(jnp.copy, states0),
                           mv.state_sharding())
    seq_losses = []
    for idxs in idx_lists:
        s_ref, logs = mv.train_step(s_ref, cache.stacked(idxs), steps=1,
                                    warm=False)
        seq_losses.append(np.asarray(logs["loss"]))

    # one scanned dispatch
    s_scan = jax.device_put(jax.tree.map(jnp.copy, states0),
                            mv.state_sharding())
    chunk = cache.stacked_chunk(idx_lists)
    assert chunk["img_1"].shape[:2] == (3, 4)
    s_scan, packed = mv.train_step_scan(s_scan, chunk, steps=1, warm=False)
    assert packed.shape[:2] == (4, 3)  # [V, K, n_metrics]

    # per-step losses recoverable from the packed matrix
    _, logs_probe = step.train_step(
        step.init_state(jax.random.PRNGKey(0),
                        np.asarray(datasets[0][0]["img_1"])),
        {k: jnp.asarray(v) for k, v in datasets[0][0].items()
         if k not in ("pair_path", "steps", "warp_window")}, steps=1, warm=False)
    keys = sorted(k for k in logs_probe if k != "_packed")
    li = keys.index("loss")
    for ki in range(3):
        np.testing.assert_allclose(np.asarray(packed)[:, ki, li],
                                   seq_losses[ki], rtol=1e-5)

    for a, b_ in zip(jax.tree.leaves(s_ref.params_sf),
                     jax.tree.leaves(s_scan.params_sf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-7)


def test_fleet_with_pallas_kernels_matches_xla_fleet(rng):
    """The multi-video fleet on real TPU runs the fused Pallas kernels
    INSIDE shard_map — pin that composition: a fleet step with all three
    kernels on (interpret mode) matches the all-XLA fleet step exactly."""
    from jax.experimental.pallas import tpu as pltpu

    import __graft_entry__ as g
    from dynamic_video_depth_tpu.parallel import MultiVideoOptimizer, make_mesh
    from dynamic_video_depth_tpu.parallel.multi_video import tree_stack
    from dynamic_video_depth_tpu.train import LossConfig, TrainStepConfig
    from dynamic_video_depth_tpu.train.step import SceneFlowMotionFieldStep

    def cfg(pallas):
        mode = "on" if pallas else "off"
        return TrainStepConfig(
            lr=1e-4, scene_lr_mul=10.0, depth_net="tiny", net_width=32,
            n_layers=2, n_freq_xyz=4, n_freq_t=2,
            loss=LossConfig(flow_mul=1.0, disp_mul=1.0, acc_mul=1.0,
                            use_disp=True, midas=False),
            compute_dtype="float32", use_pallas_sf=mode,
            use_pallas_warp=mode, use_pallas_loss=mode,
        )

    n_videos = 4
    mesh = make_mesh([("video", n_videos)], devices=jax.devices()[:n_videos])
    batches = tree_stack([g._synthetic_batch(1, 16, 24, rng)
                          for _ in range(n_videos)])

    step_ref = SceneFlowMotionFieldStep(cfg(False))
    states0 = tree_stack([
        step_ref.init_state(jax.random.PRNGKey(i), jnp.zeros((1, 16, 24, 3)))
        for i in range(n_videos)
    ])
    fleet_ref = MultiVideoOptimizer(step_ref, mesh)
    sr = jax.device_put(jax.tree.map(jnp.copy, states0),
                        fleet_ref.state_sharding())
    br = jax.device_put(batches, fleet_ref.state_sharding())
    ref_states, ref_logs = fleet_ref.train_step(sr, br, steps=2, warm=False)
    ref_loss = np.asarray(ref_logs["loss"])

    step_pl = SceneFlowMotionFieldStep(cfg(True))
    fleet_pl = MultiVideoOptimizer(step_pl, mesh)
    sp = jax.device_put(jax.tree.map(jnp.copy, states0),
                        fleet_pl.state_sharding())
    bp = jax.device_put(batches, fleet_pl.state_sharding())
    with pltpu.force_tpu_interpret_mode():
        pl_states, pl_logs = fleet_pl.train_step(sp, bp, steps=2, warm=False)
        pl_loss = np.asarray(pl_logs["loss"])
        pl_params = jax.device_get(pl_states.params_sf)

    np.testing.assert_allclose(pl_loss, ref_loss, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(ref_states.params_sf)),
                    jax.tree.leaves(pl_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_hourglass_fleet_matches_single(rng):
    """The PRODUCTION depth net on the fleet mesh (VERDICT r4 item 4): a
    2-video hourglass fleet — s2d densification forced active at this frame
    size, merged reducers on, batch 2 per video — must match independent
    single-video steps. Conv-heavy graphs have sharding/layout failure
    modes a tiny net can't surface; this is the CPU twin of dryrun
    strategy 4 (__graft_entry__.py)."""
    import dataclasses

    import __graft_entry__ as g

    cfg = dataclasses.replace(
        small_cfg(), depth_net="hourglass", midas=False,
        s2d_min_pixels=256, merge_reducers=True,
    )
    step = SceneFlowMotionFieldStep(cfg)
    n_videos, h, w = 2, 32, 48  # 32*48 >= 256: full-res branches take s2d
    batches = [g._synthetic_batch(2, h, w, rng) for _ in range(n_videos)]

    singles = []
    for i, b in enumerate(batches):
        st = step.init_state(jax.random.PRNGKey(200 + i), b["img_1"])
        st2, logs = step.train_step(st, b, steps=2, warm=False)
        singles.append((st2, float(logs["loss"])))

    mesh = make_mesh([("video", n_videos)],
                     devices=jax.devices()[:n_videos])
    mv = MultiVideoOptimizer(step, mesh)
    states = tree_stack([
        step.init_state(jax.random.PRNGKey(200 + i), batches[i]["img_1"])
        for i in range(n_videos)
    ])
    states = jax.device_put(states, mv.state_sharding())
    stacked = tree_stack(batches)
    stacked = jax.device_put(stacked, mv.state_sharding())
    new_states, logs = mv.train_step(states, stacked, steps=2, warm=False)

    for i in range(n_videos):
        ref_state, ref_loss = singles[i]
        np.testing.assert_allclose(float(tree_index(logs, i)["loss"]),
                                   ref_loss, rtol=1e-5)
        for a, b_ in zip(
                jax.tree.leaves(ref_state.params_depth),
                jax.tree.leaves(tree_index(new_states, i).params_depth)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-6)
