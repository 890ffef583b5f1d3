"""Preprocessing pipeline integration test: raw frames -> stage 1 (depth +
calibration) -> stage 2 outputs (flows; exact geometric flows stand in for
RAFT) -> stage 3 (pair packing) -> training loader -> one train step."""

import argparse
from os.path import join

import numpy as np
import jax
import jax.numpy as jnp

from dynamic_video_depth_tpu.preprocess import frames as frames_mod
from dynamic_video_depth_tpu.preprocess import flows as flows_mod
from dynamic_video_depth_tpu.preprocess import pairs as pairs_mod


def make_raw_frames(rng, n=5, h=40, w=60):
    """Raw frames with graphics-convention w2c poses and dense mvs depth."""
    frames = []
    flip = np.diag([1.0, -1.0, -1.0, 1.0])
    for i in range(n):
        img = rng.rand(h, w, 3).astype(np.float32)
        c2w = np.eye(4)
        c2w[:3, 3] = [0.01 * i, 0.0, -0.005 * i]
        # invert the stage-1 convention: pose_w2c = inv(flip @ ... ) story
        pose_w2c = np.linalg.inv(flip @ np.linalg.inv(c2w) @ flip) if False else (
            flip @ np.linalg.inv(c2w)
        )
        f = 0.8 * w
        K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
        depth_mvs = (2.0 + rng.rand(h, w)).astype(np.float32)
        frames.append({
            "img": img, "pose_w2c": pose_w2c.astype(np.float32),
            "intrinsics": K, "depth_mvs": depth_mvs,
        })
    return frames


def tiny_depth_fn(imgs):
    """Stage-1 depth stand-in: smooth positive function of the image."""
    return 2.0 + np.asarray(imgs).mean(-1)


def test_stage1_outputs(tmp_path, rng):
    frames = make_raw_frames(rng)
    out = str(tmp_path / "frames_midas" / "dog")
    s = frames_mod.process_track(frames, out, tiny_depth_fn,
                                 max_width=48, multiple_of=16)
    assert np.isfinite(s) and s > 0
    data = dict(np.load(join(out, "frame_00000.npz")))
    h, w = data["img"].shape[:2]
    assert w <= 48 and h % 16 == 0 and w % 16 == 0
    assert data["pose_c2w"].shape == (4, 4)
    assert data["depth_pred"].shape == (h, w)
    # c2w recovered: R orthonormal
    R = data["pose_c2w"][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_flow_utils(rng):
    flow = (rng.randn(12, 16, 2) * 2).astype(np.float32)
    resized = flows_mod.resize_flow(flow, (24, 32))
    assert resized.shape == (24, 32, 2)
    # doubling resolution doubles magnitudes (reference :44-54)
    assert abs(resized[..., 0].mean() / flow[..., 0].mean() - 2) < 0.2

    m = flows_mod.oob_mask(np.full((8, 8, 2), 100, np.float32))
    assert m.min() == 1.0
    m = flows_mod.oob_mask(np.zeros((8, 8, 2), np.float32))
    assert m.max() == 0.0

    # zero flows -> zero consistency error -> no occlusion
    m1, m2 = flows_mod.occlusion_masks(
        np.zeros((8, 8, 2), np.float32), np.zeros((8, 8, 2), np.float32)
    )
    assert m1.max() == 0 and m2.max() == 0


def test_full_pipeline_to_train_step(tmp_path, rng):
    root = str(tmp_path)
    frames = make_raw_frames(rng, n=6, h=32, w=48)
    frame_dir = join(root, "frames_midas", "dog")
    frames_mod.process_track(frames, frame_dir, tiny_depth_fn,
                             max_width=48, multiple_of=16)

    # stage 2 stand-in: exact depth-induced flows from the stage-1 artifacts
    import os

    from dynamic_video_depth_tpu.ops import Camera, flow_by_depth

    flow_dir = join(root, "flow_pairs", "dog")
    os.makedirs(flow_dir, exist_ok=True)
    fr = [dict(np.load(join(frame_dir, "frame_%05d.npz" % i)))
          for i in range(6)]

    def cam_of(d):
        K = d["intrinsics"][None]
        return Camera(
            jnp.asarray(d["pose_c2w"][None, :3, :3]),
            jnp.asarray(d["pose_c2w"][None, :3, 3]),
            jnp.asarray(K), jnp.asarray(np.linalg.inv(K[0])[None]),
        )

    for g in (1, 2):
        for i in range(6 - g):
            j = i + g
            d1 = jnp.asarray(fr[i]["depth_pred"][None])
            d2 = jnp.asarray(fr[j]["depth_pred"][None])
            zero = jnp.zeros(d1.shape + (2,), jnp.float32)
            f12 = np.asarray(flow_by_depth(d1, d2, zero, cam_of(fr[i]),
                                           cam_of(fr[j]))["dflow_1_2"][0])
            f21 = np.asarray(flow_by_depth(d2, d1, zero, cam_of(fr[j]),
                                           cam_of(fr[i]))["dflow_1_2"][0])
            np.savez(join(flow_dir, f"flowpair_{i:05d}_{j:05d}.npz"),
                     flow_1_2=f12, flow_2_1=f21,
                     mask_1=np.zeros(f12.shape[:2], np.uint8),
                     mask_2=np.zeros(f12.shape[:2], np.uint8))

    seq_dir = join(root, "sequences_select_pairs_midas", "dog", "001")
    pairs_mod.pack_track(frame_dir, flow_dir, seq_dir, gaps=(1, 2))

    # the packed artifacts feed the standard loader + train step
    from dynamic_video_depth_tpu.data import get_dataset
    from dynamic_video_depth_tpu.train import LossConfig, TrainStepConfig
    from dynamic_video_depth_tpu.train.step import SceneFlowMotionFieldStep

    opt = argparse.Namespace(track_id="dog", gaps="1,2", repeat=1,
                             subsample=False, cache=False, overfit=False,
                             capat=1, select=False, data_root=root)
    ds = get_dataset("davis_sequence")(opt, mode="train")
    # reference packs n - batch_size - gap pairs per gap
    # (generate_sequence_midas.py:186): 6-1-1 + 6-1-2 = 7
    assert len(ds) == (4 + 3)
    b = {k: jnp.asarray(v) for k, v in ds[0].items() if k != "pair_path"}
    step = SceneFlowMotionFieldStep(TrainStepConfig(
        lr=1e-4, scene_lr_mul=10.0, depth_net="tiny", net_width=16,
        n_layers=1, n_freq_xyz=2, n_freq_t=1,
        loss=LossConfig(flow_mul=1.0, disp_mul=1.0, acc_mul=1.0,
                        use_disp=True, midas=False),
        compute_dtype="float32",
    ))
    state = step.init_state(jax.random.PRNGKey(0), b["img_1"])
    state, logs = step.train_step(state, b, steps=1, warm=False)
    assert np.isfinite(float(logs["loss"]))

    # vali loader over the same stage-1 artifacts
    ds_v = get_dataset("davis_sequence")(opt, mode="vali")
    bv = {k: jnp.asarray(v) for k, v in ds_v[0].items() if k != "pair_path"}
    pred, vlogs = step.vali_step(state, bv)
    assert np.isfinite(float(vlogs["loss"]))


def test_shutterstock_track_by_index(tmp_path, rng):
    """shutterstock dataset selects tracks by sorted index
    (reference: datasets/shutterstock.py:40-43)."""
    from dynamic_video_depth_tpu.data.synthetic import make_track

    root = str(tmp_path)
    for name in ["alpha", "beta"]:
        make_track(root, track=name, n_frames=5, h=16, w=24, gaps=(1,))
    from dynamic_video_depth_tpu.data import get_dataset

    opt = argparse.Namespace(track_id="1", gaps="1", repeat=1,
                             subsample=False, cache=False, overfit=False,
                             capat=1, select=False, data_root=root)
    ds = get_dataset("shutterstock")(opt, mode="train")
    assert opt.track_id == "beta"
    assert len(ds) > 0 and "beta" in ds.file_list[0]


def test_stage2_sharded_matches_serial(tmp_path, rng):
    """Mesh-sharded stage-2 (RAFT batch split over the 'data' axis, one
    pair slice per device) produces the same flow-pair artifacts as the
    serial path (BASELINE config #4 at fleet scale). Random-init RAFT at a
    tiny inference resolution; weights are identical in both paths (same
    PRNGKey, same shapes)."""
    from dynamic_video_depth_tpu.data.synthetic import make_track
    from dynamic_video_depth_tpu.parallel.mesh import make_mesh

    root = str(tmp_path)
    frame_dir, _ = make_track(root, track="dog", n_frames=4, h=32, w=48,
                              gaps=(1,))

    kw = dict(gaps=(1, 2), raft_res=(64, 96), iters=2)
    out_serial = join(root, "flow_serial")
    out_sharded = join(root, "flow_sharded")
    flows_mod.process_track(frame_dir, out_serial, **kw)
    mesh = make_mesh([("data", 8)])
    flows_mod.process_track(frame_dir, out_sharded, mesh=mesh, **kw)

    import os

    names = sorted(os.listdir(out_serial))
    assert names == sorted(os.listdir(out_sharded))
    assert len(names) == 3 + 2  # gaps (1, 2) over 4 frames
    for name in names:
        a = dict(np.load(join(out_serial, name)))
        b = dict(np.load(join(out_sharded, name)))
        for k in ("flow_1_2", "flow_2_1"):
            np.testing.assert_allclose(b[k], a[k], rtol=1e-4, atol=1e-4,
                                       err_msg=f"{name}:{k}")
        for k in ("mask_1", "mask_2"):
            # thresholded masks: allow disagreement only on pixels whose
            # consistency error sits within float noise of the threshold
            assert np.abs(b[k].astype(np.int32)
                          - a[k].astype(np.int32)).mean() < 0.01
        assert int(a["frame_id_1"]) == int(b["frame_id_1"])


def test_stage1_depth_fn_sharded_matches_serial(rng):
    """make_midas_depth_fn(mesh=...) shards the frame batch over the 'data'
    axis and returns the same depths as the serial path (random-init MiDaS:
    identical PRNGKey + shapes in both paths; batch of 5 exercises the
    pad-to-axis-size path on the 8-device mesh)."""
    from dynamic_video_depth_tpu.parallel.mesh import make_mesh

    imgs = rng.rand(5, 64, 96, 3).astype(np.float32)
    serial = frames_mod.make_midas_depth_fn()(imgs)
    mesh = make_mesh([("data", 8)])
    sharded = frames_mod.make_midas_depth_fn(mesh=mesh)(imgs)
    assert sharded.shape == serial.shape == (5, 64, 96)
    # random-init MiDaS's 10000/clamp(x, 1e-2) head emits values up to 1e6,
    # amplifying batch-tiling float noise; 1e-3 relative is layout parity
    np.testing.assert_allclose(sharded, serial, rtol=1e-3, atol=1e-4)
    # a batch SMALLER than the pad (n=1, pad=7) must cycle, not crash
    one = frames_mod.make_midas_depth_fn(mesh=mesh)(imgs[:1])
    np.testing.assert_allclose(one, serial[:1], rtol=1e-3, atol=1e-4)


def test_batch_flow_fn_small_final_chunk(rng):
    """The sharded RAFT batch pad must cycle rows: a final chunk of 1 pair
    (2 direction-images) pads up to the 8-device mesh without crashing and
    returns the right flows."""
    from dynamic_video_depth_tpu.parallel.mesh import make_mesh

    mesh = make_mesh([("data", 8)])
    fn = flows_mod.make_raft_flow_batch_fn(mesh=mesh, iters=1)
    im1 = (rng.rand(1, 64, 96, 3) * 255).astype(np.float32)
    im2 = (rng.rand(1, 64, 96, 3) * 255).astype(np.float32)
    f12, f21 = fn(im1, im2)  # 2 rows -> pad 6: must cycle, not crash
    assert f12.shape == (1, 64, 96, 2) and f21.shape == (1, 64, 96, 2)
    serial = flows_mod.make_raft_flow_fn(iters=1)
    sf12, sf21 = serial(im1[0], im2[0])
    np.testing.assert_allclose(f12[0], sf12, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(f21[0], sf21, rtol=1e-4, atol=1e-4)


def test_shutterstock_h5_stage1(tmp_path, rng):
    """The shutterstock runner's h5 stage-1 path: schema-compatible h5
    frames -> calibrated reference-layout npz (true scaled MVS depth kept
    as depth_mvs, unlike DAVIS — reference: shutterstock
    generate_frame_midas.py:154-186)."""
    import sys as _sys
    from os.path import dirname

    import h5py

    _sys.path.insert(0, join(dirname(dirname(__file__)),
                             "scripts", "preprocess"))
    from run_shutterstock import process_track_h5

    raw = tmp_path / "raw"
    raw.mkdir()
    files = []
    for i in range(3):
        p = str(raw / f"frame_{i}.h5")
        with h5py.File(p, "w") as hf:
            g = hf.create_group("prediction")
            g["img"] = rng.rand(40, 64, 3).astype(np.float32)
            # mvs depth = exactly half the depth_fn output -> scale s = 2
            img = np.asarray(hf["prediction/img"])
            g["mvs_depth"] = (tiny_depth_fn(img[None])[0] / 2.0).astype(
                np.float32)
            T = np.eye(4)
            T[:3, 3] = [0.1 * i, 0, 0.05]
            g["T_1_G"] = T
            g["K"] = np.array([[50.0, 0, 32], [0, 50.0, 20], [0, 0, 1]],
                              np.float32)
        files.append(p)

    out = str(tmp_path / "frames_midas" / "track")
    s = process_track_h5(files, out, tiny_depth_fn)
    np.testing.assert_allclose(s, 2.0, rtol=1e-5)
    d = dict(np.load(join(out, "frame_00000.npz")))
    h, w = d["img"].shape[:2]
    assert h % 32 == 0 and w % 32 == 0 and max(h, w) <= 384
    # pose = inv(T with translation scaled by s)
    T = np.eye(4)
    T[:3, 3] = [0, 0, 0.05 * 2.0]
    np.testing.assert_allclose(d["pose_c2w"], np.linalg.inv(T), atol=1e-6)
    # scaled mvs stored as depth_mvs ~ depth_pred (scale calibrated)
    np.testing.assert_allclose(d["depth_mvs"], d["depth_pred"], rtol=1e-3)
    assert d["img_orig"].shape == (40, 64, 3)
