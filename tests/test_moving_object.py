"""Moving-object fixture: the scene-flow field must learn the object's
motion (nonzero flow inside the moving region, ~zero outside)."""

import argparse

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dynamic_video_depth_tpu.data import get_dataset
from dynamic_video_depth_tpu.data.synthetic import make_track
from dynamic_video_depth_tpu.train import LossConfig, TrainStepConfig
from dynamic_video_depth_tpu.train.step import SceneFlowMotionFieldStep

VEL = (0.08, 0.0, 0.0)


@pytest.fixture(scope="module")
def track(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("moving"))
    make_track(root, track="dog", n_frames=10, h=32, w=48, gaps=(1,),
               moving_object=True, object_velocity=VEL, seed=4)
    return root


def test_fixture_flow_consistency(track):
    """The packed flows equal the analytic two-layer flows by construction:
    depth-induced flow from the TRUE depths + per-region advection must
    match the packed flow on non-occluded pixels."""
    opt = argparse.Namespace(track_id="dog", gaps="1", repeat=1,
                             subsample=False, cache=False, overfit=False,
                             capat=1, select=False, data_root=track)
    ds = get_dataset("davis_sequence")(opt, mode="train")
    b = ds[0]
    from dynamic_video_depth_tpu.ops import Camera, scene_flow_projection

    cam1 = Camera(jnp.asarray(b["R_1"]), jnp.asarray(b["t_1"]),
                  jnp.asarray(b["K"]), jnp.asarray(b["K_inv"]))
    cam2 = Camera(jnp.asarray(b["R_2"]), jnp.asarray(b["t_2"]),
                  jnp.asarray(b["K"]), jnp.asarray(b["K_inv"]))
    # ground-truth scene flow: vel inside the moving region
    seg = b["motion_seg_1"]  # [1, H, W, 1]
    sf_gt = seg * np.asarray(VEL, np.float32)
    out = scene_flow_projection(
        jnp.asarray(b["depth_gt_1"]), jnp.asarray(b["depth_gt_1"]),
        jnp.asarray(b["flow_1_2"]), cam1, cam2, jnp.asarray(sf_gt),
    )
    resid = np.asarray(out["dflow_1_2"]) - b["flow_1_2"]
    valid = b["mask_2"][..., None] > 0.5
    err = np.abs(resid * valid)
    assert err.max() < 0.55, err.max()  # sub-pixel on valid pixels
    # without the scene flow the moving region is badly explained
    out0 = scene_flow_projection(
        jnp.asarray(b["depth_gt_1"]), jnp.asarray(b["depth_gt_1"]),
        jnp.asarray(b["flow_1_2"]), cam1, cam2,
        jnp.zeros_like(jnp.asarray(sf_gt)),
    )
    resid0 = np.abs((np.asarray(out0["dflow_1_2"]) - b["flow_1_2"]) * valid)
    in_region = seg[..., 0] > 0.5
    assert resid0[..., 0][in_region].mean() > 1.0


def test_sceneflow_field_learns_motion(track):
    """A few hundred optimization steps must concentrate scene flow inside
    the moving region with the right sign."""
    opt = argparse.Namespace(track_id="dog", gaps="1", repeat=1,
                             subsample=False, cache=True, overfit=False,
                             capat=1, select=False, data_root=track)
    ds = get_dataset("davis_sequence")(opt, mode="train")
    step = SceneFlowMotionFieldStep(TrainStepConfig(
        lr=0.0, scene_lr_mul=1.0, depth_net="tiny", net_width=32,
        n_layers=2, n_freq_xyz=4, n_freq_t=2,
        loss=LossConfig(flow_mul=1.0, disp_mul=1.0, acc_mul=0.01,
                        use_disp=True, midas=False, sf_mag_div=100.0),
        compute_dtype="float32",
    ))
    # freeze depth entirely (lr 0) and feed TRUE depth via a stand-in net?
    # simpler: optimize only the sf field against the exact flows with the
    # tiny depth net's (wrong) depths replaced by the packed true depths.
    b0 = {k: jnp.asarray(v) for k, v in ds[0].items() if k not in ("pair_path", "steps")}
    state = step.init_state(jax.random.PRNGKey(0), b0["img_1"])

    # bypass the depth net: monkeypatch _apply_depth to return true depth
    true_depths = {}
    for i in range(len(ds)):
        s = ds[i]
        true_depths[i] = np.asarray(s["depth_gt_1"])

    # train with batches whose imgs are ignored: swap depth net output by
    # overriding the apply fn
    orig_apply = step._apply_depth

    def apply_true(params, stats, img):
        # both frames share static background depth; frame depth equals the
        # packed depth of its own frame. Use the batch closure below.
        return apply_true.depths

    step._apply_depth = apply_true

    sf_lr = 1e-2
    import optax

    step.tx_sf = optax.adam(sf_lr, b1=0.5, b2=0.9)
    state = state.replace(opt_sf=step.tx_sf.init(state.params_sf))

    # overfit the first pair: the field at t=0 must converge to the
    # object's velocity inside the region
    for it in range(800):
        i = 0
        s = ds[i]
        b = {k: jnp.asarray(v) for k, v in s.items() if k not in ("pair_path", "steps")}
        d1 = jnp.asarray(s["depth_gt_1"])
        # frame-2 true depth: load from the next sample's frame-1 depth when
        # available; fall back to d1 (static background dominates)
        j = i + 1
        d2 = jnp.asarray(true_depths.get(j, np.asarray(s["depth_gt_1"])))
        apply_true.depths = jnp.concatenate([d1, d2], axis=0)
        state, logs = step.train_step(state, b, steps=1, warm=False)
    step._apply_depth = orig_apply

    # evaluate the learned field on frame 0
    s = ds[0]
    seg = s["motion_seg_1"][0, ..., 0] > 0.5
    from dynamic_video_depth_tpu.ops import Camera, unproject

    cam1 = Camera(jnp.asarray(s["R_1"]), jnp.asarray(s["t_1"]),
                  jnp.asarray(s["K"]), jnp.asarray(s["K_inv"]))
    pts = unproject(jnp.asarray(s["depth_gt_1"]), cam1)
    sf = np.asarray(step._apply_sf(
        state.params_sf, pts, jnp.asarray(s["time_stamp_1"])
    ))[0]

    inside_x = sf[seg][:, 0]
    outside_x = np.abs(sf[~seg][:, 0])
    assert inside_x.mean() > 0.02, inside_x.mean()  # toward +x (vel=0.08)
    assert inside_x.mean() > 3 * outside_x.mean(), (
        inside_x.mean(), outside_x.mean()
    )
