"""Multi-step-per-dispatch (lax.scan) training path."""

import argparse

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dynamic_video_depth_tpu.data import get_dataset
from dynamic_video_depth_tpu.data.synthetic import make_track
from dynamic_video_depth_tpu.runtime.loggers import ComposeLogger, LogCumulator
from dynamic_video_depth_tpu.train.loop import Trainer
from dynamic_video_depth_tpu.train.scene_flow_motion_field import Model


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    r = str(tmp_path_factory.mktemp("chunked"))
    make_track(r, track="dog", n_frames=10, h=16, w=24, gaps=(1, 2))
    return r


def make_opt(root, **kw):
    base = dict(
        track_id="dog", gaps="1,2", repeat=1, subsample=False, cache=True,
        overfit=False, capat=1, select=False, data_root=root,
        batch_size=1, no_batching=False, steps_per_dispatch=4,
        no_device_cache=False, manual_seed=0, epoch=1, epoch_batches=8,
        vali_batches=2, vali_at_start=False, warm_sf=0, profile_dir=None,
        lr=1e-4, scene_lr_mul=10.0, adam_beta1=0.5, adam_beta2=0.9,
        optim="adam", sgd_momentum=0.9, sgd_dampening=0.0, wdecay=0.0,
        midas=False, use_cnn=False, use_embedding=False, time_dependent=True,
        n_freq_xyz=2, n_freq_t=1, n_down=3, flow_mul=1.0, disp_mul=1.0,
        acc_mul=1.0, sf_mag_div=100.0, use_disp=True, use_disp_ratio=False,
        weight_steps=False, warm_reg=False, interp_steps=5,
        use_motion_seg=False, depth_net="tiny", mixed_precision_training=False,
        full_precision=True,
    )
    base.update(kw)
    return argparse.Namespace(**base)


def test_chunked_epoch_runs_and_logs(root):
    opt = make_opt(root)
    ds_t = get_dataset("davis_sequence")(opt, mode="train")
    ds_v = get_dataset("davis_sequence")(opt, mode="vali")
    m = Model(opt)
    m.init_from_sample(ds_t[0]["img_1"])
    cum = LogCumulator()
    batches_seen = []

    class Counter(ComposeLogger):
        def on_batch_end(self, batch, logs=None):
            batches_seen.append(batch)
            super().on_batch_end(batch, logs)

    logger = Counter([cum])
    Trainer(m, ds_t, ds_v, logger, opt).train(1)
    # 8 step budget at K=4 -> 2 chunks -> 8 per-step log entries
    assert len(batches_seen) == 8
    logs = cum.epoch_logs
    assert np.isfinite(logs["loss"]) and np.isfinite(logs["vali_loss"])
    assert logs["acc_reg"] > 0


def test_chunk_scan_matches_sequential_steps(root):
    """K scanned steps == K sequential train_step calls on the same data."""
    opt = make_opt(root)
    ds = get_dataset("davis_sequence")(opt, mode="train")
    m = Model(opt)
    m.init_from_sample(ds[0]["img_1"])
    state0 = jax.tree.map(jnp.copy, m.state)

    idxs = [0, 1, 2]
    batches = [
        {k: v for k, v in ds[i].items() if k not in ("pair_path", "steps")}
        for i in idxs
    ]

    # sequential
    m.state = jax.tree.map(jnp.copy, state0)
    for b in batches:
        m.train_on_batch(1, 0, dict(b), warm=False, steps=1)
    seq_state = m.state

    # scanned
    m.state = jax.tree.map(jnp.copy, state0)
    stacked = {
        k: jnp.stack([jnp.asarray(b[k]) for b in batches])
        for k in batches[0]
    }
    packed = m.train_on_chunk(1, stacked, steps=1, warm=False)
    assert np.asarray(packed).shape[0] == 3

    for a, b in zip(jax.tree.leaves(seq_state.params_sf),
                    jax.tree.leaves(m.state.params_sf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_chunk_bucket_smaller_than_k(root):
    """A gap bucket SMALLER than steps_per_dispatch must wrap cyclically
    (short videos with large gaps pack n-1-gap pairs; the old wrap logic
    indexed out of range and crashed the 40k-step protocol at startup)."""
    # 10 frames, gaps (1, 2): buckets of 8 and 7 samples; K=16 > both
    opt = make_opt(root, steps_per_dispatch=16, epoch_batches=16)
    ds_t = get_dataset("davis_sequence")(opt, mode="train")
    ds_v = get_dataset("davis_sequence")(opt, mode="vali")
    m = Model(opt)
    m.init_from_sample(ds_t[0]["img_1"])
    cum = LogCumulator()
    Trainer(m, ds_t, ds_v, ComposeLogger([cum]), opt).train(1)
    assert np.isfinite(cum.epoch_logs["loss"])


def test_chunked_dataset_takes_max_warp_window():
    """_ChunkedDataset reduces per-sample fused-warp bounds with max (the
    chunk's one static window must be exact for every stacked sample)."""
    import numpy as np

    from dynamic_video_depth_tpu.train.loop import _ChunkedDataset

    class DS:
        def __init__(self):
            self.samples = [
                {"img_1": np.zeros((1, 4, 4, 3)), "steps": 1,
                 "warp_window": w, "time_step": np.float32(0.1)}
                for w in (16, 48, 8)
            ]

        def __getitem__(self, i):
            return self.samples[i]

    ds = _ChunkedDataset(DS(), [(0, 1, 2)])
    out = ds[0]
    assert out["warp_window"] == 48
    assert out["img_1"].shape == (3, 1, 4, 4, 3)
