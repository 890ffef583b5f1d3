"""Artifact interop: datafiles written by our synthetic generator /
preprocessing must load through the REFERENCE's own dataset code, and the
resulting torch batch must match our loader's output."""

import argparse
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not available"
)
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)


@needs_reference
def test_reference_loader_reads_our_datafiles(tmp_path, rng, monkeypatch):
    from dynamic_video_depth_tpu.data.synthetic import make_track

    root = tmp_path / "datafiles" / "davis_processed"
    make_track(str(root), track="dog", n_frames=6, h=16, w=24, gaps=(1,))

    # the reference hardcodes './datafiles/davis_processed'
    monkeypatch.chdir(tmp_path)
    from datasets.davis_sequence import Dataset as RefDataset

    opt = argparse.Namespace(
        track_id="dog", gaps="1", repeat=1, subsample=False, cache=False,
        overfit=False, capat=1, select=False,
    )
    ref_ds = RefDataset(opt, mode="train", model=None)
    assert len(ref_ds) > 0
    ref_sample = ref_ds[0]
    assert ref_sample["img_1"].shape == (1, 3, 16, 24)  # permuted to BCHW
    assert ref_sample["flow_1_2"].shape == (1, 16, 24, 2)

    # our loader on the same files gives the same values (channel-last)
    from dynamic_video_depth_tpu.data import get_dataset

    opt2 = argparse.Namespace(
        track_id="dog", gaps="1", repeat=1, subsample=False, cache=False,
        overfit=False, capat=1, select=False, data_root=str(root),
    )
    ours = get_dataset("davis_sequence")(opt2, mode="train")[0]
    np.testing.assert_allclose(
        ours["img_1"], ref_sample["img_1"].numpy().transpose(0, 2, 3, 1),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        ours["flow_1_2"], ref_sample["flow_1_2"].numpy(), rtol=1e-6
    )
    np.testing.assert_allclose(
        ours["time_stamp_1"][:, 0, 0, 0],
        ref_sample["time_stamp_1"].numpy()[:, 0, 0, 0], rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(ours["time_step"]), float(ref_sample["time_step"]), rtol=1e-6
    )
    # packed pose tensors: reference keeps transposed row-vector mats; our
    # loader unpacks to plain matrices
    np.testing.assert_allclose(
        ours["R_1"],
        np.swapaxes(ref_sample["R_1"].numpy().reshape(-1, 3, 3), -1, -2),
        rtol=1e-6,
    )

    # vali mode too
    ref_vali = RefDataset(opt, mode="vali", model=None)
    rv = ref_vali[0]
    assert rv["img"].shape == (3, 16, 24)
    ours_v = get_dataset("davis_sequence")(opt2, mode="vali")[0]
    np.testing.assert_allclose(
        ours_v["img"][0], np.transpose(rv["img"], (1, 2, 0)), rtol=1e-6
    )
    np.testing.assert_allclose(ours_v["depth_mvs"][0], rv["depth_mvs"][0],
                               rtol=1e-6)


@needs_reference
def test_reference_loader_reads_our_stage3_packing(tmp_path, rng, monkeypatch):
    """Pairs packed by OUR preprocessing stage 3 load in the reference."""
    from test_preprocess import make_raw_frames, tiny_depth_fn

    from dynamic_video_depth_tpu.preprocess import frames as frames_mod
    from dynamic_video_depth_tpu.preprocess import pairs as pairs_mod

    root = tmp_path / "datafiles" / "davis_processed"
    frame_dir = str(root / "frames_midas" / "dog")
    frames = make_raw_frames(rng, n=5, h=32, w=48)
    frames_mod.process_track(frames, frame_dir, tiny_depth_fn,
                             max_width=48, multiple_of=16)
    flow_dir = str(root / "flow_pairs" / "dog")
    os.makedirs(flow_dir, exist_ok=True)
    d = dict(np.load(os.path.join(frame_dir, "frame_00000.npz")))
    h, w = d["img"].shape[:2]
    for i in range(4):
        np.savez(os.path.join(flow_dir, f"flowpair_{i:05d}_{i + 1:05d}.npz"),
                 flow_1_2=np.zeros((h, w, 2), np.float32),
                 flow_2_1=np.zeros((h, w, 2), np.float32),
                 mask_1=np.zeros((h, w), np.uint8),
                 mask_2=np.zeros((h, w), np.uint8))
    seq_dir = str(root / "sequences_select_pairs_midas" / "dog" / "001")
    pairs_mod.pack_track(frame_dir, flow_dir, seq_dir, gaps=(1,))

    monkeypatch.chdir(tmp_path)
    from datasets.davis_sequence import Dataset as RefDataset

    opt = argparse.Namespace(track_id="dog", gaps="1", repeat=1,
                             subsample=False, cache=False, overfit=False,
                             capat=1, select=False)
    ref_ds = RefDataset(opt, mode="train", model=None)
    s = ref_ds[0]
    assert s["img_1"].shape == (1, 3, h, w)
    assert s["mask_2"].shape == (1, h, w, 1, 1)
    assert float(s["mask_2"].min()) == 1.0  # no occlusions -> all valid
