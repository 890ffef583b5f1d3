"""End-to-end CLI regression: train.py (fresh + resume) and test.py driven
as real subprocesses on a synthetic fixture, asserting the artifact set and
the reference test-dump schema (the round-1 sf_1_2 tuple bug shipped
because nothing exercised test.py's npz output in the suite)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, cwd):
    env = dict(os.environ)
    env["DVD_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                          text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    return proc.stdout + proc.stderr


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    from dynamic_video_depth_tpu.data.synthetic import make_track

    make_track(str(root / "datafiles" / "davis_processed"), track="dog",
               n_frames=8, h=32, w=48, gaps=(1, 2))
    return root


TRAIN_ARGS = [
    "--net", "scene_flow_motion_field", "--dataset", "davis_sequence",
    "--track_id", "dog", "--epoch_batches", "4", "--vali_batches", "2",
    "--batch_size", "1", "--lr", "1e-4", "--scene_lr_mul", "10",
    "--warm_sf", "1", "--time_dependent", "--gaps", "1,2", "--use_disp",
    "--depth_net", "tiny", "--logdir", "./checkpoints",
    "--suffix", "track_{track_id}",
]
LOGDIR = "checkpoints/scene_flow_motion_field_davis_sequence_track_dog/0"


def test_train_fresh_and_resume(workdir):
    run([sys.executable, os.path.join(REPO, "train.py"), "--epoch", "2",
         *TRAIN_ARGS], cwd=workdir)
    logdir = workdir / LOGDIR
    assert (logdir / "checkpoint.ckpt").is_file()
    assert (logdir / "best.ckpt").is_file()
    assert (logdir / "epoch_loss.csv").is_file()
    assert (logdir / "opt.json").is_file()
    best0 = json.load(open(logdir / "best.ckpt.json"))["best"]

    out = run([sys.executable, os.path.join(REPO, "train.py"), "--epoch", "4",
               "--resume", "-1", *TRAIN_ARGS], cwd=workdir)
    assert "Resumed from" in out
    assert "Restored best vali loss" in out
    meta = json.load(open(logdir / "checkpoint.ckpt.json"))
    assert meta["epoch"] == 4
    # best never regresses across the resume
    best1 = json.load(open(logdir / "best.ckpt.json"))["best"]
    assert best1 <= best0 + 1e-12


def test_visualizations_gate_like_reference(workdir):
    """Vali dumps count from the START of the vali set (reference
    video_base.py:90) — an end-relative train-count gate would never fire
    for a short vali set; and the train gate must use the epoch's TRUE
    batch count (grouped batching, no --epoch_batches), not the sample
    count (reference scene_flow_motion_field.py:216 uses epoch_batches)."""
    run([sys.executable, os.path.join(REPO, "train.py"),
         "--net", "scene_flow_motion_field", "--dataset", "davis_sequence",
         "--track_id", "dog", "--epoch", "1", "--vali_batches", "2",
         "--vis_batches_vali", "1", "--vis_batches_train", "2",
         "--batch_size", "2", "--lr", "1e-4", "--scene_lr_mul", "10",
         "--warm_sf", "0", "--time_dependent", "--gaps", "1,2",
         "--use_disp", "--depth_net", "tiny",
         "--logdir", "./checkpoints_vis", "--suffix", "track_{track_id}"],
        cwd=workdir)
    visdir = (workdir / "checkpoints_vis" /
              "scene_flow_motion_field_davis_sequence_track_dog" / "0" /
              "visualize")
    vali_npz = list((visdir / "epoch0001_vali").glob("*.npz"))
    assert len(vali_npz) == 1, "first vali batch must be visualized"
    assert vali_npz[0].name == "rank0000_batch0000.npz"
    train_npz = list((visdir / "epoch0001_train").glob("*.npz"))
    assert len(train_npz) == 2, (
        "the LAST vis_batches_train grouped batches must be visualized")


def test_inference_cli_outputs(workdir):
    logdir = workdir / LOGDIR
    if not (logdir / "best.ckpt").is_file():
        pytest.skip("training test did not run first")
    run([sys.executable, os.path.join(REPO, "test.py"),
         "--checkpoint_path", str(logdir), "--output_dir", "./test_out"],
        cwd=workdir)
    outdir = workdir / "test_out" / "epochbest_test"
    npzs = sorted(outdir.glob("batch*.npz"))
    assert len(npzs) == 8
    d = np.load(npzs[0], allow_pickle=True)
    # the reference test-dump schema (reference: models/video_base.py:105-155
    # pack_output + test_on_batch)
    assert d["depth"].shape == (1, 32, 48)
    assert d["sf_1_2"].shape == (1, 32, 48, 3)
    assert d["img_1"].shape == (1, 32, 48, 3)
    assert d["cam_c2w"].shape == (1, 4, 4)
    assert d["K"].shape == (1, 3, 3)
    # accumulated per-epoch visualization page + rendered artifacts
    assert (outdir / "index.html").is_file()
    assert list((workdir / "test_out").glob("**/compare_*.png"))


def test_inference_overwrite_guard(workdir):
    """Re-rendering into an existing epoch output refuses without
    --overwrite (reference: test.py:55-60)."""
    logdir = workdir / LOGDIR
    if not (workdir / "test_out" / "epochbest_test").is_dir():
        pytest.skip("serial inference test did not run first")
    env = dict(os.environ)
    env["DVD_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "test.py"),
         "--checkpoint_path", str(logdir), "--output_dir", "./test_out"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode != 0
    assert "already exists" in proc.stdout + proc.stderr
    run([sys.executable, os.path.join(REPO, "test.py"),
         "--checkpoint_path", str(logdir), "--output_dir", "./test_out",
         "--overwrite"], cwd=workdir)
    assert len(list((workdir / "test_out" / "epochbest_test")
                    .glob("batch*.npz"))) == 8


def test_fleet_cli(workdir):
    """train_fleet.py end-to-end: 2 tracks in lockstep on the virtual CPU
    mesh (one video per device), per-track logs/checkpoints, async one-step-
    behind metric fetch, per-video best-on-vali checkpoints."""
    from dynamic_video_depth_tpu.data.synthetic import make_track

    make_track(str(workdir / "datafiles" / "davis_processed"), track="train",
               n_frames=8, h=32, w=48, gaps=(1, 2))
    args = [a for a in TRAIN_ARGS]
    args[args.index("--logdir") + 1] = "./fleet_ckpt"
    run([sys.executable, os.path.join(REPO, "train_fleet.py"),
         "--tracks", "dog,train", "--epoch", "2", "--vali_at_start", *args],
        cwd=workdir)
    for t in ("dog", "train"):
        tdir = workdir / "fleet_ckpt" / t
        assert (tdir / "checkpoint.ckpt").is_file(), tdir
        assert (tdir / "best.ckpt").is_file()
        assert json.load(open(tdir / "best.ckpt.json"))["best"] < float("inf")
    fleet_csv = workdir / "fleet_ckpt" / "epoch_loss.csv"
    assert fleet_csv.is_file()
    rows = fleet_csv.read_text().strip().splitlines()
    assert len(rows) >= 3  # header + 2 epochs
    # per-track vali history; --vali_at_start adds the epoch-0 init row
    hist = (workdir / "fleet_ckpt" / "dog" / "vali_loss.csv").read_text()
    assert hist.startswith("epoch,vali_loss") and len(hist.splitlines()) == 4
    assert hist.splitlines()[1].startswith("0,")


def test_inference_cli_sharded_matches_serial(workdir):
    """--n_chips frame-sharded inference (frames across the 'data' mesh
    axis) produces the same per-frame dumps as the serial path."""
    logdir = workdir / LOGDIR
    if not (workdir / "test_out" / "epochbest_test").is_dir():
        pytest.skip("serial inference test did not run first")
    run([sys.executable, os.path.join(REPO, "test.py"),
         "--checkpoint_path", str(logdir), "--output_dir", "./test_out_mc",
         "--n_chips", "8"], cwd=workdir)
    serial = sorted((workdir / "test_out" / "epochbest_test").glob("batch*.npz"))
    sharded = sorted((workdir / "test_out_mc" / "epochbest_test").glob("batch*.npz"))
    assert len(serial) == len(sharded) == 8
    for fa, fb in zip(serial, sharded):
        da, db = np.load(fa), np.load(fb)
        np.testing.assert_allclose(db["depth"], da["depth"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(db["sf_1_2"], da["sf_1_2"],
                                   rtol=1e-4, atol=1e-6)


def test_fleet_cli_2d_mesh(workdir):
    """train_fleet.py --dp 2: 2 videos x 2-way same-video data parallelism
    on a (video, data) mesh, per-track checkpoints written."""
    if not (workdir / "datafiles" / "davis_processed" / "frames_midas"
            / "train").is_dir():
        from dynamic_video_depth_tpu.data.synthetic import make_track

        make_track(str(workdir / "datafiles" / "davis_processed"),
                   track="train", n_frames=8, h=32, w=48, gaps=(1, 2))
    args = [a for a in TRAIN_ARGS]
    args[args.index("--logdir") + 1] = "./fleet2d_ckpt"
    args[args.index("--batch_size") + 1] = "2"
    run([sys.executable, os.path.join(REPO, "train_fleet.py"),
         "--tracks", "dog,train", "--dp", "2", "--epoch", "1", *args],
        cwd=workdir)
    for t in ("dog", "train"):
        tdir = workdir / "fleet2d_ckpt" / t
        assert (tdir / "checkpoint.ckpt").is_file(), tdir
        assert (tdir / "best.ckpt").is_file()


def test_train_cli_migrates_reference_checkpoint(workdir):
    """train.py --load_reference_ckpt: a mid-run checkpoint written by the
    REFERENCE'S own modules + torch Adam (hourglass depth net, canonical
    256x4 scene-flow field) imports and training continues at epoch+1."""
    import torch

    REFERENCE = "/root/reference"
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from networks.sceneflow_field import SceneFlowFieldNet as TorchSF
    from third_party.hourglass import HourglassModel_Embed

    torch.manual_seed(0)
    net_d = HourglassModel_Embed(noexp=False).eval()
    net_sf = TorchSF(net_width=256, n_layers=4, N_freq_xyz=16, N_freq_t=16,
                     time_dependent=True)
    opt_d = torch.optim.Adam(net_d.parameters(), lr=1e-4, betas=(0.5, 0.9))
    opt_sf = torch.optim.Adam(net_sf.parameters(), lr=1e-3, betas=(0.5, 0.9))
    loss = (net_d(torch.randn(1, 3, 32, 48)).mean()
            + (net_sf(torch.randn(1, 3, 8, 8), torch.randn(1, 1, 8, 8)) ** 2).mean())
    loss.backward()
    opt_d.step()
    opt_sf.step()
    ref_ckpt = str(workdir / "ref_checkpoint.pt")
    torch.save({"nets": [net_d.state_dict(), net_sf.state_dict()],
                "optimizers": [opt_d.state_dict(), opt_sf.state_dict()],
                "epoch": 7}, ref_ckpt)

    args = [a for a in TRAIN_ARGS]
    del args[args.index("--depth_net"):args.index("--depth_net") + 2]
    args[args.index("--logdir") + 1] = "./migrate_ckpt"
    out = run([sys.executable, os.path.join(REPO, "train.py"),
               "--epoch", "8", "--load_reference_ckpt", ref_ckpt, *args],
              cwd=workdir)
    assert "Imported reference checkpoint" in out
    logdir = (workdir / "migrate_ckpt" /
              "scene_flow_motion_field_davis_sequence_track_dog" / "0")
    meta = json.load(open(logdir / "checkpoint.ckpt.json"))
    assert meta["epoch"] == 8

    # round trip: export the trained state back to the reference format
    # through the CLI script (opt.json rehydration + template-guided port)
    out_pt = str(workdir / "exported_checkpoint.pt")
    run([sys.executable,
         os.path.join(REPO, "scripts", "export_reference_checkpoint.py"),
         "--checkpoint", str(logdir / "best.ckpt"),
         "--template", ref_ckpt, "--out", out_pt], cwd=workdir)
    exported = torch.load(out_pt, weights_only=False)
    net_d.load_state_dict(exported["nets"][0], strict=True)
    net_sf.load_state_dict(exported["nets"][1], strict=True)
    assert "optimizers" in exported


def test_precompile_variants_tool(workdir):
    """scripts/precompile_variants.py: each (batch, gap, warm) variant
    compiles in its own fresh process (the compile-helper OOM mitigation);
    exit 0 means all variants built."""
    out = run([sys.executable,
               os.path.join(REPO, "scripts", "precompile_variants.py"),
               "--gaps", "1", "--batch_sizes", "1", "--depth_net", "tiny",
               "--h", "32", "--w", "48", "--lr", "1e-4",
               "--scene_lr_mul", "10"], cwd=workdir)
    assert out.count("compiled bsz=1") == 2  # warm True + False
