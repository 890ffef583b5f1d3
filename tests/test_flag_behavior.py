"""Behavioral coverage for the reference-honored CLI flags that used to be
accepted-but-inert (reference: train.py:40-96,167-202, options/
options_train.py:56,90,111-144, loggers/Progbar.py:105-108). Each test
asserts the flag CHANGES observable behavior, not merely that it parses
(tests/test_flag_parity.py pins existence)."""

import csv
import io
import json
import os
import subprocess
import sys
from contextlib import redirect_stdout
from types import SimpleNamespace

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ------------------------------------------------------------- pure helpers


def test_vis_index_counts_from_end_by_default():
    from dynamic_video_depth_tpu.train.loop import vis_index

    # reference: indx = epoch_batches - batch_ind (last batches visualized)
    assert vis_index(1999, 2000, vis_at_start=False) == 1
    assert vis_index(0, 2000, vis_at_start=False) == 2000
    # --vis_at_start: first batches instead
    assert vis_index(0, 2000, vis_at_start=True) == 0
    assert vis_index(1999, 2000, vis_at_start=True) == 1999


def test_exprdir_name_prefix_toggle():
    from dynamic_video_depth_tpu.runtime.config import exprdir_name

    opt = SimpleNamespace(net="scene_flow_motion_field",
                          dataset="davis_sequence",
                          suffix="track_{track_id}", track_id="dog",
                          exprdir_no_prefix=False)
    assert exprdir_name(opt) == \
        "scene_flow_motion_field_davis_sequence_track_dog"
    opt.exprdir_no_prefix = True
    assert exprdir_name(opt) == "track_dog"


def test_tensorboard_logdir_keyword_split():
    from dynamic_video_depth_tpu.runtime.config import tensorboard_logdir

    opt = SimpleNamespace(full_logdir="./out/checkpoints/expr/0",
                          tensorboard_keyword="checkpoints",
                          logdir="./out/checkpoints", expr_id=0)
    # reference: train.py:195-199 — boards collect under
    # parent/keyword/tensorboard/sub across runs
    assert tensorboard_logdir(opt, "expr") == \
        "./out/checkpoints/tensorboard/expr/0"
    opt.tensorboard_keyword = "none"
    assert tensorboard_logdir(opt, "expr") == \
        "./out/checkpoints/tensorboard/expr/0"
    # keyword absent from the path: warn + fall back inside the run dir
    # (the reference crashes on the split)
    opt.tensorboard_keyword = "nonexistent"
    assert tensorboard_logdir(opt, "expr") == \
        "./out/checkpoints/expr/0/tensorboard"


def test_progbar_no_accum_shows_current_value():
    from dynamic_video_depth_tpu.runtime.loggers import ProgbarLogger

    def run(no_accum):
        pb = ProgbarLogger(interval=0.0, no_accum=no_accum)
        pb.set_params({"epochs": 1, "steps": 2})
        buf = io.StringIO()
        with redirect_stdout(buf):
            pb.on_epoch_begin(1)
            pb.on_batch_end(0, {"loss": 1.0, "size": 1})
            pb.on_batch_end(1, {"loss": 3.0, "size": 1})
            pb.on_epoch_end(1)
        return buf.getvalue()

    # accumulated mean of [1, 3] is 2; no_accum shows the latest value 3
    assert "loss: 2" in run(no_accum=False)
    assert "loss: 3" in run(no_accum=True)


def test_csv_resume_merges_changed_columns(tmp_path):
    from dynamic_video_depth_tpu.runtime.loggers import CsvLogger, LogCumulator

    path = str(tmp_path / "epoch_loss.csv")

    def one_run(metrics):
        cum = LogCumulator()
        lg = CsvLogger(path, cum)
        lg.on_train_begin()
        cum.on_epoch_begin(1)
        cum.on_batch_end(0, {**metrics, "size": 1})
        cum.on_epoch_end(1, {})
        lg.on_epoch_end(1)
        lg.on_train_end()

    one_run({"loss": 1.0})
    one_run({"loss": 0.5, "batch_time": 0.01})  # resumed run adds a metric
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    assert "batch_time" in rows[0]  # merged header covers old rows (blank)
    assert rows[0]["batch_time"] == ""
    assert float(rows[1]["batch_time"]) == 0.01
    assert float(rows[1]["loss"]) == 0.5


def test_sgd_dampening_changes_updates():
    """The flag must actually alter the optimizer dynamics (the silent-drop
    failure mode VERDICT r2 flagged)."""
    import jax.numpy as jnp
    import optax

    from dynamic_video_depth_tpu.train.step import (
        SceneFlowMotionFieldStep,
        TrainStepConfig,
    )

    def run(damp):
        step = SceneFlowMotionFieldStep(
            TrainStepConfig(optim="sgd", lr=1e-2, sgd_momentum=0.9,
                            sgd_dampening=damp, depth_net="tiny")
        )
        p = jnp.ones((3,))
        state = step.tx_depth.init(p)
        for g in (jnp.ones((3,)), jnp.ones((3,))):
            upd, state = step.tx_depth.update(g, state, p)
            p = optax.apply_updates(p, upd)
        return np.asarray(p)

    assert not np.allclose(run(0.0), run(0.5))


def test_explicit_depth_net_keeps_loss_and_ckpt_consistent():
    """--depth_net midas without --midas must select MiDaS EVERYWHERE:
    net, loss transform, and pretrained ckpt path (round-5 review: the
    net switched but loss/ckpt stayed on the raw flag, silently mixing
    MiDaS output with hourglass loss math)."""
    import argparse

    from dynamic_video_depth_tpu.train import scene_flow_motion_field as sfm
    from tests.test_pretrained_load import model_opt

    m = sfm.Model(model_opt(midas=False, depth_net="midas"))
    assert type(m.step.net_depth).__name__ == "MidasNet"
    assert m.cfg.midas and m.cfg.loss.midas

    h = sfm.Model(model_opt(midas=True, depth_net="hourglass"))
    assert type(h.step.net_depth).__name__ == "HourglassModelEmbed"
    assert not h.cfg.midas and not h.cfg.loss.midas


def test_depth_net_value_is_validated():
    """A depth_net typo must fail loudly, not silently fall through to the
    hourglass branch (ADVICE r4)."""
    from dynamic_video_depth_tpu.train.step import (
        SceneFlowMotionFieldStep,
        TrainStepConfig,
    )

    with pytest.raises(ValueError, match="depth_net"):
        SceneFlowMotionFieldStep(TrainStepConfig(depth_net="hourglas"))
    # explicit names select the net regardless of the midas flag
    s = SceneFlowMotionFieldStep(TrainStepConfig(depth_net="hourglass",
                                                 midas=True))
    assert type(s.net_depth).__name__ == "HourglassModelEmbed"
    s = SceneFlowMotionFieldStep(TrainStepConfig(depth_net="midas",
                                                 midas=False))
    assert type(s.net_depth).__name__ == "MidasNet"


# --------------------------------------------------------- CLI end-to-end


def run_cli(cmd, cwd):
    env = dict(os.environ)
    env["DVD_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                          text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    return proc.stdout + proc.stderr


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("flags")
    from dynamic_video_depth_tpu.data.synthetic import make_track

    make_track(str(root / "datafiles" / "davis_processed"), track="dog",
               n_frames=8, h=32, w=48, gaps=(1, 2))
    return root


FLAG_ARGS = [
    "--net", "scene_flow_motion_field", "--dataset", "davis_sequence",
    "--track_id", "dog", "--epoch_batches", "3", "--vali_batches", "1",
    "--batch_size", "1", "--lr", "1e-4", "--scene_lr_mul", "10",
    "--warm_sf", "1", "--time_dependent", "--gaps", "1,2", "--use_disp",
    "--depth_net", "tiny", "--logdir", "./checkpoints",
    "--suffix", "track_{track_id}",
]


def test_driver_flags_end_to_end(workdir):
    """One training run exercising --exprdir_no_prefix, --log_time,
    --tensorboard(+default keyword), then a --pt_no_overwrite resume."""
    run_cli([sys.executable, os.path.join(REPO, "train.py"), "--epoch", "1",
             "--exprdir_no_prefix", "--log_time", "--log_batch",
             "--tensorboard", *FLAG_ARGS], cwd=workdir)

    # --exprdir_no_prefix: run dir named by the suffix alone
    logdir = workdir / "checkpoints" / "track_dog" / "0"
    assert (logdir / "checkpoint.ckpt").is_file()
    assert not (workdir / "checkpoints" /
                "scene_flow_motion_field_davis_sequence_track_dog").exists()

    # --log_time: batch_time column present in the batch CSV
    with open(logdir / "batch_loss.csv", newline="") as f:
        rows = list(csv.DictReader(f))
    assert "batch_time" in rows[0] and float(rows[-1]["batch_time"]) > 0

    # --tensorboard with default keyword 'checkpoints': event files land in
    # checkpoints/tensorboard/<sub>, NOT inside the run dir
    tb_dir = workdir / "checkpoints" / "tensorboard" / "track_dog" / "0"
    assert tb_dir.is_dir() and list(tb_dir.iterdir())
    assert not (logdir / "tensorboard").exists()

    # --pt_no_overwrite: a rerun must keep the original opt.json
    opt_before = json.load(open(logdir / "opt.json"))
    assert opt_before["epoch"] == 1
    out = run_cli([sys.executable, os.path.join(REPO, "train.py"),
                   "--epoch", "2", "--resume", "-1", "--pt_no_overwrite",
                   "--exprdir_no_prefix", *FLAG_ARGS], cwd=workdir)
    assert "keeping existing opt.json" in out
    assert json.load(open(logdir / "opt.json"))["epoch"] == 1  # unchanged

    # control: without --log_time there is no batch_time column
    run_cli([sys.executable, os.path.join(REPO, "train.py"), "--epoch", "1",
             "--log_batch", "--force_overwrite", *FLAG_ARGS,
             "--logdir", "./ckpt_no_time"], cwd=workdir)
    plain = (workdir / "ckpt_no_time" /
             "scene_flow_motion_field_davis_sequence_track_dog" / "0" /
             "batch_loss.csv")
    with open(plain, newline="") as f:
        assert "batch_time" not in csv.DictReader(f).fieldnames

    # --save_every 2: checkpoint.ckpt written only on even epochs (round-5
    # flag; best.ckpt unaffected) — EXCEPT the final epoch, which always
    # writes so the completed run is resumable. After a 3-epoch run the
    # ckpt sidecar must record epoch 3 (the off-period final write).
    run_cli([sys.executable, os.path.join(REPO, "train.py"), "--epoch", "3",
             "--save_every", "2", "--save_net", "0", "--force_overwrite",
             *FLAG_ARGS, "--logdir", "./ckpt_save_every"], cwd=workdir)
    d = (workdir / "ckpt_save_every" /
         "scene_flow_motion_field_davis_sequence_track_dog" / "0")
    assert json.load(open(d / "checkpoint.ckpt.json"))["epoch"] == 3
    assert (d / "best.ckpt").is_file()


def test_vis_at_start_selects_first_batches(workdir):
    """Default visualizes the LAST vis_batches_train batches (reference
    semantics); --vis_at_start flips to the first ones."""

    def batches_visualized(extra, tag):
        run_cli([sys.executable, os.path.join(REPO, "train.py"),
                 "--epoch", "1", "--vis_every_train", "1",
                 "--vis_batches_train", "1", "--vis_every_vali", "0",
                 *extra, *FLAG_ARGS, "--logdir", f"./ckpt_vis_{tag}"],
                cwd=workdir)
        visdir = (workdir / f"ckpt_vis_{tag}" /
                  "scene_flow_motion_field_davis_sequence_track_dog" / "0" /
                  "visualize" / "epoch0001_train")
        return sorted(p.name for p in visdir.glob("*.npz"))

    # 3 epoch_batches, limit 1: default keeps idx = 3 - i <= 1 -> i = 2;
    # vis_at_start keeps i in {0, 1} (idx = i <= 1)
    assert batches_visualized([], "end") == ["rank0000_batch0002.npz"]
    assert batches_visualized(["--vis_at_start"], "start") == [
        "rank0000_batch0000.npz", "rank0000_batch0001.npz"]


def test_shutterstock_recipe_chains_test(workdir):
    """The shutterstock experiment template end-to-end: train on the
    synthetic shutterstock fixture (track selected BY INDEX, the dataset's
    quirk) and chain test.py via experiments/shutterstock/test_cmd.txt
    (reference ships the same template pair, experiments/shutterstock/
    test_cmd.txt:1)."""
    from dynamic_video_depth_tpu.data.synthetic import make_track

    make_track(str(workdir / "datafiles" / "shutterstock"), track="pexels",
               n_frames=6, h=32, w=48, gaps=(1,))
    args = [a for a in FLAG_ARGS]
    args[args.index("--dataset") + 1] = "shutterstock"
    args[args.index("--track_id") + 1] = "0"  # by-index selection
    args[args.index("--gaps") + 1] = "1"
    run_cli([sys.executable, os.path.join(REPO, "train.py"), "--epoch", "1",
             "--test_template",
             os.path.join(REPO, "experiments", "shutterstock", "test_cmd.txt"),
             *args], cwd=workdir)
    outdir = (workdir / "test_results" / "shutterstock" / "track_pexels" /
              "epochbest_test")
    npzs = sorted(outdir.glob("batch*.npz"))
    assert len(npzs) == 6
    d = np.load(npzs[0], allow_pickle=True)
    assert d["depth"].shape == (1, 32, 48)


def test_save_state_weights_only_roundtrip(tmp_path):
    """--save_net_opt off: periodic net checkpoints exclude optimizer state
    (reference default for nets/%04d.pt, loggers/loggers.py:265) and load
    back around the template's optimizer."""
    import jax.numpy as jnp

    from dynamic_video_depth_tpu.runtime.checkpoint import (
        load_state,
        save_state,
    )
    from dynamic_video_depth_tpu.train.step import TrainState

    big = jnp.arange(4096, dtype=jnp.float32)
    state = TrainState(
        params_depth={"w": big}, params_sf={"v": big * 2},
        stats_depth={}, opt_depth={"mu": big * 3}, opt_sf={"nu": big * 4},
        step=jnp.asarray(7),
    )
    full = str(tmp_path / "full.ckpt")
    slim = str(tmp_path / "slim.ckpt")
    save_state(full, state, epoch=1, include_opt=True)
    save_state(slim, state, epoch=1, include_opt=False)
    assert os.path.getsize(slim) < os.path.getsize(full)
    assert json.load(open(slim + ".json"))["weights_only"] is True

    template = TrainState(
        params_depth={"w": jnp.zeros_like(big)},
        params_sf={"v": jnp.zeros_like(big)}, stats_depth={},
        opt_depth={"mu": jnp.full_like(big, -1.0)},
        opt_sf={"nu": jnp.full_like(big, -2.0)}, step=jnp.asarray(0),
    )
    loaded, meta = load_state(slim, template)
    np.testing.assert_array_equal(np.asarray(loaded.params_depth["w"]),
                                  np.asarray(big))
    np.testing.assert_array_equal(np.asarray(loaded.params_sf["v"]),
                                  np.asarray(big * 2))
    # optimizer state untouched (fresh template values)
    assert float(np.asarray(loaded.opt_depth["mu"])[0]) == -1.0
    assert int(loaded.step) == 7 and meta["epoch"] == 1

    # The sidecar is advisory, not load-bearing: a weights-only payload
    # whose sidecar was lost (crash between the two writes) must still
    # restore from the payload layout instead of crashing --resume N.
    os.remove(slim + ".json")
    recovered, meta2 = load_state(slim, template)
    np.testing.assert_array_equal(np.asarray(recovered.params_depth["w"]),
                                  np.asarray(big))
    assert float(np.asarray(recovered.opt_depth["mu"])[0]) == -1.0
    assert meta2 == {}
    # ...and a stale sidecar lying about the layout is overridden too
    with open(full + ".json", "w") as f:
        json.dump({"epoch": 1, "weights_only": True}, f)
    recovered_full, _ = load_state(full, template)
    np.testing.assert_array_equal(np.asarray(recovered_full.opt_depth["mu"]),
                                  np.asarray(big * 3))


def test_force_overwrite_guard_and_vali_at_start(workdir):
    """resume 0 into an existing experiment refuses without
    --force_overwrite (reference prompts/refuses, train.py:51-77);
    --vali_at_start logs the init model's vali loss as an epoch-0 CSV row
    before any training (reference netinterface.py:348-352)."""
    args = [a for a in FLAG_ARGS]
    args[args.index("--logdir") + 1] = "./ckpt_guard"
    run_cli([sys.executable, os.path.join(REPO, "train.py"), "--epoch", "1",
             "--vali_at_start", *args], cwd=workdir)
    logdir = (workdir / "ckpt_guard" /
              "scene_flow_motion_field_davis_sequence_track_dog" / "0")
    with open(logdir / "epoch_loss.csv", newline="") as f:
        rows = list(csv.DictReader(f))
    # epoch-0 row: vali only; epoch-1 row: train metrics present too
    assert rows[0]["epoch"] == "0" and float(rows[0]["vali_loss"]) > 0
    assert rows[0].get("loss", "") == ""
    assert rows[1]["epoch"] == "1" and float(rows[1]["loss"]) > 0
    # default periodic nets checkpoint is weights-only (no --save_net_opt)
    meta = json.load(open(logdir / "nets" / "0001.ckpt.json"))
    assert meta.get("weights_only") is True

    # rerun fresh without --force_overwrite: refused, artifacts untouched
    env = dict(os.environ)
    env["DVD_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"), "--epoch", "1",
         *args], cwd=workdir, env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode != 0
    assert "Refusing to overwrite" in proc.stdout + proc.stderr
    # with --force_overwrite: the old experiment is replaced
    old_csv_len = len(rows)
    run_cli([sys.executable, os.path.join(REPO, "train.py"), "--epoch", "1",
             "--force_overwrite", *args], cwd=workdir)
    with open(logdir / "epoch_loss.csv", newline="") as f:
        rows2 = list(csv.DictReader(f))
    assert len(rows2) == 1  # fresh run, not appended to the old history
    assert old_csv_len == 2


def test_use_pallas_cli_toggles_reach_step_config():
    """--use_pallas_{sf,warp,loss} (the escape hatch if a fused kernel
    misbehaves at an untested configuration) must land in the jitted
    step's config and flip the dispatch predicates."""
    from dynamic_video_depth_tpu.runtime.config import parse
    from dynamic_video_depth_tpu.train.scene_flow_motion_field import Model

    argv = ["--net", "scene_flow_motion_field",
            "--dataset", "davis_sequence", "--track_id", "dog",
            "--lr", "1e-4", "--scene_lr_mul", "10", "--depth_net", "tiny",
            "--use_pallas_sf", "off", "--use_pallas_warp", "on",
            "--use_pallas_loss", "off"]
    opt, _ = parse(argv)
    model = Model(opt)
    assert model.cfg.use_pallas_sf == "off"
    assert model.cfg.use_pallas_warp == "on"
    assert model.cfg.use_pallas_loss == "off"
    assert not model.step._sf_use_pallas()
    assert not model.step._loss_use_pallas(10**9)
    # default is auto = backend-gated (cpu here -> off for sf)
    opt2, _ = parse(argv[:10])
    assert Model(opt2).cfg.use_pallas_sf == "auto"
