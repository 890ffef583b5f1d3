"""Runtime shell unit tests: loggers, checkpoints, config."""

import argparse
import csv
import os

import numpy as np
import pytest
import jax.numpy as jnp

from dynamic_video_depth_tpu.runtime.checkpoint import (
    load_state,
    resolve_resume,
    save_opt,
    load_opt,
    save_state,
)
from dynamic_video_depth_tpu.runtime.loggers import (
    BatchCsvLogger,
    ComposeLogger,
    CsvLogger,
    LogCumulator,
    ModelSaveLogger,
    TerminateOnNaN,
)


def run_fake_training(logger, epochs=3, batches=4, nan_at=None):
    """Mirror of the reference's inline logger smoke test
    (loggers/loggers.py:518-557)."""
    logger.set_params({"epochs": epochs, "steps": batches})
    logger.on_train_begin()
    rng = np.random.RandomState(0)
    for epoch in range(1, epochs + 1):
        logger.on_epoch_begin(epoch)
        for b in range(batches):
            loss = float(rng.rand()) if nan_at != (epoch, b) else float("nan")
            logger.on_batch_end(b, {"size": 2, "loss": loss,
                                    "flow_loss_1_2": loss * 0.5})
        cum = (logger.get_logger(LogCumulator)
               if isinstance(logger, ComposeLogger) else None)
        if cum:
            cum.on_epoch_end(epoch)
        logger.on_epoch_end(epoch, {"loss": 0.1 * epoch})
    logger.on_train_end()


def test_cumulator_weighted_mean():
    cum = LogCumulator()
    cum.on_epoch_begin(1)
    cum.on_batch_end(0, {"size": 1, "loss": 1.0})
    cum.on_batch_end(1, {"size": 3, "loss": 2.0})
    logs = cum.get_epoch_logs()
    assert abs(logs["loss"] - (1 * 1 + 3 * 2) / 4) < 1e-9
    # device scalars convert lazily
    cum.on_epoch_begin(2)
    cum.on_batch_end(0, {"size": 1, "loss": jnp.asarray(2.0)})
    assert abs(cum.get_epoch_logs()["loss"] - 2.0) < 1e-9


def test_csv_loggers(tmp_path):
    cum = LogCumulator()
    csvlog = CsvLogger(str(tmp_path / "epoch_loss.csv"), cum)
    batchlog = BatchCsvLogger(str(tmp_path / "batch_loss.csv"))
    logger = ComposeLogger([cum, csvlog, batchlog])
    run_fake_training(logger)
    with open(tmp_path / "epoch_loss.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3 and "loss" in rows[0]
    with open(tmp_path / "batch_loss.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 12


def test_terminate_on_nan():
    cum = LogCumulator()
    logger = ComposeLogger([cum, TerminateOnNaN()])
    logger.set_params({})
    logger.on_train_begin()
    logger.on_epoch_begin(1)
    # batch-level: host floats are checked immediately
    with pytest.raises(FloatingPointError):
        logger.on_batch_end(0, {"size": 1, "loss": float("nan")})
    # epoch-level: device scalars converted then checked
    import jax.numpy as jnp

    logger2 = ComposeLogger([LogCumulator(), TerminateOnNaN()])
    logger2.on_epoch_begin(1)
    with pytest.raises(FloatingPointError):
        logger2.on_epoch_end(1, {"loss": jnp.asarray(float("nan"))})
    # a transient inf must NOT abort (reference checks isnan only, its isinf
    # is deliberately commented out: reference loggers/loggers.py:309-322)
    logger3 = ComposeLogger([LogCumulator(), TerminateOnNaN()])
    logger3.on_epoch_begin(1)
    logger3.on_batch_end(0, {"size": 1, "loss": float("inf")})
    logger3.on_epoch_end(1, {"loss": jnp.asarray(float("inf"))})


def test_model_save_best_only(tmp_path):
    saves = []
    saver = ModelSaveLogger(
        lambda path, epoch, best: saves.append((path, epoch, best)),
        str(tmp_path / "best.ckpt"), save_best_only=True,
    )
    saver.on_epoch_end(1, {"loss": 1.0})
    saver.on_epoch_end(2, {"loss": 2.0})  # worse: no save
    saver.on_epoch_end(3, {"loss": 0.5})
    assert len(saves) == 2
    assert saves[-1][1] == 3


def test_checkpoint_roundtrip(tmp_path):
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.asarray(7)}
    path = str(tmp_path / "checkpoint.ckpt")
    save_state(path, state, epoch=5, best=0.25)
    template = {"params": {"w": jnp.zeros((2, 3))}, "step": jnp.asarray(0)}
    loaded, meta = load_state(path, template)
    np.testing.assert_allclose(np.asarray(loaded["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    assert meta["epoch"] == 5 and meta["best"] == 0.25


def test_async_saver_dedupes_same_snapshot(tmp_path, monkeypatch):
    """The per-epoch save set passes the SAME device snapshot 2-3x; the
    worker must fetch it once, still write every file correctly, refresh
    on a NEW snapshot, and drop the cached copies once the queue drains
    (round-5 tunnel-D2H fix + memory-retention fix)."""
    from dynamic_video_depth_tpu.runtime import checkpoint as ck

    fetches = []
    orig = ck.jax.device_get
    monkeypatch.setattr(
        ck.jax, "device_get",
        lambda x: (fetches.append(id(x)), orig(x))[1])

    saver = ck.AsyncSaver.__new__(ck.AsyncSaver)  # no thread: test _process
    saver._cache_state = None
    saver._cache_host = None
    s1 = {"params": {"w": jnp.arange(4.0)}, "step": jnp.asarray(1)}
    s2 = {"params": {"w": jnp.arange(4.0) * 2}, "step": jnp.asarray(2)}
    job = lambda name, s, e: (str(tmp_path / name), s, e, float("inf"),
                              None, True)
    saver._process(job("a.ckpt", s1, 1), drop_cache=False)
    saver._process(job("b.ckpt", s1, 1), drop_cache=True)  # queue empties
    assert fetches.count(id(s1)) == 1  # second save reused the host copy
    assert saver._cache_state is None and saver._cache_host is None
    saver._process(job("c.ckpt", s2, 2), drop_cache=True)
    tmpl = {"params": {"w": jnp.zeros((4,))}, "step": jnp.asarray(0)}
    for name, ref in (("a", s1), ("b", s1), ("c", s2)):
        loaded, _ = load_state(str(tmp_path / f"{name}.ckpt"), tmpl)
        np.testing.assert_allclose(np.asarray(loaded["params"]["w"]),
                                   np.asarray(ref["params"]["w"]))


def test_resolve_resume(tmp_path):
    d = str(tmp_path)
    assert resolve_resume(d, 0) is None
    assert resolve_resume(d, -1).endswith("checkpoint.ckpt")
    assert resolve_resume(d, -2).endswith("best.ckpt")
    assert resolve_resume(d, 7).endswith("0007.ckpt")


def test_opt_roundtrip(tmp_path):
    opt = argparse.Namespace(lr=1e-6, net="scene_flow_motion_field",
                             gaps="1,2", midas=True)
    save_opt(str(tmp_path), opt)
    loaded = load_opt(str(tmp_path))
    assert loaded["lr"] == 1e-6 and loaded["midas"] is True
    assert os.path.isfile(tmp_path / "opt.txt")


def test_config_two_phase_parse():
    from dynamic_video_depth_tpu.runtime.config import parse

    opt, unique = parse([
        "--net", "scene_flow_motion_field", "--dataset", "davis_sequence",
        "--track_id", "dog", "--midas", "--use_disp", "--scene_lr_mul",
        "1000", "--gaps", "1,2,4,6,8", "--unknown_flag_zzz",
    ])
    assert opt.track_id == "dog"
    assert opt.scene_lr_mul == 1000
    assert opt.midas and opt.use_disp
    assert "epoch_batches" in unique
def test_dead_mask_warning(capsys):
    from dynamic_video_depth_tpu.train.loop import Trainer
    t = object.__new__(Trainer)
    t._watch_dead_mask({"loss": 0.0, "flow_loss_1_2": 0.0})
    out = capsys.readouterr().out
    assert "zero mass" in out
    t._watch_dead_mask({"loss": 0.0, "flow_loss_1_2": 0.0})
    assert "zero mass" not in capsys.readouterr().out  # warns once
    t2 = object.__new__(Trainer)
    t2._watch_dead_mask({"loss": 0.5, "flow_loss_1_2": 0.1})
    assert capsys.readouterr().out == ""


def test_csv_logger_resume_after_empty_file(tmp_path):
    """An empty CSV (crash before the first epoch) counts as fresh — the
    resumed run must write a header."""
    from dynamic_video_depth_tpu.runtime.loggers import CsvLogger, LogCumulator

    p = str(tmp_path / "epoch_loss.csv")
    open(p, "w").close()  # crashed run left an empty file
    cum = LogCumulator()
    log = CsvLogger(p, cum)
    log.on_train_begin()
    cum.on_epoch_begin(1)
    cum.on_batch_end(0, {"loss": 1.0, "size": 1})
    cum.on_epoch_end(1, {})
    log.on_epoch_end(1)
    log.on_train_end()
    lines = open(p).read().strip().splitlines()
    assert lines[0].startswith("epoch") or "loss" in lines[0]  # header
    assert len(lines) == 2


def test_batch_csv_durable_per_batch(tmp_path):
    """Batch rows land on disk as they arrive (reference parity) — a NaN
    abort mid-epoch must not discard the trace."""
    from dynamic_video_depth_tpu.runtime.loggers import BatchCsvLogger

    p = str(tmp_path / "batch_loss.csv")
    log = BatchCsvLogger(p)
    log.on_epoch_begin(1)
    log.on_batch_end(0, {"loss": 1.0, "size": 1})
    log.on_batch_end(1, {"loss": float("nan"), "size": 1})
    # no on_epoch_end (aborted) — rows must already be on disk
    lines = open(p).read().strip().splitlines()
    assert len(lines) == 3  # header + 2 rows
    log.on_train_end()


def test_cumulator_partial_metric_weighting():
    """A metric logged in only some batches weights by THOSE batches' sizes
    (positional pairing would silently under-normalize)."""
    from dynamic_video_depth_tpu.runtime.loggers import LogCumulator

    cum = LogCumulator()
    cum.on_epoch_begin(1)
    cum.on_batch_end(0, {"loss": 1.0, "size": 2})
    cum.on_batch_end(1, {"loss": 3.0, "rare": 10.0, "size": 2})
    logs = cum.get_epoch_logs()
    assert logs["loss"] == 2.0
    assert logs["rare"] == 10.0  # mean over the one batch that logged it


def test_html_logger_resumes_history(tmp_path):
    from dynamic_video_depth_tpu.runtime.loggers import HtmlLogger, LogCumulator

    cum = LogCumulator()
    log = HtmlLogger(str(tmp_path), cum)
    log.on_train_begin()
    cum.on_epoch_begin(1)
    cum.on_batch_end(0, {"loss": 1.0, "size": 1})
    cum.on_epoch_end(1, {})
    log.on_epoch_end(1)

    # a fresh logger (resumed run) must keep epoch 1 in the dashboard
    log2 = HtmlLogger(str(tmp_path), cum)
    log2.on_train_begin()
    cum.on_epoch_begin(2)
    cum.on_batch_end(0, {"loss": 0.5, "size": 1})
    cum.on_epoch_end(2, {})
    log2.on_epoch_end(2)
    import json as _json

    hist = _json.load(open(tmp_path / "progress.json"))
    assert [e["epoch"] for e in hist] == [1, 2]


def test_batch_loader_early_exit_no_leak():
    """Abandoning the iterator (NaN abort) must not leave the worker thread
    parked forever in q.put."""
    import threading
    import time as _time

    from dynamic_video_depth_tpu.data.prefetch import BatchLoader

    class Slow:
        def __getitem__(self, i):
            return {"x": i}

    before = threading.active_count()
    it = iter(BatchLoader(Slow(), order=list(range(100)), queue_size=2))
    next(it)
    it.close()  # generator finally -> stop.set()
    deadline = _time.time() + 5.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before


def test_dispatch_with_retry_transient_only():
    """Transient remote-compile failures retry (bounded); real errors
    propagate immediately."""
    from dynamic_video_depth_tpu.train.loop import dispatch_with_retry

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError(
                "INTERNAL: http://127.0.0.1:8093/remote_compile: HTTP 500: "
                "tpu_compile_helper subprocess exit signal SIGKILL (9)")
        return "ok"

    assert dispatch_with_retry(flaky, "step", retries=2, wait_s=0.0) == "ok"
    assert calls["n"] == 3

    def real_bug():
        raise ValueError("shape mismatch")

    import pytest as _pytest
    with _pytest.raises(ValueError, match="shape mismatch"):
        dispatch_with_retry(real_bug, "step", retries=2, wait_s=0.0)

    def always_transient():
        raise RuntimeError("remote_compile: HTTP 500")

    with _pytest.raises(RuntimeError, match="remote_compile"):
        dispatch_with_retry(always_transient, "step", retries=1, wait_s=0.0)

    # A transient failure that struck mid-EXECUTION consumed the donated
    # state buffers; the retry's "Array has been deleted" artifact must
    # surface the ORIGINAL failure, not mask it.
    calls2 = {"n": 0}

    def donated():
        calls2["n"] += 1
        if calls2["n"] == 1:
            raise RuntimeError("UNAVAILABLE: socket closed mid-execution")
        raise RuntimeError("Array has been deleted.")

    with _pytest.raises(RuntimeError, match="UNAVAILABLE"):
        dispatch_with_retry(donated, "step", retries=2, wait_s=0.0)
    assert calls2["n"] == 2  # gave up at the deleted-buffer artifact


def test_depth_metrics_known_values():
    """utils/metrics.py: exact values on a hand-computable case + the
    invalid-mask edge."""
    import numpy as np

    from dynamic_video_depth_tpu.utils.metrics import (
        depth_metrics,
        scale_invariant_alignment,
    )

    gt = np.array([1.0, 2.0, 4.0])
    pred = np.array([1.1, 2.0, 4.8])
    m = depth_metrics(pred, gt)
    np.testing.assert_allclose(
        m["abs_rel"], np.mean([0.1 / 1, 0.0, 0.8 / 4]), rtol=1e-10)
    np.testing.assert_allclose(
        m["rmse"], np.sqrt(np.mean([0.01, 0.0, 0.64])), rtol=1e-10)
    assert m["d1"] == 1.0  # ratios [1.1, 1.0, 1.2] all < 1.25
    # perfect prediction: zeros and d=1
    perfect = depth_metrics(gt, gt)
    assert perfect["abs_rel"] == 0.0 and perfect["d1"] == 1.0
    # no valid gt -> NaNs, not a crash
    empty = depth_metrics(pred, np.zeros(3))
    assert np.isnan(empty["rmse"])
    # median-ratio alignment: pred scaled by 0.5 -> scale 2
    assert scale_invariant_alignment(gt * 0.5, gt) == 2.0


def test_trace_if_writes_profile(tmp_path):
    """--profile_dir machinery: the trace context writes profiler artifacts
    (hardware-verified on TPU in round 3; CPU path pinned here)."""
    import glob

    import jax
    import jax.numpy as jnp

    from dynamic_video_depth_tpu.runtime.profiling import trace_if

    out = str(tmp_path / "prof")
    with trace_if(out, True):
        _ = jnp.sum(jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    files = glob.glob(out + "/**/*.xplane.pb", recursive=True)
    assert files, "no profiler artifacts written"
    # disabled -> no-op, no directory
    with trace_if(str(tmp_path / "prof2"), False):
        pass
    assert not (tmp_path / "prof2").exists()


def test_bench_wait_for_backend(monkeypatch):
    """bench.py's backend-outage guard (the axon tunnel was observed down
    for tens of minutes mid-round): success returns, a dead backend raises
    after the deadline instead of hanging the driver's bench run."""
    import importlib.util
    import subprocess

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # success: the probe child honors DVD_PLATFORM (conftest pins cpu)
    monkeypatch.setenv("DVD_PLATFORM", "cpu")
    bench._wait_for_backend(deadline_s=60.0, probe_s=60.0)

    # outage: every probe hangs -> bounded failure, not an infinite wait
    def hang(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=k["timeout"])

    monkeypatch.setattr(subprocess, "run", hang)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(RuntimeError, match="unavailable"):
        bench._wait_for_backend(deadline_s=0.5, probe_s=1.0)
