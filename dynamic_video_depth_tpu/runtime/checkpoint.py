"""Checkpointing: train state + config snapshot.

Mirrors the reference's artifacts (reference: models/netinterface.py:528-562,
train.py:150-186): ``checkpoint`` every epoch, ``nets/%04d`` periodic,
``best`` on vali improvement, plus a config snapshot (``opt.json``) that
``test.py`` rehydrates (reference: test.py:81-84).

Format: flax msgpack serialization of the full TrainState pytree plus a json
sidecar with {epoch, best, metadata}. Both files are written via atomic
rename; the ckpt lands before its sidecar, so a crash between the two
leaves a NEW ckpt with a stale sidecar — resume then merely replays one
epoch (the safe direction; the reverse pairing would claim progress the
params don't have).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization


def _atomic_write(path: str, data: bytes, mode: str = "wb"):
    d = os.path.dirname(path) or "."
    fd, tmp = tempfile.mkstemp(dir=d)
    try:
        with os.fdopen(fd, mode) as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


_WEIGHT_FIELDS = ("params_depth", "params_sf", "stats_depth", "step")


def save_state(path: str, state: Any, epoch: int = 0, best: float = float("inf"),
               extra: Optional[Dict] = None, include_opt: bool = True):
    """Serialize ``state`` to ``path`` (.ckpt msgpack + .json sidecar).

    ``include_opt=False`` saves weights + BN stats only (the reference's
    periodic ``nets/%04d.pt`` default, loggers/loggers.py:265 + train.py
    ``--save_net_opt``): Adam moments double a MiDaS checkpoint, and the
    per-epoch net history rarely needs them. The sidecar records
    ``weights_only`` so ``load_state`` rebuilds around fresh opt state."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state = jax.device_get(state)
    meta = {"epoch": int(epoch), "best": float(best), **(extra or {})}
    if include_opt:
        payload = serialization.to_bytes(state)
    else:
        payload = serialization.to_bytes(
            {k: getattr(state, k) for k in _WEIGHT_FIELDS})
        meta["weights_only"] = True
    _atomic_write(path, payload)
    _atomic_write(path + ".json", json.dumps(meta).encode(), "wb")


def load_state(path: str, template: Any) -> Tuple[Any, Dict]:
    """Deserialize into the structure of ``template``; returns (state, meta).
    A missing or corrupt sidecar degrades to empty metadata (resume replays
    an epoch) rather than refusing to load the checkpoint. A weights-only
    checkpoint (``--save_net_opt`` not set on the saving run) restores
    weights into ``template`` and keeps the template's optimizer state
    (matching the reference's missing-optimizer load path,
    models/netinterface.py:552-562)."""
    meta_pre = {}
    if os.path.isfile(path + ".json"):
        try:
            with open(path + ".json") as f:
                meta_pre = json.load(f)
        except (json.JSONDecodeError, OSError) as e:
            print(f"Warning: unreadable checkpoint sidecar {path}.json "
                  f"({e}); continuing with empty metadata")
    with open(path, "rb") as f:
        data = f.read()
    # The sidecar is advisory, never load-bearing: the PAYLOAD decides the
    # layout (a crash between the ckpt and sidecar writes, or a lost/corrupt
    # sidecar, must degrade — not crash --resume N, and not silently drop a
    # full payload's optimizer state against the weights-only subset, which
    # from_bytes would tolerate: it ignores extra top-level keys).
    raw = serialization.msgpack_restore(data)
    tpl_sd = serialization.to_state_dict(template)
    weights_only = (isinstance(raw, dict) and isinstance(tpl_sd, dict)
                    and set(raw) == set(_WEIGHT_FIELDS)
                    and set(raw) != set(tpl_sd))
    if meta_pre and bool(meta_pre.get("weights_only")) != weights_only:
        print(f"Warning: checkpoint {path} payload is "
              f"{'weights-only' if weights_only else 'full'} but its "
              "sidecar disagrees; restoring from the payload layout")
    if weights_only:
        part = serialization.from_state_dict(
            {k: getattr(template, k) for k in _WEIGHT_FIELDS}, raw)
        return template.replace(**part), meta_pre
    return serialization.from_state_dict(template, raw), meta_pre


class AsyncSaver:
    """Single-worker background checkpoint writer.

    Device->host fetch + serialization of a 1.3 GB MiDaS state blocks the
    step loop for seconds per epoch; the saver snapshots on a worker thread.
    ``save`` applies back-pressure: if the previous save is still in flight
    the caller blocks for the queue slot (best.ckpt / nets/%04d must not be
    dropped). ``flush()`` drains; an atexit hook drains on interpreter exit
    so an exception that skips the caller's flush cannot lose the in-flight
    end-of-epoch checkpoint."""

    def __init__(self):
        import atexit
        import queue
        import threading

        # depth 4: one epoch's full save set (checkpoint.ckpt + best.ckpt +
        # nets/%04d) queues without blocking the step loop; back-pressure
        # only engages if storage falls a whole epoch behind (round-5
        # measurement: with maxsize=1 the third same-epoch save blocked the
        # loop for a full tunnel D2H)
        self._q = queue.Queue(maxsize=4)
        # same-state host-fetch dedupe: the per-epoch save set passes the
        # SAME device snapshot 2-3x; fetch it through the tunnel once
        # (~68 MB hourglass / ~1.3 GB MiDaS per fetch). Holds a strong ref
        # to the snapshot so Python cannot recycle its id.
        self._cache_state = None
        self._cache_host = None
        self._t = threading.Thread(target=self._worker, daemon=True)
        self._t.start()
        atexit.register(self._drain_at_exit)

    def _worker(self):
        while True:
            job = self._q.get()
            try:
                self._process(job, drop_cache=self._q.empty())
            finally:
                self._q.task_done()

    def _process(self, job, drop_cache: bool):
        """One save; factored out of the thread loop for direct testing."""
        path, state, epoch, best, extra, include_opt = job
        try:
            if state is not self._cache_state:
                self._cache_host = jax.device_get(state)
                self._cache_state = state
            save_state(path, self._cache_host, epoch=epoch, best=best,
                       extra=extra, include_opt=include_opt)
        except Exception as e:  # surface without killing the loop
            print(f"Warning: async checkpoint save failed: {e}")
        finally:
            if drop_cache:
                # an epoch's save set arrives back-to-back, so the dedupe
                # only needs to live while the queue is non-empty; dropping
                # the refs frees the host copy (~1.3 GB for MiDaS) and lets
                # the device snapshot die with train.py's per-epoch memo
                # instead of pinning a second one across the epoch
                self._cache_state = None
                self._cache_host = None

    def save(self, path, state, epoch=0, best=float("inf"), extra=None,
             include_opt=True):
        self._q.put((path, state, epoch, best, extra, include_opt))

    def flush(self):
        self._q.join()

    def _drain_at_exit(self, deadline_s: float = 120.0):
        """Bounded drain: a save hung on broken storage must not wedge
        interpreter exit forever — wait up to ``deadline_s``, then report
        what is still pending and give up."""
        import time

        try:
            if not self._q.unfinished_tasks:
                return
            print("Draining in-flight checkpoint saves...")
            t0 = time.time()
            while self._q.unfinished_tasks and time.time() - t0 < deadline_s:
                time.sleep(0.1)
            if self._q.unfinished_tasks:
                print(f"Warning: {self._q.unfinished_tasks} checkpoint "
                      f"save(s) still pending after {deadline_s:.0f}s; "
                      "giving up (the checkpoint on disk may be stale)")
        except Exception:
            pass


def save_opt(logdir: str, opt) -> None:
    """Config snapshot (reference saves opt.pt + opt.txt, train.py:93-96)."""
    os.makedirs(logdir, exist_ok=True)
    d = {k: v for k, v in vars(opt).items() if not k.startswith("_")}
    with open(os.path.join(logdir, "opt.json"), "w") as f:
        json.dump(d, f, indent=1, default=str)
    with open(os.path.join(logdir, "opt.txt"), "w") as f:
        for k in sorted(d):
            f.write(f"{k}: {d[k]}\n")


def load_opt(logdir: str) -> Dict:
    with open(os.path.join(logdir, "opt.json")) as f:
        return json.load(f)


def resolve_resume(logdir: str, resume: int) -> Optional[str]:
    """Map the reference's resume convention (train.py:243-274) to a path:
    0 = fresh, -1 = last checkpoint, -2 = previous best, N = epoch N."""
    if resume == 0:
        return None
    if resume == -1:
        return os.path.join(logdir, "checkpoint.ckpt")
    if resume == -2:
        return os.path.join(logdir, "best.ckpt")
    return os.path.join(logdir, "nets", "%04d.ckpt" % resume)
