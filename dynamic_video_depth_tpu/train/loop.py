"""Epoch-driven training loop (reference: models/netinterface.py:193-360,
train.py:297-348).

The loop is a thin host-side shell around the jitted step: it shuffles file
orders, streams batches through the background loader + device prefetcher,
fires logger callbacks, and checkpoints. Device->host syncs happen only at
epoch boundaries (log aggregation) — per-batch logs are device scalars that
the cumulator converts lazily."""

from __future__ import annotations

import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..data.batches import collate_batches
from ..data.prefetch import BatchLoader, DeviceCache, DevicePrefetcher
from ..runtime.loggers import ComposeLogger, LogCumulator


def dispatch_with_retry(fn, what: str, retries: int = 2, wait_s: float = 20.0):
    """Retry a jitted dispatch whose first call may trigger a remote
    compile. This environment's compile service occasionally OOM-kills a
    compile (``HTTP 500 ... SIGKILL``) after many variants compiled in one
    process — which aborts an hours-long optimization at a variant
    boundary. Each variant compiles once (persistent cache), so a bounded
    retry re-enters the compile against a fresh helper. Only errors that
    look like the transient backend failure are retried; real errors
    propagate immediately.

    Donation caveat: the train steps donate their state buffers, which are
    only consumed once EXECUTION begins — a compile-stage failure (the case
    this guard exists for) leaves them intact and the retry is sound. If a
    transient error instead struck mid-execution, the retry re-dispatches
    already-deleted arrays; that artifact ("Array has been deleted") is
    detected and the ORIGINAL transient failure is raised so the real cause
    is never masked."""
    import time as _time

    last_transient = None
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as e:  # jax wraps backend errors opaquely
            msg = str(e)
            if last_transient is not None and "deleted" in msg.lower():
                # the failed attempt already consumed the donated inputs:
                # unrecoverable here — surface what actually went wrong
                raise last_transient
            transient = any(t in msg for t in (
                "remote_compile", "SIGKILL", "DEADLINE_EXCEEDED",
                "UNAVAILABLE"))
            if not transient or attempt == retries:
                raise
            last_transient = e
            print(f"Warning: {what} hit a transient backend error "
                  f"({msg.splitlines()[0][:140]}); retrying "
                  f"({attempt + 1}/{retries}) in {wait_s:.0f}s", flush=True)
            _time.sleep(wait_s)


def vis_index(batch_idx: int, n_steps: int, vis_at_start: bool) -> int:
    """Visualization gate index (reference: models/scene_flow_motion_field.py
    :216, models/video_base.py:52): by default the LAST ``vis_batches``
    batches of an epoch are visualized (index counts down from the end);
    --vis_at_start counts up from the first batch instead."""
    return batch_idx if vis_at_start else n_steps - batch_idx


def group_by_gap(gap_of, n: int):
    """Sample indices bucketed by frame gap (every lockstep/scan dispatch
    needs one static gap). Shared by the single-video chunk/group builders
    and the fleet driver."""
    by_gap = {}
    for i in range(n):
        by_gap.setdefault(gap_of(i), []).append(i)
    return by_gap


class _GroupedDataset:
    """Indexable view collating fixed groups of same-gap samples."""

    def __init__(self, ds, groups):
        self.ds = ds
        self.groups = groups

    def __len__(self):
        return len(self.groups)

    def __getitem__(self, gi: int):
        return collate_batches([self.ds[i] for i in self.groups[gi]])


class _ChunkedDataset:
    """Indexable view stacking K same-gap samples along a NEW leading axis
    for multi-step-per-dispatch training (leaves become ``[K, B, ...]``)."""

    def __init__(self, ds, chunks):
        self.ds = ds
        self.chunks = chunks

    def __len__(self):
        return len(self.chunks)

    def __getitem__(self, ci: int):
        from ..data.batches import SPECIAL_COLLATORS

        samples = [self.ds[i] for i in self.chunks[ci]]
        out = {}
        for k, v0 in samples[0].items():
            special = SPECIAL_COLLATORS.get(k)
            if special is not None:
                out[k] = special([s[k] for s in samples])
            elif k == "steps" or np.ndim(v0) == 0:
                out[k] = np.stack([np.asarray(s[k]) for s in samples]) \
                    if k == "time_step" else v0
            else:
                out[k] = np.stack([np.asarray(s[k]) for s in samples])
        return out


class Trainer:
    """Drives per-video optimization epochs.

    ``_LOG_PIPELINE_DEPTH``: how many steps the per-step metric fetch may
    trail the dispatch loop (see ``_train_epoch_body``).

    Device caching: per-video optimization reuses a small fixed set of pair
    batches for the whole 40k-step schedule, so converted batches are pinned
    in HBM after first touch (``--no_device_cache`` streams instead). With
    batching, the same-gap groups are a fixed partition whose order
    reshuffles per epoch (so cached group batches stay reusable)."""

    _LOG_PIPELINE_DEPTH = 16

    def __init__(self, model, dataset_train, dataset_vali, logger: ComposeLogger,
                 opt, visualize_fn=None):
        self.model = model
        self.dataset_train = dataset_train
        self.dataset_vali = dataset_vali
        self.logger = logger
        self.opt = opt
        self.cumulator = logger.get_logger(LogCumulator) or LogCumulator()
        self.visualize_fn = visualize_fn
        self.rng = np.random.RandomState(
            opt.manual_seed if opt.manual_seed is not None else 0
        )
        batch_size = max(getattr(opt, "batch_size", 1), 1)
        if batch_size > 1 and not getattr(opt, "no_batching", False):
            groups = self._fixed_groups(batch_size)
            self._train_source = _GroupedDataset(dataset_train, groups)
        else:
            self._train_source = dataset_train
        self.steps_per_dispatch = max(
            getattr(opt, "steps_per_dispatch", 1) or 1, 1
        )
        # --log_time adds per-batch wall timings to the logged metric set
        # (reference: options/options_train.py:56; its loop stamps
        # data_time/batch_time into every batch_log, netinterface.py:301-302)
        self.log_time = bool(getattr(opt, "log_time", False))
        if self.steps_per_dispatch > 1:
            chunks = self._fixed_chunks(self._train_source,
                                        self.steps_per_dispatch)
            self._train_source = _ChunkedDataset(self._train_source, chunks)
        self._use_device_cache = not getattr(opt, "no_device_cache", False)
        if self._use_device_cache:
            self._train_source = DeviceCache(self._train_source)
            if dataset_vali is not None:
                self.dataset_vali = DeviceCache(dataset_vali)

    def _fixed_chunks(self, source, k: int):
        """Fixed partition of same-gap sample indices into chunks of k."""
        if isinstance(source, _GroupedDataset):
            gap_of = lambda gi: source.ds.gap_of(source.groups[gi][0])
            n = len(source)
        else:
            gap_of = source.gap_of
            n = len(source.file_list)
        by_gap = group_by_gap(gap_of, n)
        chunks = []
        for gap, idxs in sorted(by_gap.items()):
            idxs = list(self.rng.permutation(idxs))
            # wrap so every sample appears; the last chunk reuses early
            # samples cyclically (a bucket may be SMALLER than k: short
            # videos with large gaps pack n-1-gap pairs)
            base, j = len(idxs), 0
            while len(idxs) % k:
                idxs.append(idxs[j % base])
                j += 1
            for j in range(0, len(idxs), k):
                chunks.append(tuple(idxs[j:j + k]))
        return chunks

    def _fixed_groups(self, batch_size: int):
        ds = self.dataset_train
        by_gap = group_by_gap(ds.gap_of, len(ds.file_list))
        groups = []
        for gap, idxs in sorted(by_gap.items()):
            idxs = list(self.rng.permutation(idxs))
            for k in range(0, len(idxs) - batch_size + 1, batch_size):
                groups.append(tuple(idxs[k:k + batch_size]))
        return groups

    def epoch_order(self, n: int, epoch_batches: Optional[int]):
        order = self.rng.permutation(n)
        if epoch_batches is not None:
            reps = int(np.ceil(epoch_batches / max(n, 1)))
            order = np.concatenate([self.rng.permutation(n) for _ in range(reps)])
            order = order[:epoch_batches]
        return order

    def train(self, start_epoch: int = 1):
        opt = self.opt
        self.logger.set_params({
            "epochs": opt.epoch,
            "steps": opt.epoch_batches or len(self.dataset_train),
        })
        self.logger.on_train_begin()
        if opt.vali_at_start:
            # validate BEFORE training and log it as epoch start-1
            # (reference: netinterface.py:348-352 fires the logger stack, so
            # the init model's vali loss lands in the CSV and seeds the
            # best checkpoint)
            e0 = max(start_epoch - 1, 0)
            self.logger.on_epoch_begin(e0)
            self.logger.on_epoch_end(e0, self._vali(e0))
        try:
            for epoch in range(start_epoch, opt.epoch + 1):
                t_epoch = time.time()
                self._train_one(epoch)
                t_train = time.time()
                vali_logs = self._vali(epoch)
                vali_logs = dict(vali_logs)
                t_vali = time.time()
                vali_logs["epoch_time"] = time.time() - t_epoch
                self.logger.on_epoch_end(epoch, vali_logs)
                if self.log_time:
                    print(f"[epoch {epoch} phases] train "
                          f"{t_train - t_epoch:.1f}s vali "
                          f"{t_vali - t_train:.1f}s epoch-end "
                          f"{time.time() - t_vali:.1f}s", flush=True)
        finally:
            self.logger.on_train_end()
        return self

    def _train_one(self, epoch: int):
        opt = self.opt
        warm = epoch <= getattr(opt, "warm_sf", 0)
        profile_dir = getattr(opt, "profile_dir", None)
        # profile the SECOND epoch when there is one: epoch 1 is dominated
        # by step-variant compiles, which on a remote-compile backend run
        # minutes inside the trace and swamp the timeline (hardware-verified
        # round 3: tracing works, but only once the step is compiled)
        profile_epoch = min(2, getattr(opt, "epoch", 1) or 1)
        if profile_dir and epoch == profile_epoch:
            from ..runtime.profiling import trace_if

            with trace_if(profile_dir, True):
                return self._train_epoch_body(epoch, warm)
        return self._train_epoch_body(epoch, warm)

    def _train_epoch_body(self, epoch: int, warm: bool):
        opt = self.opt
        self.logger.on_epoch_begin(epoch)
        source = self._train_source
        base = source.dataset if isinstance(source, DeviceCache) else source
        n = len(base)
        if self.steps_per_dispatch > 1:
            return self._train_epoch_chunked(epoch, warm, source, n)
        order = self.epoch_order(n, opt.epoch_batches)
        t_data = time.time()
        # Per-step metrics are fetched ``_LOG_PIPELINE_DEPTH`` steps behind
        # via async host copies: a synchronous read per scalar would stall
        # the dispatch queue on a device roundtrip, and even a depth-1
        # pipeline pays one tunnel fetch latency PER STEP when the backend
        # cannot overlap the host copy (measured round 5: ~0.2 s/step on a
        # congested window — more than the step itself). Metrics (progbar,
        # CSV, the NaN guard) trail the device by up to this many steps.
        pending = []
        for i, (idx, dev, host) in enumerate(self._iter_batches(source, order)):
            data_time = time.time() - t_data
            t_step = time.time()
            logs = dispatch_with_retry(
                lambda: self.model.train_on_batch(
                    epoch, i, dev, warm=warm, steps=host.get("steps"),
                    warp_window=host.get("warp_window")),
                f"train step (epoch {epoch}, batch {i})")
            packed = logs.pop("_packed", None)
            if packed is not None:
                try:
                    packed.copy_to_host_async()
                except AttributeError:
                    pass
                # batch_time = host dispatch wall time (the device result is
                # fetched async several steps behind, so this measures the
                # step loop's real cost, not a forced sync)
                pending.append(
                    (i, packed, sorted(k for k in logs if k != "size"),
                     logs["size"], data_time, time.time() - t_step))
                if len(pending) > self._LOG_PIPELINE_DEPTH:
                    self._flush_logs(pending.pop(0))
            else:
                logs["data_time"] = data_time
                if self.log_time:
                    logs["batch_time"] = time.time() - t_step
                self.logger.on_batch_end(i, logs)
            if self.visualize_fn is not None:
                self.visualize_fn("train", epoch, i, dev, host,
                                  n_steps=len(order))
            t_data = time.time()
        for entry in pending:
            self._flush_logs(entry)

    def _train_epoch_chunked(self, epoch: int, warm: bool, source, n: int):
        """Multi-step-per-dispatch epoch: each iteration runs K optimization
        steps inside one jitted lax.scan call."""
        opt = self.opt
        k = self.steps_per_dispatch
        n_chunks = ((opt.epoch_batches + k - 1) // k
                    if opt.epoch_batches else n)
        order = self.epoch_order(n, n_chunks)
        pending = None
        step_idx = 0
        t_data = time.time()
        for ci, (idx, dev, host) in enumerate(
            self._iter_batches(source, order)
        ):
            data_time = time.time() - t_data
            t_step = time.time()
            packed = dispatch_with_retry(
                lambda: self.model.train_on_chunk(
                    epoch, dev, steps=host.get("steps", 1), warm=warm,
                    warp_window=host.get("warp_window")),
                f"chunked train dispatch (epoch {epoch})")
            try:
                packed.copy_to_host_async()
            except AttributeError:
                pass
            keys = sorted(self.model.metrics_packed)
            size = int(dev["img_1"].shape[1])
            entry = (step_idx, packed, keys, size, data_time, k,
                     time.time() - t_step)
            if pending is not None:
                self._flush_chunk_logs(pending)
            pending = entry
            step_idx += k
            t_data = time.time()
        if pending is not None:
            self._flush_chunk_logs(pending)

    def _flush_chunk_logs(self, entry):
        start, packed, keys, size, data_time, k, batch_time = entry
        vals = np.asarray(packed)  # [K, n_metrics]
        for j in range(vals.shape[0]):
            logs = dict(zip(keys, vals[j]))
            logs["size"] = size
            logs["data_time"] = data_time if j == 0 else 0.0
            if self.log_time:
                logs["batch_time"] = batch_time / max(vals.shape[0], 1)
            self._watch_dead_mask(logs)
            self.logger.on_batch_end(start + j, logs)

    def _flush_logs(self, entry):
        i, packed, keys, size, data_time, batch_time = entry
        vals = np.asarray(packed)
        logs = dict(zip(keys, vals))
        logs["size"] = size
        logs["data_time"] = data_time
        if self.log_time:
            logs["batch_time"] = batch_time
        self._watch_dead_mask(logs)
        self.logger.on_batch_end(i, logs)

    def _watch_dead_mask(self, logs):
        """A training loss of EXACTLY zero means the occlusion x far-field
        mask has zero mass everywhere (with --midas this happens whenever the
        depth net is random-init: depth = 10000/clamp(x, 1e-2) ~ 1e6 > 100,
        the far-field cutoff) — no gradient flows and the run can never
        recover. The reference cannot hit this (it unconditionally loads the
        pretrained checkpoint); warn loudly once instead of burning hours."""
        if getattr(self, "_dead_mask_warned", False):
            return
        if logs.get("loss", 1.0) == 0.0 and logs.get("flow_loss_1_2", 1.0) == 0.0:
            self._dead_mask_warned = True
            print(
                "WARNING: training loss is exactly 0 — the occlusion/far-"
                "field mask has zero mass (random-init MiDaS depth > 100 "
                "everywhere?). Training cannot make progress; load the "
                "pretrained depth checkpoint (scripts/download_data_and_"
                "depth_ckpt.sh) or use --depth_net tiny for smoke runs.",
                flush=True,
            )

    @staticmethod
    def _iter_batches(source, order):
        """Yield (idx, device_batch, host_extras). Device-cached sources put
        batches on device inside the background loader thread; streaming
        sources go through the one-ahead prefetcher."""
        from ..data.prefetch import split_host_device

        if isinstance(source, DeviceCache):
            for idx, batch in BatchLoader(source, order):
                dev, host = split_host_device(batch)
                yield idx, dev, host
        else:
            yield from DevicePrefetcher(iter(BatchLoader(source, order)))

    def _vali(self, epoch: int):
        opt = self.opt
        if self.dataset_vali is None or len(self.dataset_vali) == 0:
            return {}
        n = len(self.dataset_vali)
        if opt.vali_batches is not None:
            n = min(n, opt.vali_batches)
        losses, sizes = [], []
        for idx, dev, host in self._iter_batches(self.dataset_vali, range(n)):
            logs = self.model.vali_on_batch(epoch, idx, dev)
            # keep the per-frame loss ON DEVICE: a float() here would block
            # on a device roundtrip per frame, and on a tunneled backend
            # those serial syncs cost more than the vali compute itself
            losses.append(logs["loss"])
            sizes.append(int(logs.get("size", 1)))
            if self.visualize_fn is not None:
                self.visualize_fn("vali", epoch, idx, dev, host, n_steps=n)
        total = max(sum(sizes), 1)
        losses = np.asarray(jnp.stack([jnp.asarray(x) for x in losses]),
                            dtype=np.float64)
        loss = float(np.sum(losses * np.asarray(sizes)) / total)
        return {"loss": loss, "size": total}
