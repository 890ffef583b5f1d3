#!/usr/bin/env python
"""Multi-video fleet training CLI: optimize several videos in lockstep, one
video per chip (BASELINE config #5).

The single-video driver (train.py) mirrors the reference's UX; this driver
is the TPU-native scaling path the reference's DDP intended but never had:
V independent per-video optimizations execute as one jitted program over a
``video`` mesh axis (see parallel/multi_video.py).

Usage:
  python train_fleet.py --tracks dog,train,car --dataset davis_sequence \
      --epoch 20 --epoch_batches 2000 [same model flags as train.py]

``--dp D`` adds same-video data parallelism on a 2D (video x data) mesh:
each video's pair batch (``--batch_size``, a multiple of D) shards over D
chips with XLA-inserted gradient all-reduce (exact single-device numerics;
see parallel/multi_video.py MultiVideoDataParallel).

Per-step, all videos consume their own pair batch of the SAME frame gap
(gap buckets rotate across steps); per-video logs and checkpoints are
written under <logdir>/<track>/.
"""

import os
import sys
from os.path import join


def main():
    import jax

    if os.environ.get("DVD_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["DVD_PLATFORM"])
    # Persistent compilation cache: per-(gap, warm) step variants compile
    # once per machine, not once per process (remote compiles are minutes).
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR",
                                         os.path.expanduser("~/.cache/jax_dvd")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import numpy as np

    from dynamic_video_depth_tpu.data import get_dataset
    from dynamic_video_depth_tpu.models import get_model
    from dynamic_video_depth_tpu.parallel import MultiVideoOptimizer, make_mesh
    from dynamic_video_depth_tpu.parallel.multi_video import (
        tree_index,
        tree_stack,
    )
    from dynamic_video_depth_tpu.runtime import config as config_mod
    from dynamic_video_depth_tpu.runtime.checkpoint import save_opt, save_state
    from dynamic_video_depth_tpu.runtime.loggers import (
        ComposeLogger,
        CsvLogger,
        LogCumulator,
        ProgbarLogger,
        TerminateOnNaN,
    )

    # reuse the full train.py flag surface + fleet-specific flags
    argv = sys.argv[1:]
    extra = []
    tracks = None
    dp = 1
    i = 0
    while i < len(argv):
        if argv[i] == "--tracks":
            tracks = argv[i + 1].split(",")
            i += 2
        elif argv[i] == "--dp":
            dp = max(int(argv[i + 1]), 1)
            i += 2
        else:
            extra.append(argv[i])
            i += 1
    assert tracks, "--tracks a,b,c is required"
    if "--track_id" not in extra:
        extra += ["--track_id", tracks[0]]
    opt, _ = config_mod.parse(extra)

    n_videos = len(tracks)
    n_dev = len(jax.devices())
    assert n_videos * dp <= n_dev, (
        f"{n_videos} videos x dp {dp} > {n_dev} devices"
    )
    if dp > 1 and opt.batch_size % dp != 0:
        # no silent bump: a different effective batch changes the
        # optimization trajectory the user asked for
        sys.exit(
            f"--batch_size {opt.batch_size} must be a multiple of --dp {dp} "
            f"(each video's pair batch shards over the data axis); "
            f"pass e.g. --batch_size {dp}"
        )

    Model = get_model(opt.net)
    Dataset = get_dataset(opt.dataset)

    # per-track datasets + models (sharing one compiled step via the fleet)
    import copy

    models, datasets, vali_sets = [], [], []
    for t in tracks:
        o = copy.deepcopy(opt)
        o.track_id = t
        m = Model(o, None)
        models.append(m)
        datasets.append(Dataset(o, mode="train", model=m))
        vali_sets.append(Dataset(o, mode="vali", model=m))
    base = models[0]

    if dp > 1:
        # 2D mesh: V independent videos x same-video data parallelism.
        # Batches assemble on the host each step (the HBM-pinned
        # FleetBatchCache is single-device-per-video; acceptable here since
        # dp mode targets large per-step batches where compute dominates).
        from dynamic_video_depth_tpu.parallel import MultiVideoDataParallel

        mesh = make_mesh([("video", n_videos), ("data", dp)])
        fleet = MultiVideoDataParallel(base.step, mesh)
    else:
        mesh = make_mesh([("video", n_videos)])
        fleet = MultiVideoOptimizer(base.step, mesh)

    # init per-video states (pretrained load once, replicated)
    sample = datasets[0][0]
    base.init_from_sample(sample["img_1"], seed=opt.manual_seed or 0)
    states = fleet.broadcast_state(base.state, n_videos)

    logdir0 = opt.logdir or "./checkpoints/fleet"
    start_epoch = 1
    if opt.resume == -1:
        # resume every video from its per-track checkpoint when present
        from dynamic_video_depth_tpu.runtime.checkpoint import load_state

        loaded, epochs = [], []
        for t in tracks:
            p = join(logdir0, t, "checkpoint.ckpt")
            if os.path.isfile(p):
                st, meta = load_state(p, base.state)
                loaded.append(st)
                epochs.append(int(meta.get("epoch", 0)))
            else:
                loaded.append(jax.device_get(base.state))
                epochs.append(0)
        if any(epochs):
            states = jax.device_put(tree_stack(loaded),
                                    fleet.state_sharding())
            start_epoch = min(e for e in epochs) + 1
            print(f"Resumed fleet at epoch {start_epoch - 1}")

    logdir = opt.logdir or "./checkpoints/fleet"
    os.makedirs(logdir, exist_ok=True)
    save_opt(logdir, opt)

    cum = LogCumulator()
    logger = ComposeLogger([
        cum, ProgbarLogger(interval=opt.progbar_interval),
        CsvLogger(join(logdir, "epoch_loss.csv"), cum),
        TerminateOnNaN(),  # fleet means: NaN in any video aborts the run
    ])
    logger.set_params({"epochs": opt.epoch,
                       "steps": opt.epoch_batches or len(datasets[0])})
    logger.on_train_begin()

    rng = np.random.RandomState(opt.manual_seed or 0)
    # group files per gap so every lockstep call has one static gap
    from dynamic_video_depth_tpu.train.loop import (
        dispatch_with_retry,
        group_by_gap,
    )

    orders = [group_by_gap(ds.gap_of, len(ds.file_list)) for ds in datasets]
    gaps = sorted(set.intersection(*[set(o.keys()) for o in orders]))
    # gap sampled proportional to pair count, matching the reference's
    # concatenated per-gap file list (reference: datasets/davis_sequence.py:
    # 64-73 — a uniform draw over the union visits each gap in proportion)
    gap_counts = np.array(
        [sum(len(o[g]) for o in orders) for g in gaps], np.float64
    )
    gap_probs = gap_counts / gap_counts.sum()

    best_vali = [float("inf")] * n_videos
    if start_epoch > 1:
        # restore previous best so a resumed run can't overwrite best.ckpt
        # with a worse epoch (reference reloads prev_best, train.py:150-165)
        import json

        for vi, t in enumerate(tracks):
            meta_p = join(logdir, t, "best.ckpt.json")
            if os.path.isfile(meta_p):
                with open(meta_p) as f:
                    best_vali[vi] = float(json.load(f).get("best", "inf"))

    # HBM-resident per-video batch caches: steady-state steps assemble the
    # fleet batch from device shards with zero host traffic (1D fleet only;
    # dp mode shards each video's pair batch over its mesh row instead)
    from dynamic_video_depth_tpu.data.prefetch import (
        _HOST_KEYS_SKIP,
        FleetBatchCache,
    )

    train_cache = vali_cache = None
    if dp == 1:
        train_cache = FleetBatchCache(datasets, mesh)
        vali_cache = FleetBatchCache(vali_sets, mesh)
    bsz = opt.batch_size  # divisibility by dp enforced at startup

    warp_holder = {"max": 0}  # latched fused-warp exactness bound (dp path)

    def host_stacked(ds_list, idx_lists):
        """[V][B] sample indices -> host-stacked fleet batch [V, B, ...]
        (per-track scalars stay rank-1 [V])."""
        per_video, keys = [], None
        for vi, idxs in enumerate(idx_lists):
            samples = [ds_list[vi][i] for i in idxs]
            for smp in samples:
                if "warp_window" in smp:
                    warp_holder["max"] = max(warp_holder["max"],
                                             int(smp["warp_window"]))
            if keys is None:
                keys = [k for k in samples[0] if k not in _HOST_KEYS_SKIP]
            pv = {}
            for kk in keys:
                v0 = np.asarray(samples[0][kk])
                pv[kk] = (np.concatenate(
                    [np.asarray(s[kk]) for s in samples], 0)
                    if v0.ndim >= 1 else v0)
            per_video.append(pv)
        return {kk: np.stack([pv[kk] for pv in per_video]) for kk in keys}

    spd = max(int(getattr(opt, "steps_per_dispatch", 1) or 1), 1)
    if dp > 1 and spd > 1:
        print("--steps_per_dispatch is 1D-fleet-only; forcing 1 under --dp")
        spd = 1
    metric_keys = None

    def _flush_pending(entry, keys):
        """One-dispatch-behind async metric flush (fleet means per metric).
        ``packed`` is [V, n_metrics] (single step) or [V, K, n_metrics]
        (chunked scan: one log row per inner step)."""
        it0, packed = entry
        vals = np.asarray(packed)
        if vals.ndim == 2:
            vals = vals[:, None, :]
        for ki in range(vals.shape[1]):
            mean_logs = {mk: float(np.mean(vals[:, ki, mi]))
                         for mi, mk in enumerate(keys)}
            mean_logs["size"] = vals.shape[0]
            logger.on_batch_end(it0 + ki, mean_logs)

    def fleet_vali_and_checkpoint(epoch):
        """Lockstep per-video validation (masked disparity MSE, the
        reference's model-selection metric) + per-track history/checkpoints.
        ``states``/``best_vali`` are shared with the epoch loop."""
        nonlocal states
        n_vali = min(min(len(v) for v in vali_sets),
                     opt.vali_batches or 10**9)
        vali_losses = np.zeros(n_videos)
        for fi in range(n_vali):
            if dp > 1:
                # duplicate the frame across the data axis (mean over
                # identical frames == the single-frame loss)
                vb = host_stacked(vali_sets, [[fi] * dp] * n_videos)
                states, vb = fleet.place(states, vb)
            else:
                vb = vali_cache.stacked([fi] * n_videos)
            _, vlogs = fleet.vali_step(states, vb)
            vali_losses += np.asarray(vlogs["loss"]) / max(n_vali, 1)

        logger.on_epoch_end(epoch, {"loss": float(np.mean(vali_losses))})

        # per-video checkpoints + best-on-vali + per-track vali history
        host_states = jax.device_get(states)
        for vi, t in enumerate(tracks):
            state_i = tree_index(host_states, vi)
            os.makedirs(join(logdir, t), exist_ok=True)
            hist = join(logdir, t, "vali_loss.csv")
            new_file = not os.path.isfile(hist)
            with open(hist, "a") as f:
                if new_file:
                    f.write("epoch,vali_loss\n")
                f.write(f"{epoch},{float(vali_losses[vi]):.8g}\n")
            save_state(join(logdir, t, "checkpoint.ckpt"), state_i,
                       epoch=epoch, best=best_vali[vi])
            if vali_losses[vi] < best_vali[vi]:
                best_vali[vi] = float(vali_losses[vi])
                save_state(join(logdir, t, "best.ckpt"), state_i,
                           epoch=epoch, best=best_vali[vi])

    if getattr(opt, "vali_at_start", False):
        # init-model vali before training (reference: netinterface.py:
        # 348-352): logs an epoch start-1 row and seeds the per-track best
        e0 = max(start_epoch - 1, 0)
        logger.on_epoch_begin(e0)
        fleet_vali_and_checkpoint(e0)

    for epoch in range(start_epoch, opt.epoch + 1):
        warm = epoch <= getattr(opt, "warm_sf", 0)
        logger.on_epoch_begin(epoch)
        n_steps = opt.epoch_batches or min(len(d) for d in datasets)
        it_ = 0
        pending = None
        while it_ < n_steps:
            gap = gaps[rng.choice(len(gaps), p=gap_probs)]
            euler_steps = int(round(gap / datasets[0].unit))
            k = min(spd, n_steps - it_)
            if k > 1:
                # K same-gap lockstep steps in ONE dispatch (lax.scan)
                idx_lists = [
                    [orders[vi][gap][rng.randint(len(orders[vi][gap]))]
                     for vi in range(n_videos)]
                    for _ in range(k)
                ]
                chunk = train_cache.stacked_chunk(idx_lists)
                states, packed = dispatch_with_retry(
                    lambda: fleet.train_step_scan(
                        states, chunk, steps=euler_steps, warm=warm,
                        full_warp=base._full_warp(
                            train_cache.max_warp_window or None)),
                    f"fleet scan dispatch (epoch {epoch})")
                if metric_keys is None:
                    metric_keys = sorted(base.metrics_packed)
                # fetched ONE DISPATCH BEHIND like the k=1 path: a sync
                # read here would give back part of the latency the scan
                # amortizes (CLAUDE.md: keep host syncs out of the hot loop)
                try:
                    packed.copy_to_host_async()
                except AttributeError:
                    pass
                if pending is not None:
                    _flush_pending(pending, metric_keys)
                pending = (it_, packed)
            else:
                if dp > 1:
                    idx_lists = [
                        [orders[vi][gap][rng.randint(len(orders[vi][gap]))]
                         for _ in range(bsz)]
                        for vi in range(n_videos)
                    ]
                    stacked = host_stacked(datasets, idx_lists)
                    states, stacked = fleet.place(states, stacked)
                    fw = base._full_warp(warp_holder["max"] or None)
                else:
                    idxs = [orders[vi][gap][rng.randint(len(orders[vi][gap]))]
                            for vi in range(n_videos)]
                    stacked = train_cache.stacked(idxs)
                    fw = base._full_warp(train_cache.max_warp_window or None)
                states, logs = dispatch_with_retry(
                    lambda: fleet.train_step(states, stacked,
                                             steps=euler_steps, warm=warm,
                                             full_warp=fw),
                    f"fleet step (epoch {epoch})")
                if metric_keys is None:
                    metric_keys = sorted(base.metrics_packed)
                # metrics fetched ONE STEP BEHIND: a synchronous read here
                # would stall the dispatch queue on a device roundtrip every
                # step (same pattern as the single-video loop)
                packed = logs["_packed"]
                try:
                    packed.copy_to_host_async()
                except AttributeError:
                    pass
                if pending is not None:
                    _flush_pending(pending, metric_keys)
                pending = (it_, packed)
            it_ += k
        if pending is not None:
            _flush_pending(pending, metric_keys)
            pending = None
        fleet_vali_and_checkpoint(epoch)
    logger.on_train_end()
    print(f"fleet of {n_videos} videos done; checkpoints under {logdir}/<track>/")


if __name__ == "__main__":
    main()
