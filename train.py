#!/usr/bin/env python
"""Training CLI (reference: train.py).

Same UX as the reference driver: two-phase option parsing, templated logdir,
resume -1/-2/N, per-epoch checkpoints + best-on-vali, optional chained test
run via --test_template. TPU-native internals: one jitted step, background
host loading, device prefetch.

Example (canonical DAVIS recipe, reference experiments/davis/train_sequence.sh):
  python train.py --net scene_flow_motion_field --dataset davis_sequence \
      --track_id dog --log_time --epoch_batches 2000 --epoch 20 \
      --lr 1e-6 --html_logger --vali_batches 150 --batch_size 1 \
      --optim adam --vis_batches_vali 4 --vis_every_vali 1 \
      --vis_every_train 1 --vis_batches_train 5 --n_vis_butterfly 512 \
      --logdir ./checkpoints/davis --suffix track_{track_id} \
      --force_overwrite --test_template experiments/davis/test_cmd.txt \
      --scene_lr_mul 1000 --warm_sf 5 --acc_mul 1 --disp_mul 1 \
      --flow_mul 1 --sf_mag_div 100 --time_dependent \
      --gaps 1,2,4,6,8 --midas --use_disp
"""

import os
import sys
from os.path import join


def main():
    # Precision policy: geometry ops pin f32 explicitly (ops/geometry.py);
    # convs run at the backend default, opt into bf16 activations via
    # --mixed_precision_training or force full f32 via --full_precision.
    import jax
    # The environment's sitecustomize force-selects the TPU platform; honor
    # an explicit override (e.g. DVD_PLATFORM=cpu for smoke runs).
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


    from dynamic_video_depth_tpu.data import get_dataset
    from dynamic_video_depth_tpu.models import get_model
    from dynamic_video_depth_tpu.runtime import config as config_mod
    from dynamic_video_depth_tpu.runtime.checkpoint import (
        load_opt,
        load_state,
        resolve_resume,
        save_opt,
        save_state,
    )
    from dynamic_video_depth_tpu.runtime.loggers import (
        BatchCsvLogger,
        ComposeLogger,
        CsvLogger,
        HtmlLogger,
        LogCumulator,
        ModelSaveLogger,
        ProgbarLogger,
        TensorBoardLogger,
        TerminateOnNaN,
    )
    from dynamic_video_depth_tpu.train.loop import Trainer

    opt, unique_params = config_mod.parse()
    if (opt.multiprocess_distributed or opt.world_size != 1
            or opt.node_rank != 0 or opt.init_url):
        # the reference's torch-DDP plumbing (reference: train.py:111-139);
        # on TPU, scaling is mesh sharding — don't let these silently no-op
        print("Warning: torch-DDP flags (--multiprocess_distributed/"
              "--world_size/--node_rank/--init_url) have no effect on the "
              "TPU runtime; use --n_chips for sharded surfaces or "
              "train_fleet.py --tracks a,b,... [--dp D] for multi-video "
              "fleets (mesh collectives replace the NCCL process group)")
    if opt.manual_seed is not None:
        from dynamic_video_depth_tpu.utils.printing import set_manual_seed

        set_manual_seed(opt.manual_seed)

    # ---------------------------------------------------------------- logdir
    exprdir = config_mod.exprdir_name(opt)
    if opt.full_logdir is None:
        base = opt.logdir or "./checkpoints"
        opt.full_logdir = join(base, exprdir, str(opt.expr_id))
    if opt.resume == 0 and os.path.isfile(join(opt.full_logdir,
                                               "checkpoint.ckpt")):
        # fresh run into a directory holding a previous run (reference
        # prompts / refuses, train.py:51-77; non-interactive here: remove
        # with --force_overwrite, otherwise refuse)
        if opt.force_overwrite:
            import shutil

            print(f"Warning: removing previous experiment at "
                  f"{opt.full_logdir} (--force_overwrite)")
            shutil.rmtree(opt.full_logdir)
        else:
            sys.exit(
                f"Refusing to overwrite the existing experiment at "
                f"{opt.full_logdir}; pass --force_overwrite to replace it "
                f"or --resume -1 to continue it"
            )
    os.makedirs(opt.full_logdir, exist_ok=True)
    os.makedirs(join(opt.full_logdir, "nets"), exist_ok=True)

    resume_path = resolve_resume(opt.full_logdir, opt.resume)
    if opt.resume != 0 and os.path.isfile(join(opt.full_logdir, "opt.json")):
        opt = config_mod.overwrite(opt, load_opt(opt.full_logdir), unique_params)
    if opt.pt_no_overwrite and os.path.isfile(join(opt.full_logdir, "opt.json")):
        # on-the-fly eval: keep the original run's saved options intact
        # (reference: train.py:89-96)
        print("Warning: --pt_no_overwrite set, keeping existing opt.json")
    else:
        save_opt(opt.full_logdir, opt)
    # set AFTER the resume-overwrite so a resumed run keeps the precision it
    # was trained with even when the flag is not re-typed
    if getattr(opt, "full_precision", False):
        jax.config.update("jax_default_matmul_precision", "highest")

    # ---------------------------------------------------------------- logger
    cumulator = LogCumulator()
    loggers = [
        cumulator,
        ProgbarLogger(interval=opt.progbar_interval, no_accum=opt.no_accum),
        CsvLogger(join(opt.full_logdir, "epoch_loss.csv"), cumulator),
        TerminateOnNaN(),
    ]
    if opt.log_batch:
        loggers.append(BatchCsvLogger(join(opt.full_logdir, "batch_loss.csv")))
    if opt.tensorboard:
        loggers.append(
            TensorBoardLogger(
                config_mod.tensorboard_logdir(opt, exprdir), cumulator
            )
        )
    if opt.html_logger:
        loggers.append(HtmlLogger(join(opt.full_logdir, "html"), cumulator))
    logger = ComposeLogger(loggers)

    # ----------------------------------------------------------------- model
    Model = get_model(opt.net)
    model = Model(opt, logger)

    Dataset = get_dataset(opt.dataset)
    dataset_train = Dataset(opt, mode="train", model=model)
    dataset_vali = Dataset(opt, mode="vali", model=model)
    print(f"#train files: {len(dataset_train)}  #vali frames: {len(dataset_vali)}")

    sample = dataset_train[0]
    model.init_from_sample(sample["img_1"], seed=opt.manual_seed or 0)
    if opt.print_net:
        for name, n in model.count_params().items():
            print(f"{name}: {n / 1e6:.2f}M params")

    start_epoch = 1
    if resume_path and os.path.isfile(resume_path):
        state, meta = load_state(resume_path, model.state)
        model.state = state
        start_epoch = int(meta.get("epoch", 0)) + 1
        print(f"Resumed from {resume_path} at epoch {start_epoch - 1}")
    elif getattr(opt, "load_reference_ckpt", ""):
        # mid-run migration from the reference implementation: weights, BN
        # stats, and Adam moments import so the next step continues the
        # torch optimization exactly (runtime/migrate.py)
        from dynamic_video_depth_tpu.runtime.migrate import (
            import_reference_checkpoint,
        )

        model.state, extras = import_reference_checkpoint(
            opt.load_reference_ckpt, model.step, model.state
        )
        start_epoch = int(extras.get("epoch", 0)) + 1
        print(f"Imported reference checkpoint {opt.load_reference_ckpt} "
              f"(epoch {start_epoch - 1}); continuing at {start_epoch}")

    # ----------------------------------------------------------- checkpoints
    from dynamic_video_depth_tpu.runtime.checkpoint import AsyncSaver

    saver = AsyncSaver()
    # one-dispatch device-side copy: the training step donates its input
    # state buffers, so the async writer must fetch from an undonated copy.
    # Snapshot ONCE per epoch — the end-of-epoch save set (checkpoint.ckpt
    # + best.ckpt + nets/%04d) reuses one device copy, and AsyncSaver
    # dedupes the host fetch by snapshot identity, so each epoch pays one
    # D2H of the state instead of three (round-5: the extra tunnel fetches
    # were ~half the steady-state epoch wall at batch 8)
    snapshot = jax.jit(lambda s: jax.tree.map(jax.numpy.copy, s))
    _snap = {"epoch": None, "dev": None}

    def save_fn(path, epoch=0, best=float("inf"), include_opt=True):
        if _snap["epoch"] != epoch:
            _snap["dev"] = snapshot(model.state)
            _snap["epoch"] = epoch
        saver.save(path, _snap["dev"], epoch=epoch, best=best,
                   include_opt=include_opt)

    # one shared best value: periodic sidecars record it, and on resume the
    # previous best is restored from best.ckpt.json so the first resumed
    # epoch can't overwrite best.ckpt with a worse model (reference reloads
    # prev_best from best.pt, reference train.py:150-165)
    best_holder = {"best": float("inf")}
    if start_epoch > 1:
        best_meta = join(opt.full_logdir, "best.ckpt.json")
        if os.path.isfile(best_meta):
            import json

            with open(best_meta) as f:
                best_holder["best"] = float(json.load(f).get("best", "inf"))
            print(f"Restored best vali loss {best_holder['best']:.6g}")

    logger.add_logger(
        ModelSaveLogger(save_fn, join(opt.full_logdir, "checkpoint.ckpt"),
                        period=max(getattr(opt, "save_every", 1), 1),
                        cumulator=cumulator, best_holder=best_holder)
    )
    if opt.save_net > 0:
        # periodic net history without optimizer state unless
        # --save_net_opt (reference: train.py:177-180, save_optimizer flag)
        def save_net_fn(path, epoch=0, best=float("inf")):
            save_fn(path, epoch=epoch, best=best,
                    include_opt=opt.save_net_opt)

        logger.add_logger(
            ModelSaveLogger(save_net_fn,
                            join(opt.full_logdir, "nets", "%04d.ckpt"),
                            period=opt.save_net, cumulator=cumulator,
                            best_holder=best_holder)
        )
    best_saver = ModelSaveLogger(
        save_fn, join(opt.full_logdir, "best.ckpt"), save_best_only=True,
        cumulator=cumulator, best_holder=best_holder,
    )
    logger.add_logger(best_saver)

    # --------------------------------------------------------- visualization
    from dynamic_video_depth_tpu.utils.visualizer import HTMLVisualizer
    import numpy as np

    visualizer = HTMLVisualizer(n_workers=opt.vis_workers)

    from dynamic_video_depth_tpu.train.loop import vis_index

    # Visualization is fetched + rendered OFF the step loop: the gated
    # batches' device->host image fetch (~tens of MB through the tunnel)
    # plus PNG/npz writes measured ~45 s per epoch inline (round 5) — more
    # than the 250-step batch-8 epoch itself. The loop thread only runs the
    # vis forward (an async dispatch) and enqueues device refs; this worker
    # does the np conversion (the D2H), the PNG pool handoff, and the npz
    # write. Queue holds a whole epoch's vis set; back-pressure only if
    # rendering falls a full epoch behind.
    import queue as _queue
    import threading as _threading

    _vis_q = _queue.Queue(maxsize=24)

    def _vis_worker():
        while True:
            job = _vis_q.get()
            try:
                pred, dev_batch, outdir, key_idx, batch_idx = job
                pred = {k: np.asarray(v) for k, v in pred.items()}
                output = model.pack_output(pred, dev_batch)
                visualizer.visualize(output, key_idx, outdir)
                np.savez(join(outdir, "rank0000_batch%04d" % batch_idx),
                         **output)
            except Exception as e:
                print(f"Warning: async visualization failed: {e}")
            finally:
                _vis_q.task_done()

    _threading.Thread(target=_vis_worker, daemon=True).start()

    def visualize_fn(phase, epoch, batch_idx, dev_batch, host_batch,
                     n_steps=None):
        every = opt.vis_every_train if phase == "train" else opt.vis_every_vali
        if every <= 0 or epoch % every != 0:
            return
        if phase == "train":
            # reference gates the LAST vis_batches_train batches of the
            # epoch unless --vis_at_start (scene_flow_motion_field.py:216);
            # n_steps = the epoch's true batch count from the Trainer
            if n_steps is None:
                n_steps = opt.epoch_batches or len(dataset_train)
            idx = vis_index(batch_idx, n_steps, opt.vis_at_start)
            if idx > opt.vis_batches_train:
                return
            # windowed-warp batches the trainer escalated to the full-height
            # warp must visualize through the same exact path
            # device refs only — the worker does the D2H (as_numpy=False;
            # an inline fetch here stalls the step loop on the tunnel)
            pred = model.vis_on_batch(
                dev_batch, warp_window=host_batch.get("warp_window"),
                as_numpy=False)
        else:
            # vali always counts from the START (video_base.py:90)
            idx = batch_idx
            if batch_idx >= opt.vis_batches_vali:
                return
            pred = {k: np.asarray(v) for k, v in
                    (model.last_pred or {}).items()}
        outdir = join(opt.full_logdir, "visualize",
                      f"epoch{epoch:04d}_{phase}")
        os.makedirs(outdir, exist_ok=True)
        # reference keys the visualizer on the gate index but the npz dump
        # on the absolute batch index (scene_flow_motion_field.py:216-225,
        # video_base.py:98-100)
        _vis_q.put((pred, dev_batch, outdir, idx + 1000 * epoch, batch_idx))

    def _drain_vis(deadline_s: float = 300.0):
        """Bounded drain (same rationale as AsyncSaver._drain_at_exit): a
        vis job hung on a dead tunnel or broken storage must not wedge the
        run after training completed — warn and move on."""
        import time as _t

        t0 = _t.time()
        while _vis_q.unfinished_tasks and _t.time() - t0 < deadline_s:
            _t.sleep(0.1)
        if _vis_q.unfinished_tasks:
            print(f"Warning: {_vis_q.unfinished_tasks} visualization "
                  f"job(s) still pending after {deadline_s:.0f}s; "
                  "continuing (some epoch PNGs/npz may be missing)")

    # ------------------------------------------------------------------ train
    trainer = Trainer(model, dataset_train, dataset_vali, logger, opt,
                      visualize_fn=visualize_fn)
    trainer.train(start_epoch=start_epoch)
    save_every = max(getattr(opt, "save_every", 1), 1)
    if save_every > 1 and opt.epoch % save_every != 0:
        # the periodic logger gates on epoch % N == 0, so a final epoch off
        # the period would leave checkpoint.ckpt stale — always end the run
        # with the final state resumable
        save_fn(join(opt.full_logdir, "checkpoint.ckpt"), epoch=opt.epoch,
                best=best_holder["best"])
    _drain_vis()  # all queued fetches rendered before the PNG pool closes
    visualizer.close()
    saver.flush()

    # -------------------------------------------------- chained test template
    if opt.test_template and os.path.isfile(opt.test_template):
        with open(opt.test_template) as f:
            cmd = f.read().strip()
        cmd = cmd.format(net_file=join(opt.full_logdir, "best.ckpt"),
                         **vars(opt))
        # resolve 'python test.py' against this driver's location, not cwd
        here = os.path.dirname(os.path.abspath(__file__))
        cmd = cmd.replace(
            "python test.py", f'"{sys.executable}" "{join(here, "test.py")}"', 1
        )
        print("Running test command:", cmd)
        rc = os.system(cmd)
        if rc != 0:
            sys.exit(f"chained test command failed (rc={rc})")


if __name__ == "__main__":
    main()
