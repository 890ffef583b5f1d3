#!/usr/bin/env python
"""Inference / rendering CLI (reference: test.py + models/video_base.py:128-272).

Rehydrates the training options from the checkpoint dir, runs the refined
depth net over every frame of the track, dumps per-frame npz + PNGs, then
renders comparison videos (refined vs initial vs GT inverse depth), temporal
slice panels, and an HTML report. ffmpeg is used when present.
"""

import os
import sys
from argparse import Namespace
from os.path import dirname, join
from subprocess import call


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
    from dynamic_video_depth_tpu.runtime import config as config_mod
    from dynamic_video_depth_tpu.runtime.checkpoint import load_opt, load_state
    from dynamic_video_depth_tpu.train.losses import disparity_vali_loss
    from dynamic_video_depth_tpu.utils.html import Webpage
    from dynamic_video_depth_tpu.utils.visualizer import HTMLVisualizer

    opt_test = config_mod.parse_test()

    ckpt_dir = opt_test.checkpoint_path
    if ckpt_dir.endswith(".ckpt"):
        ckpt_file, ckpt_dir = ckpt_dir, dirname(ckpt_dir)
    else:
        name = "best.ckpt" if opt_test.epoch < 0 else join("nets", "%04d.ckpt" % opt_test.epoch)
        ckpt_file = join(ckpt_dir, name)

    opt_train = Namespace(**load_opt(ckpt_dir))
    if opt_test.data_root:
        opt_train.data_root = opt_test.data_root
    # template-compat validation: the reference's test_cmd.txt passes
    # --net/--dataset explicitly; we rehydrate them from the checkpoint's
    # opt.json — warn if the caller's values disagree (wrong checkpoint?)
    for k in ("net", "dataset"):
        v = getattr(opt_test, k, None)
        if v and v != getattr(opt_train, k, v):
            print(f"Warning: --{k} {v} differs from the checkpoint's "
                  f"{getattr(opt_train, k)}; using the checkpoint's")

    Model = get_model(opt_train.net)
    model = Model(opt_train, None)
    Dataset = get_dataset(opt_train.dataset)
    dataset = Dataset(opt_train, mode="vali", model=model)
    assert len(dataset) > 0, "no validation frames found"

    sample = dataset[0]
    model.init_from_sample(sample["img"], seed=0)
    state, meta = load_state(ckpt_file, model.state)
    model.state = state
    print(f"Loaded {ckpt_file} (epoch {meta.get('epoch', '?')})")

    epoch_string = "best" if opt_test.epoch < 0 else "%04d" % opt_test.epoch
    outdir = join(opt_test.output_dir, f"epoch{epoch_string}_test")
    if os.path.isdir(outdir) and os.listdir(outdir):
        # reference refuses to clobber an existing epoch render set unless
        # --overwrite (reference: test.py:55-60)
        if opt_test.overwrite:
            import shutil

            shutil.rmtree(outdir)
        else:
            sys.exit(f"{outdir} already exists; pass --overwrite to replace")
    os.makedirs(outdir, exist_ok=True)
    visualizer = HTMLVisualizer(n_workers=opt_test.vis_workers)

    # ------------------------------------------------------------- inference
    # With --n_chips > 1, frames batch across a 'data' mesh axis: each chip
    # runs the refined depth net on its frame slice (params replicated) —
    # the inference analog of the fleet training / sharded preprocessing
    # strategies. Per-frame outputs and artifacts are identical.
    n_par = max(1, getattr(opt_test, "n_chips", 1))
    predict_block = None
    if n_par > 1:
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from dynamic_video_depth_tpu.parallel.mesh import make_mesh

        mesh = make_mesh([("data", n_par)])
        shard = NamedSharding(mesh, P("data"))

        def predict_block(group):
            n = len(group)
            padded = group + [group[-1]] * ((-n) % n_par)
            stacked = {}
            for k in group[0]:
                v0 = np.asarray(padded[0][k])
                if v0.ndim >= 1 and v0.shape[0] == 1:
                    arr = np.concatenate([np.asarray(b[k]) for b in padded], 0)
                    stacked[k] = jax.device_put(jnp.asarray(arr), shard)
                else:  # per-track scalars (time_step)
                    stacked[k] = jnp.asarray(v0)
            pred = model.step.predict(model.state, stacked)
            return [
                {kk: np.asarray(vv[j:j + 1]) for kk, vv in pred.items()}
                for j in range(n)
            ]

    depth_pred, depth_nn, depth_gt, imgs = [], [], [], []
    test_loss = 0.0
    for lo in range(0, len(dataset), n_par):
        idxs = list(range(lo, min(lo + n_par, len(dataset))))
        group = [dataset[i] for i in idxs]
        devs = [{k: v for k, v in b.items() if k != "pair_path"}
                for b in group]
        if predict_block is not None:
            preds = predict_block(devs)
        else:
            preds = [model.test_on_batch(idxs[0], devs[0])]
        for i, batch, pred in zip(idxs, group, preds):
            test_loss += float(
                disparity_vali_loss(pred["depth"], batch["depth_mvs"])
            )
            # Full reference test-dump schema (reference: pack_output,
            # models/video_base.py:105-126 + test_on_batch :128-155): the
            # prediction dict (depth, sf_1_2) plus imgs, init depth, "gt"
            # depth, camera pose/intrinsics and the source path.
            pack = {
                "batch_size": np.asarray([1]),
                "img_1": batch["img"], "img_2": batch["img"],
                "depth": np.asarray(pred["depth"]),
                "sf_1_2": np.asarray(pred["sf_1_2"]),
                "depth_nn": batch["depth_pred"],
                "depth_gt": batch["depth_mvs"],
                "cam_c2w": batch["cam_c2w"], "K": batch["K"],
                "pair_path": np.asarray(batch["pair_path"]),
            }
            np.savez(join(outdir, "batch%04d" % i), **pack)
            visualizer.visualize(pack, i, outdir)
            depth_pred.append(pred["depth"][0])
            depth_nn.append(batch["depth_pred"][0])
            depth_gt.append(batch["depth_mvs"][0])
            imgs.append(batch["img"][0])
    visualizer.flush()
    test_loss /= max(len(dataset), 1)
    print(f"disparity loss vs init: {test_loss:.6g}")

    from dynamic_video_depth_tpu.utils.metrics import depth_metrics

    metrics = depth_metrics(np.stack(depth_pred), np.stack(depth_gt))
    print("depth metrics vs gt:",
          " ".join(f"{k}={v:.4g}" for k, v in metrics.items()))

    # ------------------------------------------------- comparison rendering
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    depth_pred = np.stack(depth_pred)
    depth_nn = np.stack(depth_nn)
    depth_gt = np.stack(depth_gt)
    imgs = np.stack(imgs)
    pred_min, pred_max = depth_pred.min(), depth_pred.max()
    mask_valid = np.where(depth_gt > 1e-8, 1.0, 0.0)

    def colorbar_panel(ax, im):
        cbar = plt.colorbar(im, ax=ax, fraction=0.048 * 0.5, pad=0.01)
        cbar.ax.yaxis.set_tick_params(color="w", labelsize=10)
        plt.setp(plt.getp(cbar.ax.axes, "yticklabels"), color="w")

    for i in range(depth_pred.shape[0]):
        fig, axes = plt.subplots(1, 3, figsize=(15, 5), facecolor="black")
        panels = [
            ("Refined", 1.0 / depth_pred[i]),
            ("Initial", 1.0 / depth_nn[i]),
            ("GT", mask_valid[i] / (depth_gt[i] + 1e-8)),
        ]
        for ax, (title, data) in zip(axes, panels):
            im = ax.imshow(data, cmap="turbo",
                           vmax=1.0 / pred_min, vmin=1.0 / pred_max)
            ax.set_title(title, color="w")
            ax.axis("off")
            colorbar_panel(ax, im)
        fig.savefig(join(outdir, "compare_%04d.png" % i),
                    bbox_inches="tight", facecolor="black")
        plt.close(fig)

        plt.imshow(np.clip(imgs[i], 0, 1))
        plt.axis("off")
        plt.savefig(join(outdir, "rgb_%04d.png" % i),
                    bbox_inches="tight", facecolor="black")
        plt.close()

    # temporal slices (reference rows 120..139 scaled to our height)
    h = depth_pred.shape[1]
    rows = range(min(120, h - 21), min(140, h - 1))
    for ridx, r in enumerate(rows):
        fig, axes = plt.subplots(1, 2, figsize=(12, 4), facecolor="black")
        for ax, (title, data) in zip(
            axes,
            [("Refined", 1.0 / depth_pred[:, r, :]),
             ("Initial", 1.0 / depth_nn[:, r, :])],
        ):
            im = ax.imshow(data, cmap="turbo")
            ax.set_title(title, color="w")
            ax.axis("off")
            colorbar_panel(ax, im)
        fig.savefig(join(outdir, "temporal_slice_%04d.png" % ridx),
                    bbox_inches="tight", facecolor="black")
        plt.close(fig)

    # --------------------------------------------------------------- videos
    vid = join(dirname(outdir), f"epoch{epoch_string}_test.mp4")
    vid_t = join(dirname(outdir), f"epoch{epoch_string}_test_temporal.mp4")
    ffmpeg_tpl = (
        'ffmpeg -y -r {rate} -i {tpl} -vcodec libx264 -crf 25 -pix_fmt yuv420p'
        ' -vf "pad=ceil(iw/2)*2:ceil(ih/2)*2" {out} > /dev/null 2>&1'
    )
    if os.system("which ffmpeg > /dev/null 2>&1") == 0:
        call(ffmpeg_tpl.format(rate=30, tpl=join(outdir, "compare_%04d.png"),
                               out=vid), shell=True)
        call(ffmpeg_tpl.format(rate=2, tpl=join(outdir, "temporal_slice_%04d.png"),
                               out=vid_t), shell=True)

    web = Webpage()
    web.add_video(os.path.basename(vid), title=f"Disparity loss {test_loss:.6g}")
    web.add_video(os.path.basename(vid_t), title="temporal slices")
    web.save(join(dirname(outdir), f"epoch{epoch_string}_test.html"))
    print(f"Wrote results to {outdir}")


if __name__ == "__main__":
    main()
