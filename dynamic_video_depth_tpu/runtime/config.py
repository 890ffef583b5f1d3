"""Layered CLI config (reference: options/options_train.py, options_test.py).

Same knob names and two-phase parse: general args first, then the chosen
model's and dataset's ``add_arguments`` are injected and the full command
line re-parsed. ``unique_params`` are preserved across resume-overwrite
(reference: options/options_train.py:150-162).
"""

from __future__ import annotations

import argparse
import sys
from typing import Optional, Sequence


def add_general_arguments(parser: argparse.ArgumentParser):
    unique_params = {
        "gpu", "resume", "epoch", "workers", "batch_size", "save_net",
        "save_every",
        "epoch_batches", "logdir", "full_logdir", "vis_batches_vali",
        "vali_batches", "vali_at_start", "vis_every_vali", "pt_no_overwrite",
        # TPU-runtime execution knobs (not model-defining, numerics-
        # neutral): a resumed run honors the freshly typed values, not the
        # saved ones. Precision flags stay OUT of this set: they change
        # numerics, so resume preserves the original run's choice.
        "profile_dir", "steps_per_dispatch", "no_device_cache",
        "remat_depth", "n_chips", "load_reference_ckpt", "test_template",
    }
    a = parser.add_argument
    a("--gpu", default="none", type=str,
      help="device selection (kept for CLI parity; JAX picks the TPU)")
    a("--manual_seed", type=int, default=None, help="manual seed")
    a("--resume", type=int, default=0,
      help="0 scratch; -1 last; -2 best; N epoch N")
    a("--load_reference_ckpt", type=str, default="",
      help="import a reference-implementation training checkpoint "
           "(checkpoint.pt/best.pt: nets + Adam moments) and continue "
           "optimizing from it")
    a("--suffix", default="", type=str,
      help="logdir suffix formatted with opt vars, e.g. '{track_id}_lr{lr}'")
    a("--epoch", type=int, default=0, help="number of epochs to train")
    a("--force_overwrite", action="store_true")
    # Dataset IO
    a("--dataset", type=str, required=True)
    a("--data_root", type=str, default=None,
      help="override the dataset's default datafiles root")
    a("--workers", type=int, default=4)
    a("--batch_size", type=int, default=16)
    a("--no_batching", action="store_true")
    a("--epoch_batches", default=None, type=int)
    a("--vali_batches", default=None, type=int)
    a("--vali_at_start", action="store_true")
    a("--log_time", action="store_true")
    a("--print_net", action="store_true")
    # Multi-device (TPU analog of the reference's DDP flags)
    a("--multiprocess_distributed", action="store_true",
      help="parity flag; on TPU use --n_chips / mesh sharding instead")
    a("--n_chips", type=int, default=1,
      help="number of TPU chips to shard independent videos over")
    a("--world_size", type=int, default=1)
    a("--node_rank", type=int, default=0)
    a("--dist_backend", type=str, default="ici",
      choices=["ici", "dcn", "nccl", "gloo", "mpi"],
      help="collectives ride the TPU interconnect; torch names accepted")
    a("--init_url", type=str, default="")
    # Network/optim
    a("--net", type=str, required=True)
    a("--optim", type=str, default="adam")
    a("--lr", type=float, default=1e-4)
    a("--adam_beta1", type=float, default=0.5)
    a("--adam_beta2", type=float, default=0.9)
    a("--sgd_momentum", type=float, default=0.9)
    a("--sgd_dampening", type=float, default=0)
    a("--wdecay", type=float, default=0.0)
    a("--init_type", type=str, default="kaiming",
      help="scene-flow net weight init (normal/xavier/kaiming/orth); the "
           "reference declares default 'normal' but unconditionally "
           "initializes its scene-flow net with kaiming (reference "
           "models/scene_flow_motion_field.py:123) — we default to the "
           "effective behavior and honor explicit overrides")
    # Mixed precision: on TPU this selects the conv compute dtype
    a("--mixed_precision_training", action="store_true",
      help="run depth-net convs in bfloat16 (f32 params/updates)")
    a("--loss_scaling", type=float, default=255,
      help="parity flag; bf16 on TPU needs no loss scaling")
    a("--full_precision", action="store_true",
      help="force float32 conv compute")
    a("--remat_depth", action="store_true",
      help="rematerialize the depth-net forward in the backward pass "
           "(~1/3 more FLOPs for O(activations) less HBM; for resolutions "
           "beyond the reference's <=384-wide protocol)")
    # Logging and visualization
    a("--logdir", type=str, default=None)
    a("--full_logdir", type=str, default=None)
    a("--exprdir_no_prefix", action="store_true")
    a("--pt_no_overwrite", action="store_true")
    a("--log_batch", action="store_true")
    a("--progbar_interval", type=float, default=0.05)
    a("--no_accum", action="store_true")
    a("--expr_id", type=int, default=0)
    a("--save_net", type=int, default=1)
    a("--save_net_opt", action="store_true")
    a("--save_every", type=int, default=1,
      help="write checkpoint.ckpt every N epochs (reference writes every "
           "epoch; on a tunneled backend each save is a full-state D2H "
           "fetch, so cheap fast epochs can raise this). The final epoch "
           "always writes regardless of N; best.ckpt is unaffected")
    a("--vis_every_vali", default=1, type=int)
    a("--vis_every_train", default=1, type=int)
    a("--vis_batches_vali", type=int, default=10)
    a("--vis_batches_train", type=int, default=10)
    a("--tensorboard", action="store_true")
    a("--tensorboard_keyword", type=str, default="checkpoints")
    a("--html_logger", action="store_true")
    a("--vis_workers", default=2, type=int)
    a("--vis_param_f", default=None, type=str)
    a("--vis_at_start", action="store_true")
    a("--test_template", type=str, default=None)
    a("--profile_dir", type=str, default=None,
      help="write a jax.profiler trace of the first training epoch here")
    a("--no_device_cache", action="store_true",
      help="stream batches host->device every step instead of pinning the "
           "video's packed batches in HBM")
    a("--steps_per_dispatch", type=int, default=1,
      help="run K optimization steps per jitted dispatch (lax.scan over "
           "stacked same-gap batches); amortizes host dispatch latency")
    return parser, unique_params


def exprdir_name(opt) -> str:
    """Experiment directory name (reference: train.py:40-46). With
    --exprdir_no_prefix only the formatted suffix names the run; otherwise
    the net/dataset prefix is prepended."""
    suffix = opt.suffix.format(**vars(opt)) if opt.suffix else ""
    if getattr(opt, "exprdir_no_prefix", False):
        return suffix
    exprdir = f"{opt.net}_{opt.dataset}"
    if suffix:
        exprdir += "_" + suffix
    return exprdir


def tensorboard_logdir(opt, exprdir: str) -> str:
    """TensorBoard directory (reference: train.py:195-202): split the run's
    logdir on ``/{keyword}/`` and park the event files under
    ``parent/{keyword}/tensorboard/sub`` so every run's boards collect in
    one place; ``--tensorboard_keyword none`` uses
    ``logdir/tensorboard/exprdir/expr_id``. The reference crashes when the
    keyword is absent from the path; we fall back to an in-rundir
    ``tensorboard/`` with a warning instead."""
    import os

    kw = getattr(opt, "tensorboard_keyword", "checkpoints")
    full_logdir = opt.full_logdir
    if kw != "none":
        parts = full_logdir.split(f"/{kw}/")
        if len(parts) == 2:
            return os.path.join(parts[0], kw, "tensorboard", parts[1])
        print(f"Warning: --tensorboard_keyword '{kw}' not found in logdir "
              f"{full_logdir}; writing tensorboard inside the run dir")
        return os.path.join(full_logdir, "tensorboard")
    return os.path.join(opt.logdir or ".", "tensorboard", exprdir,
                        str(opt.expr_id))


def overwrite(opt, opt_old: dict, unique_params):
    """Resume-overwrite: adopt the saved run's options except unique_params
    (reference: options/options_train.py:150-162)."""
    for k, v in opt_old.items():
        if k in unique_params or k.startswith("_"):
            continue
        setattr(opt, k, v)
    return opt


def parse(argv: Optional[Sequence[str]] = None):
    """Two-phase parse (reference: options/options_train.py:165-189)."""
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser()
    parser, unique_params = add_general_arguments(parser)
    opt_general, _ = parser.parse_known_args(argv)

    from ..data import get_dataset
    from ..models import get_model

    if opt_general.dataset is not None:
        dataset_cls = get_dataset(opt_general.dataset)
        parser, u = dataset_cls.add_arguments(parser)
        unique_params |= u
    model_cls = get_model(opt_general.net)
    parser, u = model_cls.add_arguments(parser)
    unique_params |= u

    opt, unknown = parser.parse_known_args(argv)
    if unknown:
        print(f"Warning: ignoring unknown options {unknown}")
    return opt, unique_params


def parse_test(argv: Optional[Sequence[str]] = None):
    """(reference: options/options_test.py:59-77)"""
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser()
    a = parser.add_argument
    a("--checkpoint_path", type=str, required=True)
    a("--output_dir", type=str, required=True)
    a("--gpu", default="none", type=str)
    # template-compat with the reference's test_cmd.txt (reference:
    # options/options_test.py:24-49): net/dataset are validated against the
    # checkpoint's opt.json; --overwrite gates clobbering an existing
    # render set (reference test.py:55-60)
    a("--net", type=str, default=None)
    a("--dataset", type=str, default=None)
    a("--suffix", type=str, default="")
    a("--overwrite", action="store_true")
    a("--html_logger", action="store_true")
    a("--epoch", type=int, default=-1,
      help="epoch checkpoint to load; -1 for best")
    a("--manual_seed", type=int, default=None)
    a("--workers", type=int, default=4)
    a("--batch_size", type=int, default=1)
    a("--vis_workers", default=2, type=int)
    a("--data_root", type=str, default=None)
    a("--n_chips", type=int, default=1,
      help="shard per-frame inference over this many devices "
           "(frames batch across a 'data' mesh axis)")
    opt, unknown = parser.parse_known_args(argv)
    if unknown:
        print(f"Warning: ignoring unknown options {unknown}")
    return opt
