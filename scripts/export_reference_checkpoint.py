#!/usr/bin/env python
"""Export a training checkpoint back to the reference's torch format.

    python scripts/export_reference_checkpoint.py \
        --checkpoint <logdir>/0/best.ckpt --template ref/checkpoint.pt \
        --out exported_checkpoint.pt

``--template`` is any reference checkpoint of the same architecture
(typically the one originally imported with ``--load_reference_ckpt``): it
disambiguates torch layouts and carries tensors this framework does not
model. The result loads through the reference's ``load_state_dict``
(weights, BatchNorm stats, AND Adam moments — optimization can continue in
torch from where this framework left off). Round-trip exactness is pinned
in tests/test_migrate.py.
"""

import argparse
import os
import sys
from argparse import Namespace
from os.path import dirname, join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help=".ckpt file (or its directory; uses best.ckpt)")
    ap.add_argument("--template", required=True,
                    help="a reference checkpoint.pt of the same architecture")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    if os.environ.get("DVD_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["DVD_PLATFORM"])

    from dynamic_video_depth_tpu.models import get_model
    from dynamic_video_depth_tpu.runtime.checkpoint import load_opt, load_state
    from dynamic_video_depth_tpu.runtime.migrate import (
        export_reference_checkpoint,
    )

    ckpt_file = args.checkpoint
    ckpt_dir = dirname(ckpt_file) if ckpt_file.endswith(".ckpt") else ckpt_file
    if not ckpt_file.endswith(".ckpt"):
        ckpt_file = join(ckpt_dir, "best.ckpt")

    opt = Namespace(**load_opt(ckpt_dir))
    model = get_model(opt.net)(opt, None)
    h = int(getattr(opt, "export_height", 32) or 32)
    w = int(getattr(opt, "export_width", 64) or 64)
    import numpy as np

    model.init_from_sample(np.zeros((1, h, w, 3), np.float32), seed=0)
    state, meta = load_state(ckpt_file, model.state)
    extras = {"epoch": int(meta.get("epoch", 0))}
    export_reference_checkpoint(state, args.template, args.out, extras=extras)
    print(f"Exported {ckpt_file} -> {args.out} (reference format, "
          f"epoch {extras['epoch']})")


if __name__ == "__main__":
    main()
