#!/usr/bin/env python
"""Precompile the train step's (batch, gap, warm) variants, one variant per
fresh process, into the persistent compilation cache.

Why a separate tool: this environment's remote compile helper can be
OOM-killed (HTTP 500 / SIGKILL) after many large compiles accumulate in one
process — which round 3 observed twice as an abort of an hours-long run at
an epoch boundary where a new variant compiled. Each variant compiles fine
in a fresh process, and the persistent cache (~/.cache/jax_dvd) makes that
a one-time cost per machine. Run this before a long protocol run:

    python scripts/precompile_variants.py --gaps 1,2,4,6,8 \
        [--batch_sizes 1] [--midas | --depth_net tiny] [--h 224 --w 384] \
        [--lr 1e-6 --scene_lr_mul 1000] [--mixed_precision_training]

The optimizer hyperparameters MUST match the training run's: learning
rates are compile-time constants in the jitted update.

Exit code 0 = every variant compiled (or was already cached).
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import os, sys
sys.path.insert(0, {repo!r})
import numpy as np, jax
if os.environ.get("DVD_PLATFORM"):
    # same forced-platform escape hatch as train.py/test.py: sitecustomize
    # pins the axon TPU platform and ignores JAX_PLATFORMS, so tests (and
    # hosts without a live tunnel) must pin via jax.config before first use
    jax.config.update("jax_platforms", os.environ["DVD_PLATFORM"])
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR",
                                 os.path.expanduser("~/.cache/jax_dvd")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from __graft_entry__ import _synthetic_batch
from dynamic_video_depth_tpu.train import LossConfig, TrainStepConfig
from dynamic_video_depth_tpu.train.step import SceneFlowMotionFieldStep

cfg = TrainStepConfig(
    lr={lr}, scene_lr_mul={scene_lr_mul}, midas={midas},
    depth_net={depth_net!r},
    loss=LossConfig(flow_mul=1.0, disp_mul=1.0, acc_mul=1.0,
                    sf_mag_div=100.0, use_disp=True, midas={midas},
                    interp_steps=5),
    compute_dtype={dtype!r},
)
step = SceneFlowMotionFieldStep(cfg)
rng = np.random.RandomState(0)
b = _synthetic_batch({bsz}, {h}, {w}, rng)
s = step.init_state(jax.random.PRNGKey(0), b["img_1"])
s, logs = step.train_step(s, b, steps={gap}, warm={warm})
print("compiled bsz={bsz} gap={gap} warm={warm}:",
      float(logs["loss"]), flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaps", default="1,2,4,6,8")
    ap.add_argument("--batch_sizes", default="1")
    ap.add_argument("--h", type=int, default=224)
    ap.add_argument("--w", type=int, default=384)
    ap.add_argument("--lr", type=float, default=1e-6)
    ap.add_argument("--scene_lr_mul", type=float, default=1000.0)
    ap.add_argument("--midas", action="store_true")
    ap.add_argument("--depth_net", default="")
    ap.add_argument("--mixed_precision_training", action="store_true")
    a = ap.parse_args()

    dtype = "bfloat16" if a.mixed_precision_training else "float32"
    failures = 0
    for bsz in (int(x) for x in a.batch_sizes.split(",")):
        for gap in (int(x) for x in a.gaps.split(",")):
            for warm in (True, False):
                code = _CHILD.format(
                    repo=REPO, lr=a.lr, scene_lr_mul=a.scene_lr_mul,
                    midas=a.midas, depth_net=a.depth_net, dtype=dtype,
                    bsz=bsz, h=a.h, w=a.w, gap=gap, warm=warm,
                )
                rc = subprocess.run([sys.executable, "-c", code]).returncode
                if rc != 0:
                    print(f"FAILED: bsz={bsz} gap={gap} warm={warm}")
                    failures += 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
