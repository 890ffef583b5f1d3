#!/usr/bin/env python
"""Round-5 scratch probe: batch-scaling knee (MiDaS + hourglass) on the
real TPU. Not part of the bench; results feed bench.py's matrix and the
fast recipe. Prints one JSON line per (net, batch, gap) config."""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_CACHE_DIR", os.path.expanduser("~/.cache/jax_dvd"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="midas", choices=["midas", "hourglass"])
    ap.add_argument("--batches", default="1,2,4,8,16")
    ap.add_argument("--gaps", default="2")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--res", default="224x384",
                    help="HxW (must satisfy the net's divisibility: /32 "
                         "midas, /16 hourglass)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from __graft_entry__ import _synthetic_batch
    from dynamic_video_depth_tpu.train import LossConfig, TrainStepConfig
    from dynamic_video_depth_tpu.train.step import SceneFlowMotionFieldStep
    from dynamic_video_depth_tpu.train.loop import dispatch_with_retry

    midas = args.net == "midas"
    cfg = TrainStepConfig(
        lr=1e-6, scene_lr_mul=1000.0, midas=midas,
        depth_net="" if midas else "hourglass",
        loss=LossConfig(flow_mul=1.0, disp_mul=1.0, acc_mul=1.0,
                        sf_mag_div=100.0, use_disp=True, midas=midas,
                        interp_steps=5),
        compute_dtype="bfloat16",
        remat_depth=args.remat,
    )
    step = SceneFlowMotionFieldStep(cfg)
    rng = np.random.RandomState(0)
    h, w = (int(x) for x in args.res.split("x"))
    state = step.init_state(jax.random.PRNGKey(0),
                            _synthetic_batch(1, h, w, rng)["img_1"])

    for gap in [int(g) for g in args.gaps.split(",")]:
        for bsz in [int(b) for b in args.batches.split(",")]:
            b = _synthetic_batch(bsz, h, w, rng)
            try:
                t_compile0 = time.perf_counter()
                state, lg = dispatch_with_retry(
                    lambda: step.train_step(state, b, steps=gap, warm=False),
                    f"probe compile b{bsz} g{gap}")
                _ = float(lg["loss"])
                compile_s = time.perf_counter() - t_compile0
                state, lg = step.train_step(state, b, steps=gap, warm=False)
                _ = float(lg["loss"])
                ts = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    for _ in range(args.iters):
                        state, lg = step.train_step(state, b, steps=gap,
                                                    warm=False)
                    _ = float(lg["loss"])
                    ts.append((time.perf_counter() - t0) / args.iters * 1e3)
                ms = float(np.median(ts))
                stats = jax.devices()[0].memory_stats() or {}
                print(json.dumps({
                    "net": args.net, "batch": bsz, "gap": gap,
                    "remat": args.remat,
                    "step_ms": round(ms, 2),
                    "step_ms_min": round(float(np.min(ts)), 2),
                    "pairs_per_s": round(bsz / (ms / 1e3), 2),
                    "compile_s": round(compile_s, 1),
                    "peak_gb": round(
                        stats.get("peak_bytes_in_use", 0) / 2**30, 2),
                }), flush=True)
            except Exception as e:
                print(json.dumps({
                    "net": args.net, "batch": bsz, "gap": gap,
                    "remat": args.remat,
                    "error": f"{type(e).__name__}: {str(e)[:200]}",
                }), flush=True)
                # OOM at batch B usually means larger B also fails
                break


if __name__ == "__main__":
    main()
