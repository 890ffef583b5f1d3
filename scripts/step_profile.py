#!/usr/bin/env python
"""Capture and analyze a per-op device timeline of the canonical train step.

Parses the Chrome-trace JSON (``vm.trace.json.gz``) that jax.profiler writes
on this backend — the per-op events carry ``model_flops``, ``bytes_accessed``
and the full HLO ``long_name`` with shape+layout, which is everything needed
for a measured per-op roofline. Prints, for the TPU "XLA Ops" line:

  - step spans and busy/idle split
  - time by hlo_category with achieved TFLOP/s and GB/s
  - convolution time bucketed by output shape (finds MXU-starved convs)
  - top individual ops

Round-3 finding from this tool: the device is ~100% busy during the step —
the 54 ms step is NOT dispatch-sequencing overhead; it is real on-device
time, dominated by ResNeXt grouped convolutions (32 groups x 8/16 ch) at
0.2-4 TF/s and the relayout copies around their 5-D tiled layouts, while
dense convs in the same graph run at 120-190 TF/s.

Usage (TPU):
    python scripts/step_profile.py [--iters 5] [--out /tmp/dvd_profile]
    python scripts/step_profile.py --analyze-only --out /tmp/dvd_profile

The capture runs the same step configuration as bench.py (MiDaS, 224x384,
batch 1, gap 2, bf16 policy).
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def capture(outdir: str, iters: int, wide: bool = False,
            dense_group_width: int = 16, merge_group_width: int = 128,
            pallas: str = "auto", sf_chain: str = "auto", gap: int = 2,
            depth_net: str = "", s2d_min_pixels: int = 16384,
            merge_reducers: bool = True):
    import jax
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR",
                                         os.path.expanduser("~/.cache/jax_dvd")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from __graft_entry__ import _synthetic_batch
    from dynamic_video_depth_tpu.train import LossConfig, TrainStepConfig
    from dynamic_video_depth_tpu.train.step import SceneFlowMotionFieldStep
    from dynamic_video_depth_tpu.train.loop import dispatch_with_retry

    midas = depth_net in ("", "midas")
    cfg = TrainStepConfig(
        lr=1e-6, scene_lr_mul=1000.0, midas=midas, depth_net=depth_net,
        loss=LossConfig(flow_mul=1.0, disp_mul=1.0, acc_mul=1.0,
                        sf_mag_div=100.0, use_disp=True, midas=midas,
                        interp_steps=5),
        compute_dtype="bfloat16",
        remat_depth=wide,
        dense_group_width=dense_group_width,
        merge_group_width=merge_group_width,
        s2d_min_pixels=s2d_min_pixels,
        merge_reducers=merge_reducers,
        use_pallas_sf=pallas, use_pallas_warp=pallas, use_pallas_loss=pallas,
        use_pallas_sf_chain=sf_chain,
    )
    step = SceneFlowMotionFieldStep(cfg)
    rng = np.random.RandomState(0)
    h, w = (320, 576) if wide else (224, 384)
    batch = _synthetic_batch(1, h, w, rng)
    state = step.init_state(jax.random.PRNGKey(0), batch["img_1"])

    # compile + settle OUTSIDE the trace (value fetch = real completion on
    # this backend; block_until_ready returns at enqueue)
    state, logs = dispatch_with_retry(
        lambda: step.train_step(state, batch, steps=gap, warm=False),
        "profile capture compile")
    for _ in range(2):
        state, logs = step.train_step(state, batch, steps=gap, warm=False)
    _ = float(logs["loss"])

    with jax.profiler.trace(outdir):
        for _ in range(iters):
            state, logs = step.train_step(state, batch, steps=gap, warm=False)
        _ = float(logs["loss"])
    print(f"trace written to {outdir}")


def load_trace(outdir: str):
    paths = sorted(glob.glob(
        os.path.join(outdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {outdir}/plugins/profile")
    with gzip.open(paths[-1]) as f:
        return json.load(f)["traceEvents"], paths[-1]


def device_ops(events):
    """Return (xla_op_events, step_events) for the TPU device timeline."""
    tname, pname = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "thread_name":
            tname[(e["pid"], e["tid"])] = e["args"]["name"]
        elif e.get("name") == "process_name":
            pname[e["pid"]] = e["args"]["name"]

    def line(e):
        return (pname.get(e["pid"], ""), tname.get((e["pid"], e.get("tid")), ""))

    ops, steps = [], []
    for e in events:
        if e.get("ph") != "X":
            continue
        proc, thread = line(e)
        if "TPU" not in proc and "/device:" not in proc:
            continue
        if thread == "XLA Ops":
            ops.append(e)
        elif thread == "Steps":
            steps.append(e)
    return ops, steps


def _out_shape(long_name: str) -> str:
    m = re.match(r"%\S+ = (\S+?)\{", long_name)
    return m.group(1) if m else "?"


def analyze(events, top: int = 15, json_out: bool = False):
    ops, steps = device_ops(events)
    if not ops:
        raise SystemExit("no TPU 'XLA Ops' events in trace")
    n_steps = max(len(steps), 1)

    per_cat = collections.defaultdict(lambda: [0, 0.0, 0, 0])  # n,dur,flop,byte
    conv_by_shape = collections.defaultdict(lambda: [0, 0.0, 0])
    by_name = collections.defaultdict(lambda: [0, 0.0])
    tot_flops = tot_bytes = 0
    tot_dur = 0.0
    for e in ops:
        a = e.get("args", {})
        f = int(a.get("model_flops", 0) or 0)
        b = int(a.get("raw_bytes_accessed", a.get("bytes_accessed", 0)) or 0)
        d = e.get("dur", 0.0)  # us
        cat = a.get("hlo_category", "?")
        tot_flops += f
        tot_bytes += b
        tot_dur += d
        c = per_cat[cat]
        c[0] += 1
        c[1] += d
        c[2] += f
        c[3] += b
        nm = by_name[e["name"]]
        nm[0] += 1
        nm[1] += d
        if cat == "convolution fusion":
            s = _out_shape(a.get("long_name", ""))
            cs = conv_by_shape[s]
            cs[0] += 1
            cs[1] += d
            cs[2] += f

    result = {
        "n_steps": n_steps,
        "step_spans_ms": [s["dur"] / 1e3 for s in steps],
        "per_step": {
            "ops": len(ops) // n_steps,
            "busy_ms": tot_dur / n_steps / 1e3,
            "model_gflops": tot_flops / n_steps / 1e9,
            "bytes_gb": tot_bytes / n_steps / 1e9,
            "avg_tflops": tot_flops / tot_dur / 1e6 if tot_dur else 0.0,
        },
        "by_category": {
            cat: {"n": c // n_steps, "ms": d / n_steps / 1e3,
                  "gflops": f / n_steps / 1e9,
                  "tflops": f / d / 1e6 if d else 0.0,
                  "gbps": b / d / 1e6 if d else 0.0}
            for cat, (c, d, f, b) in sorted(per_cat.items(),
                                            key=lambda kv: -kv[1][1])
        },
        "conv_by_shape": [
            {"shape": s, "n": c // n_steps, "ms": d / n_steps / 1e3,
             "tflops": f / d / 1e6 if d else 0.0}
            for s, (c, d, f) in sorted(conv_by_shape.items(),
                                       key=lambda kv: -kv[1][1])[:top]
        ],
        "top_ops": [
            {"name": nm[:90], "n": c // n_steps, "ms": d / n_steps / 1e3}
            for nm, (c, d) in sorted(by_name.items(),
                                     key=lambda kv: -kv[1][1])[:top]
        ],
    }
    if json_out:
        print(json.dumps(result, indent=1))
        return result

    ps = result["per_step"]
    print(f"steps: {n_steps}, spans "
          f"{['%.1f' % s for s in result['step_spans_ms']]} ms")
    print(f"per step: {ps['ops']} ops, busy {ps['busy_ms']:.2f} ms, "
          f"{ps['model_gflops']:.1f} GF, "
          f"{ps['bytes_gb']:.2f} GB  ->  avg {ps['avg_tflops']:.1f} TF/s")
    print("\nby hlo_category (per step):")
    for cat, r in result["by_category"].items():
        print(f"  {cat:<28} n={r['n']:<6} {r['ms']:7.2f} ms "
              f"{r['gflops']:8.2f} GF {r['tflops']:6.1f} TF/s "
              f"{r['gbps']:5.0f} GB/s")
    print("\nconv fusions by output shape (per step):")
    for r in result["conv_by_shape"]:
        print(f"  {r['ms']:7.3f} ms n={r['n']:<4} {r['tflops']:6.1f} TF/s  "
              f"{r['shape']}")
    print("\ntop ops by total time (per step):")
    for t in result["top_ops"]:
        print(f"  {t['ms']:7.3f} ms n={t['n']:<4} {t['name']}")
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/dvd_step_profile")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--gap", type=int, default=2,
                    help="Euler step count (the gap bucket to profile)")
    ap.add_argument("--wide", action="store_true")
    ap.add_argument("--analyze-only", action="store_true")
    ap.add_argument("--dense-group-width", type=int, default=16)
    ap.add_argument("--merge-group-width", type=int, default=128)
    ap.add_argument("--s2d-min-pixels", type=int, default=16384,
                    help="hourglass s2d densification threshold (0 = off)")
    ap.add_argument("--merge-reducers", type=int, default=1,
                    help="hourglass merged 1x1 reducer convs (0 = off)")
    ap.add_argument("--sf-chain", choices=("auto", "on", "off"),
                    default="auto",
                    help="Euler-chain megakernel A/B (auto = follow "
                         "--pallas sf)")
    ap.add_argument("--pallas", choices=("auto", "on", "off"),
                    default="auto",
                    help="force the fused kernels on/off for hardware A/Bs")
    ap.add_argument("--depth-net", default="",
                    choices=("", "midas", "hourglass", "tiny"),
                    help="depth net to profile ('' = midas, the bench "
                         "default; 'hourglass' = the reference's default "
                         "net and our validation-run net)")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--top", type=int, default=15)
    a = ap.parse_args()
    if not a.analyze_only:
        capture(a.out, a.iters, a.wide,
                a.dense_group_width, a.merge_group_width, a.pallas,
                a.sf_chain, a.gap, a.depth_net, a.s2d_min_pixels,
                bool(a.merge_reducers))
    events, path = load_trace(a.out)
    print(f"analyzing {path}")
    analyze(events, top=a.top, json_out=a.json)


if __name__ == "__main__":
    main()
