#!/usr/bin/env python
"""Benchmark: fused train-step latency on the canonical DAVIS configuration.

Measures the full per-video optimization step (2x MiDaS forward, depth-
induced flow via ONE fused Pallas warp, gap-step scene-flow Euler
integration (fused Pallas MLP), scene-flow projection, all losses +
acceleration regularizer, one fused backward, both Adam updates) at the
reference working resolution 224x384, batch 1, gap 2 (reference protocol:
experiments/davis/train_sequence.sh 20 epochs x 2000 steps, SURVEY §6).

Baseline: the reference publishes NO wall-clock numbers (BASELINE.md), so
``vs_baseline`` is relative to an ESTIMATE — 360 ms/step, i.e. 40k steps at
~4 h/video on the contemporary V100-class hardware this pipeline shipped
against. Treat the ratio as indicative; the ms numbers are the measurement.

Prints ONE JSON line with the headline metric (median step ms) plus
supporting fields: {"metric", "value", "unit", "vs_baseline",
"vs_baseline_note", "step_ms_median", "step_ms_min",
"steps_per_s_sustained"}.
"""

import json
import time

import numpy as np

REFERENCE_STEP_MS = 360.0  # estimate; the reference publishes no number


def main():
    import os

    import jax

    # Persistent compilation cache: per-(gap, warm) step variants compile
    # once per machine, not once per process (remote compiles are minutes).
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

    cfg = TrainStepConfig(
        lr=1e-6, scene_lr_mul=1000.0, midas=True,
        loss=LossConfig(flow_mul=1.0, disp_mul=1.0, acc_mul=1.0,
                        sf_mag_div=100.0, use_disp=True, midas=True,
                        interp_steps=5),
        compute_dtype="bfloat16",
    )
    step = SceneFlowMotionFieldStep(cfg)

    rng = np.random.RandomState(0)
    h, w = 224, 384  # reference working resolution (<=384 wide, mult of 32)
    batch = _synthetic_batch(1, h, w, rng)
    state = step.init_state(jax.random.PRNGKey(0), batch["img_1"])

    gap = 2
    # compile + warm up; float() forces a REAL value fetch — on this
    # environment's experimental remote backend block_until_ready returns at
    # enqueue, so only a value read measures true completion
    for _ in range(3):
        state, logs = step.train_step(state, batch, steps=gap, warm=False)
    _ = float(logs["loss"])

    # batched timing: the TPU is reached through a shared, contended tunnel
    # (observed 2x swings between windows) — report median (headline) and
    # min (contention floor) over hard-synced batches
    n_iters, n_batches = 20, 9
    times = []
    sustained_t0 = time.perf_counter()
    for _ in range(n_batches):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, logs = step.train_step(state, batch, steps=gap, warm=False)
        _ = float(logs["loss"])  # hard sync
        times.append((time.perf_counter() - t0) / n_iters * 1e3)
    sustained_s = time.perf_counter() - sustained_t0
    dt_median = float(np.median(times))
    dt_min = float(np.min(times))
    steps_per_s = n_iters * n_batches / sustained_s

    # K-steps-per-dispatch scan mode (--steps_per_dispatch): same compute,
    # 1/K the dispatches — the robust number when the tunnel's per-dispatch
    # latency spikes (a per-step-synced host loop can see 1.6x worse)
    import jax.numpy as jnp

    K = 8
    chunk = {k: jnp.stack([jnp.asarray(v)] * K) for k, v in batch.items()}
    state, packed = step.train_step_scan(state, chunk, steps=gap, warm=False)
    _ = np.asarray(packed)
    scan_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, packed = step.train_step_scan(state, chunk, steps=gap,
                                             warm=False)
        _ = np.asarray(packed)
        scan_times.append((time.perf_counter() - t0) / K * 1e3)
    scan_ms = float(np.median(scan_times))

    print(json.dumps({
        "metric": "davis_train_step_224x384_gap2",
        "value": round(dt_median, 3),
        "unit": "ms",
        "vs_baseline": round(REFERENCE_STEP_MS / dt_median, 3),
        "vs_baseline_note": "relative to a 360 ms/step reference-GPU "
                            "ESTIMATE; the reference publishes no number",
        "step_ms_median": round(dt_median, 3),
        "step_ms_min": round(dt_min, 3),
        "steps_per_s_sustained": round(steps_per_s, 2),
        "step_ms_scan8": round(scan_ms, 3),
    }))


if __name__ == "__main__":
    main()
