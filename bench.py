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


def _wait_for_backend(deadline_s: float = None, probe_s: float = 120.0):
    """Block until the TPU backend initializes, retrying through transient
    tunnel outages (observed: backend init raising UNAVAILABLE, or hanging
    indefinitely, for tens of minutes). Each probe runs in a child process
    so a HANGING init can be killed and retried; the parent only touches
    jax after a probe succeeds. Returns silently on success; raises after
    ``deadline_s`` so a dead tunnel still fails loudly."""
    import os
    import subprocess
    import sys

    if deadline_s is None:
        deadline_s = float(os.environ.get("DVD_BENCH_BACKEND_DEADLINE_S",
                                          900.0))
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        try:
            proc = subprocess.run(
                [sys.executable, "-c",
                 "import os, jax\n"
                 "if os.environ.get('DVD_PLATFORM'):\n"
                 "    jax.config.update('jax_platforms',"
                 " os.environ['DVD_PLATFORM'])\n"
                 "assert jax.devices()"],
                env=dict(os.environ), timeout=probe_s,
                capture_output=True, text=True,
            )
            if proc.returncode == 0:
                if attempt > 1:
                    print(f"# backend up after {attempt} probes "
                          f"({time.time() - t0:.0f}s)", flush=True)
                return
            err = proc.stderr.strip().splitlines()
            err = err[-1] if err else "?"
        except subprocess.TimeoutExpired:
            err = f"init hang >{probe_s:.0f}s"
        waited = time.time() - t0
        if waited > deadline_s:
            raise RuntimeError(
                f"TPU backend unavailable after {waited:.0f}s: {err}")
        print(f"# backend probe {attempt} failed ({err}); retrying",
              flush=True)
        time.sleep(min(30.0, probe_s / 4))


def main():
    import argparse
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--wide", action="store_true",
                    help="beyond-reference resolution leg: 320x576 (vs the "
                         "reference's <=384-wide protocol) with "
                         "--remat_depth; reports step ms + device memory")
    args = ap.parse_args()

    _wait_for_backend()
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
        remat_depth=args.wide,
    )
    step = SceneFlowMotionFieldStep(cfg)

    rng = np.random.RandomState(0)
    if args.wide:
        # beyond-reference: 320x576, 2.1x the canonical pixel count
        # (reference protocol caps at <=384 wide,
        # scripts/preprocess/davis/generate_frame_midas.py:118-126)
        h, w = 320, 576
    else:
        h, w = 224, 384  # reference working resolution (<=384 wide, mult 32)
    batch = _synthetic_batch(1, h, w, rng)
    state = step.init_state(jax.random.PRNGKey(0), batch["img_1"])

    gap = 2

    from dynamic_video_depth_tpu.train.loop import dispatch_with_retry

    # compile + warm up; float() forces a REAL value fetch — on this
    # environment's experimental remote backend block_until_ready returns at
    # enqueue, so only a value read measures true completion. The first call
    # may remote-compile; retry transient helper OOMs (loop.py).
    state, logs = dispatch_with_retry(
        lambda: step.train_step(state, batch, steps=gap, warm=False),
        "bench step compile")
    for _ in range(2):
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

    if args.wide:
        mem = {}
        try:
            stats = jax.devices()[0].memory_stats() or {}
            mem = {
                "bytes_in_use_gb": round(stats.get("bytes_in_use", 0) / 2**30, 3),
                "peak_bytes_gb": round(stats.get("peak_bytes_in_use", 0) / 2**30, 3),
                "bytes_limit_gb": round(stats.get("bytes_limit", 0) / 2**30, 3),
            }
        except Exception:
            pass
        print(json.dumps({
            "metric": "davis_train_step_320x576_remat_gap2",
            "value": round(dt_median, 3),
            "unit": "ms",
            "vs_baseline": round(REFERENCE_STEP_MS / dt_median, 3),
            "vs_baseline_note": "2.1x the reference's pixel cap, vs the "
                                "same 360 ms/step 224x384 estimate",
            "step_ms_median": round(dt_median, 3),
            "step_ms_min": round(dt_min, 3),
            "steps_per_s_sustained": round(steps_per_s, 2),
            "remat_depth": True, **mem,
        }))
        return

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

    # ---- throughput matrices (VERDICT r2 item 1a, r4 items 1+3) ---------
    # batch scaling: larger pair batches raise MXU occupancy — the
    # throughput-per-chip lever at the reference's batch-1 protocol. Same
    # config/shapes as the canonical probe so the persistent compile cache
    # amortizes the variants across runs. One timing helper shared by every
    # (net, batch, gap) leg (ADVICE r4).
    states = {}

    def timed(stp, key, bsz, steps, iters=8):
        b = batch if bsz == 1 else _synthetic_batch(bsz, h, w, rng)
        st = states[key]
        st, lg = dispatch_with_retry(
            lambda: stp.train_step(st, b, steps=steps, warm=False),
            f"bench matrix compile ({key}, batch {bsz}, gap {steps})")
        st, lg = stp.train_step(st, b, steps=steps, warm=False)
        _ = float(lg["loss"])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                st, lg = stp.train_step(st, b, steps=steps, warm=False)
            _ = float(lg["loss"])
            ts.append((time.perf_counter() - t0) / iters * 1e3)
        states[key] = st
        return float(np.median(ts))

    def device_estimate(w_lo, n_lo, w_hi, n_hi):
        """Wall at two sync granularities -> (device ms/step, fetch RTT ms).

        Round-5 profiler reconciliation: device steps run back-to-back
        (span == busy); the wall excess over busy is ONE value-fetch
        round trip through the shared tunnel per sync block (~30 ms),
        amortized over the block. T(n) = n*device + rtt solves both."""
        device = (n_hi * w_hi - n_lo * w_lo) / (n_hi - n_lo)
        return device, n_lo * (w_lo - device)

    def batch_row(stp, key, bsz, steps):
        ms = timed(stp, key, bsz, steps)
        return {"step_ms": round(ms, 2),
                "pairs_per_s": round(bsz / (ms / 1e3), 2)}

    states["midas"] = state
    batch_matrix = {str(b): batch_row(step, "midas", b, gap)
                    for b in (1, 2, 4, 8, 16)}
    gain_best = max(v["pairs_per_s"] for v in batch_matrix.values()) \
        / batch_matrix["1"]["pairs_per_s"]
    gap_ms = {str(g): round(timed(step, "midas", 1, g), 2) for g in (1, 4, 8)}
    # RTT-free device estimate: two sync granularities of the SAME config
    # measured back-to-back (the tunnel swings ~2x between windows, so
    # pairing measurements taken minutes apart can produce negative RTTs)
    # solve T(n) = n*device + rtt
    midas_device, rtt = device_estimate(
        timed(step, "midas", 1, gap, iters=8), 8,
        timed(step, "midas", 1, gap, iters=20), 20)
    rtt = max(rtt, 0.0)

    # ---- hourglass legs: the reference's DEFAULT depth net ---------------
    # (third_party/hourglass.py; --depth_net hourglass). Same canonical
    # protocol so the numbers track the s2d/merged-reducer work; gap + batch
    # legs so a regression in either is visible in the round artifact
    # (VERDICT r4 item 3).
    hg_cfg = TrainStepConfig(
        lr=1e-6, scene_lr_mul=1000.0, midas=False, depth_net="hourglass",
        loss=LossConfig(flow_mul=1.0, disp_mul=1.0, acc_mul=1.0,
                        sf_mag_div=100.0, use_disp=True, midas=False,
                        interp_steps=5),
        compute_dtype="bfloat16",
    )
    hg_step = SceneFlowMotionFieldStep(hg_cfg)
    states["hg"] = hg_step.init_state(jax.random.PRNGKey(0), batch["img_1"])
    hg_batch_matrix = {str(b): batch_row(hg_step, "hg", b, gap)
                       for b in (1, 4, 8, 16)}
    # headline at the SAME 20-iters-per-sync protocol as the MiDaS leg
    # (round-4's 36.3 "wall vs busy gap" was the fetch RTT amortized over
    # only 8 iters; the device steps are back-to-back — see RESULTS.md).
    # The 8-iter leg for the device estimate is re-timed ADJACENT to the
    # headline so the two-point solve sees one tunnel window.
    hg_w8 = timed(hg_step, "hg", 1, gap, iters=8)
    hourglass_ms = timed(hg_step, "hg", 1, gap, iters=20)
    hg_device, hg_rtt = device_estimate(hg_w8, 8, hourglass_ms, 20)
    hg_rtt = max(hg_rtt, 0.0)
    hg_gap_ms = {str(g): round(timed(hg_step, "hg", 1, g), 2)
                 for g in (1, 8)}

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
        "batch_matrix": batch_matrix,
        "throughput_per_chip_gain_best": round(gain_best, 2),
        "gap_step_ms": gap_ms,
        "step_ms_device_est": round(midas_device, 2),
        "sync_rtt_ms_est": round(rtt, 1),
        "hourglass_step_ms": round(hourglass_ms, 2),
        "hourglass_step_ms_device_est": round(hg_device, 2),
        "hourglass_sync_rtt_ms_est": round(hg_rtt, 1),
        "hourglass_batch_matrix": hg_batch_matrix,
        "hourglass_gap_step_ms": hg_gap_ms,
    }))


if __name__ == "__main__":
    main()
