#!/usr/bin/env python
"""Per-op conv roofline at the train step's ACTUAL shapes vs the
environment throughput cap.

The canonical step (224x384, batch B pairs -> 2B frames through MiDaS) is
depth-CNN-bound (RESULTS.md round 2: fwd+bwd 51 of 54 ms). This script
measures, for every dominant conv shape of the MiDaS ResNeXt101-32x8d
encoder + refinenet decoder (reference: third_party/midas_blocks.py:71-168
and torchvision resnext101_32x8d), three timings via host-sync-free
lax.scan probes:

  - forward,
  - backward w.r.t. input (grad_x of sum(conv(x, w) * cot)),
  - backward w.r.t. filter (grad_w),

plus the environment reference cap (large bf16/f32 matmul and a large
dense conv), and prints a markdown table with achieved TFLOP/s and the
fraction of the measured cap. Run on the real TPU:

    python scripts/roofline.py [--frames 2] [--reps 10]

Probe methodology (CLAUDE.md/RESULTS.md round-2 gotchas): this backend's
block_until_ready returns at enqueue, so each measurement runs K
repetitions inside ONE jitted lax.scan whose carry feeds back into the
op's INPUT (loop-invariant probes get hoisted), and the wall clock spans a
value fetch.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2,
                    help="frames through the net (= 2 x pair batch)")
    ap.add_argument("--reps", type=int, default=10,
                    help="scan repetitions per timed call")
    ap.add_argument("--outer", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    a = ap.parse_args()

    import os

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     os.path.expanduser("~/.cache/jax_dvd")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dtype = jnp.dtype(a.dtype)
    B = a.frames
    rng = np.random.RandomState(0)

    CHAIN = 8  # op copies per scan iteration (amortizes the per-iteration
    # floor: this backend pays ~3 ms per scan step REGARDLESS of body size,
    # so a single-op body measures the floor, not the op — the round-2
    # "2-4 TFLOP/s cap" was exactly that artifact)

    def scan_probe(fn, x, reps, outer, chain=None):
        """Median ms/op: each scan iteration runs ``chain`` copies of
        fn(x), every copy's input perturbed by the previous copy's output
        (defeats hoisting AND common-subexpression elimination); the
        per-iteration floor is divided across the chain."""
        chain = CHAIN if chain is None else chain

        @jax.jit
        def run(x0):
            def body(s, _):
                for _ in range(chain):
                    xk = x * (1.0 + 1e-20 * s).astype(x.dtype)
                    y = fn(xk)
                    s = jnp.mean(y.astype(jnp.float32))
                return s, ()

            s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=reps)
            return s

        v = float(run(x))  # compile + warm
        times = []
        for _ in range(outer):
            t0 = time.perf_counter()
            v = float(run(x))
            times.append((time.perf_counter() - t0) / (reps * chain) * 1e3)
        del v
        return float(np.median(times))

    def conv(x, w, stride, groups):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), "SAME",
            feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def make(h, w_, cin, cout, k, stride, groups):
        x = jnp.asarray(rng.randn(B, h, w_, cin), dtype)
        wgt = jnp.asarray(rng.randn(k, k, cin // groups, cout) * 0.05, dtype)
        ho, wo = h // stride, w_ // stride
        cot = jnp.asarray(rng.randn(B, ho, wo, cout), dtype)
        flops = 2.0 * B * ho * wo * k * k * (cin // groups) * cout
        return x, wgt, cot, flops

    # Dominant conv shapes of the 224x384 step (per-stage resolutions of
    # ResNeXt101-32x8d on a 224x384 input + the refinenet decoder).
    # count = instances per MiDaS forward.
    SHAPES = [
        ("stem 7x7/2 3->64 @224x384",       (224, 384, 3, 64, 7, 2, 1), 1),
        ("L1 3x3 g32 256 @56x96",           (56, 96, 256, 256, 3, 1, 32), 3),
        ("L1 1x1 256->256 @56x96",          (56, 96, 256, 256, 1, 1, 1), 3),
        ("L2 3x3 g32 512 @28x48",           (28, 48, 512, 512, 3, 1, 32), 4),
        ("L2 1x1 512->512 @28x48",          (28, 48, 512, 512, 1, 1, 1), 4),
        ("L3 3x3 g32 1024 @14x24",          (14, 24, 1024, 1024, 3, 1, 32), 23),
        ("L3 1x1 512->1024 @14x24",         (14, 24, 512, 1024, 1, 1, 1), 23),
        ("L3 1x1 1024->1024 @14x24",        (14, 24, 1024, 1024, 1, 1, 1), 23),
        ("L4 3x3 g32 2048 @7x12",           (7, 12, 2048, 2048, 3, 1, 32), 3),
        ("refinenet 3x3 256 @14x24",        (14, 24, 256, 256, 3, 1, 1), 4),
        ("refinenet 3x3 256 @28x48",        (28, 48, 256, 256, 3, 1, 1), 4),
        ("refinenet 3x3 256 @56x96",        (56, 96, 256, 256, 3, 1, 1), 4),
        ("refinenet 3x3 256 @112x192",      (112, 192, 256, 256, 3, 1, 1), 2),
        ("out 3x3 256->128 @112x192",       (112, 192, 256, 128, 3, 1, 1), 1),
    ]

    # ---- probe-scaffold calibration ------------------------------------
    # the chain couples copies through a mean()->scalar->broadcast, which
    # costs ~2 small kernels per copy on this backend; measure it with a
    # negligible op so small-conv readings can be interpreted as
    # (scaffold + op) UPPER BOUNDS
    tiny = jnp.ones((8, 128), dtype)
    scaffold_ms = scan_probe(lambda x: x * 1.5, tiny, a.reps, a.outer)
    print(f"probe scaffold floor: {scaffold_ms:.3f} ms/copy — small-op "
          "rows below are upper bounds (op + scaffold)")

    # ---- environment reference cap -------------------------------------
    n = 4096
    am = jnp.asarray(rng.randn(n, n) * 0.05, dtype)
    bm = jnp.asarray(rng.randn(n, n) * 0.05, dtype)
    mm_ms = scan_probe(lambda x: x @ bm, am, a.reps, a.outer)
    mm_tf = 2.0 * n ** 3 / (mm_ms / 1e3) / 1e12
    xc, wc, cotc, fl_c = make(56, 96, 512, 512, 3, 1, 1)
    bigconv_ms = scan_probe(lambda x: conv(x, wc, 1, 1), xc, a.reps, a.outer)
    bigconv_tf = fl_c / (bigconv_ms / 1e3) / 1e12
    cap_tf = max(mm_tf, bigconv_tf)
    print(f"env cap probes ({a.dtype}): {n}^3 matmul {mm_ms:.2f} ms = "
          f"{mm_tf:.2f} TFLOP/s; dense 3x3x512 conv @56x96 "
          f"{bigconv_ms:.2f} ms = {bigconv_tf:.2f} TFLOP/s")
    print(f"reference cap used: {cap_tf:.2f} TFLOP/s\n")

    rows = []
    print("| op (x count/fwd) | dir | ms | TFLOP/s | % cap |")
    print("|---|---|---|---|---|")
    for name, (h, w_, cin, cout, k, stride, groups), count in SHAPES:
        x, wgt, cot, flops = make(h, w_, cin, cout, k, stride, groups)

        def fwd(xx):
            return conv(xx, wgt, stride, groups)

        def gin(xx):
            return jax.grad(
                lambda q: jnp.sum(conv(q, wgt, stride, groups)
                                  .astype(jnp.float32)
                                  * cot.astype(jnp.float32)))(xx)

        def gw(xx):
            # grad w.r.t. the FILTER; perturbing x keeps each chained copy
            # distinct (grad_w is independent of w, so carrying w would CSE)
            return jax.grad(
                lambda q: jnp.sum(conv(xx, q, stride, groups)
                                  .astype(jnp.float32)
                                  * cot.astype(jnp.float32)))(wgt)

        for tag, fn, carrier, fl in (("fwd", fwd, x, flops),
                                     ("bwd_in", gin, x, flops),
                                     ("bwd_w", gw, x, flops)):
            ms = scan_probe(fn, carrier, a.reps, a.outer)
            tf = fl / (ms / 1e3) / 1e12
            rows.append({"op": name, "count": count, "dir": tag,
                         "ms": round(ms, 3), "tflops": round(tf, 3),
                         "pct_cap": round(100 * tf / cap_tf, 1)})
            print(f"| {name} x{count} | {tag} | {ms:.3f} | {tf:.2f} | "
                  f"{100 * tf / cap_tf:.0f}% |")

    total_fwd = sum(r["ms"] * r["count"] for r in rows if r["dir"] == "fwd")
    total_bwd = sum(r["ms"] * r["count"] for r in rows
                    if r["dir"] != "fwd")
    print(f"\nsum over counted instances: fwd {total_fwd:.1f} ms, "
          f"bwd {total_bwd:.1f} ms (per {B}-frame depth forward; "
          f"excludes pointwise/norm layers XLA fuses into these)")
    print(json.dumps({"cap_tflops": round(cap_tf, 3),
                      "matmul_tflops": round(mm_tf, 3),
                      "bigconv_tflops": round(bigconv_tf, 3),
                      "scaffold_ms": round(scaffold_ms, 3),
                      "frames": B, "dtype": a.dtype, "rows": rows}))


if __name__ == "__main__":
    main()
