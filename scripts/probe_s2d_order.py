#!/usr/bin/env python
"""A/B the s2d dense-kernel channel order on hardware.

The hourglass step burns ~4.0 ms/step on kernel-expansion data formatting
(round-5 step_profile: reshape/copy of [kp,kp,cin,4,cout,4]-shaped
expansion intermediates). Hypothesis: the 'ci' channel order pins the
expansion einsum's minor dim to the phase index (4) — a 32x lane-padding
inflation under the (8,128) tile — while a phase-major order would make
the minor dim the cout axis (16..64, 2-8x padding).

Measures, per branch-conv shape actually s2d'd in the hourglass
(models/hourglass.py _STAGES at 224x384), the full fwd+bwd cost of one
s2d-space branch conv with the expansion inside the differentiated graph
(kernel perturbed per copy so the expansion cannot be hoisted), for
order='ci' (current) vs order='phase'.

Run on the TPU host: python scripts/probe_s2d_order.py
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--outer", type=int, default=5)
    ap.add_argument("--chain", type=int, default=8)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     os.path.expanduser("~/.cache/jax_dvd")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dynamic_video_depth_tpu.ops.s2d import s2d_space_conv

    rng = np.random.RandomState(0)
    dtype = jnp.bfloat16

    def scan_probe(fn, args, reps, outer, chain):
        @jax.jit
        def run(args0):
            def body(s, _):
                for _ in range(chain):
                    pert = [(x * (1.0 + 1e-20 * s).astype(x.dtype))
                            for x in args0]
                    s = fn(*pert) * 1e-20 + s
                return s, ()
            s, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=reps)
            return s

        v = float(run(args))
        times = []
        for _ in range(outer):
            t0 = time.perf_counter()
            v = float(run(args))
            times.append((time.perf_counter() - t0) / (reps * chain) * 1e3)
        del v
        return float(np.median(times))

    # scaffold floor with a negligible op
    tiny = jnp.ones((8, 128), dtype)
    scaffold = scan_probe(lambda x: jnp.mean(x.astype(jnp.float32)),
                          (tiny,), a.reps, a.outer, a.chain)
    print(f"# scaffold {scaffold:.3f} ms/copy", flush=True)

    # (hh, ww, cin, cout, k, n_per_step): s2d'd branch convs at 224x384
    # (fwd; bwd doubles the count) — from _STAGES level 4 (full res,
    # s2d map 112x192) and level 3 (half res, s2d map 56x96)
    SHAPES = [
        ("lvl4 _A4 5x5 64->32 @112x192", (112, 192, 64, 32, 5)),
        ("lvl4 _A16 7x7 32->16 @112x192", (112, 192, 32, 16, 7)),
        ("lvl4 _A 11x11 64->16 @112x192", (112, 192, 64, 16, 11)),
        ("lvl4 _A 3x3 64->16 @112x192", (112, 192, 64, 16, 3)),
        ("lvl3 _G 5x5 32->32 @56x96", (56, 96, 32, 32, 5)),
        ("lvl3 _BC2 11x11 64->32 @56x96", (56, 96, 64, 32, 11)),
        ("lvl3 _BC2 7x7 64->32 @56x96", (56, 96, 64, 32, 7)),
    ]

    results = {}
    for name, (hh, ww, cin, cout, k) in SHAPES:
        xs = jnp.asarray(rng.randn(2, hh, ww, 4 * cin) * 0.1, dtype)
        K = jnp.asarray(rng.randn(k, k, cin, cout) * 0.05, jnp.float32)
        cot = jnp.asarray(rng.randn(2, hh, ww, 4 * cout) * 0.1, dtype)
        row = {}
        for order in ("ci", "phase"):
            def fwd_bwd(xs_, K_, cot_, _order=order):
                def f(xs2, K2):
                    y = s2d_space_conv(xs2, K2.astype(xs2.dtype), 2, _order)
                    return jnp.sum((y * cot_).astype(jnp.float32))
                l, (gx, gk) = jax.value_and_grad(f, argnums=(0, 1))(xs_, K_)
                return l + jnp.sum(gx.astype(jnp.float32)) * 1e-20 \
                    + jnp.sum(gk) * 1e-20
            ms = scan_probe(fwd_bwd, (xs, K, cot), a.reps, a.outer, a.chain)
            row[order] = round(ms - scaffold, 4)
        results[name] = row
        print(json.dumps({"shape": name, **row}), flush=True)

    tot_ci = sum(r["ci"] for r in results.values())
    tot_ph = sum(r["phase"] for r in results.values())
    print(json.dumps({"sum_ci_ms": round(tot_ci, 3),
                      "sum_phase_ms": round(tot_ph, 3)}), flush=True)


if __name__ == "__main__":
    main()
