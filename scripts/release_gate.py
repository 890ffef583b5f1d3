#!/usr/bin/env python
"""End-of-round release gate: the LAST command before any snapshot/commit
that closes a work session (round-3 lesson: a session ended with bench.py
red at HEAD and every headline claim unverifiable).

Runs, in order, and exits nonzero on the first failure:

  1. the CPU test suite (8 virtual devices via tests/conftest.py) — the
     FAST tier (``-m "not slow"``, ~5 min) by default; ``--full-tests``
     runs everything (use at round end / nightly; the full suite is
     ~30 min on this 1-CPU host and a slow gate is a skipped gate —
     round-3 lesson),
  2. the multi-chip dryrun (``__graft_entry__.dryrun_multichip(8)``),
  3. ``python bench.py`` on the real TPU — must print a parseable JSON
     line AND must not regress vs the most recent green ``BENCH_r*.json``
     by more than ``--regress-tol`` (default 1.25x: the TPU is reached
     through a shared tunnel with observed ~2x window-to-window swings,
     so the tolerance screens real regressions without flaking on noise).

Writes ``RELEASE_GATE.json`` with per-stage results. Stages can be
skipped explicitly (``--skip-tests``, ``--skip-dryrun``, ``--skip-bench``)
when a stage was just run by hand — the JSON records the skip.

Usage: python scripts/release_gate.py              (fast tier + dryrun + bench)
       python scripts/release_gate.py --full-tests # round end: whole suite
       python scripts/release_gate.py --skip-tests # suite already green
"""

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name, cmd, env=None, timeout=3600):
    print(f"[gate] {name}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, timeout=timeout, cwd=REPO,
                          capture_output=True, text=True)
    dt = time.time() - t0
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-15:])
    ok = proc.returncode == 0
    print(f"[gate] {name}: {'OK' if ok else 'FAIL'} ({dt:.0f}s)", flush=True)
    if not ok:
        print(tail, flush=True)
    return {"ok": ok, "rc": proc.returncode, "seconds": round(dt, 1),
            "tail": tail if not ok else tail.splitlines()[-1:],
            "stdout": proc.stdout}


def last_green_bench():
    """Most recent BENCH_r*.json with rc==0 and a parsed value."""
    best = None
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        try:
            d = json.load(open(path))
        except Exception:
            continue
        if d.get("rc") == 0 and (d.get("parsed") or {}).get("value"):
            best = (path, d["parsed"]["value"])
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-tests", action="store_true")
    ap.add_argument("--full-tests", action="store_true",
                    help="run the whole suite instead of the fast tier "
                         "(-m 'not slow'); use at round end / nightly")
    ap.add_argument("--skip-dryrun", action="store_true")
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--regress-tol", type=float, default=1.25,
                    help="max allowed bench value vs the last green round, "
                         "as a ratio (tunnel noise allowance)")
    args = ap.parse_args()

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    results = {}
    failed = []

    if args.skip_tests:
        results["tests"] = {"skipped": True}
    else:
        cmd = [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=line"]
        if not args.full_tests:
            cmd += ["-m", "not slow"]
        r = run("tests", cmd, env=env, timeout=3600)
        r["tier"] = "full" if args.full_tests else "fast"
        results["tests"] = {k: v for k, v in r.items() if k != "stdout"}
        if not r["ok"]:
            failed.append("tests")

    if args.skip_dryrun:
        results["dryrun"] = {"skipped": True}
    else:
        denv = dict(env)
        denv["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
                             + denv.get("XLA_FLAGS", "")).strip()
        r = run("dryrun", [sys.executable, "-c",
                           "import jax; jax.config.update('jax_platforms','cpu')\n"
                           "import __graft_entry__ as g; g.dryrun_multichip(8)\n"
                           "print('dryrun ok')"], env=denv, timeout=1800)
        results["dryrun"] = {k: v for k, v in r.items() if k != "stdout"}
        if not r["ok"]:
            failed.append("dryrun")

    if args.skip_bench:
        results["bench"] = {"skipped": True}
    else:
        r = run("bench", [sys.executable, "bench.py"], env=env, timeout=5400)
        bench = {k: v for k, v in r.items() if k != "stdout"}
        parsed = None
        for line in reversed(r["stdout"].splitlines()):
            if re.match(r"^\s*\{", line):
                try:
                    parsed = json.loads(line)
                    break
                except Exception:
                    pass
        bench["parsed"] = parsed
        if not r["ok"] or parsed is None:
            failed.append("bench")
        else:
            prev = last_green_bench()
            if prev is not None:
                path, prev_val = prev
                ratio = parsed["value"] / prev_val
                bench["prev_green"] = {"path": os.path.basename(path),
                                       "value": prev_val,
                                       "ratio": round(ratio, 3)}
                if ratio > args.regress_tol:
                    print(f"[gate] bench REGRESSION: {parsed['value']} ms vs "
                          f"{prev_val} ms in {path} "
                          f"(ratio {ratio:.2f} > {args.regress_tol})",
                          flush=True)
                    failed.append("bench-regression")
        results["bench"] = bench

    results["ok"] = not failed
    results["failed"] = failed
    results["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open(os.path.join(REPO, "RELEASE_GATE.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(f"[gate] {'GREEN' if not failed else 'RED: ' + ', '.join(failed)}",
          flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
