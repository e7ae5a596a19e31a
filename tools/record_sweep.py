#!/usr/bin/env python
"""Machine-record the perf matrix as a committed SWEEP_r{N}.json artifact.

VERDICT r2 weak #5: only the 128x128/J=2 headline was machine-recorded
per round (BENCH_r*.json); the size x batch sweep and the large-image
rows in docs/performance.md were hand-pasted, so an off-headline
regression would be invisible to the round driver.  This tool runs the
standard matrix through benchmarks/sweep.py (chained-fori_loop timing,
tunnel latency subtracted — utils/profiling.py) and writes one JSON
artifact for the round:

    python tools/record_sweep.py SWEEP_r3.json

Compare rounds with:  python tools/record_sweep.py --diff A.json B.json
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from benchmarks.sweep import main as sweep  # noqa: E402

# The standard matrix: the reference's speed-vs-scale / speed-vs-batch
# curves (README.rst:107-127) + the large-image single-image rows + the
# scatternet deployment shape (reference docs/scatternet.rst:31-41).
MATRIX = [
    ["--dtcwt", "--sizes", "64", "128", "256", "512", "1024",
     "--batches", "1", "8", "32"],
    ["--dtcwt", "--sizes", "2048", "4096", "--batches", "1", "-j", "3"],
    ["--dwt", "--sizes", "256", "1024", "--batches", "8"],
    ["--scat", "--sizes", "256", "--batches", "8", "32", "64", "128"],
    ["--scat", "--sizes", "256", "--batches", "8", "32", "--grad"],
    # the storage-dtype dial at the byte-bound shape (rows are tagged
    # 'dtcwt_e2e+bfloat16' so cross-round diffs keep keys distinct)
    ["--dtcwt", "--sizes", "2048", "--batches", "4", "-j", "3",
     "--coeff-dtype", "bfloat16"],
]


def record(path):
    out = {"argv_matrix": MATRIX, "rows": [],
           "recorded_unix": int(time.time())}
    try:
        import jax
        out["backend"] = jax.default_backend()
    except Exception:
        out["backend"] = "unknown"
    for argv in MATRIX:
        out["rows"].extend(sweep(argv))
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path} ({len(out['rows'])} rows)")


def diff(a_path, b_path, tol=0.12):
    a = {(r["workload"], r["size"], r["batch"]): r["mpix_per_s"]
         for r in json.load(open(a_path))["rows"]}
    b = {(r["workload"], r["size"], r["batch"]): r["mpix_per_s"]
         for r in json.load(open(b_path))["rows"]}
    worst = 0.0
    for k in sorted(set(a) & set(b)):
        rel = (b[k] - a[k]) / a[k]
        flag = "  REGRESSION" if rel < -tol else ""
        print(f"{k}: {a[k]:.0f} -> {b[k]:.0f} Mpix/s "
              f"({rel * 100:+.1f}%){flag}")
        worst = min(worst, rel)
    return worst >= -tol


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--diff":
        ok = diff(sys.argv[2], sys.argv[3])
        sys.exit(0 if ok else 1)
    record(sys.argv[1] if len(sys.argv) > 1 else "SWEEP.json")
