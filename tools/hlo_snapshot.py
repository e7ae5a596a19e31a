#!/usr/bin/env python
"""Chip-independent perf-shape regression canary (VERDICT r4 task 3).

The axon TPU tunnel can vanish for whole rounds; while it is down nothing
used to catch a perf-shape regression (a lost fusion, an extra
transpose/copy, changed dot shapes, bytes-accessed growth).  This tool
compiles the headline program — the bench.py DTCWT J=2 end-to-end round
trip on the 10x10x128x128 batch, with the operator-matmul path FORCED so
the TPU program structure is what gets fingerprinted — on the CPU backend,
and extracts a structural fingerprint from the optimized HLO:

  * dot instruction count + the sorted multiset of their result shapes
    (the MXU work: these must not change silently)
  * convolution / fusion / transpose / copy / concatenate / reshape counts
  * total instruction count
  * XLA cost-analysis flops + bytes accessed (when the backend reports it)

Usage:
  python tools/hlo_snapshot.py OUT.json            # write fingerprint
  python tools/hlo_snapshot.py OUT.json --check BASELINE.json
                                                   # also compare; rc=1 on drift

The committed baseline is HLO_SNAPSHOT.json at the repo root;
tests/test_hlo_snapshot.py recomputes the fingerprint and asserts it
matches (exact on dot shapes, within tolerance on fusion-level counts —
those are compiler heuristics, not program semantics).

Reference analogue: the archived nvprof kernel tables the reference backs
its speed claims with (/root/reference/tests/profiles/end_to_end_j2.prof).
"""
from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# Counts that only move if the traced program itself changes.
EXACT_KEYS = ("dot_count", "dot_shapes", "convolution_count")
# Compiler-heuristic counts: allow drift within tolerance.
TOL_KEYS = {
    "fusion_count": 0.25,
    "transpose_count": 0.25,
    "copy_count": 0.25,
    "concatenate_count": 0.25,
    "reshape_count": 0.25,
    "instruction_count": 0.15,
    "flops": 0.10,
    "bytes_accessed": 0.10,
}

_INSTR = re.compile(r"^\s*(?:ROOT\s+)?%?[\w.-]+ = (\S+?)\s+(\w+)\(")


def fingerprint_hlo(txt: str) -> dict:
    """Structural fingerprint of an optimized-HLO text dump."""
    ops = Counter()
    dot_shapes = Counter()
    for line in txt.splitlines():
        m = _INSTR.match(line)
        if not m:
            continue
        shape, op = m.groups()
        ops[op] += 1
        if op == "dot":
            dot_shapes[shape.split("{")[0]] += 1
    return {
        "dot_count": ops["dot"],
        "dot_shapes": sorted(f"{k} x{v}" for k, v in dot_shapes.items()),
        "convolution_count": ops["convolution"],
        "fusion_count": ops["fusion"],
        "transpose_count": ops["transpose"],
        "copy_count": ops["copy"],
        "concatenate_count": ops["concatenate"],
        "reshape_count": ops["reshape"],
        "instruction_count": sum(ops.values()),
    }


def headline_fingerprint() -> dict:
    """Compile the bench.py headline program (forced matmul, CPU backend)
    and fingerprint its optimized HLO."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    import pytorch_wavelets_tpu as tw
    from pytorch_wavelets_tpu.ops import banded

    N, C, H, W = 10, 10, 128, 128  # bench.py headline shape
    x = jnp.asarray(np.random.RandomState(0).randn(N, C, H, W)
                    .astype(np.float32))
    fwd = tw.DTCWTForward(J=2, biort="near_sym_a", qshift="qshift_a")
    inv = tw.DTCWTInverse(biort="near_sym_a", qshift="qshift_a")

    banded.set_operator_matmul(True)
    try:
        compiled = (jax.jit(lambda z: inv(fwd(z))).lower(x).compile())
    finally:
        banded.set_operator_matmul(None)

    fp = fingerprint_hlo(compiled.as_text())
    try:  # backend-dependent; absent entries are simply omitted
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        if cost and "flops" in cost:
            fp["flops"] = int(cost["flops"])
        if cost and "bytes accessed" in cost:
            fp["bytes_accessed"] = int(cost["bytes accessed"])
    except Exception:
        pass
    fp["program"] = "dtcwt_j2_end_to_end_10x10x128x128_forced_matmul"
    fp["backend"] = "cpu"
    return fp


def compare(got: dict, want: dict) -> list:
    """Drift report between two fingerprints; empty list == match."""
    problems = []
    for k in EXACT_KEYS:
        if got.get(k) != want.get(k):
            problems.append(f"{k}: got {got.get(k)!r} != baseline {want.get(k)!r}")
    for k, tol in TOL_KEYS.items():
        g, w = got.get(k), want.get(k)
        if g is None or w is None:  # cost-analysis keys may be absent
            continue
        if w == 0:
            if g != 0:
                problems.append(f"{k}: got {g} != baseline 0")
        elif abs(g - w) / w > tol:
            problems.append(f"{k}: got {g}, baseline {w} (tol {tol:.0%})")
    return problems


def main(argv):
    out = argv[1] if len(argv) > 1 else "HLO_SNAPSHOT.json"
    fp = headline_fingerprint()
    with open(out, "w") as f:
        json.dump(fp, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out}: {fp['dot_count']} dots, "
          f"{fp['fusion_count']} fusions, "
          f"{fp['instruction_count']} instructions")
    if "--check" in argv:
        base = argv[argv.index("--check") + 1]
        with open(base) as f:
            want = json.load(f)
        problems = compare(fp, want)
        if problems:
            print("DRIFT vs", base)
            for p in problems:
                print(" ", p)
            return 1
        print("matches", base)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
