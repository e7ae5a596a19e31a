"""Chip-independent perf-shape regression gate (VERDICT r4 task 3).

Recompiles the bench.py headline program (DTCWT J=2 end-to-end,
10x10x128x128, operator-matmul forced) on the CPU backend and asserts its
optimized-HLO fingerprint still matches the committed HLO_SNAPSHOT.json:
exact on dot count/shapes (the MXU work), within tolerance on
fusion-heuristic counts and cost-analysis totals.  This is what catches a
lost fusion, an extra transpose/copy, or changed dot shapes while the TPU
tunnel is down.

If this fails after an INTENTIONAL change to the compute path, regenerate
the baseline: `python tools/hlo_snapshot.py HLO_SNAPSHOT.json` and commit
it alongside the change.
"""
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "HLO_SNAPSHOT.json")


def test_headline_hlo_fingerprint_matches_snapshot():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import hlo_snapshot
    finally:
        sys.path.pop(0)
    with open(BASELINE) as f:
        want = json.load(f)
    got = hlo_snapshot.headline_fingerprint()
    problems = hlo_snapshot.compare(got, want)
    assert not problems, (
        "headline-program HLO drifted from HLO_SNAPSHOT.json:\n  "
        + "\n  ".join(problems)
        + "\nIf intentional: python tools/hlo_snapshot.py HLO_SNAPSHOT.json"
    )
