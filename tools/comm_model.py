#!/usr/bin/env python
"""Per-level communication-volume model of the sharded operator paths.

Pure trace-time analysis — no devices needed.  For each transform config
and spatial shard count it builds the actual sharded operator plans
(parallel/banded_shard.py), reads off the exact halo widths, and reports
per-device bytes ppermuted vs local MXU FLOPs per apply, plus the ICI
bandwidth needed to keep the halo exchange under 15% of step time (the
>=85% BASELINE north star) at a given sustained compute rate.

    python tools/comm_model.py                # table + JSON lines
    python tools/comm_model.py --tflops 20    # assumed sustained TFLOP/s
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _op_row_flops(op):
    """MXU multiply-adds per (H-row, N, C) of one sharded apply,
    band-plan aware (the runtime apply contracts only the planned
    segments)."""
    if op.band_plan is None:
        return 2 * op.blocks.shape[1] * op.blocks.shape[2]
    return sum(2 * (r1 - r0) * sum(c1 - c0 for c0, c1 in segs)
               for r0, r1, segs in op.band_plan)


def _dwt_rows(wave, J, W, n):
    """(name, halo_cols, flops_per_row, tile) per level of the sharded
    DWT analysis row path."""
    from pytorch_wavelets_tpu.transforms.dwt import dec_filters
    from pytorch_wavelets_tpu.parallel.sharded import (
        _dwt_row_analysis_plans)
    h0c, h1c, h0r, h1r = dec_filters(wave)
    rh = (tuple(np.asarray(h0r)[::-1]), tuple(np.asarray(h1r)[::-1]))
    ops = _dwt_row_analysis_plans(rh, J, W, n)
    out = []
    w = W
    for j, op in enumerate(ops):
        # level j acts on the level-j lowpass: H has halved j times
        out.append((f"dwt level {j}", op.halo_left + op.halo_right,
                    _op_row_flops(op), w // n, 0.5 ** j))
        w //= 2
    return out


def _dtcwt_pyramid(biort, qshift, J, H, W, n):
    from pytorch_wavelets_tpu.transforms.dtcwt import _fwd_pyramid_plan
    from pytorch_wavelets_tpu.transforms.dtcwt_xfm import dtcwt_fwd_filters
    from pytorch_wavelets_tpu.parallel.sharded import _pyramid_shard_op
    f = dtcwt_fwd_filters(biort, qshift)
    plan = _fwd_pyramid_plan(f["h0o"], f["h1o"], f["h0a"], f["h1a"],
                             f["h0b"], f["h1b"], J, (False,) * J,
                             (False,) * J, "symmetric", H, W)
    if plan is None:
        return None
    op = _pyramid_shard_op(plan, W, n)
    if op is None:
        return None
    return [(f"dtcwt pyramid J={J} (single stage-1 apply)",
             op.halo_left + op.halo_right, _op_row_flops(op), W // n,
             1.0)]


def analyse(rows, N, C, H, n, tflops, target=0.85):
    """rows: (name, halo_cols, flops_per_row, tile).  Returns records
    with bytes ppermuted per device, local stage-1 FLOPs, intensity, and
    the ICI bandwidth needed for <= (1-target) comm fraction (no
    overlap)."""
    recs = []
    for name, halo, row_flops, tile, h_scale in rows:
        Hj = int(H * h_scale)                # rows at this level's input
        bytes_dev = halo * Hj * N * C * 4                # f32 halo columns
        flops_dev = row_flops * Hj * N * C               # banded stage-1
        t_comp = flops_dev / (tflops * 1e12)
        bw_req = bytes_dev / (t_comp * (1 - target) / target) if t_comp \
            else float("inf")
        recs.append({
            "stage": name, "halo_cols": int(halo), "tile_cols": int(tile),
            "mbytes_ppermute_per_dev": round(bytes_dev / 1e6, 3),
            "gflops_per_dev": round(flops_dev / 1e9, 3),
            "flops_per_byte": round(flops_dev / max(bytes_dev, 1), 1),
            "gbps_ici_needed_for_85pct": round(bw_req / 1e9, 2),
        })
    return recs


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--ch", type=int, default=3)
    p.add_argument("--tflops", type=float, default=20.0,
                   help="assumed sustained MXU TFLOP/s at f32-exact")
    args = p.parse_args(argv)

    configs = [
        ("dwt db4 J=3 1024", lambda n: _dwt_rows("db4", 3, 1024, n), 1024),
        ("dwt db4 J=3 4096", lambda n: _dwt_rows("db4", 3, 4096, n), 4096),
        ("dtcwt J=3 1024",
         lambda n: _dtcwt_pyramid("near_sym_a", "qshift_a", 3, 1024, 1024,
                                  n), 1024),
        ("dtcwt J=3 4096",
         lambda n: _dtcwt_pyramid("near_sym_a", "qshift_a", 3, 4096, 4096,
                                  n), 4096),
    ]
    out = []
    for name, fn, H in configs:
        for n in (2, 4, 8):
            try:
                rows = fn(n)
            except ValueError as e:
                print(json.dumps({"config": name, "shards": n,
                                  "skipped": str(e)[:80]}))
                continue
            if rows is None:
                continue
            for r in analyse(rows, args.batch, args.ch, H, n, args.tflops):
                rec = {"config": name, "shards": n, **r}
                out.append(rec)
                print(json.dumps(rec))
    return out


if __name__ == "__main__":
    main()
