#!/usr/bin/env python
"""Assemble the scaling-efficiency evidence artifact (SCALING_r*.json).

Three independent legs, none needing multi-chip hardware:

1. **Analytic communication model** (tools/comm_model.py): exact halo
   widths read off the sharded operator plans -> bytes ppermuted vs
   banded MXU FLOPs per device, and the ICI bandwidth that keeps the
   exchange under 15% of step time.
2. **Compiled-program cross-check**: the spatially-sharded DWT/DTCWT are
   compiled for an 8-device mesh and every `collective-permute` in the
   optimized HLO is extracted with its shape; the summed bytes must
   match the analytic model (and there must be no all-gather) — ties the
   model to the program that would run on a pod.
3. **Virtual-mesh plumbing curve** (tools/scaling_bench.py): batch-DP
   throughput at 1..8 virtual CPU devices.  Shared-core, so it validates
   execution and sharding mechanics only — NOT hardware efficiency; the
   file labels it as such.

Usage:  python tools/scaling_evidence.py [--out SCALING_r2.json]
"""
import argparse
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def hlo_collectives(txt):
    """(op kind -> [byte counts]) for collective ops in optimized HLO."""
    out = {}
    for kind in ("collective-permute", "all-gather", "all-reduce",
                 "all-to-all"):
        pat = re.compile(r"= (\w+)\[([\d,]*)\]\S* " + kind + r"\(")
        sizes = []
        for m in pat.finditer(txt):
            dtype, dims = m.group(1), m.group(2)
            bits = {"f32": 4, "bf16": 2, "f16": 2, "f64": 8,
                    "s32": 4, "u32": 4, "pred": 1}.get(dtype, 4)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            sizes.append(n * bits)
        if sizes:
            out[kind] = sizes
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="SCALING_r3.json")
    p.add_argument("--skip-curve", action="store_true",
                   help="reuse no plumbing curve (fast mode)")
    args = p.parse_args(argv)

    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pytorch_wavelets_tpu.ops import banded
    from pytorch_wavelets_tpu.parallel import make_mesh
    from pytorch_wavelets_tpu.parallel.sharded import (
        sharded_dwt2d, _sharded_dtcwt2d_matmul)
    from pytorch_wavelets_tpu.transforms.dtcwt_xfm import dtcwt_fwd_filters
    import tools.comm_model as cm

    banded.set_operator_matmul(True)
    try:
        result = {"note": ("evidence for the >=85% scaling-efficiency "
                           "north star without multi-chip hardware; see "
                           "docs/parallel.md 'Scaling evidence'")}

        # --- leg 1: analytic model -----------------------------------
        result["comm_model_tflops_assumed"] = 20.0
        result["comm_model"] = cm.main([])

        # --- leg 2: HLO cross-check ----------------------------------
        mesh = make_mesh(n_data=1, n_spatial=8)
        N, C, H, W = 2, 3, 64, 1024
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(N, C, H, W).astype(np.float32))
        spec = NamedSharding(mesh, P("data", None, None, "spatial"))
        J = 3

        def run_dwt(z):
            return sharded_dwt2d(z, mesh, wave="db4", J=J)

        txt = (jax.jit(run_dwt, in_shardings=spec)
               .lower(jax.device_put(x, spec)).compile().as_text())
        got = hlo_collectives(txt)
        # analytic: per level, (hl + hr) halo columns of (N, C, H) f32,
        # counted once per direction (two ppermutes of hl and hr cols)
        rows = cm._dwt_rows("db4", J, W, 8)
        model_bytes = sum(int(halo * N * C * H * hs * 4)
                          for _, halo, _, _, hs in rows)
        hlo_bytes = sum(got.get("collective-permute", []))
        result["hlo_check_dwt"] = {
            "collective_permutes": len(got.get("collective-permute", [])),
            "hlo_bytes": int(hlo_bytes),
            "model_bytes": int(model_bytes),
            "all_gather_present": "all-gather" in got,
            "all_reduce_present": "all-reduce" in got,
        }
        assert not got.get("all-gather"), "unexpected all-gather"
        assert hlo_bytes == model_bytes, (hlo_bytes, model_bytes)

        f = dtcwt_fwd_filters("near_sym_a", "qshift_a")
        x2 = jnp.asarray(np.random.RandomState(1)
                         .randn(N, C, 128, W).astype(np.float32))

        def run_dtcwt(z):
            return _sharded_dtcwt2d_matmul(z, mesh, f, 3, "symmetric")

        txt2 = (jax.jit(run_dtcwt, in_shardings=spec)
                .lower(jax.device_put(x2, spec)).compile().as_text())
        got2 = hlo_collectives(txt2)
        pyr = cm._dtcwt_pyramid("near_sym_a", "qshift_a", 3, 128, W, 8)
        model2 = sum(halo * N * C * 128 * 4 for _, halo, _, _, _ in pyr)
        hlo2 = sum(got2.get("collective-permute", []))
        result["hlo_check_dtcwt"] = {
            "collective_permutes": len(got2.get("collective-permute", [])),
            "hlo_bytes": int(hlo2),
            "model_bytes": int(model2),
            "all_gather_present": "all-gather" in got2,
        }
        assert not got2.get("all-gather"), "unexpected all-gather"
        assert hlo2 == model2, (hlo2, model2)

        # --- leg 2c: per-level (giant-image) DTCWT path --------------
        # Same code path the W>MAX_MATMUL_N pyramid runs
        # (tests/test_parallel_giant.py), compiled here at a small W so
        # the HLO check stays fast; halo widths read off the actual
        # per-level ShardedOp plans.
        from pytorch_wavelets_tpu.parallel.sharded import (
            _sharded_dtcwt2d_perlevel, _dtcwt_fwd_perlevel_shard_plans)
        from pytorch_wavelets_tpu.transforms.dtcwt_xfm import dtcwt2d
        H3 = 128

        def run_pl(z):
            return _sharded_dtcwt2d_perlevel(z, mesh, f, 3, "symmetric")

        x3 = jnp.asarray(np.random.RandomState(2)
                         .randn(N, C, H3, W).astype(np.float32))
        txt3 = (jax.jit(run_pl, in_shardings=spec)
                .lower(jax.device_put(x3, spec)).compile().as_text())
        got3 = hlo_collectives(txt3)
        plans = _dtcwt_fwd_perlevel_shard_plans(
            f["h0o"], f["h1o"], f["h0a"], f["h1a"], f["h0b"], f["h1b"],
            3, (False,) * 3, "symmetric", H3, W, 8, 1)
        scales, _ = dtcwt2d(x3, f, J=3, include_scale=True)
        heights = [H3] + [s.shape[2] for s in scales[:-1]]
        model3 = sum((op.halo_left + op.halo_right) * N * C * h * 4
                     for (op, _), h in zip(plans, heights))
        hlo3 = sum(got3.get("collective-permute", []))
        result["hlo_check_dtcwt_perlevel"] = {
            "collective_permutes": len(got3.get("collective-permute",
                                                [])),
            "hlo_bytes": int(hlo3),
            "model_bytes": int(model3),
            "all_gather_present": "all-gather" in got3,
            "all_reduce_present": "all-reduce" in got3,
        }
        assert not got3.get("all-gather"), "unexpected all-gather"
        assert hlo3 == model3, (hlo3, model3)

        # --- leg 2d: per-level DTCWT INVERSE (incl. a skipped level) --
        # The synthesis twin of leg 2c, with level 1 skipped so the
        # None-level lowpass-only branch (VERDICT r3 task 5) is in the
        # compiled program; model bytes walk the actual plan strategies.
        from pytorch_wavelets_tpu.parallel.sharded import (
            _sharded_idtcwt2d_perlevel, _dtcwt_inv_perlevel_shard_plans)
        from pytorch_wavelets_tpu.transforms.dtcwt_xfm import (
            dtcwt_inv_filters)
        fi = dtcwt_inv_filters("near_sym_a", "qshift_a")
        yl4, yh4 = dtcwt2d(x3, f, J=3, mode="symmetric")
        yh4 = [yh4[0], None, yh4[2]]

        def run_pli(ll, hs):
            return _sharded_idtcwt2d_perlevel((ll, hs), mesh, fi,
                                              "symmetric")

        spec6 = NamedSharding(mesh, P("data", None, None, None,
                                      "spatial", None))
        yl4s = jax.device_put(yl4, spec)
        yh4s = [None if h is None else jax.device_put(h, spec6)
                for h in yh4]
        txt4 = jax.jit(run_pli).lower(yl4s, yh4s).compile().as_text()
        got4 = hlo_collectives(txt4)
        sizes_i = tuple(None if h is None else (h.shape[3], h.shape[4])
                        for h in yh4)
        plans_i = _dtcwt_inv_perlevel_shard_plans(
            fi["g0o"], fi["g1o"], fi["g0a"], fi["g1a"], fi["g0b"],
            fi["g1b"], "symmetric", (yl4.shape[2], yl4.shape[3]),
            sizes_i, 8, 1)
        model4, cur_h = 0, yl4.shape[2]
        for (lv, ll_row, ll_col), hw in zip(plans_i, sizes_i[::-1]):
            if hw is not None:
                for members, row, _col in lv:
                    if row[0] == "shard":
                        op = row[1]
                        model4 += (2 * N * C * (2 * hw[0] * len(members))
                                   * (op.halo_left + op.halo_right) * 4)
            if ll_row[0] == "shard":
                op = ll_row[1]
                model4 += (N * C * cur_h
                           * (op.halo_left + op.halo_right) * 4)
            cur_h = (ll_col[1].shape[0] if ll_col[0] == "local"
                     else 2 * cur_h)
        hlo4 = sum(got4.get("collective-permute", []))
        result["hlo_check_dtcwt_perlevel_inverse"] = {
            "skipped_level": 1,
            "collective_permutes": len(got4.get("collective-permute",
                                                [])),
            "hlo_bytes": int(hlo4),
            "model_bytes": int(model4),
            "all_gather_present": "all-gather" in got4,
            "all_reduce_present": "all-reduce" in got4,
        }
        assert not got4.get("all-gather"), "unexpected all-gather"
        assert hlo4 == model4, (hlo4, model4)

        # --- leg 2e: per-level ICI thresholds at the giant regime -----
        # Analytic bytes/FLOPs per device for the W=12288 per-level
        # forward plans (the regime the path exists for); intensity and
        # the gbps-for-85% threshold are H-independent (bytes and FLOPs
        # both scale with H), so H=1024 keeps the plan build cheap.
        Wg, Hg = 12288, 1024
        plans_g = _dtcwt_fwd_perlevel_shard_plans(
            f["h0o"], f["h1o"], f["h0a"], f["h1a"], f["h0b"], f["h1b"],
            2, (False,) * 2, "symmetric", Hg, Wg, 8, 1)
        rows_g = []
        hj = Hg
        for j, (op, _s2) in enumerate(plans_g):
            rows_g.append((f"dtcwt perlevel W={Wg} level {j}",
                           op.halo_left + op.halo_right,
                           cm._op_row_flops(op), sum(op.col_tiles),
                           hj / Hg))
            hj = hj // 2
        result["comm_model_perlevel_giant"] = cm.analyse(
            rows_g, N, C, Hg, 8, result["comm_model_tflops_assumed"])

    finally:
        banded.set_operator_matmul(None)

    # --- leg 3: plumbing curve (default dispatch, NOT forced matmul) --
    if not args.skip_curve:
        from tools import scaling_bench
        result["virtual_mesh_plumbing_curve"] = {
            "caveat": ("8 virtual devices share one CPU socket: "
                       "validates sharded execution, NOT hardware "
                       "scaling efficiency"),
            "points": scaling_bench.main(
                ["--devices", "1", "2", "4", "8", "--size", "128",
                 "--batch", "8", "--repeats", "20"]),
        }

    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print("wrote", args.out)
    return result


if __name__ == "__main__":
    main()
