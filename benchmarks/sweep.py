#!/usr/bin/env python
"""Throughput sweep over image sizes and batch sizes — the TPU analogue of
the reference's speed-vs-scale / speed-vs-batch curves (reference
README.rst:107-127, docs/scale.png, docs/batchsize.png).

Prints a JSON line per point and a markdown table at the end.

    python benchmarks/sweep.py --dtcwt --sizes 64 128 256 512 --batches 1 8 32
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dwt", action="store_true")
    p.add_argument("--dtcwt", action="store_true")
    p.add_argument("--scat", action="store_true")
    p.add_argument("--sizes", type=int, nargs="+",
                   default=[64, 128, 256, 512])
    p.add_argument("--batches", type=int, nargs="+", default=[1, 8, 32])
    p.add_argument("--ch", type=int, default=3)
    p.add_argument("-j", "--levels", type=int, default=3)
    p.add_argument("--wave", default="db4")
    p.add_argument("--repeats", type=int, default=50)
    p.add_argument("--grad", action="store_true",
                   help="time forward+backward (VJP through the forward "
                        "coefficients; scatternet: loss on the output)")
    p.add_argument("--coeff-dtype", default=None, metavar="DTYPE",
                   help="bandpass storage dtype dial (e.g. bfloat16); "
                        "rows are tagged so diffs don't collide")
    p.add_argument("--precision", default=None,
                   choices=["highest", "high", "default"],
                   help="matmul precision dial")
    args = p.parse_args(argv)
    if not (args.dwt or args.dtcwt or args.scat):
        args.dtcwt = True

    import jax
    import numpy as np
    import jax.numpy as jnp
    import pytorch_wavelets_tpu as tw
    from pytorch_wavelets_tpu.utils.profiling import (coeff_loss, time_op,
                                                      mpix_per_s)

    if args.precision:
        tw.set_matmul_precision(args.precision)
    tag = "".join([f"+{args.coeff_dtype}" if args.coeff_dtype else "",
                   f"+{args.precision}" if args.precision else ""])

    if args.dwt:
        fwd = tw.DWTForward(J=args.levels, wave=args.wave,
                            coeff_dtype=args.coeff_dtype)
        inv = tw.DWTInverse(wave=args.wave)
        name, fn = "dwt_e2e", lambda z: inv(fwd(z))
        if args.grad:
            g = jax.grad(lambda z: coeff_loss(fwd(z)))
            name, fn = "dwt_fwd_bwd", lambda z: z * 0.999 + 1e-12 * g(z)
    elif args.dtcwt:
        fwd = tw.DTCWTForward(J=args.levels, coeff_dtype=args.coeff_dtype)
        inv = tw.DTCWTInverse()
        name, fn = "dtcwt_e2e", lambda z: inv(fwd(z))
        if args.grad:
            g = jax.grad(lambda z: coeff_loss(fwd(z)))
            name, fn = ("dtcwt_fwd_bwd",
                        lambda z: z * 0.999 + 1e-12 * g(z))
    else:
        m = tw.ScatLayerj2()
        name = "scatj2_fwd"

        def fn(z):
            out = m(z)
            return z * 0.999 + 1e-12 * out.mean()

        if args.grad:
            gs = jax.grad(lambda z: jnp.sum(m(z) ** 2))
            name, fn = ("scatj2_fwd_bwd",
                        lambda z: z * 0.999 + 1e-12 * gs(z))

    name += tag
    rows = []
    for size in args.sizes:
        for batch in args.batches:
            shape = (batch, args.ch, size, size)
            x = jnp.asarray(np.random.RandomState(0).randn(*shape)
                            .astype(np.float32))
            # keep total chained work well above timer/dispatch noise
            npix = batch * args.ch * size * size
            repeats = max(args.repeats, int(3e8 // max(npix, 1)))
            dt = time_op(fn, x, repeats=repeats)
            r = {"workload": name, "size": size, "batch": batch,
                 "ms": round(dt * 1e3, 4),
                 "mpix_per_s": round(mpix_per_s(shape, dt), 1)}
            print(json.dumps(r))
            rows.append(r)

    print(f"\n| size \\ batch | " +
          " | ".join(str(b) for b in args.batches) + " |")
    print("|---" * (len(args.batches) + 1) + "|")
    for size in args.sizes:
        vals = [r for r in rows if r["size"] == size]
        print(f"| {size} | " +
              " | ".join(f"{v['mpix_per_s']:.0f}" for v in vals) + " |")
    return rows


if __name__ == "__main__":
    main()
