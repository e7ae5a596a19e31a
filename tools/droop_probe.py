#!/usr/bin/env python
"""Attack the 256x256 batch-32/64 bandwidth droop (VERDICT r2 weak #2).

docs/performance.md §"The 256/batch-32 dip" diagnoses the droop as an
XLA fusion/layout choice on the larger working set (bytes/pixel flat,
achieved bandwidth down 1.21 -> 0.93 -> 0.76 TB/s at batch 16/32/64).
This probe measures candidate mitigations that shrink the per-step
working set back to the batch-8..16 regime without changing semantics:

  baseline   jit(inv(fwd(x))) on the full batch
  map8/map16 lax.map over batch chunks of 8/16 (sequential chunk loop
             inside one program)
  split2     two half-batch pyramids concatenated inside one program

Each variant is a shape-preserving fn timed with the chained-fori_loop
harness (utils/profiling.time_op — tunnel latency subtracted).  Run on
the real chip:

    python tools/droop_probe.py --size 256 --batches 8 32 64

Prints one JSON line per (variant, batch) with Mpix/s.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batches", type=int, nargs="+", default=[8, 32, 64])
    p.add_argument("--channels", type=int, default=3)
    p.add_argument("--J", type=int, default=3)
    p.add_argument("--repeats", type=int, default=30)
    p.add_argument("--cpu", action="store_true",
                   help="force CPU (smoke test only)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from jax import lax
    import pytorch_wavelets_tpu as tw
    from pytorch_wavelets_tpu.utils.profiling import time_op, mpix_per_s

    fwd = tw.DTCWTForward(J=args.J)
    inv = tw.DTCWTInverse()

    def rt(z):
        return inv(fwd(z))

    def make_map(chunk):
        def f(z):
            b = z.shape[0]
            if b % chunk or b == chunk:
                return rt(z)
            zc = z.reshape(b // chunk, chunk, *z.shape[1:])
            return lax.map(rt, zc).reshape(z.shape)
        return f

    def split2(z):
        b = z.shape[0]
        if b < 2 or b % 2:
            return rt(z)
        return jnp.concatenate([rt(z[:b // 2]), rt(z[b // 2:])], axis=0)

    variants = [("baseline", rt), ("map8", make_map(8)),
                ("map16", make_map(16)), ("split2", split2)]

    rows = []
    for batch in args.batches:
        shape = (batch, args.channels, args.size, args.size)
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(*shape).astype(np.float32))
        for name, f in variants:
            # correctness pin before timing
            ref = np.asarray(rt(x[:2]))
            got = np.asarray(f(x))[:2]
            assert np.allclose(got, ref, atol=1e-4), (name, batch)
            sec = time_op(f, x, repeats=args.repeats)
            row = {"variant": name, "size": args.size, "batch": batch,
                   "mpix_per_s": round(mpix_per_s(shape, sec), 1)}
            rows.append(row)
            print(json.dumps(row), flush=True)
    return rows


if __name__ == "__main__":
    main()
