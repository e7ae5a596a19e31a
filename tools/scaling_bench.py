#!/usr/bin/env python
"""Scaling-efficiency harness: sharded throughput at 1..N devices.

On a real multi-chip slice this measures the BASELINE north-star
(>= 85% efficiency 1 -> N); on a single-chip/virtual rig it still runs,
reporting relative efficiency on whatever devices exist (virtual CPU
devices share one socket, so the numbers there validate plumbing, not
hardware scaling).

    python tools/scaling_bench.py --devices 1 2 4 8 --size 256 --batch 32
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--devices", type=int, nargs="+", default=None,
                   help="device counts to test (defaults to 1..all)")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch", type=int, default=32,
                   help="per-device batch (weak scaling)")
    p.add_argument("--ch", type=int, default=3)
    p.add_argument("--repeats", type=int, default=50)
    p.add_argument("--workload", default="dwt",
                   choices=["dwt", "scat"])
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import lax
    from jax.sharding import Mesh
    import pytorch_wavelets_tpu as tw

    all_dev = jax.devices()
    counts = args.devices or [n for n in (1, 2, 4, 8, 16, 32)
                              if n <= len(all_dev)]
    if args.workload == "dwt":
        fwd = tw.DWTForward(J=3, wave="db4", mode="periodization")
        inv = tw.DWTInverse(wave="db4", mode="periodization")

        def step(z):
            return inv(fwd(z))
    else:
        m = tw.ScatLayerj2()

        def step(z):
            out = m(z)
            return z * 0.999 + 1e-12 * out.mean()

    results = []
    base = None
    for n in counts:
        mesh = Mesh(np.array(all_dev[:n]), ("data",))
        shape = (args.batch * n, args.ch, args.size, args.size)
        x = jnp.asarray(np.random.RandomState(0).randn(*shape)
                        .astype(np.float32))
        x = jax.device_put(x, NamedSharding(mesh, P("data")))

        @jax.jit
        def chained(z):
            return jnp.sum(lax.fori_loop(
                0, args.repeats, lambda i, a: step(a), z))

        @jax.jit
        def trivial(z):
            return jnp.sum(z) * 0.0

        float(chained(x))
        float(trivial(x))

        def best(f):
            b = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                float(f(x))
                b = min(b, time.perf_counter() - t0)
            return b

        dt = max(best(chained) - best(trivial), 1e-9) / args.repeats
        mpix = np.prod(shape) / 1e6 / dt
        if base is None:
            base = mpix / n
        eff = mpix / (n * base)
        r = {"devices": n, "mpix_per_s": round(float(mpix), 1),
             "efficiency": round(float(eff), 3)}
        print(json.dumps(r))
        results.append(r)
    return results


if __name__ == "__main__":
    main()
