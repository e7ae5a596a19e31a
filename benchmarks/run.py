#!/usr/bin/env python
"""Benchmark CLI: throughput (Mpix/s) for the library's transform
families, mirroring the reference's workload driver flags
(reference tests/profile.py:13-38) on TPU-appropriate measurement.

Examples:
    python benchmarks/run.py --dtcwt -j 2 --size 128 --batch 10 --ch 10
    python benchmarks/run.py --dwt --wave db4 -j 3 --size 512 --batch 32
    python benchmarks/run.py --scat --size 256 --batch 128 --grad
    python benchmarks/run.py --dtcwt --trace /tmp/trace   # xprof trace
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dwt", action="store_true", help="2-D DWT fwd+inv")
    p.add_argument("--dtcwt", action="store_true", help="DTCWT fwd+inv")
    p.add_argument("--swt", action="store_true", help="SWT fwd+inv")
    p.add_argument("--scat", action="store_true", help="ScatLayerj2 fwd")
    p.add_argument("--forward", action="store_true",
                   help="forward transform only")
    p.add_argument("--inverse", action="store_true",
                   help="inverse transform only (coefficients precomputed "
                        "outside the timed loop; mirrors the reference "
                        "profiler's --inverse, its tests/profile.py)")
    p.add_argument("--grad", action="store_true",
                   help="include the backward pass")
    p.add_argument("-j", "--levels", type=int, default=2)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--batch", type=int, default=10)
    p.add_argument("--ch", type=int, default=10)
    p.add_argument("--wave", default="db4")
    p.add_argument("--biort", default="near_sym_a")
    p.add_argument("--qshift", default="qshift_a")
    p.add_argument("--mode", default="symmetric")
    p.add_argument("--repeats", type=int, default=100)
    p.add_argument("--coeff-dtype", default=None, metavar="DTYPE",
                   help="DTCWT bandpass storage dtype (e.g. bfloat16) — "
                        "the HBM-bandwidth dial on byte-bound shapes")
    p.add_argument("--batch-chunk", type=int, default=None,
                   help="run the transform as a sequential lax.map over "
                        "batch chunks of this size (working-set dial, "
                        "models/_base.py:batch_chunked; DTCWT/scat only). "
                        "Unset = the models' auto default (DTCWT chunks "
                        "to 8 inside the measured droop region); 0 = "
                        "explicitly unchunked")
    p.add_argument("--precision", default=None,
                   choices=["highest", "high", "default"],
                   help="matmul precision dial (ops/precision.py); "
                        "composes with --coeff-dtype")
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="capture a jax.profiler trace into DIR")
    args = p.parse_args(argv)
    if not (args.dwt or args.dtcwt or args.swt or args.scat):
        args.dtcwt = True

    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytorch_wavelets_tpu as tw
    from pytorch_wavelets_tpu.utils.profiling import (coeff_loss, time_op,
                                                      trace, mpix_per_s)

    if args.precision:
        tw.set_matmul_precision(args.precision)

    shape = (args.batch, args.ch, args.size, args.size)
    x = jnp.asarray(np.random.RandomState(0).randn(*shape)
                    .astype(np.float32))
    results = []

    def consume(z, out):
        """Fold every output leaf into a same-shaped result so nothing is
        dead-code-eliminated from a forward-only benchmark."""
        leaves = [v for v in jax.tree.leaves(out) if v is not None]
        return z * 0.999 + 1e-12 * sum(v.mean() for v in leaves)

    def inverse_only(fwd, inv):
        """Chainable inverse-only workload: coefficients are computed once
        outside the loop; each iteration rescales them by a loop-carried
        scalar so XLA cannot hoist the inverse out as loop-invariant."""
        coeffs = jax.tree.map(jnp.asarray, fwd(x))

        def fn(z):
            s = 1.0 + 1e-12 * jnp.mean(z)
            scaled = jax.tree.map(  # keep each leaf's (dial) dtype
                lambda v: v * s.astype(v.dtype), coeffs)
            return z * 0.999 + 1e-6 * inv(scaled)
        return fn

    def run(name, fn):
        if args.trace:
            with trace(args.trace):
                jax.block_until_ready(jax.jit(fn)(x))
        dt = time_op(fn, x, repeats=args.repeats)
        results.append({
            "workload": name, "shape": list(shape),
            "ms": round(dt * 1e3, 4),
            "mpix_per_s": round(mpix_per_s(shape, dt), 1),
        })

    if args.dwt:
        fwd = tw.DWTForward(J=args.levels, wave=args.wave, mode=args.mode,
                            coeff_dtype=args.coeff_dtype)
        inv = tw.DWTInverse(wave=args.wave, mode=args.mode)
        if args.grad:
            g = jax.grad(lambda z: coeff_loss(fwd(z)))
            run("dwt_fwd_bwd", lambda z: z * 0.999 + 1e-12 * g(z))
        elif args.forward:
            run("dwt_fwd", lambda z: consume(z, fwd(z)))
        elif args.inverse:
            run("dwt_inv", inverse_only(fwd, inv))
        else:
            run("dwt_e2e", lambda z: inv(fwd(z)))
    if args.dtcwt:
        fwd = tw.DTCWTForward(J=args.levels, biort=args.biort,
                              qshift=args.qshift, mode=args.mode,
                              coeff_dtype=args.coeff_dtype,
                              batch_chunk=args.batch_chunk)
        inv = tw.DTCWTInverse(biort=args.biort, qshift=args.qshift,
                              mode=args.mode,
                              batch_chunk=args.batch_chunk)
        if args.grad:
            g = jax.grad(lambda z: coeff_loss(fwd(z)))
            run("dtcwt_fwd_bwd", lambda z: z * 0.999 + 1e-12 * g(z))
        elif args.forward:
            run("dtcwt_fwd", lambda z: consume(z, fwd(z)))
        elif args.inverse:
            run("dtcwt_inv", inverse_only(fwd, inv))
        else:
            run("dtcwt_e2e", lambda z: inv(fwd(z)))
    if args.swt:
        fwd = tw.SWTForward(J=args.levels, wave=args.wave,
                            coeff_dtype=args.coeff_dtype)
        inv = tw.SWTInverse(wave=args.wave)
        if args.forward:
            run("swt_fwd", lambda z: consume(z, fwd(z)))
        elif args.inverse:
            run("swt_inv", inverse_only(fwd, inv))
        else:
            run("swt_e2e", lambda z: inv(fwd(z)))
    if args.scat:
        m = tw.ScatLayerj2(biort=args.biort, qshift=args.qshift,
                           batch_chunk=args.batch_chunk)
        if args.grad:
            g = jax.grad(lambda z: jnp.sum(m(z) ** 2))
            run("scatj2_fwd_bwd", lambda z: z * 0.999 + 1e-12 * g(z))
        else:
            run("scatj2_fwd", lambda z: consume(z, m(z)))

    for r in results:
        print(json.dumps(r))
    return results


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
