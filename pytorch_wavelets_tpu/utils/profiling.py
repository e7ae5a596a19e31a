"""Timing and tracing utilities (TPU-native analogue of the reference's
nvprof harness, reference tests/profile.py / profile_xfms / parser.py).

Measurement model: remote-attached TPUs (and async dispatch generally)
make single-call wall times meaningless, so a workload is chained K times
inside one jitted fori_loop (output feeds input, so nothing can be elided)
and timed with a forced host readback; the fixed dispatch+readback latency
of a trivial kernel is measured the same way and subtracted.
"""
from __future__ import annotations

import contextlib
import time

import numpy as np

__all__ = ["time_op", "trace", "mpix_per_s"]


def time_op(fn, x, repeats: int = 100, iters: int = 5) -> float:
    """Per-iteration seconds of ``fn`` (shape-preserving) on ``x``."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chained(z):
        # scalar readback: keeps the (noisy, multi-ms) tunnel transfer of
        # the full array out of the measurement
        return jnp.sum(lax.fori_loop(0, repeats, lambda i, a: fn(a), z))

    @jax.jit
    def trivial(z):
        return jnp.sum(z) * 0.0

    float(np.asarray(chained(x)))   # compile
    float(np.asarray(trivial(x)))

    def best_of(f):
        b = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            float(np.asarray(f(x)))
            b = min(b, time.perf_counter() - t0)
        return b

    lat = best_of(trivial)
    tot = best_of(chained)
    return max(tot - lat, 1e-9) / repeats


def mpix_per_s(shape, seconds: float) -> float:
    n = 1.0
    for s in shape:
        n *= s
    return n / 1e6 / seconds


def coeff_loss(out):
    """Scalar sum-of-squares over every concrete coefficient leaf, so a
    ``--grad`` benchmark times the forward + its backward only
    (comparable to the reference's fwd+bwd baselines), not the inverse
    transform too.  Works for any family's output pytree (DWT/DTCWT
    tuples, SWT lists), skipping None/skipped entries."""
    import jax
    import jax.numpy as jnp
    return sum(jnp.sum(v ** 2) for v in jax.tree.leaves(out)
               if v is not None)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context; view with TensorBoard/xprof."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
