#!/usr/bin/env python
"""Headline benchmark: end-to-end DTCWT (forward + inverse), J=2,
near_sym_a/qshift_a, on a 10x10x128x128 batch — the reference's published
workload (reference docs/speed.rst:37-40: 14.8 ms on a GTX1080,
i.e. 1.638 Mpix / 14.8 ms ~= 111 Mpix/s end-to-end).

Measurement notes: on this rig the TPU sits behind a tunnel with ~30 ms
fixed dispatch+readback latency and a `block_until_ready` that does not
actually block, so the end-to-end transform is CHAINED K times inside one
jitted fori_loop (the output feeds the next input, so nothing can be
elided) and timed with a forced host readback; the measured fixed latency
of a trivial kernel is subtracted.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_MPIX_S = 110.7  # GTX1080 end-to-end J=2 (docs/speed.rst:37-40)
HBM_PEAK_GB_S = 819.0    # TPU v5e HBM bandwidth (the usual bound here;
                         # docs/performance.md "HBM roofline" section)


def _device_probe(timeout_s=300):
    """Fail fast when the TPU tunnel is dead instead of hanging forever.

    PJRT client init inside *this* process cannot be timed out, so probe
    device enumeration in a subprocess first.  Any responsive backend
    (TPU, or CPU on rigs without one) proceeds; only a hang/crash
    short-circuits.  Returns None when healthy, else an error string."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return f"device enumeration hung >{timeout_s}s (tunnel down?)"
    if r.returncode != 0:
        return f"device enumeration failed: {r.stderr.strip()[-200:]}"
    return None


def _timed_readback(fn, x, iters=8):
    """Min-of-iters single-shot timings with forced host readback (the
    tunnel adds +-1-2 ms of per-call noise; min is the robust estimator)."""
    float(np.asarray(fn(x)).ravel()[0])  # warm-up / compile
    best = float("inf")
    s = None
    for _ in range(iters):
        t0 = time.perf_counter()
        s = float(np.asarray(fn(x)).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best, s


def main():
    err = _device_probe()
    if err is not None:
        print(json.dumps({
            "metric": "dtcwt_j2_end_to_end_mpix_per_s",
            "value": 0.0, "unit": "Mpix/s", "vs_baseline": 0.0,
            "error": err,
        }))
        sys.exit(1)

    import jax
    import jax.numpy as jnp
    from jax import lax
    import pytorch_wavelets_tpu as tw

    N, C, H, W = 10, 10, 128, 128
    K = 200
    x = jnp.asarray(np.random.RandomState(0).randn(N, C, H, W)
                    .astype(np.float32))
    fwd = tw.DTCWTForward(J=2, biort="near_sym_a", qshift="qshift_a")
    inv = tw.DTCWTInverse(biort="near_sym_a", qshift="qshift_a")

    def end_to_end(z):
        yl, yh = fwd(z)
        return inv((yl, yh))

    @jax.jit
    def chained(z):
        # scalar readback: the tunnel moves 4 bytes, not the 6.5 MB image
        return jnp.sum(lax.fori_loop(0, K, lambda i, a: end_to_end(a), z))

    @jax.jit
    def trivial(z):
        return jnp.sum(z) * 0.0 + 1.0

    t_lat, _ = _timed_readback(trivial, x)
    t_tot, _ = _timed_readback(chained, x)
    dt = max(t_tot - t_lat, 1e-9) / K

    mpix = N * C * H * W / 1e6
    value = mpix / dt

    # Roofline context (VERDICT r4 task 7): bytes moved per end-to-end
    # invocation from XLA's cost analysis of this very program, so the
    # achieved bandwidth — and how close it sits to the HBM roof — is in
    # the headline line itself.  Cost-analysis bytes are a traffic upper
    # bound (fusion-internal bytes partly live in registers/caches), so
    # the fraction can exceed 1.0 on a well-fused program.
    bytes_e2e, bytes_src = None, None
    try:
        cost = jax.jit(end_to_end).lower(x).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        bytes_e2e, bytes_src = float(cost["bytes accessed"]), "device"
    except Exception:
        try:  # committed CPU-backend fingerprint of the same program
            with open(os.path.join(os.path.dirname(
                    os.path.abspath(__file__)), "HLO_SNAPSHOT.json")) as f:
                bytes_e2e = float(json.load(f)["bytes_accessed"])
                bytes_src = "hlo_snapshot"
        except Exception:
            pass

    line = {
        "metric": "dtcwt_j2_end_to_end_mpix_per_s",
        "value": round(value, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(value / BASELINE_MPIX_S, 2),
    }
    if bytes_e2e is not None:
        gb_s = bytes_e2e / dt / 1e9
        line["bytes_model_gb_per_e2e"] = round(bytes_e2e / 1e9, 3)
        line["bytes_model_src"] = bytes_src
        line["effective_gb_per_s"] = round(gb_s, 1)
        line["frac_of_hbm_peak_819"] = round(gb_s / HBM_PEAK_GB_S, 3)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
