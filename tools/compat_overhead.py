#!/usr/bin/env python
"""Measure the torch compat bridge's per-call overhead vs the native API.

The compat layer (pytorch_wavelets_tpu/compat/torch.py) stages tensors
host-side both ways on every forward and re-stages saved inputs on every
backward; behind the axon TPU tunnel (~30 ms fixed dispatch) that staging
plausibly dominates a training step.  This tool puts a number on it
(VERDICT r3 task 6) so users can decide quantitatively:

  * native-chained : jitted fwd(+bwd) timed via the chained fori_loop
    protocol (utils/profiling.py:time_op) — the engine's true cost.
  * native-percall : one jitted call per Python iteration, block_until_ready
    each time — what a torch-style training loop pays for dispatch even
    without the bridge.
  * compat-percall : the full bridge (torch -> host numpy -> JAX -> host
    numpy -> torch) per call.

  bridge overhead per call = compat-percall - native-percall.

Run:  python tools/compat_overhead.py [--size 256] [--batch 8] [--repeats 20]
Writes a JSON line per row; pass --out FILE to also append them to a file.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--ch", type=int, default=3)
    p.add_argument("-j", "--levels", type=int, default=2)
    p.add_argument("--repeats", type=int, default=20)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (tunnel-down smoke)")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        # fail fast instead of hanging when the axon tunnel is dead —
        # same subprocess enumeration probe as bench.py (bb8838f)
        from bench import _device_probe
        err = _device_probe()
        if err is not None:
            print(json.dumps({"workload": "compat_overhead",
                              "error": err}))
            return []

    import numpy as np
    import jax
    import jax.numpy as jnp
    import torch

    import pytorch_wavelets_tpu as tw
    from pytorch_wavelets_tpu.compat import torch as compat
    from pytorch_wavelets_tpu.utils.profiling import time_op

    dev = jax.devices()[0]
    shape = (args.batch, args.ch, args.size, args.size)
    xnp = np.random.RandomState(0).randn(*shape).astype(np.float32)
    rows = []

    def emit(name, sec_per_call):
        row = {"workload": name, "shape": list(shape),
               "ms_per_call": round(sec_per_call * 1e3, 4),
               "backend": dev.platform}
        rows.append(row)
        print(json.dumps(row))

    def percall(fn, n):
        fn()  # warm (compile / cache)
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        return (time.perf_counter() - t0) / n

    # ---- forward only -------------------------------------------------
    fwd = tw.DTCWTForward(J=args.levels)
    xj = jnp.asarray(xnp)
    jfwd = jax.jit(lambda z: fwd(z))

    emit("native_chained_fwd",
         time_op(lambda z: z * 0.999 + 1e-12 * jfwd(z)[0].mean(),
                 xj, repeats=args.repeats))
    emit("native_percall_fwd",
         percall(lambda: jax.block_until_ready(jfwd(xj)), args.repeats))

    cfwd = compat.DTCWTForward(J=args.levels)
    xt = torch.from_numpy(xnp)
    emit("compat_percall_fwd", percall(lambda: cfwd(xt), args.repeats))

    # ---- forward + backward -------------------------------------------
    def loss_j(z):
        yl, yh = fwd(z)
        return jnp.abs(yl).sum() + sum(jnp.abs(h).sum() for h in yh)
    jgrad = jax.jit(jax.grad(loss_j))
    emit("native_percall_fwd_bwd",
         percall(lambda: jax.block_until_ready(jgrad(xj)), args.repeats))

    def compat_step():
        xg = xt.detach().clone().requires_grad_(True)
        yl, yh = cfwd(xg)
        (yl.abs().sum() + sum(h.abs().sum() for h in yh)).backward()
        return xg.grad
    emit("compat_percall_fwd_bwd", percall(compat_step, args.repeats))

    by = {r["workload"]: r["ms_per_call"] for r in rows}
    summary = {
        "workload": "bridge_overhead_summary",
        "shape": list(shape), "backend": dev.platform,
        "fwd_overhead_ms": round(
            by["compat_percall_fwd"] - by["native_percall_fwd"], 4),
        "fwd_bwd_overhead_ms": round(
            by["compat_percall_fwd_bwd"] - by["native_percall_fwd_bwd"], 4),
        "dispatch_gap_ms": round(
            by["native_percall_fwd"] - by["native_chained_fwd"], 4),
    }
    rows.append(summary)
    print(json.dumps(summary))

    if args.out:
        with open(args.out, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    return rows


if __name__ == "__main__":
    main()
