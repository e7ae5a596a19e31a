#!/usr/bin/env python
"""Scattering stability metrics — the reference's quality table
(reference docs/scatternet.rst:52-62): mean squared feature distance
||Sx - Sy||^2 under additive noise, translation, and smooth deformation,
with features L2-normalised per sample.

    python benchmarks/stability.py
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _load_image():
    import jax.numpy as jnp
    path = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "fixtures", "barbara.npz")
    barb = np.load(path)["barbara"]              # (512, 512, 3)
    x = np.asarray(barb, np.float32).transpose(2, 0, 1)[None]
    return jnp.asarray(x[:, :, :256, :256])


def _normed(z):
    z = np.asarray(z, np.float64).reshape(z.shape[0], -1)
    return z / np.linalg.norm(z, axis=1, keepdims=True)


def _dist(a, b):
    return float(np.mean(np.sum((_normed(a) - _normed(b)) ** 2, axis=1)))


def _deform(x, amp=2.0, freq=2):
    """Smooth sinusoidal warp of amplitude ``amp`` pixels."""
    import jax.numpy as jnp
    N, C, H, W = x.shape
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    dx = amp * np.sin(2 * np.pi * freq * yy / H)
    src = np.clip(xx + dx, 0, W - 1)
    i0 = np.floor(src).astype(int)
    i1 = np.minimum(i0 + 1, W - 1)
    t = (src - i0).astype(np.float32)
    xn = np.asarray(x)
    out = xn[..., yy, i0] * (1 - t) + xn[..., yy, i1] * t
    return jnp.asarray(out.astype(np.float32))


def main():
    import jax
    import jax.numpy as jnp
    import pytorch_wavelets_tpu as tw

    x = _load_image()
    rng = np.random.RandomState(0)
    scat = tw.ScatLayerj2()
    f = jax.jit(lambda z: scat(z))

    sx = f(x)
    results = {}

    # additive gaussian noise at 5% of image std
    noise = jnp.asarray(
        rng.randn(*x.shape).astype(np.float32) * 0.05 * float(x.std()))
    results["additive_noise"] = _dist(sx, f(x + noise))

    # 4-pixel translation (wrap)
    results["shift_4px"] = _dist(sx, f(jnp.roll(x, 4, axis=-1)))

    # smooth 2-pixel sinusoidal deformation
    results["deformation"] = _dist(sx, f(_deform(x)))

    print(json.dumps({"metric": "scatj2_stability_msd",
                      **{k: round(v, 5) for k, v in results.items()}}))
    return results


if __name__ == "__main__":
    main()
