#!/usr/bin/env python
"""Classic wavelet soft-threshold denoising with the 2-D DWT.

    python examples/denoising.py          # runs on CPU or TPU
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import pytorch_wavelets_tpu as tw


def main():
    d = np.load(os.path.join(os.path.dirname(__file__), "..", "tests",
                             "fixtures", "barbara.npz"))
    img = d["barbara"].transpose(2, 0, 1)[None].astype(np.float32) / 255.0
    rng = np.random.RandomState(0)
    noisy = img + 0.1 * rng.randn(*img.shape).astype(np.float32)

    fwd = tw.DWTForward(J=4, wave="db4", mode="symmetric")
    inv = tw.DWTInverse(wave="db4", mode="symmetric")

    @jax.jit
    def denoise(x, thresh):
        yl, yh = fwd(x)
        yh = [jnp.sign(h) * jnp.maximum(jnp.abs(h) - thresh, 0.0)
              for h in yh]
        return inv((yl, yh))

    out = denoise(jnp.asarray(noisy), 0.1)
    psnr = lambda a, b: 10 * np.log10(1.0 / np.mean((np.asarray(a) - b) ** 2))
    print(f"noisy PSNR: {psnr(noisy, img):.2f} dB  "
          f"denoised PSNR: {psnr(out, img):.2f} dB")


if __name__ == "__main__":
    main()
