#!/usr/bin/env python
"""Embedding a scattering front-end in a Flax model.

Transforms are stateless, hashable pytree configs, so they drop into any
JAX framework module unchanged (they serialize implicitly — there are no
parameters to checkpoint, mirroring the reference's frozen buffers).

    python examples/flax_integration.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import flax.linen as nn
import pytorch_wavelets_tpu as tw


class ScatNet(nn.Module):
    """Frozen scattering features -> small MLP head."""
    classes: int = 10

    @nn.compact
    def __call__(self, x):                       # x: (N, C, H, W)
        scat = tw.ScatLayerj2()                  # no params; config only
        f = scat(x).mean(axis=(2, 3))            # (N, 49C)
        f = nn.Dense(128)(f)
        f = nn.relu(f)
        return nn.Dense(self.classes)(f)


def main():
    model = ScatNet()
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(4, 3, 64, 64).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    logits = jax.jit(model.apply)(params, x)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    grads = jax.jit(jax.grad(
        lambda p, z: jnp.sum(model.apply(p, z) ** 2)))(params, x)
    gn = float(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)) ** 0.5)
    print(f"logits {logits.shape}, trainable params {n_params}, "
          f"grad norm {gn:.3f}")


if __name__ == "__main__":
    main()
