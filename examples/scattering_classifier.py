#!/usr/bin/env python
"""Train a linear probe on frozen ScatLayerj2 features — the scattering
front-end as a no-learn feature extractor (reference docs/scatternet.rst).

    python examples/scattering_classifier.py
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
    # toy task: classify which quadrant of barbara a crop came from
    d = np.load(os.path.join(os.path.dirname(__file__), "..", "tests",
                             "fixtures", "barbara.npz"))
    img = d["barbara"].transpose(2, 0, 1).astype(np.float32) / 255.0
    rng = np.random.RandomState(0)
    xs, ys = [], []
    for _ in range(256):
        q = rng.randint(4)
        oy, ox = (q // 2) * 256, (q % 2) * 256
        y0, x0 = rng.randint(oy, oy + 192), rng.randint(ox, ox + 192)
        xs.append(img[:, y0:y0 + 64, x0:x0 + 64])
        ys.append(q)
    X = jnp.asarray(np.stack(xs))
    Y = jnp.asarray(np.eye(4, dtype=np.float32)[np.asarray(ys)])

    scat = tw.ScatLayerj2()
    with tw.matmul_precision("high"):          # feature-grade precision
        feats = jax.jit(lambda z: scat(z).mean(axis=(2, 3)))(X)
    W = jnp.zeros((feats.shape[1], 4))
    b = jnp.zeros((4,))

    def loss_fn(params, f, y):
        W, b = params
        logits = f @ W + b
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.sum(y * logp, axis=-1))

    @jax.jit
    def step(params, f, y):
        l, g = jax.value_and_grad(loss_fn)(params, f, y)
        return l, jax.tree.map(lambda p, gr: p - 0.5 * gr, params, g)

    params = (W, b)
    for i in range(200):
        l, params = step(params, feats, Y)
    acc = float(jnp.mean(jnp.argmax(feats @ params[0] + params[1], -1) ==
                         jnp.argmax(Y, -1)))
    print(f"final loss {float(l):.3f}, train accuracy {acc:.2%}")


if __name__ == "__main__":
    main()
