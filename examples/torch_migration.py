#!/usr/bin/env python
"""Incremental migration from fbcotter/pytorch_wavelets: a torch training
step whose wavelet front-end runs on the JAX engine via the compat layer,
with gradients flowing through the bridge.

    python examples/torch_migration.py     # torch CPU + JAX (CPU or TPU)

See docs/migration.md for the full mapping table.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


import torch

# step 1 of a migration: swap this import —
#   from pytorch_wavelets import ScatLayer
from pytorch_wavelets_tpu.compat.torch import ScatLayer


class TinyNet(torch.nn.Module):
    """Frozen scattering front-end + trainable linear head — the
    reference's canonical scatternet usage (its docs/scatternet.rst)."""

    def __init__(self):
        super().__init__()
        self.scat = ScatLayer()        # runs on the JAX engine
        self.head = torch.nn.Linear(7 * 3 * 16 * 16, 10)

    def forward(self, x):
        z = self.scat(x)               # torch in, torch out
        return self.head(z.flatten(1))


def main():
    torch.manual_seed(0)
    net = TinyNet()
    opt = torch.optim.SGD(net.parameters(), lr=0.005)
    x = torch.randn(8, 3, 32, 32)
    y = torch.randint(0, 10, (8,))

    for step in range(5):
        opt.zero_grad()
        loss = torch.nn.functional.cross_entropy(net(x), y)
        loss.backward()                    # grads bridge through jax.vjp
        opt.step()
        print(f"step {step}: loss {loss.item():.4f}")

    # torch.save / torch.load of the whole module works (the jit bridge
    # is rebuilt on load)
    torch.save(net, "/tmp/tiny_net.pt")
    net2 = torch.load("/tmp/tiny_net.pt", weights_only=False)
    assert torch.allclose(net2(x), net(x))
    print("saved, reloaded, outputs identical — migration step complete")


if __name__ == "__main__":
    main()
