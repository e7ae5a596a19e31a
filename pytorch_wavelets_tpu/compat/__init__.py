"""Interop layers for incremental migration from the reference package.

``pytorch_wavelets_tpu.compat.torch`` provides drop-in ``torch.nn.Module``
wrappers (same constructor signatures, input/output structures, and
gradients as fbcotter/pytorch_wavelets) that execute on the JAX engine.
Import it explicitly — nothing here is loaded at package import time, so
the core package never requires torch.
"""
