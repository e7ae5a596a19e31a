"""Boundary extension for NCHW tensors, computed gather-free.

The reference implements 'symmetric'/'periodic' padding as an index gather
(``mypad``, reference: dwt/lowlevel.py:28-88) — nvprof shows those gather
kernels costing 16% of GPU time (tests/profiles/end_to_end_j2.prof).  Here
every mode lowers to ``jnp.pad`` (slice+reverse+concat), which XLA fuses and
GSPMD can partition, so there is no gather anywhere on the compute path.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["pad1d", "PAD_MODES"]

_JNP_MODE = {
    "zero": "constant",
    "constant": "constant",  # torch F.pad 'constant' with value 0
    "symmetric": "symmetric",  # half-sample symmetric (pywt/MATLAB 'sym')
    "reflect": "reflect",      # whole-sample reflect (torch 'reflect')
    "replicate": "edge",
    "periodic": "wrap",
    "periodization": "wrap",   # periodization pads circularly once evened
}

PAD_MODES = tuple(_JNP_MODE)


def pad1d(x: jnp.ndarray, front: int, back: int, axis: int,
          mode: str) -> jnp.ndarray:
    """Pad one axis of ``x`` by (front, back) using a pywt-style mode."""
    if front == 0 and back == 0:
        return x
    if front < 0 or back < 0:
        raise ValueError(f"negative pad ({front}, {back})")
    try:
        jmode = _JNP_MODE[mode]
    except KeyError:
        raise ValueError(f"Unknown pad type: {mode}") from None
    pads = [(0, 0)] * x.ndim
    axis = axis % x.ndim
    n = x.shape[axis]
    if jmode in ("symmetric", "reflect", "wrap") and max(front, back) > n:
        # jnp.pad only extends by at most one period/reflection at a time,
        # and stacking pads of a grown array mis-aligns wrap/reflect
        # phases.  These oversize pads only occur for tiny inputs vs long
        # (dilated) filters on the conv/probe path, so use an exact static
        # index map computed by numpy (which handles any pad size).
        import numpy as np
        idx = np.pad(np.arange(n), (front, back), mode=jmode)
        return jnp.take(x, jnp.asarray(idx), axis=axis)
    pads[axis] = (front, back)
    return jnp.pad(x, pads, mode=jmode)
