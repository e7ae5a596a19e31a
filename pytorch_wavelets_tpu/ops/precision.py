"""Matmul precision policy for the operator-matmul fast paths.

TPU MXU f32 matmuls are emulated with bfloat16 passes; the pass count is
the speed/accuracy dial:

- ``"highest"`` (default): bf16x6 — indistinguishable from true f32
  (measured max abs error ~1e-6 on the DTCWT end-to-end reconstruction);
  matches the reference library's f32 cuDNN numerics.
- ``"high"``: bf16x3 — ~1.5x faster end-to-end, max abs error ~2.5e-4.
- ``"default"``: single bf16 pass — ~3x faster, ~4e-2 error; for
  feature-extraction workloads (e.g. scattering front ends) where
  downstream training absorbs the quantisation.

The reference has no analogous dial (cuDNN f32 only); this is a TPU-native
extension.  Use :func:`set_matmul_precision` globally or the
:func:`matmul_precision` context manager.  NOTE: changing precision
changes compiled programs — under jit the setting is baked in at trace
time.
"""
from __future__ import annotations

from contextlib import contextmanager

from jax import lax

__all__ = ["set_matmul_precision", "get_matmul_precision",
           "matmul_precision"]

_LEVELS = {
    "highest": lax.Precision.HIGHEST,
    "high": lax.Precision.HIGH,
    "default": lax.Precision.DEFAULT,
}

_current = "highest"


def set_matmul_precision(level: str) -> None:
    """Set the global matmul precision: 'highest' | 'high' | 'default'."""
    global _current
    if level not in _LEVELS:
        raise ValueError(f"unknown precision {level!r}; "
                         f"expected one of {sorted(_LEVELS)}")
    _current = level


def get_matmul_precision():
    """The lax.Precision used by the operator-matmul fast paths."""
    return _LEVELS[_current]


@contextmanager
def matmul_precision(level: str):
    """Context manager form of :func:`set_matmul_precision`."""
    global _current
    prev = _current
    set_matmul_precision(level)
    try:
        yield
    finally:
        _current = prev
