"""Host-side index math shared by every transform family.

All boundary handling in this package is derived at *trace time* with
numpy, so the compiled TPU program only ever sees static slices/gathers.
:func:`reflect` is the half-sample symmetric extension primitive the
reference builds its symmetric padding on (reference:
``pytorch_wavelets/utils.py:146-163``); here it exists as the executable
specification that `ops.pad.pad1d('symmetric')` and the probed operator
matrices are pinned against in tests (tests/test_utils.py).
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "reflect",
    "symm_pad_1d",
    "mode_to_int",
    "int_to_mode",
    "MODES",
    "dwt_coeff_len",
]

# String <-> int codec for padding modes (reference: dwt/lowlevel.py:274-309).
MODES = ("zero", "symmetric", "periodization", "constant", "reflect",
         "replicate", "periodic")
_MODE_TO_INT = {
    "zero": 0,
    "symmetric": 1,
    "per": 2,
    "periodization": 2,
    "constant": 3,
    "reflect": 4,
    "replicate": 5,
    "periodic": 6,
}


def mode_to_int(mode: str) -> int:
    try:
        return _MODE_TO_INT[mode]
    except KeyError:
        raise ValueError(f"Unknown pad type: {mode}") from None


def int_to_mode(mode: int) -> str:
    if not 0 <= mode <= 6:
        raise ValueError(f"Unknown pad type: {mode}")
    return MODES[mode]


def reflect(x, minx, maxx):
    """Fold indices ``x`` into [minx, maxx] by reflection about the bounds.

    Formulated as a triangle wave of period ``2 * (maxx - minx)``: shift to
    the bound, wrap into one period, and mirror the descending half.  With
    integer ``x`` and half-integer bounds (``k - 0.5``) this yields
    half-sample symmetric extension — edge samples repeated — which is the
    behaviour the reference's symmetric padding is built on (reference:
    pytorch_wavelets/utils.py:146-163; same contract, independent
    derivation).
    """
    x = np.asanyarray(x)
    period = 2.0 * (maxx - minx)
    phase = np.mod(x - minx, period)           # true mod: negatives fold up
    tri = (period / 2.0) - np.abs(phase - period / 2.0)
    return (tri + minx).astype(x.dtype)


def symm_pad_1d(l: int, m: int) -> np.ndarray:
    """Gather indices for half-sample symmetric padding by ``m`` on both
    ends of a length-``l`` axis (reference contract:
    pytorch_wavelets/utils.py:166-174)."""
    return reflect(np.arange(-m, l + m, dtype="int32"), -0.5, l - 0.5)


def dwt_coeff_len(data_len: int, filt_len: int, mode: str) -> int:
    """Output length of one DWT level; re-implements ``pywt.dwt_coeff_len``
    without the pywt dependency (reference relies on it at
    dwt/lowlevel.py:153)."""
    if data_len < 1:
        raise ValueError("Value of data_len must be greater than zero.")
    if filt_len < 1:
        raise ValueError("Value of filt_len must be greater than zero.")
    if mode in ("per", "periodization"):
        return (data_len + 1) // 2
    return (data_len + filt_len - 1) // 2
