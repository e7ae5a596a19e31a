"""Host-side index math and small helpers shared by every transform family.

The load-bearing primitive is :func:`reflect`, which computes half-sample
symmetric index reflection (reference: ``pytorch_wavelets/utils.py:146-163``).
All boundary handling in this package is derived from it at *trace time* with
numpy, so the compiled TPU program only ever sees static slices/gathers.
"""
from __future__ import annotations

import functools

import numpy as np

__all__ = [
    "reflect",
    "symm_pad_1d",
    "mode_to_int",
    "int_to_mode",
    "MODES",
    "dwt_coeff_len",
    "memoize",
    "drawedge",
    "drawcirc",
    "unpack",
    "stacked_2d_matrix_vector_prod",
    "stacked_2d_matrix_matrix_prod",
    "stacked_2d_vector_matrix_prod",
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
    """Reflect indices ``x`` about the half-open bounds ``minx``/``maxx``.

    With integer ``x`` and bounds of the form ``k - 0.5`` this produces
    half-sample symmetric extension indices (edge samples repeated), matching
    the classic Kingsbury DTCWT toolbox behaviour the reference relies on
    (reference: pytorch_wavelets/utils.py:146-163).
    """
    x = np.asanyarray(x)
    rng = maxx - minx
    rng_by_2 = 2 * rng
    mod = np.fmod(x - minx, rng_by_2)
    normed_mod = np.where(mod < 0, mod + rng_by_2, mod)
    out = np.where(normed_mod >= rng, rng_by_2 - normed_mod, normed_mod) + minx
    return np.array(out, dtype=x.dtype)


def symm_pad_1d(l: int, m: int) -> np.ndarray:
    """Indices implementing symmetric padding by ``m`` on both ends of a
    length-``l`` axis (reference: pytorch_wavelets/utils.py:166-174)."""
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


def memoize(obj):
    """Positional-arg memoizer (ignores kwargs)."""
    cache = obj.cache = {}

    @functools.wraps(obj)
    def memoizer(*args, **kwargs):
        if args not in cache:
            cache[args] = obj(*args, **kwargs)
        return cache[args]

    return memoizer


def drawedge(theta, r, w, N):
    """Test image: raised-cosine edge at ``theta`` degrees through point ``r``
    (reference: pytorch_wavelets/utils.py:45-74)."""
    thetar = np.array(theta * np.pi / 180)
    imCentre = (np.array([N, N]).T - 1) / 2 + 1
    r = np.array([np.cos(thetar), np.sin(thetar)]) * (-1) * (r - imCentre)
    w = np.maximum(1, w)
    ramp = np.arange(0, N) - (N + 1) / 2
    hgrad = np.sin(thetar) * (-1) * np.ones([N, 1])
    vgrad = np.cos(thetar) * (-1) * np.ones([1, N])
    plane = ((hgrad * ramp) - r[0]) + ((ramp * vgrad).T - r[1])
    x = 0.5 + 0.5 * np.sin(
        np.minimum(np.maximum(plane * (np.pi / w), np.pi / (-2)), np.pi / 2))
    return x


def drawcirc(r, w, du, dv, N):
    """Test image: cosine-edged circle of radius ``r`` at offset (du, dv)
    (reference: pytorch_wavelets/utils.py:77-101)."""
    w = np.maximum(w, 1)
    x = np.ones([N, 1]) * ((np.arange(0, N, 1, dtype="float") -
                            (N + 1) / 2 - dv) / r)
    y = (((np.arange(0, N, 1, dtype="float") - (N + 1) / 2 - du) / r) *
         np.ones([1, N])).T
    p = 0.5 + 0.5 * np.sin(
        np.minimum(np.maximum(
            (np.exp(np.array([-0.5]) * (x ** 2 + y ** 2)).T -
             np.exp(-0.5)) * (r * 3 / w), np.pi / (-2)), np.pi / 2))
    return p


def unpack(coeffs):
    """Unpack a transform result into its constituent parts.

    Accepts the (yl, yh) pair returned by DTCWTForward/DWTForward, or the
    (scales, yh) pair produced under ``include_scale`` — yielding yl, yh
    (and scales when present), mirroring the reference's pyramid unpacker
    (reference: pytorch_wavelets/utils.py:9-42; our transforms return
    plain pytrees instead of backend-specific Pyramid objects, so a
    2/3-tuple is the only "pyramid" shape here).
    """
    first, yh = coeffs[0], coeffs[1]
    if isinstance(first, (list, tuple)):
        # include_scale=True: first element is the per-level scales list
        yield first[-1]
        yield yh
        yield first
    else:
        yield first
        yield yh
        if len(coeffs) > 2 and coeffs[2] is not None:
            yield coeffs[2]


def stacked_2d_matrix_vector_prod(mats, vecs):
    """result[i, j] = mats[i, j] @ vecs[i, j]
    (reference: pytorch_wavelets/utils.py:190-203)."""
    return np.einsum('...ij,...j->...i', mats, vecs)


def stacked_2d_matrix_matrix_prod(mats1, mats2):
    """result[i, j] = mats1[i, j] @ mats2[i, j]
    (reference: pytorch_wavelets/utils.py:223-235)."""
    return np.einsum('...ij,...jk->...ik', mats1, mats2)


def stacked_2d_vector_matrix_prod(vecs, mats):
    """result[i, j] = mats[i, j].T @ vecs[i, j]
    (reference: pytorch_wavelets/utils.py:206-220)."""
    return np.einsum('...ij,...i->...j', mats, vecs)
