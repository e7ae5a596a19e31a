"""DTCWT L2 kernels: non-decimated biorthogonal filters, decimating and
interpolating quarter-shift filters, and the quad<->complex corner maps.

Reference semantics: pytorch_wavelets/dtcwt/lowlevel.py:70-295.  All of the
reference's symmetric-pad index gathers and phase-split channel gathers are
re-expressed as pad + strided slice + dense conv, which XLA fuses on TPU.

Tap convention: functions here take taps in *application (correlation)
order* — i.e. already reversed relative to the column vectors in the coeff
bank, exactly like the reference's ``prep_filt`` buffers
(dtcwt/lowlevel.py:58-67).  Use :func:`prep_taps` to go from bank arrays to
application order.
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import lax

from pytorch_wavelets_tpu.ops.precision import get_matmul_precision

from pytorch_wavelets_tpu.ops.afb_sfb import _conv_axis, as_taps
from pytorch_wavelets_tpu.ops.pad import pad1d

__all__ = [
    "prep_taps", "colfilter", "rowfilter", "coldfilt", "rowdfilt",
    "colifilt", "rowifilt", "q2c", "c2q",
]


def prep_taps(h) -> np.ndarray:
    """Coefficient-bank column vector -> correlation-order tap vector
    (the reference's prep_filt reversal, dtcwt/lowlevel.py:58-67)."""
    return as_taps(h)[::-1].copy()


def _filter_axis(x, taps, axis, mode):
    """Non-decimated filter along ``axis`` with symmetric or zero boundary.

    Output length = N (odd taps) or N + 1 (even taps), matching reference
    colfilter/rowfilter (dtcwt/lowlevel.py:70-94).
    Dispatches to the MXU operator-matmul fast path off-CPU."""
    from pytorch_wavelets_tpu.ops import banded
    n = x.shape[axis % 4]
    if banded.matmul_op_enabled(n):
        T = _filter_matrix(tuple(np.asarray(taps).ravel()), mode, n)
        if axis % 4 == 2:
            return banded.apply_col(x, T)
        return banded.apply_row(x, T)
    return _filter_axis_conv(x, taps, axis, mode)


@lru_cache(maxsize=None)
def _filter_matrix(taps, mode, n):
    from pytorch_wavelets_tpu.ops import banded
    from pytorch_wavelets_tpu.ops.afb_sfb import _ext_ns
    return banded.synthesized_or_probe(
        lambda m: banded.probe_op(
            lambda I: _filter_axis_conv(I, np.asarray(taps), 2, mode), m),
        n, _ext_ns(len(taps)), 1, 1, (1, 1))


def _filter_axis_conv(x, taps, axis, mode):
    taps = np.asarray(taps, dtype=np.float64)
    L = len(taps)
    m = L // 2
    k = taps.reshape(1, L)
    if mode == "symmetric":
        xp = pad1d(x, m, m, axis, "symmetric")
        return _conv_axis(xp, k, axis)[:, :, 0]
    # zero-pad (m, m): torch conv2d padding=(m, 0)/(0, m)
    xp = pad1d(x, m, m, axis, "zero")
    return _conv_axis(xp, k, axis)[:, :, 0]


def colfilter(x, h_taps, mode="symmetric"):
    return _filter_axis(x, h_taps, 2, mode)


def rowfilter(x, h_taps, mode="symmetric"):
    return _filter_axis(x, h_taps, 3, mode)


def _dfilt_axis(x, ha_taps, hb_taps, highpass, mode, axis):
    """Quarter-shift decimating filter along ``axis``: N -> N/2.

    Requires the axis length to be a multiple of 4.  Mirrors reference
    coldfilt/rowdfilt (dtcwt/lowlevel.py:97-151): symmetric-pad by the full
    filter length m, split into the two tree-phase streams, convolve each
    with its tree's filter at stride 2, and interleave (b, a) for highpass
    else (a, b).
    """
    if mode != "symmetric":
        raise NotImplementedError(
            "q-shift decimating filters only support 'symmetric' mode")
    axis = axis % 4
    n = x.shape[axis]
    if n % 4 != 0:
        raise ValueError(
            f"Length of axis {axis} must be a multiple of 4, got {n}")
    from pytorch_wavelets_tpu.ops import banded
    if banded.matmul_op_enabled(n):
        T = _dfilt_matrix(tuple(np.asarray(ha_taps).ravel()),
                          tuple(np.asarray(hb_taps).ravel()),
                          bool(highpass), n)
        if axis == 2:
            return banded.apply_col(x, T)
        return banded.apply_row(x, T)
    return _dfilt_axis_conv(x, ha_taps, hb_taps, highpass, mode, axis)


@lru_cache(maxsize=None)
def _dfilt_matrix(ha, hb, highpass, n):
    from pytorch_wavelets_tpu.ops import banded
    from pytorch_wavelets_tpu.ops.afb_sfb import _ext_ns
    return banded.synthesized_or_probe(
        lambda m: banded.probe_op(
            lambda I: _dfilt_axis_conv(I, np.asarray(ha), np.asarray(hb),
                                       highpass, "symmetric", 2), m),
        n, _ext_ns(len(ha)), 1, 1, (2, 4))


def _dfilt_axis_conv(x, ha_taps, hb_taps, highpass, mode, axis):
    axis = axis % 4
    n = x.shape[axis]
    ha = np.asarray(ha_taps, dtype=np.float64)
    hb = np.asarray(hb_taps, dtype=np.float64)
    m = len(ha)
    # pad symmetric by m; padded index i corresponds to reflect index i - m
    xp = pad1d(x, m, m, axis, "symmetric")
    # stream "even": padded positions 2, 4, ...; stream "odd": 3, 5, ...
    se = lax.slice_in_dim(xp, 2, xp.shape[axis] - 1, stride=2, axis=axis)
    so = lax.slice_in_dim(xp, 3, xp.shape[axis], stride=2, axis=axis)
    streams = jnp.stack([se, so], axis=2)  # (N, C, 2, H', W')
    N, C = x.shape[:2]
    streams = streams.reshape(N, C * 2, *streams.shape[3:])
    kernels = np.zeros((2, 2, m))
    kernels[0, 0] = ha
    kernels[1, 1] = hb
    # grouped conv expressed densely on the tiny 2-stream axis: fold the
    # stream pair into channels and use a (2-out, 2-in) kernel per plane
    y = _conv_grouped_pair(streams, kernels, axis, stride=2)
    ya = y[:, :, 0]
    yb = y[:, :, 1]
    first, second = (yb, ya) if highpass else (ya, yb)
    out = jnp.stack([first, second], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = n // 2
    return out.reshape(shape)


def _conv_grouped_pair(x, kernels, axis, stride):
    """x: (N, 2C, H, W) where channels alternate (stream_e, stream_o) pairs;
    kernels: (2, 2, m) block-diagonal.  Returns (N, C, 2, H', W')."""
    N, C2 = x.shape[:2]
    C = C2 // 2
    xr = x.reshape(N * C, 2, *x.shape[2:])
    m = kernels.shape[-1]
    if axis == 2:
        w = jnp.asarray(kernels.reshape(2, 2, m, 1), dtype=x.dtype)
        strides = (stride, 1)
    else:
        w = jnp.asarray(kernels.reshape(2, 2, 1, m), dtype=x.dtype)
        strides = (1, stride)
    y = lax.conv_general_dilated(
        xr, w, window_strides=strides, padding=((0, 0), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=get_matmul_precision())
    return y.reshape(N, C, 2, *y.shape[2:])


def coldfilt(x, ha_taps, hb_taps, highpass=False, mode="symmetric"):
    return _dfilt_axis(x, ha_taps, hb_taps, highpass, mode, 2)


def rowdfilt(x, ha_taps, hb_taps, highpass=False, mode="symmetric"):
    return _dfilt_axis(x, ha_taps, hb_taps, highpass, mode, 3)


def _ifilt_axis(x, ha_taps, hb_taps, highpass, mode, axis):
    """Quarter-shift interpolating filter along ``axis``: N -> 2N.

    Mirrors reference colifilt/rowifilt (dtcwt/lowlevel.py:154-239): split
    each tree filter into odd/even taps, filter four phase-shifted copies of
    the input, and 4-way interleave.
    """
    if mode != "symmetric":
        raise NotImplementedError(
            "q-shift interpolating filters only support 'symmetric' mode")
    axis = axis % 4
    n = x.shape[axis]
    if n % 2 != 0:
        raise ValueError(
            f"Length of axis {axis} must be a multiple of 2, got {n}")
    from pytorch_wavelets_tpu.ops import banded
    if banded.matmul_op_enabled(n):
        T = _ifilt_matrix(tuple(np.asarray(ha_taps).ravel()),
                          tuple(np.asarray(hb_taps).ravel()),
                          bool(highpass), n)
        if axis == 2:
            return banded.apply_col(x, T)
        return banded.apply_row(x, T)
    return _ifilt_axis_conv(x, ha_taps, hb_taps, highpass, mode, axis)


@lru_cache(maxsize=None)
def _ifilt_matrix(ha, hb, highpass, n):
    from pytorch_wavelets_tpu.ops import banded
    from pytorch_wavelets_tpu.ops.afb_sfb import _ext_ns
    return banded.synthesized_or_probe(
        lambda m: banded.probe_op(
            lambda I: _ifilt_axis_conv(I, np.asarray(ha), np.asarray(hb),
                                       highpass, "symmetric", 2), m),
        n, _ext_ns(len(ha)), 1, 1, (4, 2))


def _ifilt_axis_conv(x, ha_taps, hb_taps, highpass, mode, axis):
    axis = axis % 4
    n = x.shape[axis]
    ha = np.asarray(ha_taps, dtype=np.float64)
    hb = np.asarray(hb_taps, dtype=np.float64)
    m = len(ha)
    m2 = m // 2
    hao, hae = ha[1::2], ha[0::2]
    hbo, hbe = hb[1::2], hb[0::2]
    xp = pad1d(x, m2, m2, axis, "symmetric")  # index i -> reflect(i - m2)
    P = xp.shape[axis]

    def sl(start, stop_offset):
        return lax.slice_in_dim(xp, start, P + stop_offset, stride=2,
                                axis=axis)

    if m2 % 2 == 0:
        filts = (hae, hbe, hao, hbo)
        if highpass:
            phases = (sl(1, -2), sl(0, -2), sl(3, 0), sl(2, 0))
        else:
            phases = (sl(0, -2), sl(1, -2), sl(2, 0), sl(3, 0))
    else:
        filts = (hao, hbo, hae, hbe)
        if highpass:
            phases = (sl(2, -1), sl(1, -1), sl(2, -1), sl(1, -1))
        else:
            phases = (sl(1, -1), sl(2, -1), sl(1, -1), sl(2, -1))

    N, C = x.shape[:2]
    streams = jnp.stack(phases, axis=2)  # (N, C, 4, H', W')
    streams = streams.reshape(N, C * 4, *streams.shape[3:])
    Lf = len(filts[0])
    kernels = np.zeros((4, 4, Lf))
    for i, f in enumerate(filts):
        kernels[i, i] = f
    y = _conv_quad(streams, kernels, axis)
    # interleave the 4 phase outputs -> length 2n
    y = jnp.moveaxis(y, 2, axis + 1)  # (..., n2, 4, ...) along axis
    shape = list(x.shape)
    shape[axis] = 2 * n
    return y.reshape(shape)


def _conv_quad(x, kernels, axis):
    """x: (N, 4C, H, W) with per-channel 4-phase groups; kernels (4, 4, L)
    block-diagonal.  Returns (N, C, 4, H', W') ordered phase-major on dim 2
    after the caller's moveaxis/reshape."""
    N, C4 = x.shape[:2]
    C = C4 // 4
    xr = x.reshape(N * C, 4, *x.shape[2:])
    L = kernels.shape[-1]
    if axis == 2:
        w = jnp.asarray(kernels.reshape(4, 4, L, 1), dtype=x.dtype)
    else:
        w = jnp.asarray(kernels.reshape(4, 4, 1, L), dtype=x.dtype)
    y = lax.conv_general_dilated(
        xr, w, window_strides=(1, 1), padding=((0, 0), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=get_matmul_precision())
    return y.reshape(N, C, 4, *y.shape[2:])


def colifilt(x, ha_taps, hb_taps, highpass=False, mode="symmetric"):
    return _ifilt_axis(x, ha_taps, hb_taps, highpass, mode, 2)


def rowifilt(x, ha_taps, hb_taps, highpass=False, mode="symmetric"):
    return _ifilt_axis(x, ha_taps, hb_taps, highpass, mode, 3)


_SQRT2 = math.sqrt(2.0)


def q2c(y):
    """Quad corners -> two complex subimages (reference:
    dtcwt/lowlevel.py:243-260).  Returns ((r1, i1), (r2, i2)) where
    (r1, i1) = (a - d, b + c)/sqrt2 and (r2, i2) = (a + d, b - c)/sqrt2."""
    y = y / _SQRT2
    a, b = y[:, :, 0::2, 0::2], y[:, :, 0::2, 1::2]
    c, d = y[:, :, 1::2, 0::2], y[:, :, 1::2, 1::2]
    return ((a - d, b + c), (a + d, b - c))


def c2q(w1, w2):
    """Inverse of :func:`q2c` (reference: dtcwt/lowlevel.py:263-295)."""
    w1r, w1i = w1
    w2r, w2i = w2
    x1 = (w1r + w2r) / _SQRT2
    x2 = (w1i + w2i) / _SQRT2
    x3 = (w1i - w2i) / _SQRT2
    x4 = (w2r - w1r) / _SQRT2
    # interleave 2x2: rows (x1 x2 / x3 x4)
    top = jnp.stack([x1, x2], axis=-1)      # (..., r, c, 2)
    bot = jnp.stack([x3, x4], axis=-1)
    rows = jnp.stack([top, bot], axis=-2)   # (..., r, 2, c, 2)
    b, ch, r, c = w1r.shape
    return rows.transpose(0, 1, 2, 4, 3, 5).reshape(b, ch, 2 * r, 2 * c)
