"""1-D analysis/synthesis filterbanks over one spatial axis of NCHW arrays.

These are the DWT's L2 kernels (reference: dwt/lowlevel.py:91-271), built
TPU-first: channels fold into the batch so every filtering step is a single
dense (non-grouped) ``lax.conv_general_dilated`` that XLA maps onto the MXU,
and all boundary handling is slice/concat padding computed at trace time —
no gathers, no dynamic shapes.

Filter-tap convention: every function here takes taps "in application
order", i.e. the correlation kernel.  Public analysis entry points reverse
pywt-ordered ``dec_*`` filters before calling in (the reference does the
same reversal once in ``prep_filt_afb1d``, dwt/lowlevel.py:970-971).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pytorch_wavelets_tpu.ops.pad import pad1d
from pytorch_wavelets_tpu.utils import dwt_coeff_len

__all__ = [
    "as_taps", "afb1d", "sfb1d", "afb1d_atrous", "sfb1d_atrous",
    "afb2d", "sfb2d", "afb2d_atrous", "sfb2d_atrous",
    "afb2d_nonsep", "sfb2d_nonsep",
]


def as_taps(h) -> np.ndarray:
    """Flatten any array-like filter to a 1-D float64 numpy tap vector."""
    return np.asarray(jax.device_get(h) if isinstance(h, jnp.ndarray) else h,
                      dtype=np.float64).ravel()


def _prec(x):
    # fp32 convs on TPU otherwise go through bf16 passes; wavelets need the
    # full mantissa for perfect reconstruction (configurable via
    # ops.precision.set_matmul_precision).
    from pytorch_wavelets_tpu.ops.precision import get_matmul_precision
    return get_matmul_precision()


def _conv_axis(x, kernels, axis, stride=1, lhs_dilation=1, rhs_dilation=1,
               padding=(0, 0)):
    """Correlate each (N,C) plane of ``x`` (N,C,H,W) along ``axis`` with a
    stack of 1-D kernels.

    kernels: (n_out, L) array of taps in correlation order.
    Returns (N, C, n_out, H', W').  Channels are folded into the conv batch
    so the contraction is dense (never grouped) — the TPU-friendly layout.
    """
    N, C, H, W = x.shape
    n_out, L = kernels.shape
    xr = x.reshape(N * C, 1, H, W)
    if axis in (2, -2):
        w = kernels.reshape(n_out, 1, L, 1)
        strides = (stride, 1)
        lhs_dil = (lhs_dilation, 1)
        rhs_dil = (rhs_dilation, 1)
        pads = (padding, (0, 0))
    elif axis in (3, -1):
        w = kernels.reshape(n_out, 1, 1, L)
        strides = (1, stride)
        lhs_dil = (1, lhs_dilation)
        rhs_dil = (1, rhs_dilation)
        pads = ((0, 0), padding)
    else:
        raise ValueError(f"axis must be 2 or 3, got {axis}")
    w = jnp.asarray(w, dtype=x.dtype)
    y = lax.conv_general_dilated(
        xr, w, window_strides=strides, padding=pads,
        lhs_dilation=lhs_dil, rhs_dilation=rhs_dil,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=_prec(x))
    return y.reshape(N, C, n_out, *y.shape[2:])


# --------------------------------------------------------------------------
# Analysis (decimating) filterbank
# --------------------------------------------------------------------------

def _afb1d_corr(x, h0_taps, h1_taps, mode, axis):
    """Single-level analysis split along ``axis``; taps pre-reversed
    (correlation order).  Mirrors reference afb1d (dwt/lowlevel.py:91-172)
    including the per-mode output-length calculus.

    Returns (N, C, 2, H', W') with index 0=lowpass, 1=highpass.
    Dispatches to the MXU operator-matmul fast path off-CPU.
    """
    from pytorch_wavelets_tpu.ops import banded
    axis = axis % 4
    n = x.shape[axis]
    if banded.matmul_op_enabled(n):
        T = _afb_matrix(tuple(h0_taps), tuple(h1_taps), mode, n)
        if axis == 2:
            y = banded.apply_col(x, T)                    # (N, C, 2M, W)
            return y.reshape(*y.shape[:2], 2, -1, y.shape[-1])
        y = banded.apply_row(x, T)                        # (N, C, H, 2M)
        y = y.reshape(*y.shape[:3], 2, -1)                # (N, C, H, 2, M)
        return jnp.moveaxis(y, 3, 2)
    return _afb1d_corr_conv(x, h0_taps, h1_taps, mode, axis)


@lru_cache(maxsize=None)
def _afb_matrix(h0, h1, mode, n):
    from pytorch_wavelets_tpu.ops import banded
    return banded.synthesized_or_probe(
        lambda m: banded.probe_op(
            lambda I: _afb1d_corr_conv(I, np.asarray(h0), np.asarray(h1),
                                       mode, 2), m),
        n, _ext_ns(len(h0)), 2, 1, (1, 2))


def _ext_ns(L, dilation=1):
    """Small-probe length for operator extension: large enough that the
    boundary regions separate cleanly."""
    ns = max(256, 16 * L * dilation)
    return ns + (-ns) % 8


def _afb1d_corr_conv(x, h0_taps, h1_taps, mode, axis):
    """Conv-path implementation (semantics source + CPU path)."""
    axis = axis % 4
    N = x.shape[axis]
    L = len(h0_taps)
    kernels = np.stack([h0_taps, h1_taps])

    if mode in ("per", "periodization"):
        if N % 2 == 1:
            # repeat the final sample to make the axis even
            last = lax.slice_in_dim(x, N - 1, N, axis=axis)
            x = jnp.concatenate([x, last], axis=axis)
            N += 1
        L2 = L // 2
        if L <= N:
            # circular convolution evaluated at even taps; equivalent to the
            # reference's roll + wrap-add (dwt/lowlevel.py:141-150)
            front, back = L - 1 - L2, max(L2 - 1, 0)
            xp = pad1d(x, front, back, axis, "periodic")
            return _conv_axis(xp, kernels, axis, stride=2)
        # Filter longer than the (evened) signal: the reference's wrap-add
        # only folds ONE period, which is not circular convolution — mirror
        # its literal roll + zero-pad + single fold behaviour.
        x = jnp.roll(x, -L2, axis=axis)
        xp = pad1d(x, L - 1, L - 1, axis, "zero")
        y = _conv_axis(xp, kernels, axis, stride=2)
        ax = axis + 1  # spatial axes shift by 1 past the inserted band dim
        N2 = N // 2
        folded = (lax.slice_in_dim(y, 0, L2, axis=ax) +
                  lax.slice_in_dim(y, N2, N2 + L2, axis=ax))
        if L2 >= N2:
            return lax.slice_in_dim(folded, 0, N2, axis=ax)
        return jnp.concatenate(
            [folded, lax.slice_in_dim(y, L2, N2, axis=ax)], axis=ax)

    outsize = dwt_coeff_len(N, L, mode)
    p = 2 * (outsize - 1) - N + L
    if mode == "zero":
        front, back = p // 2, p - p // 2
        xp = pad1d(x, front, back, axis, "zero")
    elif mode in ("symmetric", "reflect", "periodic"):
        front, back = p // 2, (p + 1) // 2
        xp = pad1d(x, front, back, axis, mode)
    else:
        raise ValueError(f"Unknown pad type: {mode}")
    return _conv_axis(xp, kernels, axis, stride=2)


def afb1d(x, h0, h1, mode="zero", axis=-1):
    """Analysis filterbank with pywt-ordered dec_lo/dec_hi filters."""
    h0t, h1t = as_taps(h0)[::-1], as_taps(h1)[::-1]
    return _afb1d_corr(x, h0t, h1t, mode, axis)


def _afb1d_atrous_corr(x, h0_taps, h1_taps, mode, axis, dilation):
    from pytorch_wavelets_tpu.ops import banded
    axis = axis % 4
    n = x.shape[axis]
    if banded.matmul_op_enabled(n):
        T = _afb_atrous_matrix(tuple(h0_taps), tuple(h1_taps), mode,
                               dilation, n)
        if axis == 2:
            y = banded.apply_col(x, T)
            return y.reshape(*y.shape[:2], 2, -1, y.shape[-1])
        y = banded.apply_row(x, T)
        y = y.reshape(*y.shape[:3], 2, -1)
        return jnp.moveaxis(y, 3, 2)
    return _afb1d_atrous_corr_conv(x, h0_taps, h1_taps, mode, axis,
                                   dilation)


@lru_cache(maxsize=None)
def _afb_atrous_matrix(h0, h1, mode, dilation, n, dtype_str="f4"):
    from pytorch_wavelets_tpu.ops import banded
    return banded.synthesized_or_probe(
        lambda m: banded.probe_op(
            lambda I: _afb1d_atrous_corr_conv(
                I, np.asarray(h0), np.asarray(h1), mode, 2, dilation), m,
            dtype=np.dtype(dtype_str).type),
        n, _ext_ns(len(h0), dilation), 2, 1, (1, 1))


def _afb1d_atrous_corr_conv(x, h0_taps, h1_taps, mode, axis, dilation):
    """Undecimated (à trous) analysis split (reference:
    dwt/lowlevel.py:175-223)."""
    L = len(h0_taps)
    L2 = (L * dilation) // 2
    kernels = np.stack([h0_taps, h1_taps])
    xp = pad1d(x, L2 - dilation, L2, axis % 4, mode)
    return _conv_axis(xp, kernels, axis % 4, rhs_dilation=dilation)


def afb1d_atrous(x, h0, h1, mode="periodic", axis=-1, dilation=1):
    h0t, h1t = as_taps(h0)[::-1], as_taps(h1)[::-1]
    return _afb1d_atrous_corr(x, h0t, h1t, mode, axis, dilation)


# --------------------------------------------------------------------------
# Synthesis (interpolating) filterbank
# --------------------------------------------------------------------------

def _sfb1d_conv(lo, hi, g0_taps, g1_taps, mode, axis):
    """Single-level synthesis merge along ``axis``; taps in *convolution*
    order (true convolution, like the reference's conv_transpose2d usage,
    dwt/lowlevel.py:226-271).

    lo/hi: (N, C, H, W).  Returns (N, C, H', W').
    Dispatches to the MXU operator-matmul fast path off-CPU.
    """
    from pytorch_wavelets_tpu.ops import banded
    axis = axis % 4
    n = lo.shape[axis]
    if banded.matmul_op_enabled(2 * n):
        T = _sfb_matrix(tuple(g0_taps), tuple(g1_taps), mode, n)
        xcat = jnp.concatenate([lo, hi], axis=axis)
        if axis == 2:
            return banded.apply_col(xcat, T)
        return banded.apply_row(xcat, T)
    return _sfb1d_conv_conv(lo, hi, g0_taps, g1_taps, mode, axis)


@lru_cache(maxsize=None)
def _sfb_matrix(g0, g1, mode, n):
    """Operator matrix of the synthesis merge on concat(lo, hi)."""
    from pytorch_wavelets_tpu.ops import banded

    def direct(m):
        def fn(I):  # I: (1, 1, 2m, 2m) identity over the concat input
            return _sfb1d_conv_conv(I[:, :, :m], I[:, :, m:],
                                    np.asarray(g0), np.asarray(g1),
                                    mode, 2)
        return banded.probe_op(fn, 2 * m)

    return banded.synthesized_or_probe(direct, n, _ext_ns(len(g0)) // 2,
                                       1, 2, (2, 1))


def _sfb1d_conv_conv(lo, hi, g0_taps, g1_taps, mode, axis):
    """Conv-path implementation (semantics source + CPU path)."""
    axis = axis % 4
    L = len(g0_taps)
    Nin = lo.shape[axis]
    # transpose-conv(stride 2, pad p) == correlate(up2(x), rev(g), L-1-p)
    k0 = np.asarray(g0_taps)[::-1].reshape(1, L)
    k1 = np.asarray(g1_taps)[::-1].reshape(1, L)

    if mode in ("per", "periodization"):
        pad = (L - 1, L - 1)
        y = (_conv_axis(lo, k0, axis, lhs_dilation=2, padding=pad) +
             _conv_axis(hi, k1, axis, lhs_dilation=2, padding=pad))
        y = y[:, :, 0]
        Nout = 2 * Nin
        if L > 2:
            # wrap-add the tail onto the first L-2 samples then crop
            # (reference dwt/lowlevel.py:256-260); when the filter is
            # longer than the signal (L-2 >= Nout) the cropped output
            # comes entirely from the folded head
            head = (lax.slice_in_dim(y, 0, L - 2, axis=axis) +
                    lax.slice_in_dim(y, Nout, Nout + L - 2, axis=axis))
            if L - 2 >= Nout:
                y = lax.slice_in_dim(head, 0, Nout, axis=axis)
            else:
                body = lax.slice_in_dim(y, L - 2, Nout, axis=axis)
                y = jnp.concatenate([head, body], axis=axis)
        else:
            y = lax.slice_in_dim(y, 0, Nout, axis=axis)
        return jnp.roll(y, 1 - L // 2, axis=axis)

    if mode in ("zero", "symmetric", "reflect", "periodic"):
        pad = (1, 1)  # = L-1 - (L-2)
        y = (_conv_axis(lo, k0, axis, lhs_dilation=2, padding=pad) +
             _conv_axis(hi, k1, axis, lhs_dilation=2, padding=pad))
        return y[:, :, 0]
    raise ValueError(f"Unknown pad type: {mode}")


def sfb1d(lo, hi, g0, g1, mode="zero", axis=-1):
    """Synthesis filterbank with pywt-ordered rec_lo/rec_hi filters."""
    return _sfb1d_conv(lo, hi, as_taps(g0), as_taps(g1), mode, axis)


def _sfb1d_atrous_conv(lo, hi, g0_taps, g1_taps, mode, axis, dilation):
    from pytorch_wavelets_tpu.ops import banded
    axis = axis % 4
    n = lo.shape[axis]
    if banded.matmul_op_enabled(2 * n):
        T = _sfb_atrous_matrix(tuple(g0_taps), tuple(g1_taps), mode,
                               dilation, n)
        xcat = jnp.concatenate([lo, hi], axis=axis)
        if axis == 2:
            return banded.apply_col(xcat, T)
        return banded.apply_row(xcat, T)
    return _sfb1d_atrous_conv_conv(lo, hi, g0_taps, g1_taps, mode, axis,
                                   dilation)


@lru_cache(maxsize=None)
def _sfb_atrous_matrix(g0, g1, mode, dilation, n):
    from pytorch_wavelets_tpu.ops import banded

    def direct(m):
        def fn(I):
            return _sfb1d_atrous_conv_conv(I[:, :, :m], I[:, :, m:],
                                           np.asarray(g0), np.asarray(g1),
                                           mode, 2, dilation)
        return banded.probe_op(fn, 2 * m)

    return banded.synthesized_or_probe(direct, n,
                                       _ext_ns(len(g0), dilation), 1, 2,
                                       (1, 1))


def _sfb1d_atrous_conv_conv(lo, hi, g0_taps, g1_taps, mode, axis, dilation):
    """Undecimated synthesis: adjoint of the à trous analysis, averaging the
    two shift-interleaved reconstructions.  (The reference's swt_inverse.py
    is dead code — reference: dwt/swt_inverse.py:1-204 has no imports — so
    this is a working replacement with the standard ISWT definition.)"""
    L = len(g0_taps)
    axis = axis % 4
    k0 = np.asarray(g0_taps)[::-1].reshape(1, L)
    k1 = np.asarray(g1_taps)[::-1].reshape(1, L)
    Ld = L * dilation
    L2 = Ld // 2
    # analysis pads (L2 - d, L2); the inverse correlation needs the halo
    # (L2, Ld - d - L2) so the branch-sum delta lands at zero offset.
    front, back = L2, Ld - dilation - L2
    lo_p = pad1d(lo, front, back, axis, mode)
    hi_p = pad1d(hi, front, back, axis, mode)
    y = (_conv_axis(lo_p, k0, axis, rhs_dilation=dilation) +
         _conv_axis(hi_p, k1, axis, rhs_dilation=dilation))
    return 0.5 * y[:, :, 0]


def sfb1d_atrous(lo, hi, g0, g1, mode="periodic", axis=-1, dilation=1):
    return _sfb1d_atrous_conv(lo, hi, as_taps(g0), as_taps(g1), mode, axis,
                              dilation)


# --------------------------------------------------------------------------
# Separable 2-D compositions
# --------------------------------------------------------------------------

def afb2d(x, h0_col, h1_col, h0_row, h1_row, mode="zero"):
    """One level of 2-D analysis. Returns (N, C, 4, H', W') ordered
    (LL, LH, HL, HH) — reference band packing (dwt/lowlevel.py:343-347)."""
    h0c, h1c = as_taps(h0_col)[::-1], as_taps(h1_col)[::-1]
    h0r, h1r = as_taps(h0_row)[::-1], as_taps(h1_row)[::-1]
    return _afb2d_corr(x, h0c, h1c, h0r, h1r, mode)


def _afb2d_corr(x, h0c, h1c, h0r, h1r, mode):
    N, C = x.shape[:2]
    from pytorch_wavelets_tpu.ops import banded
    H, W = x.shape[2], x.shape[3]
    if banded.matmul_op_enabled(H) and banded.matmul_op_enabled(W):
        # fused 2-dot level: both filter pairs stacked inside the operator
        # matrices, so the four bands come out as quadrants of one matmul
        # chain (no interleave/moveaxis passes)
        Tr = _afb_matrix(tuple(h0r), tuple(h1r), mode, W)   # (2W', W)
        Tc = _afb_matrix(tuple(h0c), tuple(h1c), mode, H)   # (2H', H)
        y = banded.apply_col(banded.apply_row(x, Tr), Tc)   # (N,C,2H',2W')
        Hp, Wp = Tc.shape[0] // 2, Tr.shape[0] // 2
        return jnp.stack([
            y[:, :, :Hp, :Wp],    # LL: row-lo, col-lo
            y[:, :, Hp:, :Wp],    # LH: row-lo, col-hi
            y[:, :, :Hp, Wp:],    # HL: row-hi, col-lo
            y[:, :, Hp:, Wp:],    # HH: row-hi, col-hi
        ], axis=2)
    lohi = _afb1d_corr(x, h0r, h1r, mode, axis=3)          # (N,C,2,H,W')
    lohi = lohi.reshape(N, C * 2, *lohi.shape[3:])
    y = _afb1d_corr(lohi, h0c, h1c, mode, axis=2)          # (N,2C,2,H',W')
    # (N, C, w∈{lo,hi}, h∈{lo,hi}, H', W') -> 4 bands (LL, LH, HL, HH)
    y = y.reshape(N, C, 2, 2, *y.shape[3:])
    return y.reshape(N, C, 4, *y.shape[4:])


def sfb2d(ll, lh, hl, hh, g0_col, g1_col, g0_row, g1_row, mode="zero"):
    """One level of 2-D synthesis (reference: dwt/lowlevel.py:600-644)."""
    g0c, g1c = as_taps(g0_col), as_taps(g1_col)
    g0r, g1r = as_taps(g0_row), as_taps(g1_row)
    return _sfb2d_conv(ll, lh, hl, hh, g0c, g1c, g0r, g1r, mode)


def _sfb2d_conv(ll, lh, hl, hh, g0c, g1c, g0r, g1r, mode):
    from pytorch_wavelets_tpu.ops import banded
    Hp, Wp = ll.shape[2], ll.shape[3]
    if (banded.matmul_op_enabled(2 * Hp) and banded.matmul_op_enabled(2 * Wp)
            and lh.shape == ll.shape == hl.shape == hh.shape):
        # fused 2-dot merge: quadrant-concat the bands, then one column
        # and one row operator matmul reconstruct in a single chain
        Sc = _sfb_matrix(tuple(g0c), tuple(g1c), mode, Hp)  # (H_out, 2Hp)
        Sr = _sfb_matrix(tuple(g0r), tuple(g1r), mode, Wp)  # (W_out, 2Wp)
        q = jnp.concatenate([
            jnp.concatenate([ll, hl], axis=3),
            jnp.concatenate([lh, hh], axis=3)], axis=2)     # (N,C,2Hp,2Wp)
        return banded.apply_row(banded.apply_col(q, Sc), Sr)
    lo = _sfb1d_conv(ll, lh, g0c, g1c, mode, axis=2)
    hi = _sfb1d_conv(hl, hh, g0c, g1c, mode, axis=2)
    return _sfb1d_conv(lo, hi, g0r, g1r, mode, axis=3)


def afb2d_atrous(x, h0_col, h1_col, h0_row, h1_row, mode="periodization",
                 dilation=1):
    """One level of undecimated 2-D analysis (SWT forward step).
    Returns (N, C, 4, H, W) ordered (LL, LH, HL, HH)
    (reference: dwt/lowlevel.py:475-521)."""
    h0c, h1c = as_taps(h0_col)[::-1], as_taps(h1_col)[::-1]
    h0r, h1r = as_taps(h0_row)[::-1], as_taps(h1_row)[::-1]
    N, C = x.shape[:2]
    from pytorch_wavelets_tpu.ops import banded
    H, W = x.shape[2], x.shape[3]
    if banded.matmul_op_enabled(H) and banded.matmul_op_enabled(W):
        Tr = _afb_atrous_matrix(tuple(h0r), tuple(h1r), mode, dilation, W)
        Tc = _afb_atrous_matrix(tuple(h0c), tuple(h1c), mode, dilation, H)
        y = banded.apply_col(banded.apply_row(x, Tr), Tc)   # (N,C,2H,2W)
        return jnp.stack([
            y[:, :, :H, :W], y[:, :, H:, :W],
            y[:, :, :H, W:], y[:, :, H:, W:]], axis=2)
    lohi = _afb1d_atrous_corr(x, h0r, h1r, mode, 3, dilation)
    lohi = lohi.reshape(N, C * 2, *lohi.shape[3:])
    y = _afb1d_atrous_corr(lohi, h0c, h1c, mode, 2, dilation)
    y = y.reshape(N, C, 2, 2, *y.shape[3:])
    return y.reshape(N, C, 4, *y.shape[4:])


def sfb2d_atrous(coeffs, g0_col, g1_col, g0_row, g1_row,
                 mode="periodization", dilation=1):
    """One level of undecimated 2-D synthesis (ISWT step); inverse of
    afb2d_atrous.  ``coeffs``: (N, C, 4, H, W)."""
    g0c, g1c = as_taps(g0_col), as_taps(g1_col)
    g0r, g1r = as_taps(g0_row), as_taps(g1_row)
    ll, lh, hl, hh = (coeffs[:, :, i] for i in range(4))
    from pytorch_wavelets_tpu.ops import banded
    Hp, Wp = ll.shape[2], ll.shape[3]
    if banded.matmul_op_enabled(2 * Hp) and banded.matmul_op_enabled(2 * Wp):
        Sc = _sfb_atrous_matrix(tuple(g0c), tuple(g1c), mode, dilation, Hp)
        Sr = _sfb_atrous_matrix(tuple(g0r), tuple(g1r), mode, dilation, Wp)
        q = jnp.concatenate([
            jnp.concatenate([ll, hl], axis=3),
            jnp.concatenate([lh, hh], axis=3)], axis=2)
        return banded.apply_row(banded.apply_col(q, Sc), Sr)
    lo = _sfb1d_atrous_conv(ll, lh, g0c, g1c, mode, 2, dilation)
    hi = _sfb1d_atrous_conv(hl, hh, g0c, g1c, mode, 2, dilation)
    return _sfb1d_atrous_conv(lo, hi, g0r, g1r, mode, 3, dilation)


# --------------------------------------------------------------------------
# Non-separable single-conv variants (reference: dwt/lowlevel.py:524-798)
# --------------------------------------------------------------------------

def _outer_filters(h0_col, h1_col, h0_row, h1_row):
    h0c, h1c = as_taps(h0_col), as_taps(h1_col)
    h0r, h1r = as_taps(h0_row), as_taps(h1_row)
    return np.stack([np.outer(h0c, h0r), np.outer(h1c, h0r),
                     np.outer(h0c, h1r), np.outer(h1c, h1r)])


def _nonsep_conv(x, f, mode):
    """Strided (2, 2) analysis conv of each (N, C) plane with a stack of
    K mirrored 2-D PSFs ``f`` (K, Ly, Lx), with the per-mode pad calculus
    of the separable path.  Returns (N, C, K, H', W')."""
    N, C, H, W = x.shape
    K, Ly, Lx = f.shape
    if mode in ("per", "periodization"):
        if H % 2:
            x = jnp.concatenate([x, x[:, :, -1:]], axis=2)
            H += 1
        if W % 2:
            x = jnp.concatenate([x, x[:, :, :, -1:]], axis=3)
            W += 1
        xp = pad1d(x, Ly - 1 - Ly // 2, max(Ly // 2 - 1, 0), 2, "periodic")
        xp = pad1d(xp, Lx - 1 - Lx // 2, max(Lx // 2 - 1, 0), 3, "periodic")
    elif mode in ("zero", "symmetric", "reflect"):
        out1 = dwt_coeff_len(H, Ly, mode)
        out2 = dwt_coeff_len(W, Lx, mode)
        p1 = 2 * (out1 - 1) - H + Ly
        p2 = 2 * (out2 - 1) - W + Lx
        fb1 = ((p1 // 2, p1 - p1 // 2) if mode == "zero"
               else (p1 // 2, (p1 + 1) // 2))
        fb2 = ((p2 // 2, p2 - p2 // 2) if mode == "zero"
               else (p2 // 2, (p2 + 1) // 2))
        xp = pad1d(x, fb1[0], fb1[1], 2, mode)
        xp = pad1d(xp, fb2[0], fb2[1], 3, mode)
    else:
        raise ValueError(f"Unknown pad type: {mode}")
    xr = xp.reshape(N * C, 1, *xp.shape[2:])
    w = jnp.asarray(np.ascontiguousarray(f[:, None]), dtype=x.dtype)
    y = lax.conv_general_dilated(
        xr, w, window_strides=(2, 2), padding=((0, 0), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=_prec(x))
    return y.reshape(N, C, K, *y.shape[2:])


def afb2d_nonsep(x, h0_col, h1_col, h0_row=None, h1_row=None, mode="zero"):
    """1-level 2-D analysis as one conv with 4 outer-product PSFs.
    Returns (N, C, 4, H', W')."""
    if h0_row is None:
        h0_row, h1_row = h0_col, h1_col
    f = _outer_filters(h0_col, h1_col, h0_row, h1_row)[:, ::-1, ::-1]
    return _nonsep_conv(x, f, mode)


def sfb2d_nonsep(coeffs, g0_col, g1_col, g0_row=None, g1_row=None,
                 mode="zero"):
    """1-level 2-D synthesis from stacked (N, C, 4, H, W) coefficients via
    one transpose conv (reference: dwt/lowlevel.py:746-798)."""
    if g0_row is None:
        g0_row, g1_row = g0_col, g1_col
    f = _outer_filters(g0_col, g1_col, g0_row, g1_row)
    N, C = coeffs.shape[:2]
    Ny, Nx = coeffs.shape[-2:]
    Ly, Lx = f.shape[1:]
    xr = coeffs.reshape(N * C, 4, Ny, Nx)
    # transpose-conv == correlate(lhs-dilated input, doubly-reversed kernel);
    # the 4 bands become input channels of one dense conv that sums them.
    w = jnp.asarray(np.ascontiguousarray(
        f[:, ::-1, ::-1][None]), dtype=coeffs.dtype)  # (1, 4, Ly, Lx)
    if mode in ("per", "periodization"):
        pad = ((Ly - 1, Ly - 1), (Lx - 1, Lx - 1))
    elif mode in ("zero", "symmetric", "reflect", "periodic"):
        pad = ((1, 1), (1, 1))
    else:
        raise ValueError(f"Unknown pad type: {mode}")
    y = lax.conv_general_dilated(
        xr, w, window_strides=(1, 1), padding=pad, lhs_dilation=(2, 2),
        dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=_prec(coeffs))
    y = y.reshape(N, C, *y.shape[2:])
    if mode in ("per", "periodization"):
        for axis, L, Nn in ((2, Ly, Ny), (3, Lx, Nx)):
            if L > 2:
                head = lax.slice_in_dim(y, 0, L - 2, axis=axis)
                tail = lax.slice_in_dim(y, 2 * Nn, 2 * Nn + L - 2, axis=axis)
                body = lax.slice_in_dim(y, L - 2, 2 * Nn, axis=axis)
                y = jnp.concatenate([head + tail, body], axis=axis)
            else:
                y = lax.slice_in_dim(y, 0, 2 * Nn, axis=axis)
            y = jnp.roll(y, 1 - L // 2, axis=axis)
    return y
