"""DTCWT forward/inverse level functions and their custom VJPs.

Reference semantics: pytorch_wavelets/dtcwt/transform_funcs.py.  The
backward of a forward level is the inverse level run with the same
(biorthogonal, self-time-reversing) filters; for q-shift levels the a/b
trees swap to effect time reversal (reference:
transform_funcs.py:361-374,395-413).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_wavelets_tpu.ops.dtcwt_fb import (
    c2q, coldfilt, colfilter, colifilt, q2c, rowdfilt, rowfilter, rowifilt,
    _dfilt_matrix, _filter_matrix, _ifilt_matrix,
)


def _taps_key(taps):
    return tuple(float(v) for v in np.asarray(taps).ravel())


def _fused_analysis_j1(x, h0, h1, h2, o_dim, mode):
    """Parity-folded matmul path for level-1 analysis (h2 optional for the
    bandpass-diagonal variant).  Returns None if not applicable."""
    from pytorch_wavelets_tpu.ops import banded, fused_dtcwt
    H, W = x.shape[2], x.shape[3]
    if not (banded.matmul_op_enabled(H) and banded.matmul_op_enabled(W)):
        return None
    k0, k1 = _taps_key(h0), _taps_key(h1)
    Cl, Ch = _filter_matrix(k0, mode, H), _filter_matrix(k1, mode, H)
    Rl, Rh = _filter_matrix(k0, mode, W), _filter_matrix(k1, mode, W)
    mats = [Cl, Ch, Rl, Rh]
    if h2 is not None:
        k2 = _taps_key(h2)
        C2, R2 = _filter_matrix(k2, mode, H), _filter_matrix(k2, mode, W)
        mats += [C2, R2]
    if any(m.shape[0] % 2 for m in mats):
        return None  # even-length filters give odd outputs; q2c undefined
    hh_spec = (R2, C2) if h2 is not None else (Rh, Ch)
    return fused_dtcwt.analysis_level(
        x, (Rl, Cl), (Rl, Ch), (Rh, Cl), hh_spec, o_dim)


def _fused_analysis_j2(x, h0a, h1a, h0b, h1b, h2a, h2b, o_dim, mode):
    from pytorch_wavelets_tpu.ops import banded, fused_dtcwt
    if mode != "symmetric":
        return None
    H, W = x.shape[2], x.shape[3]
    if H % 4 or W % 4:
        return None
    if not (banded.matmul_op_enabled(H) and banded.matmul_op_enabled(W)):
        return None
    kl = (_taps_key(h0b), _taps_key(h0a))
    kh = (_taps_key(h1b), _taps_key(h1a))
    Cl, Ch = _dfilt_matrix(*kl, False, H), _dfilt_matrix(*kh, True, H)
    Rl, Rh = _dfilt_matrix(*kl, False, W), _dfilt_matrix(*kh, True, W)
    if h2a is not None:
        kb = (_taps_key(h2b), _taps_key(h2a))
        C2, R2 = _dfilt_matrix(*kb, True, H), _dfilt_matrix(*kb, True, W)
        hh_spec = (R2, C2)
    else:
        hh_spec = (Rh, Ch)
    return fused_dtcwt.analysis_level(
        x, (Rl, Cl), (Rl, Ch), (Rh, Cl), hh_spec, o_dim)


def _fused_synthesis_j1(ll, highr, highi, g0, g1, g2, o_dim, h_dim, w_dim,
                        mode):
    from pytorch_wavelets_tpu.ops import banded, fused_dtcwt
    hh, ww = highr.shape[h_dim], highr.shape[w_dim]
    if not (banded.matmul_op_enabled(2 * hh)
            and banded.matmul_op_enabled(2 * ww)):
        return None
    k0, k1 = _taps_key(g0), _taps_key(g1)
    C0, C1 = _filter_matrix(k0, mode, 2 * hh), _filter_matrix(k1, mode,
                                                              2 * hh)
    R0, R1 = _filter_matrix(k0, mode, 2 * ww), _filter_matrix(k1, mode,
                                                              2 * ww)
    if g2 is not None:
        k2 = _taps_key(g2)
        C2 = _filter_matrix(k2, mode, 2 * hh)
        R2 = _filter_matrix(k2, mode, 2 * ww)
        hh_spec, hl_spec = (R2, C2), (R1, C0)
    else:
        hh_spec, hl_spec = (R1, C1), (R1, C0)
    if ll is not None:
        ll = _crop_ll(ll, highr, h_dim, w_dim)
        if ll.shape[2] != 2 * hh or ll.shape[3] != 2 * ww:
            return None
    return fused_dtcwt.synthesis_level(
        ll, highr, highi, (R0, C0), (R0, C1), hl_spec, hh_spec, o_dim)


def _fused_synthesis_j2(ll, highr, highi, g0a, g1a, g0b, g1b, g2a, g2b,
                        o_dim, h_dim, w_dim, mode):
    from pytorch_wavelets_tpu.ops import banded, fused_dtcwt
    if mode != "symmetric":
        return None
    hh, ww = highr.shape[h_dim], highr.shape[w_dim]
    if not (banded.matmul_op_enabled(2 * hh)
            and banded.matmul_op_enabled(2 * ww)):
        return None
    kl = (_taps_key(g0b), _taps_key(g0a))
    kh = (_taps_key(g1b), _taps_key(g1a))
    C0, C1 = _ifilt_matrix(*kl, False, 2 * hh), _ifilt_matrix(*kh, True,
                                                              2 * hh)
    R0, R1 = _ifilt_matrix(*kl, False, 2 * ww), _ifilt_matrix(*kh, True,
                                                              2 * ww)
    if g2a is not None:
        kb = (_taps_key(g2b), _taps_key(g2a))
        C2 = _ifilt_matrix(*kb, True, 2 * hh)
        R2 = _ifilt_matrix(*kb, True, 2 * ww)
        hh_spec, hl_spec = (R2, C2), (R1, C0)
    else:
        hh_spec, hl_spec = (R1, C1), (R1, C0)
    if ll is not None and (ll.shape[2] != 2 * hh or ll.shape[3] != 2 * ww):
        return None
    return fused_dtcwt.synthesis_level(
        ll, highr, highi, (R0, C0), (R0, C1), hl_spec, hh_spec, o_dim)

__all__ = [
    "get_dimensions5", "get_dimensions6",
    "highs_to_orientations", "orientations_to_highs",
    "fwd_j1", "fwd_j1_rot", "inv_j1", "inv_j1_rot",
    "fwd_j2plus", "fwd_j2plus_rot", "inv_j2plus", "inv_j2plus_rot",
    "fwd_j1_op", "fwd_j2plus_op", "inv_j1_op", "inv_j2plus_op",
    "fwd_j1_rot_op", "fwd_j2plus_rot_op",
]


def get_dimensions5(o_dim, ri_dim):
    """Orientation/height/width dims once re/im has been popped off a 6-D
    layout (reference: transform_funcs.py:10-29)."""
    o_dim = o_dim % 6
    ri_dim = ri_dim % 6
    if ri_dim < o_dim:
        o_dim -= 1
    if o_dim == 4:
        h_dim, w_dim = 2, 3
    elif o_dim == 3:
        h_dim, w_dim = 2, 4
    else:
        h_dim, w_dim = 3, 4
    return o_dim, ri_dim, h_dim, w_dim


def get_dimensions6(o_dim, ri_dim):
    """Dims in the full 6-D bandpass tensor (reference:
    transform_funcs.py:32-58).

    Derived from the 5-D dims plus the re/im stack insertion: stacking at
    ``ri_dim`` shifts every 5-D axis at or past it up by one.  This agrees
    with the reference's case table on every layout its inverse supports
    and *corrects* it on the layouts where exactly one of o_dim/ri_dim is
    >= 4 — there the reference mislabels the H/W axes and its DTCWTInverse
    crashes (docs/parity.md, Known divergences), while these dims make the
    inverse work for the full 30-pair matrix."""
    od5, rd, h5, w5 = get_dimensions5(o_dim, ri_dim)
    h_dim = h5 + (1 if h5 >= rd else 0)
    w_dim = w5 + (1 if w5 >= rd else 0)
    return od5, rd, h_dim, w_dim


def highs_to_orientations(lh, hl, hh, o_dim):
    """(lh, hl, hh) subbands -> 6 oriented complex bands stacked on o_dim in
    the order 15, 45, 75, 105, 135, 165 degrees (reference:
    transform_funcs.py:61-72)."""
    (deg15r, deg15i), (deg165r, deg165i) = q2c(lh)
    (deg45r, deg45i), (deg135r, deg135i) = q2c(hh)
    (deg75r, deg75i), (deg105r, deg105i) = q2c(hl)
    reals = jnp.stack([deg15r, deg45r, deg75r, deg105r, deg135r, deg165r],
                      axis=o_dim)
    imags = jnp.stack([deg15i, deg45i, deg75i, deg105i, deg135i, deg165i],
                      axis=o_dim)
    return reals, imags


def orientations_to_highs(reals, imags, o_dim):
    """Inverse of :func:`highs_to_orientations` (reference:
    transform_funcs.py:75-95)."""
    r = jnp.moveaxis(reals, o_dim, 0)
    i = jnp.moveaxis(imags, o_dim, 0)
    lh = c2q((r[0], i[0]), (r[5], i[5]))
    hl = c2q((r[2], i[2]), (r[3], i[3]))
    hh = c2q((r[1], i[1]), (r[4], i[4]))
    return lh, hl, hh


# --------------------------------------------------------------------------
# Level functions (taps in correlation order, like prep_filt buffers)
# --------------------------------------------------------------------------

def fwd_j1(x, h0, h1, skip_hps, o_dim, mode):
    """Level-1 analysis (reference: transform_funcs.py:98-121)."""
    if not skip_hps:
        fused = _fused_analysis_j1(x, h0, h1, None, o_dim, mode)
        if fused is not None:
            return fused
        lo = rowfilter(x, h0, mode)
        hi = rowfilter(x, h1, mode)
        ll = colfilter(lo, h0, mode)
        lh = colfilter(lo, h1, mode)
        hl = colfilter(hi, h0, mode)
        hh = colfilter(hi, h1, mode)
        highr, highi = highs_to_orientations(lh, hl, hh, o_dim)
    else:
        ll = colfilter(rowfilter(x, h0, mode), h0, mode)
        highr = highi = None
    return ll, highr, highi


def fwd_j1_rot(x, h0, h1, h2, skip_hps, o_dim, mode):
    """Level-1 analysis with the bandpass-diagonal (rotationally symmetric)
    filter h2 on the HH branch (reference: transform_funcs.py:124-149)."""
    if not skip_hps:
        fused = _fused_analysis_j1(x, h0, h1, h2, o_dim, mode)
        if fused is not None:
            return fused
        lo = rowfilter(x, h0, mode)
        hi = rowfilter(x, h1, mode)
        ba = rowfilter(x, h2, mode)
        lh = colfilter(lo, h1, mode)
        hl = colfilter(hi, h0, mode)
        hh = colfilter(ba, h2, mode)
        ll = colfilter(lo, h0, mode)
        highr, highi = highs_to_orientations(lh, hl, hh, o_dim)
    else:
        ll = colfilter(rowfilter(x, h0, mode), h0, mode)
        highr = highi = None
    return ll, highr, highi


def _crop_ll(ll, highr, h_dim, w_dim):
    r, c = ll.shape[2:]
    r1, c1 = highr.shape[h_dim], highr.shape[w_dim]
    if r != r1 * 2:
        ll = ll[:, :, 1:-1]
    if c != c1 * 2:
        ll = ll[:, :, :, 1:-1]
    return ll


def inv_j1(ll, highr, highi, g0, g1, o_dim, h_dim, w_dim, mode):
    """Level-1 synthesis (reference: transform_funcs.py:152-184)."""
    if highr is None:
        return rowfilter(colfilter(ll, g0), g0)
    fused = _fused_synthesis_j1(ll, highr, highi, g0, g1, None, o_dim,
                                h_dim, w_dim, mode)
    if fused is not None:
        return fused
    lh, hl, hh = orientations_to_highs(highr, highi, o_dim)
    if ll is None:
        hi = colfilter(hh, g1, mode) + colfilter(hl, g0, mode)
        lo = colfilter(lh, g1, mode)
    else:
        ll = _crop_ll(ll, highr, h_dim, w_dim)
        hi = colfilter(hh, g1, mode) + colfilter(hl, g0, mode)
        lo = colfilter(lh, g1, mode) + colfilter(ll, g0, mode)
    return rowfilter(hi, g1, mode) + rowfilter(lo, g0, mode)


def inv_j1_rot(ll, highr, highi, g0, g1, g2, o_dim, h_dim, w_dim, mode):
    """Level-1 synthesis, bandpass-diagonal variant (reference:
    transform_funcs.py:187-223)."""
    if highr is None:
        return rowfilter(colfilter(ll, g0), g0)
    fused = _fused_synthesis_j1(ll, highr, highi, g0, g1, g2, o_dim,
                                h_dim, w_dim, mode)
    if fused is not None:
        return fused
    lh, hl, hh = orientations_to_highs(highr, highi, o_dim)
    if ll is None:
        lo = colfilter(lh, g1, mode)
        hi = colfilter(hl, g0, mode)
        ba = colfilter(hh, g2, mode)
    else:
        ll = _crop_ll(ll, highr, h_dim, w_dim)
        lo = colfilter(lh, g1, mode) + colfilter(ll, g0, mode)
        hi = colfilter(hl, g0, mode)
        ba = colfilter(hh, g2, mode)
    return (rowfilter(hi, g1, mode) + rowfilter(lo, g0, mode) +
            rowfilter(ba, g2, mode))


def fwd_j2plus(x, h0a, h1a, h0b, h1b, skip_hps, o_dim, mode):
    """Level>=2 analysis with q-shift trees (reference:
    transform_funcs.py:226-249)."""
    if not skip_hps:
        fused = _fused_analysis_j2(x, h0a, h1a, h0b, h1b, None, None,
                                   o_dim, mode)
        if fused is not None:
            return fused
        lo = rowdfilt(x, h0b, h0a, False, mode)
        hi = rowdfilt(x, h1b, h1a, True, mode)
        ll = coldfilt(lo, h0b, h0a, False, mode)
        lh = coldfilt(lo, h1b, h1a, True, mode)
        hl = coldfilt(hi, h0b, h0a, False, mode)
        hh = coldfilt(hi, h1b, h1a, True, mode)
        highr, highi = highs_to_orientations(lh, hl, hh, o_dim)
    else:
        ll = coldfilt(rowdfilt(x, h0b, h0a, False, mode), h0b, h0a, False,
                      mode)
        highr = highi = None
    return ll, highr, highi


def fwd_j2plus_rot(x, h0a, h1a, h0b, h1b, h2a, h2b, skip_hps, o_dim, mode):
    """Level>=2 analysis, bandpass-diagonal variant (reference:
    transform_funcs.py:252-276)."""
    if not skip_hps:
        fused = _fused_analysis_j2(x, h0a, h1a, h0b, h1b, h2a, h2b,
                                   o_dim, mode)
        if fused is not None:
            return fused
        lo = rowdfilt(x, h0b, h0a, False, mode)
        hi = rowdfilt(x, h1b, h1a, True, mode)
        ba = rowdfilt(x, h2b, h2a, True, mode)
        lh = coldfilt(lo, h1b, h1a, True, mode)
        hl = coldfilt(hi, h0b, h0a, False, mode)
        hh = coldfilt(ba, h2b, h2a, True, mode)
        ll = coldfilt(lo, h0b, h0a, False, mode)
        highr, highi = highs_to_orientations(lh, hl, hh, o_dim)
    else:
        ll = coldfilt(rowdfilt(x, h0b, h0a, False, mode), h0b, h0a, False,
                      mode)
        highr = highi = None
    return ll, highr, highi


def inv_j2plus(ll, highr, highi, g0a, g1a, g0b, g1b, o_dim, h_dim, w_dim,
               mode):
    """Level>=2 synthesis (reference: transform_funcs.py:279-307)."""
    if highr is None:
        return rowifilt(colifilt(ll, g0b, g0a, False, mode), g0b, g0a,
                        False, mode)
    fused = _fused_synthesis_j2(ll, highr, highi, g0a, g1a, g0b, g1b,
                                None, None, o_dim, h_dim, w_dim, mode)
    if fused is not None:
        return fused
    lh, hl, hh = orientations_to_highs(highr, highi, o_dim)
    if ll is None:
        hi = (colifilt(hh, g1b, g1a, True, mode) +
              colifilt(hl, g0b, g0a, False, mode))
        lo = colifilt(lh, g1b, g1a, True, mode)
    else:
        hi = (colifilt(hh, g1b, g1a, True, mode) +
              colifilt(hl, g0b, g0a, False, mode))
        lo = (colifilt(lh, g1b, g1a, True, mode) +
              colifilt(ll, g0b, g0a, False, mode))
    return (rowifilt(hi, g1b, g1a, True, mode) +
            rowifilt(lo, g0b, g0a, False, mode))


def inv_j2plus_rot(ll, highr, highi, g0a, g1a, g0b, g1b, g2a, g2b,
                   o_dim, h_dim, w_dim, mode):
    """Level>=2 synthesis, bandpass-diagonal variant (reference:
    transform_funcs.py:310-340)."""
    if highr is None:
        return rowifilt(colifilt(ll, g0b, g0a, False, mode), g0b, g0a,
                        False, mode)
    fused = _fused_synthesis_j2(ll, highr, highi, g0a, g1a, g0b, g1b,
                                g2a, g2b, o_dim, h_dim, w_dim, mode)
    if fused is not None:
        return fused
    lh, hl, hh = orientations_to_highs(highr, highi, o_dim)
    if ll is None:
        lo = colifilt(lh, g1b, g1a, True, mode)
        hi = colifilt(hl, g0b, g0a, False, mode)
        ba = colifilt(hh, g2b, g2a, True, mode)
    else:
        lo = (colifilt(lh, g1b, g1a, True, mode) +
              colifilt(ll, g0b, g0a, False, mode))
        hi = colifilt(hl, g0b, g0a, False, mode)
        ba = colifilt(hh, g2b, g2a, True, mode)
    return (rowifilt(hi, g1b, g1a, True, mode) +
            rowifilt(lo, g0b, g0a, False, mode) +
            rowifilt(ba, g2b, g2a, True, mode))


# --------------------------------------------------------------------------
# custom_vjp wrappers (reference FWD_J1 / FWD_J2PLUS / INV_J1 / INV_J2PLUS)
# --------------------------------------------------------------------------

def _np_taps(t):
    return np.asarray(t, dtype=np.float64)


@lru_cache(maxsize=None)
def _make_fwd_j1_op(h0, h1, skip_hps, o_dim, ri_dim, mode):
    h0a, h1a = _np_taps(h0), _np_taps(h1)
    dims = get_dimensions5(o_dim, ri_dim)
    od, rd, hd, wd = dims

    @jax.custom_vjp
    def op(x):
        ll, highr, highi = fwd_j1(x, h0a, h1a, skip_hps, od, mode)
        if skip_hps:
            return ll
        return ll, jnp.stack((highr, highi), axis=rd)

    def fwd(x):
        return op(x), None

    def bwd(_, cts):
        if skip_hps:
            dl, dhr, dhi = cts, None, None
        else:
            dl, dh = cts
            dhr, dhi = jnp.moveaxis(dh, rd, 0)
        # biort filters are self-time-reversing: inverse with same taps
        dx = inv_j1(dl, dhr, dhi, h0a, h1a, od, hd, wd, mode)
        return (dx,)

    op.defvjp(fwd, bwd)
    return op


def fwd_j1_op(x, h0, h1, skip_hps, o_dim, ri_dim, mode):
    op = _make_fwd_j1_op(tuple(h0), tuple(h1), bool(skip_hps), o_dim,
                         ri_dim, mode)
    if skip_hps:
        return op(x), None
    return op(x)


@lru_cache(maxsize=None)
def _make_fwd_j2plus_op(h0a, h1a, h0b, h1b, skip_hps, o_dim, ri_dim, mode):
    H0a, H1a = _np_taps(h0a), _np_taps(h1a)
    H0b, H1b = _np_taps(h0b), _np_taps(h1b)
    dims = get_dimensions5(o_dim, ri_dim)
    od, rd, hd, wd = dims
    mode = "symmetric"  # reference forces symmetric for J>=2 (:381)

    @jax.custom_vjp
    def op(x):
        ll, highr, highi = fwd_j2plus(x, H0a, H1a, H0b, H1b, skip_hps, od,
                                      mode)
        if skip_hps:
            return ll
        return ll, jnp.stack((highr, highi), axis=rd)

    def fwd(x):
        return op(x), None

    def bwd(_, cts):
        if skip_hps:
            dl, dhr, dhi = cts, None, None
        else:
            dl, dh = cts
            dhr, dhi = jnp.moveaxis(dh, rd, 0)
        # time reverse of q-shift filters == swap the a/b trees (:398-401)
        dx = inv_j2plus(dl, dhr, dhi, H0b, H1b, H0a, H1a, od, hd, wd, mode)
        return (dx,)

    op.defvjp(fwd, bwd)
    return op


def fwd_j2plus_op(x, h0a, h1a, h0b, h1b, skip_hps, o_dim, ri_dim, mode):
    op = _make_fwd_j2plus_op(tuple(h0a), tuple(h1a), tuple(h0b), tuple(h1b),
                             bool(skip_hps), o_dim, ri_dim, mode)
    if skip_hps:
        return op(x), None
    return op(x)


@lru_cache(maxsize=None)
def _make_fwd_j1_rot_op(h0, h1, h2, skip_hps, o_dim, ri_dim, mode):
    H0, H1, H2 = _np_taps(h0), _np_taps(h1), _np_taps(h2)
    od, rd, hd, wd = get_dimensions5(o_dim, ri_dim)

    @jax.custom_vjp
    def op(x):
        ll, highr, highi = fwd_j1_rot(x, H0, H1, H2, skip_hps, od, mode)
        if skip_hps:
            return ll
        return ll, jnp.stack((highr, highi), axis=rd)

    def fwd(x):
        return op(x), None

    def bwd(_, cts):
        if skip_hps:
            dl, dhr, dhi = cts, None, None
        else:
            dl, dh = cts
            dhr, dhi = jnp.moveaxis(dh, rd, 0)
        dx = inv_j1_rot(dl, dhr, dhi, H0, H1, H2, od, hd, wd, mode)
        return (dx,)

    op.defvjp(fwd, bwd)
    return op


def fwd_j1_rot_op(x, h0, h1, h2, skip_hps, o_dim, ri_dim, mode):
    op = _make_fwd_j1_rot_op(tuple(h0), tuple(h1), tuple(h2), bool(skip_hps),
                             o_dim, ri_dim, mode)
    if skip_hps:
        return op(x), None
    return op(x)


@lru_cache(maxsize=None)
def _make_fwd_j2plus_rot_op(h0a, h1a, h0b, h1b, h2a, h2b, skip_hps, o_dim,
                            ri_dim, mode):
    H0a, H1a = _np_taps(h0a), _np_taps(h1a)
    H0b, H1b = _np_taps(h0b), _np_taps(h1b)
    H2a, H2b = _np_taps(h2a), _np_taps(h2b)
    od, rd, hd, wd = get_dimensions5(o_dim, ri_dim)
    mode = "symmetric"

    @jax.custom_vjp
    def op(x):
        ll, highr, highi = fwd_j2plus_rot(x, H0a, H1a, H0b, H1b, H2a, H2b,
                                          skip_hps, od, mode)
        if skip_hps:
            return ll
        return ll, jnp.stack((highr, highi), axis=rd)

    def fwd(x):
        return op(x), None

    def bwd(_, cts):
        if skip_hps:
            dl, dhr, dhi = cts, None, None
        else:
            dl, dh = cts
            dhr, dhi = jnp.moveaxis(dh, rd, 0)
        dx = inv_j2plus_rot(dl, dhr, dhi, H0b, H1b, H0a, H1a, H2b, H2a,
                            od, hd, wd, mode)
        return (dx,)

    op.defvjp(fwd, bwd)
    return op


def fwd_j2plus_rot_op(x, h0a, h1a, h0b, h1b, h2a, h2b, skip_hps, o_dim,
                      ri_dim, mode):
    op = _make_fwd_j2plus_rot_op(
        tuple(h0a), tuple(h1a), tuple(h0b), tuple(h1b), tuple(h2a),
        tuple(h2b), bool(skip_hps), o_dim, ri_dim, mode)
    if skip_hps:
        return op(x), None
    return op(x)


@lru_cache(maxsize=None)
def _make_inv_j1_op(g0, g1, has_lows, has_highs, o_dim, ri_dim, mode):
    G0, G1 = _np_taps(g0), _np_taps(g1)
    od, rd, hd, wd = get_dimensions5(o_dim, ri_dim)

    @jax.custom_vjp
    def op(lows, highs):
        hr = hi = None
        if has_highs:
            hr, hi = jnp.moveaxis(highs, rd, 0)
        return inv_j1(lows if has_lows else None, hr, hi, G0, G1, od, hd, wd,
                      mode)

    def fwd(lows, highs):
        # no residuals: callers pass None exactly when has_* is False, so
        # the cotangent for an absent input is None — saving the inputs
        # would pin every level's coefficients through the backward pass
        return op(lows, highs), None

    def bwd(res, dy):
        dl, dhr, dhi = fwd_j1(dy, G0, G1, not has_highs, od, mode)
        dh = jnp.stack((dhr, dhi), axis=rd) if has_highs else None
        dlow = dl if has_lows else None
        return dlow, dh

    op.defvjp(fwd, bwd)
    return op


def inv_j1_op(lows, highs, g0, g1, o_dim, ri_dim, mode):
    op = _make_inv_j1_op(tuple(g0), tuple(g1), lows is not None,
                         highs is not None, o_dim, ri_dim, mode)
    return op(lows, highs)


@lru_cache(maxsize=None)
def _make_inv_j2plus_op(g0a, g1a, g0b, g1b, has_lows, has_highs, o_dim,
                        ri_dim, mode):
    G0a, G1a = _np_taps(g0a), _np_taps(g1a)
    G0b, G1b = _np_taps(g0b), _np_taps(g1b)
    od, rd, hd, wd = get_dimensions5(o_dim, ri_dim)
    mode = "symmetric"  # reference forces symmetric (:456)

    @jax.custom_vjp
    def op(lows, highs):
        hr = hi = None
        if has_highs:
            hr, hi = jnp.moveaxis(highs, rd, 0)
        return inv_j2plus(lows if has_lows else None, hr, hi, G0a, G1a, G0b,
                          G1b, od, hd, wd, mode)

    def fwd(lows, highs):
        return op(lows, highs), None

    def bwd(res, dy):
        dl, dhr, dhi = fwd_j2plus(dy, G0b, G1b, G0a, G1a, not has_highs, od,
                                  mode)
        dh = jnp.stack((dhr, dhi), axis=rd) if has_highs else None
        dlow = dl if has_lows else None
        return dlow, dh

    op.defvjp(fwd, bwd)
    return op


def inv_j2plus_op(lows, highs, g0a, g1a, g0b, g1b, o_dim, ri_dim, mode):
    op = _make_inv_j2plus_op(tuple(g0a), tuple(g1a), tuple(g0b), tuple(g1b),
                             lows is not None, highs is not None, o_dim,
                             ri_dim, mode)
    return op(lows, highs)


# --------------------------------------------------------------------------
# Whole-transform composed planners (cross-level operator composition)
#
# Every level is linear, so level-j operators compose through the lowpass
# chain at trace time: the inter-level %4 replicate pads and the inverse's
# [1:-1] crops are selection matrices and fold in exactly.  The composed
# forward computes every output directly from x (no inter-level lowpass
# intermediates); the composed inverse scatters every level straight to x
# resolution through one global stage-2 contraction.  These paths are pure
# einsums/slices/concats, so plain autodiff yields machine-exact adjoints
# (the reference's "inverse with reversed filters" backward IS the adjoint).
# --------------------------------------------------------------------------

def _plan_bytes(plan):
    """Total numpy bytes held by a (nested) plan structure."""
    total = 0
    stack = [plan]
    while stack:
        p = stack.pop()
        if isinstance(p, np.ndarray):
            total += p.nbytes
        elif isinstance(p, dict):
            stack.extend(p.values())
        elif isinstance(p, (list, tuple)):
            stack.extend(p)
    return total


_PLAN_CACHE_BUDGET = 4 << 30   # bytes of composed operator matrices kept


def _budgeted_plan_cache(fn):
    """LRU cache bounded by total held bytes, not entry count: composed
    plans near MAX_MATMUL_N hold hundreds of MB of operator matrices each,
    so a count-bounded cache could pin tens of GB of host RAM."""
    from collections import OrderedDict
    cache: "OrderedDict" = OrderedDict()
    sizes: dict = {}

    def wrapper(*args):
        if args in cache:
            cache.move_to_end(args)
            return cache[args]
        out = fn(*args)
        cache[args] = out
        sizes[args] = _plan_bytes(out) + 1
        while sum(sizes.values()) > _PLAN_CACHE_BUDGET and len(cache) > 1:
            old, _ = cache.popitem(last=False)
            del sizes[old]
        return out

    wrapper.cache_clear = lambda: (cache.clear(), sizes.clear())
    wrapper.__wrapped__ = fn
    return wrapper


def _pad4_matrix(n):
    """Replicate-pad-to-%4 selection matrix (reference
    dtcwt/transform2d.py:131-135), or None when no pad is needed."""
    if n % 4 == 0:
        return None
    P = np.zeros((n + 2, n), dtype=np.float32)
    P[0, 0] = 1.0
    P[np.arange(1, n + 1), np.arange(n)] = 1.0
    P[-1, -1] = 1.0
    return P


def _compose(A, chain):
    from pytorch_wavelets_tpu.ops import banded
    return A if chain is None else np.ascontiguousarray(
        banded.compose(A, chain))


@_budgeted_plan_cache   # entries hold O(n^2) composed operator matrices
def _fwd_pyramid_plan(h0o, h1o, h0a, h1a, h0b, h1b, J, skips, incs, mode,
                      H, W):
    """Composed forward plan: per-level specs for analysis_pyramid, all
    operators acting directly on the (even-padded) input.  None when the
    filter/size combination doesn't admit the parity-folded form."""
    kl = ((h0b, h0a), False)
    kh = ((h1b, h1a), True)
    chain_h, chain_w = None, None          # None == identity
    levels = []
    for j in range(J):
        nh = H if chain_h is None else chain_h.shape[0]
        nw = W if chain_w is None else chain_w.shape[0]
        if j == 0:
            Cl, Ch = (_filter_matrix(h0o, mode, nh),
                      _filter_matrix(h1o, mode, nh))
            Rl, Rh = (_filter_matrix(h0o, mode, nw),
                      _filter_matrix(h1o, mode, nw))
            if any(m.shape[0] % 2 for m in (Cl, Ch, Rl, Rh)):
                return None
        else:
            Ph, Pw = _pad4_matrix(nh), _pad4_matrix(nw)
            if Ph is not None:
                chain_h = _compose(Ph, chain_h)
                nh += 2
            if Pw is not None:
                chain_w = _compose(Pw, chain_w)
                nw += 2
            Cl, Ch = (_dfilt_matrix(*kl[0], kl[1], nh),
                      _dfilt_matrix(*kh[0], kh[1], nh))
            Rl, Rh = (_dfilt_matrix(*kl[0], kl[1], nw),
                      _dfilt_matrix(*kh[0], kh[1], nw))
            if Cl.shape[0] % 2 or Rl.shape[0] % 2:
                return None
        Rl_c, Rh_c = _compose(Rl, chain_w), _compose(Rh, chain_w)
        Cl_c, Ch_c = _compose(Cl, chain_h), _compose(Ch, chain_h)
        lev = {"bands": None, "ll": None}
        if not skips[j]:
            lev["bands"] = [("lh", (Rl_c, Ch_c)), ("hl", (Rh_c, Cl_c)),
                            ("hh", (Rh_c, Ch_c))]
        chain_h, chain_w = Cl_c, Rl_c
        if incs[j] or j == J - 1:
            lev["ll"] = (chain_w, chain_h)
        levels.append(lev)
    return tuple(levels)


def dtcwt2d_pyramid(x, filters, J, skip_hps, include_scale, o_dim, ri_dim,
                    mode):
    """Composed whole-transform forward.  Returns None to signal fallback
    to the per-level path.  ``x`` must already be even-padded."""
    from pytorch_wavelets_tpu.ops import banded, fused_dtcwt
    H, W = x.shape[2], x.shape[3]
    if not (banded.matmul_enabled(H) and banded.matmul_enabled(W)):
        return None
    plan = _fwd_pyramid_plan(
        filters["h0o"], filters["h1o"], filters["h0a"], filters["h1a"],
        filters["h0b"], filters["h1b"], J, tuple(skip_hps),
        tuple(include_scale), mode, H, W)
    if plan is None:
        return None
    od, rd, hd, wd = get_dimensions5(o_dim, ri_dim)
    lls, highs = fused_dtcwt.analysis_pyramid(x, plan, od)
    yh = [jnp.stack(h, axis=rd) if h is not None else None for h in highs]
    if True in include_scale:
        return [lls[j] if include_scale[j] else None for j in range(J)], yh
    return lls[-1], yh


@_budgeted_plan_cache   # entries hold O(n^2) composed operator matrices
def _inv_pyramid_plan(g0o, g1o, g0a, g1a, g0b, g1b, mode, yl_hw, highs_hw):
    """Composed inverse plan from coefficient shapes.

    yl_hw: (H, W) of the lowpass or None; highs_hw: fine-first tuple of
    (h, w) band-corner sizes or None per level.  Returns (levels, ll_spec,
    out_hw) or None for fallback."""
    J = len(highs_hw)
    kl = ((g0b, g0a), False)
    kh = ((g1b, g1a), True)

    def walk(axis):
        """Per-axis size walk coarse->fine: (n_j list, K_j crops, out_1)."""
        cur = yl_hw[axis] if yl_hw is not None else None
        ns, Ks = [None] * J, [None] * J
        for j in range(J - 1, -1, -1):
            hw = highs_hw[j]
            if hw is not None:
                n = 2 * hw[axis]
                if cur is not None and cur != n:
                    if cur != n + 2:
                        return None
                    K = np.zeros((n, cur), dtype=np.float32)
                    K[np.arange(n), np.arange(1, n + 1)] = 1.0
                else:
                    K = None
            else:
                if cur is None:
                    return None
                n, K = cur, None
            ns[j], Ks[j] = n, K
            if j > 0:
                cur = 2 * n                       # colifilt upsamples x2
            else:
                cur = _filter_matrix(g0o, mode, n).shape[0]
        return ns, Ks, cur

    wh = walk(0)
    ww = walk(1)
    if wh is None or ww is None:
        return None
    ns_h, Ks_h, out_h = wh
    ns_w, Ks_w, out_w = ww

    levels = []
    pre_h, pre_w = None, None        # prefix operator (x-res, level input)
    for j in range(J):
        nh, nw = ns_h[j], ns_w[j]
        if j == 0:
            # reference inv_j1 uses the caller mode when bandpasses exist
            # but colfilter's default (symmetric) in the lowpass-only
            # branch (reference transform_funcs.py:159 vs :166-177)
            m1 = mode if highs_hw[0] is not None else "symmetric"
            C0 = _filter_matrix(g0o, m1, nh)
            C1 = _filter_matrix(g1o, m1, nh)
            R0 = _filter_matrix(g0o, m1, nw)
            R1 = _filter_matrix(g1o, m1, nw)
        else:
            if nh % 2 or nw % 2:
                return None
            C0 = _ifilt_matrix(*kl[0], kl[1], nh)
            C1 = _ifilt_matrix(*kh[0], kh[1], nh)
            R0 = _ifilt_matrix(*kl[0], kl[1], nw)
            R1 = _ifilt_matrix(*kh[0], kh[1], nw)
        R0_c, R1_c = _compose(R0.T, None if pre_w is None else pre_w.T).T, \
            _compose(R1.T, None if pre_w is None else pre_w.T).T
        from pytorch_wavelets_tpu.ops import banded as _bd
        C0_c = _bd.compose(pre_h, C0) if pre_h is not None else C0
        C1_c = _bd.compose(pre_h, C1) if pre_h is not None else C1
        lev = None
        if highs_hw[j] is not None:
            lev = {"bands": [("lh", (R0_c, C1_c)), ("hl", (R1_c, C0_c)),
                             ("hh", (R1_c, C1_c))]}
        levels.append(lev)
        # extend prefix through this level's lowpass branch + next crop
        step_h = C0_c if Ks_h[j] is None else _bd.compose(C0_c, Ks_h[j])
        step_w = R0_c if Ks_w[j] is None else _bd.compose(R0_c, Ks_w[j])
        pre_h, pre_w = step_h, step_w
    ll_spec = (pre_w, pre_h) if yl_hw is not None else None
    return tuple(levels), ll_spec, (out_h, out_w)
