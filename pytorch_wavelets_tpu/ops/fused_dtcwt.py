"""Fully-fused DTCWT level transforms: separable filtering, decimation,
q-shift phase logic AND the quad->complex corner sampling all folded into
MXU matmuls.

Motivation: q2c/c2q are stride-2 corner gathers on the lane axis — slow
vector shuffles on TPU.  But the corner parity of an output equals the
parity of the corresponding operator-matrix row (row parity of the column
matrix, column parity of the row matrix), so slicing the *matrices* at
trace time removes every strided memory access from the compiled program:

    a = lh[::2, ::2] = (Pe C) lo (Pe R)^T  = apply(x, C[0::2], R_lo[0::2])

Analysis level: 12 quarter-resolution matmul outputs -> elementwise
butterflies -> the 6 oriented complex bands.  Synthesis level: the exact
transpose structure, with c2q's interleaving becoming input-side parity
column slices of the synthesis matrices.

Semantics are pinned to the unfused ops (reference:
dtcwt/lowlevel.py:70-295, transform_funcs.py:61-95) — see
tests/test_fused_dtcwt.py for the equality tests.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from pytorch_wavelets_tpu.ops.banded import apply_col, apply_row

__all__ = ["analysis_level", "synthesis_level"]

_SQRT2 = math.sqrt(2.0)


def analysis_level(x, ll_spec, lh_spec, hl_spec, hh_spec, o_dim,
                   skip_hps=False):
    """One DTCWT analysis level as parity-folded matmuls.

    Each spec is (R, C): the row (W' x W) and column (H' x H) operator
    matrices (numpy, trace-time constants) of that subband's separable
    filtering.  H'/W' must be even for the bandpass specs.

    Returns (ll, highr, highi) with the 6 orientations
    (15, 45, 75, 105, 135, 165 degrees) stacked on ``o_dim``.
    """
    R_ll, C_ll = ll_spec
    ll = apply_col(apply_row(x, R_ll), C_ll)
    if skip_hps:
        return ll, None, None

    row_cache: dict = {}

    def row(R, parity):
        key = (id(R), parity)
        if key not in row_cache:
            row_cache[key] = apply_row(x, R[parity::2])
        return row_cache[key]

    def quads(spec):
        """(a, b, c, d) corner subimages of C @ x @ R^T, no gathers."""
        R, C = spec
        Ce, Co = C[0::2], C[1::2]
        xe, xo = row(R, 0), row(R, 1)
        a = apply_col(xe, Ce)
        b = apply_col(xo, Ce)
        c = apply_col(xe, Co)
        d = apply_col(xo, Co)
        return a, b, c, d

    def q2c_pair(spec):
        a, b, c, d = quads(spec)
        s = 1.0 / _SQRT2
        return ((a - d) * s, (b + c) * s), ((a + d) * s, (b - c) * s)

    (d15r, d15i), (d165r, d165i) = q2c_pair(lh_spec)
    (d45r, d45i), (d135r, d135i) = q2c_pair(hh_spec)
    (d75r, d75i), (d105r, d105i) = q2c_pair(hl_spec)

    highr = jnp.stack([d15r, d45r, d75r, d105r, d135r, d165r], axis=o_dim)
    highi = jnp.stack([d15i, d45i, d75i, d105i, d135i, d165i], axis=o_dim)
    return ll, highr, highi


# orientation index pairs per subband (reference transform_funcs.py:75-95)
_SB_ORIENTS = {"lh": (0, 5), "hl": (2, 3), "hh": (1, 4)}


def synthesis_level(ll, highr, highi, ll_spec, lh_spec, hl_spec, hh_spec,
                    o_dim):
    """One DTCWT synthesis level as parity-folded matmuls.

    Specs are (R, C) *synthesis* operator matrices: C (H_out x H_band_full)
    and R (W_out x W_band_full), i.e. the matrices of the unfused
    colfilter/colifilt + rowfilter/rowifilt on the full (interleaved)
    subband.  c2q's corner scatter becomes input-side parity slices of
    C and R.  ``ll`` may be None.
    """
    r = jnp.moveaxis(highr, o_dim, 0)
    i = jnp.moveaxis(highi, o_dim, 0)
    s = 1.0 / _SQRT2

    y = None
    for name, spec in (("lh", lh_spec), ("hl", hl_spec), ("hh", hh_spec)):
        R, C = spec
        o1, o2 = _SB_ORIENTS[name]
        w1r, w1i, w2r, w2i = r[o1], i[o1], r[o2], i[o2]
        # c2q corners (reference dtcwt/lowlevel.py:263-295)
        x1 = (w1r + w2r) * s     # even row, even col
        x2 = (w1i + w2i) * s     # even row, odd col
        x3 = (w1i - w2i) * s     # odd row, even col
        x4 = (w2r - w1r) * s     # odd row, odd col
        Ce, Co = C[:, 0::2], C[:, 1::2]
        Re, Ro = R[:, 0::2], R[:, 1::2]
        contrib = apply_row(apply_col(x1, Ce), Re)
        contrib = contrib + apply_row(apply_col(x2, Ce), Ro)
        contrib = contrib + apply_row(apply_col(x3, Co), Re)
        contrib = contrib + apply_row(apply_col(x4, Co), Ro)
        y = contrib if y is None else y + contrib

    if ll is not None and ll_spec is not None:
        R, C = ll_spec
        y_ll = apply_row(apply_col(ll, C), R)
        y = y_ll if y is None else y + y_ll
    return y
