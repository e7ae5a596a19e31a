"""Fully-fused DTCWT level transforms: separable filtering, decimation,
q-shift phase logic AND the quad->complex corner sampling all folded into
MXU matmuls, executed as VMEM-resident Pallas "sandwich" kernels
(Y = C @ X @ R^T per plane).

Motivation: q2c/c2q are stride-2 corner gathers on the lane axis — slow
vector shuffles on TPU.  The corner parity of an output equals the parity
of the corresponding operator-matrix row, so slicing the *matrices* at
trace time removes every strided memory access from the compiled program:

    a = lh[::2, ::2] = (Pe C) x (Pe R)^T

One analysis level = 5 sandwiches (4 row-parity groups with the column
matrices of both subbands stacked, + the lowpass), each reading x exactly
once.  Semantics are pinned to the unfused ops (reference:
dtcwt/lowlevel.py:70-295, transform_funcs.py:61-95) by
tests/test_fused_dtcwt.py.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from pytorch_wavelets_tpu.ops.pallas_kernels import sandwich

__all__ = ["analysis_level", "synthesis_level"]

_SQRT2 = math.sqrt(2.0)


def _stack(*mats):
    return np.ascontiguousarray(np.concatenate(mats, axis=0))


def analysis_level(x, ll_spec, lh_spec, hl_spec, hh_spec, o_dim,
                   skip_hps=False):
    """One DTCWT analysis level as parity-folded sandwich matmuls.

    Each spec is (R, C): the row (W' x W) and column (H' x H) operator
    matrices (numpy, trace-time constants) of that subband's separable
    filtering.  H'/W' must be even for the bandpass specs.

    Returns (ll, highr, highi) with the 6 orientations
    (15, 45, 75, 105, 135, 165 degrees) stacked on ``o_dim``.
    """
    R_ll, C_ll = ll_spec
    ll = sandwich(x, C_ll, R_ll)
    if skip_hps:
        return ll, None, None

    # group subbands by their row operator so each sandwich reads x once
    groups: dict = {}
    for name, (R, C) in (("lh", lh_spec), ("hl", hl_spec),
                         ("hh", hh_spec)):
        groups.setdefault(id(R), (R, []))[1].append((name, C))

    quads = {}
    for R, members in groups.values():
        Cstack = _stack(*[C[p::2] for _, C in members for p in (0, 1)])
        halves = []
        for col_parity in (0, 1):
            out = sandwich(x, Cstack, np.ascontiguousarray(R[col_parity::2]))
            halves.append(out)
        ofs = 0
        for name, C in members:
            m = C[0::2].shape[0]
            # row-parity blocks: [even(C) rows..., odd(C) rows...]
            a = halves[0][:, :, ofs:ofs + m]
            c = halves[0][:, :, ofs + m:ofs + 2 * m]
            b = halves[1][:, :, ofs:ofs + m]
            d = halves[1][:, :, ofs + m:ofs + 2 * m]
            quads[name] = (a, b, c, d)
            ofs += 2 * m

    def q2c_pair(name):
        a, b, c, d = quads[name]
        s = 1.0 / _SQRT2
        return ((a - d) * s, (b + c) * s), ((a + d) * s, (b - c) * s)

    (d15r, d15i), (d165r, d165i) = q2c_pair("lh")
    (d45r, d45i), (d135r, d135i) = q2c_pair("hh")
    (d75r, d75i), (d105r, d105i) = q2c_pair("hl")

    highr = jnp.stack([d15r, d45r, d75r, d105r, d135r, d165r], axis=o_dim)
    highi = jnp.stack([d15i, d45i, d75i, d105i, d135i, d165i], axis=o_dim)
    return ll, highr, highi


# orientation index pairs per subband (reference transform_funcs.py:75-95)
_SB_ORIENTS = {"lh": (0, 5), "hl": (2, 3), "hh": (1, 4)}


def synthesis_level(ll, highr, highi, ll_spec, lh_spec, hl_spec, hh_spec,
                    o_dim):
    """One DTCWT synthesis level as parity-folded sandwich matmuls.

    Specs are (R, C) *synthesis* operator matrices: C (H_out x H_band_full)
    and R (W_out x W_band_full) of the unfused colfilter/colifilt +
    rowfilter/rowifilt on the full (interleaved) subband.  c2q's corner
    scatter becomes input-side parity slices of C and R.  ``ll`` may be
    None.
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
        Ce = np.ascontiguousarray(C[:, 0::2])
        Co = np.ascontiguousarray(C[:, 1::2])
        Re = np.ascontiguousarray(R[:, 0::2])
        Ro = np.ascontiguousarray(R[:, 1::2])
        contrib = (sandwich(x1, Ce, Re) + sandwich(x2, Ce, Ro) +
                   sandwich(x3, Co, Re) + sandwich(x4, Co, Ro))
        y = contrib if y is None else y + contrib

    if ll is not None and ll_spec is not None:
        R, C = ll_spec
        y_ll = sandwich(ll, C, R)
        y = y_ll if y is None else y + y_ll
    return y
