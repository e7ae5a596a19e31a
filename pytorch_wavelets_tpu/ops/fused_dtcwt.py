"""Fully-fused DTCWT level transforms: separable filtering, decimation,
q-shift phase logic AND the quad->complex corner sampling all folded into
a handful of large MXU matmuls per level.

Two structural tricks (both trace-time, both exact):

1. *Corner-parity folding* — q2c/c2q are stride-2 corner gathers on the
   lane axis, which are slow vector shuffles on TPU.  The corner parity of
   an output equals the parity of the corresponding operator-matrix row,
   so slicing the *matrices* at trace time removes every strided memory
   access from the compiled program:  a = lh[::2, ::2] = (Pe C) x (Pe R).

2. *Shared-stage planning* — all subbands of a level read the same input,
   so the level is emitted as ONE stage-1 dot with every row operator
   stacked on the output axis (Z = R_all @ x on the W axis), then one
   stage-2 dot per column-operator group over its slice of Z.  This
   replaces 5 two-dot "sandwiches" (10 dots, 5 reads of x, 5 HBM
   intermediates) with 3 dots, 1 read of x and 1 shared intermediate.
   Synthesis mirrors it: one stage-1 dot per subband group applying the
   row operators, one stage-2 dot applying every column operator at once
   via a single contraction over the concatenated intermediates.

Semantics are pinned to the unfused ops (reference:
dtcwt/lowlevel.py:70-295, transform_funcs.py:61-95) by
tests/test_fused_dtcwt.py.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from jax import lax

from pytorch_wavelets_tpu.ops.precision import get_matmul_precision

__all__ = ["analysis_level", "synthesis_level", "analysis_pyramid",
           "synthesis_pyramid"]

_SQRT2 = math.sqrt(2.0)


def _cat(*mats):
    return np.ascontiguousarray(np.concatenate(mats, axis=0))


def _row_stage(x, R_all):
    """Z[..., h, k] = sum_w R_all[k, w] x[..., h, w] — one MXU dot
    (block-banded on large axes via ops.banded)."""
    from pytorch_wavelets_tpu.ops.banded import apply_row
    return apply_row(x, R_all)


def _col_stage(z, C):
    """Y[..., m, k] = sum_h C[m, h] z[..., h, k] — one MXU dot
    (block-banded on large axes via ops.banded)."""
    from pytorch_wavelets_tpu.ops.banded import apply_col
    return apply_col(z, C)


def _sum_col_apply(c_blocks, t_blocks):
    """x_hat = sum_i C_i @ T_i as summed dots — avoids materialising the
    concatenated (c, m)-stacked intermediate (a full extra HBM pass);
    block-banded on large axes via ops.banded."""
    from pytorch_wavelets_tpu.ops.banded import apply_col
    y = None
    for C, t in zip(c_blocks, t_blocks):
        contrib = apply_col(t, C)
        y = contrib if y is None else y + contrib
    return y


def analysis_level(x, ll_spec, lh_spec, hl_spec, hh_spec, o_dim,
                   skip_hps=False):
    """One DTCWT analysis level as shared-stage parity-folded matmuls.

    Each spec is (R, C): the row (W' x W) and column (H' x H) operator
    matrices (numpy, trace-time constants) of that subband's separable
    filtering.  H'/W' must be even for the bandpass specs.

    Returns (ll, highr, highi) with the 6 orientations
    (15, 45, 75, 105, 135, 165 degrees) stacked on ``o_dim``.
    A single level is a 1-entry pyramid (see :func:`analysis_pyramid`).
    """
    if skip_hps:
        R_ll, C_ll = ll_spec
        return _col_stage(_row_stage(x, R_ll), C_ll), None, None
    lev = {"bands": [("lh", lh_spec), ("hl", hl_spec), ("hh", hh_spec)],
           "ll": ll_spec}
    lls, highs = analysis_pyramid(x, (lev,), o_dim)
    highr, highi = highs[0]
    return lls[0], highr, highi


# orientation index pairs per subband (reference transform_funcs.py:75-95)
_SB_ORIENTS = {"lh": (0, 5), "hl": (2, 3), "hh": (1, 4)}


def synthesis_level(ll, highr, highi, ll_spec, lh_spec, hl_spec, hh_spec,
                    o_dim):
    """One DTCWT synthesis level as shared-stage parity-folded matmuls.

    Specs are (R, C) *synthesis* operator matrices: C (H_out x H_band_full)
    and R (W_out x W_band_full) of the unfused colfilter/colifilt +
    rowfilter/rowifilt on the full (interleaved) subband.  c2q's corner
    scatter becomes input-side parity slices of C and R.  ``ll`` may be
    None.  A single level is a 1-entry pyramid (see
    :func:`synthesis_pyramid`).
    """
    lev = {"bands": [("lh", lh_spec), ("hl", hl_spec), ("hh", hh_spec)]}
    return synthesis_pyramid((ll, ll_spec), [(highr, highi)], (lev,), o_dim)


# --------------------------------------------------------------------------
# Whole-transform (cross-level composed) planners
#
# Every DTCWT level is linear, so level-j operators compose through the
# lowpass chain at trace time: band_j = (C_j·P·C_ll,j-1···C_ll,1) x
# (R_j·P·R_ll,j-1···R_ll,1)^T — the inter-level %4 pads P and inverse-side
# crops are selection matrices and fold in exactly.  The J-level forward
# then needs NO inter-level lowpass intermediates: one global stage-1 dot
# feeds per-level stage-2 dots; the J-level inverse runs per-level stage-1
# dots into ONE global stage-2 contraction.
# --------------------------------------------------------------------------

def _q2c_epilogue(quads, o_dim):
    def pair(name):
        a, b, c, d = quads[name]     # operators carry the 1/sqrt2
        return ((a - d), (b + c)), ((a + d), (b - c))

    (d15r, d15i), (d165r, d165i) = pair("lh")
    (d45r, d45i), (d135r, d135i) = pair("hh")
    (d75r, d75i), (d105r, d105i) = pair("hl")
    highr = jnp.stack([d15r, d45r, d75r, d105r, d135r, d165r], axis=o_dim)
    highi = jnp.stack([d15i, d45i, d75i, d105i, d135i, d165i], axis=o_dim)
    return highr, highi


def _pyramid_layout(levels):
    """Stage-1 row-operator blocks + per-level stage-2 plan (pure python,
    shared by the forward and the hand-written VJP)."""
    blocks = []
    ofs = 0
    plan = []
    for lev in levels:
        entry = {"groups": [], "ll": None}
        if lev.get("bands"):
            groups: dict = {}
            for name, (R, C) in lev["bands"]:
                groups.setdefault(id(R), (R, []))[1].append((name, C))
            for R, members in groups.values():
                k = R[0::2].shape[0]
                blocks += [R[0::2], R[1::2]]
                entry["groups"].append((members, ofs, 2 * k))
                ofs += 2 * k
        if lev.get("ll") is not None:
            R, C = lev["ll"]
            blocks.append(R)
            entry["ll"] = (C, ofs, R.shape[0])
            ofs += R.shape[0]
        plan.append(entry)
    return blocks, plan


def _cstack(members):
    return _cat(*[C[p::2] for _, C in members
                  for p in (0, 1)]) * (1.0 / _SQRT2)


def _analysis_pyramid_impl(x, levels, o_dim):
    # the spatially-sharded twin of this function is
    # parallel/sharded.py:_sharded_pyramid (same layout, offsets divided
    # by the shard counts, strategies instead of direct stages)
    blocks, plan = _pyramid_layout(levels)
    z = _row_stage(x, _cat(*blocks))

    lls, highs = [], []
    for entry in plan:
        quads = {}
        for members, go, gn in entry["groups"]:
            k = gn // 2
            y = _col_stage(z[..., go:go + gn], _cstack(members))
            mofs = 0
            for name, C in members:
                m = C[0::2].shape[0]
                quads[name] = (y[:, :, mofs:mofs + m, :k],
                               y[:, :, mofs:mofs + m, k:],
                               y[:, :, mofs + m:mofs + 2 * m, :k],
                               y[:, :, mofs + m:mofs + 2 * m, k:])
                mofs += 2 * m
        highs.append(_q2c_epilogue(quads, o_dim) if quads else None)
        if entry["ll"] is not None:
            C, go, gn = entry["ll"]
            lls.append(_col_stage(z[..., go:go + gn], C))
        else:
            lls.append(None)
    return lls, highs


def analysis_pyramid(x, levels, o_dim):
    """Multi-level composed analysis.

    ``levels``: per level a dict with
      'bands': [('lh', (R, C)), ('hl', ...), ('hh', ...)] or None (skipped),
      'll':    (R, C) or None — only set when this level's lowpass is an
               output (final level / include_scale).
    All operators are composed to act directly on x.  Returns
    (lls, highs): lists with lls[j] the lowpass output or None and
    highs[j] = (highr, highi) or None.

    Registered via ``jax.custom_derivatives.linear_call`` (the transform
    is linear): forward-mode AD reapplies the forward, while the
    hand-written transpose assembles the stage-1 cotangent by
    CONCATENATING the disjoint per-consumer blocks — plain reverse-mode
    autodiff would pad each slice-consumer's cotangent to full size and
    sum them, a large extra HBM cost in training steps.
    """
    B, Cc, H, _ = x.shape
    dtype = x.dtype

    def fwd_fn(_, xv):
        return _analysis_pyramid_impl(xv, levels, o_dim)

    def transpose_fn(_, cts):
        lls_ct, highs_ct = cts
        blocks, plan = _pyramid_layout(levels)
        dz_parts = []
        for j, entry in enumerate(plan):
            hct = highs_ct[j]
            dhr = dhi = None
            if hct is not None and entry["groups"]:
                dhr = jnp.moveaxis(hct[0], o_dim, 0)
                dhi = jnp.moveaxis(hct[1], o_dim, 0)
            for members, go, gn in entry["groups"]:
                if dhr is None:
                    dz_parts.append(jnp.zeros((B, Cc, H, gn), dtype))
                    continue
                dys = []
                for name, C in members:
                    o1, o2 = _SB_ORIENTS[name]
                    # adjoint of the (orthogonal) q2c butterfly == the c2q
                    # corner combine (operators carry the 1/sqrt2)
                    da = dhr[o1] + dhr[o2]
                    db = dhi[o1] + dhi[o2]
                    dc = dhi[o1] - dhi[o2]
                    dd = dhr[o2] - dhr[o1]
                    top = jnp.concatenate([da, db], axis=-1)
                    bot = jnp.concatenate([dc, dd], axis=-1)
                    dys.append(jnp.concatenate([top, bot], axis=-2))
                dy = jnp.concatenate(dys, axis=-2) if len(dys) > 1 else dys[0]
                dz_parts.append(_col_stage(
                    dy, np.ascontiguousarray(_cstack(members).T)))
            if entry["ll"] is not None:
                C, go, gn = entry["ll"]
                lct = lls_ct[j]
                if lct is None:
                    dz_parts.append(jnp.zeros((B, Cc, H, gn), dtype))
                else:
                    dz_parts.append(_col_stage(
                        lct, np.ascontiguousarray(C.T)))
        dz = (jnp.concatenate(dz_parts, axis=-1) if len(dz_parts) > 1
              else dz_parts[0])
        R_all = _cat(*blocks)
        return _row_stage(dz, np.ascontiguousarray(R_all.T))

    try:
        from jax.custom_derivatives import linear_call
    except ImportError:  # pragma: no cover - plain autodiff fallback
        return _analysis_pyramid_impl(x, levels, o_dim)
    return linear_call(fwd_fn, transpose_fn, (), x)


def synthesis_pyramid(ll, highs_ri, levels, o_dim):
    """Multi-level composed synthesis.

    ``levels``: per level (fine->coarse order matching highs_ri) a dict
      'bands': [('lh', (R, C)), ...] with operators composed to map the
               level's interleaved band planes directly to x resolution.
    ``ll``: (array or None, (R, C) composed spec) for the final lowpass.
    ``highs_ri``: list of (highr, highi) or None per level.
    """
    t_blocks, c_blocks = [], []
    for lev, hri in zip(levels, highs_ri):
        if hri is None or not lev.get("bands"):
            continue
        r = jnp.moveaxis(hri[0], o_dim, 0)
        i = jnp.moveaxis(hri[1], o_dim, 0)
        groups: dict = {}
        for name, (R, C) in lev["bands"]:
            groups.setdefault(id(R), (R, []))[1].append((name, C))
        for R, members in groups.values():
            xqs, cms = [], []
            for name, C in members:
                o1, o2 = _SB_ORIENTS[name]
                w1r, w1i, w2r, w2i = r[o1], i[o1], r[o2], i[o2]
                x1 = w1r + w2r
                x2 = w1i + w2i
                x3 = w1i - w2i
                x4 = w2r - w1r
                top = jnp.concatenate([x1, x2], axis=-1)
                bot = jnp.concatenate([x3, x4], axis=-1)
                xqs.append(jnp.concatenate([top, bot], axis=-2))
                cms.append(np.concatenate([C[:, 0::2], C[:, 1::2]], axis=1))
            c_blocks.append(np.ascontiguousarray(
                np.concatenate(cms, axis=1)))
            xq = jnp.concatenate(xqs, axis=-2) if len(xqs) > 1 else xqs[0]
            Rt = np.ascontiguousarray(
                _cat(R[:, 0::2].T, R[:, 1::2].T).T * (1.0 / _SQRT2))
            t_blocks.append(_row_stage(xq, Rt))

    ll_arr, ll_spec = ll
    if ll_arr is not None and ll_spec is not None:
        R, C = ll_spec
        t_blocks.append(_row_stage(ll_arr, R))
        c_blocks.append(C)

    return _sum_col_apply(c_blocks, t_blocks)
