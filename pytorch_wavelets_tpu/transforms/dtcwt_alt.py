"""Alternative DTCWT formulation as 4 parallel critically-sampled DWTs
(Selesnick's complex dual-tree construction).

Reference semantics: pytorch_wavelets/dtcwt/lowlevel2.py:17-154 (module
formulation) and :444-575 (functional cplxdual2D/icplxdual2D).  Each of the
four (col-tree, row-tree) combinations runs an ordinary separable DWT; the
+/- butterflies of corresponding subbands give the 6 oriented complex
bands.  On TPU each DWT level is already an MXU operator matmul, so the
four trees are four matmul pyramids XLA runs concurrently.
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp

from pytorch_wavelets_tpu.filters import level1 as _level1, qshift as _qshift
from pytorch_wavelets_tpu.models._base import StaticModule
from pytorch_wavelets_tpu.transforms.dwt import (
    dec_filters, rec_filters, dwt2d, idwt2d,
)

__all__ = ["cplxdual2d", "icplxdual2d", "DTCWTForward2",
           "DTCWTInverse2", "quad_afb2d", "quad_afb2d_nonsep",
           "prep_filt_quad_afb2d_nonsep"]

_SQRT2 = math.sqrt(2.0)


def _pm(a, b):
    return (a + b) / _SQRT2, (a - b) / _SQRT2


def _tree_filters_dec(bank):
    """8-tuple (h0a, h0b, g0a, g0b, h1a, h1b, g1a, g1b) -> 2x2 grid of
    4-tuple dec filter specs indexed [col_tree][row_tree]."""
    h0a, h0b, _, _, h1a, h1b, _, _ = bank
    return ((
        (h0a, h1a, h0a, h1a), (h0a, h1a, h0b, h1b)),
        ((h0b, h1b, h0a, h1a), (h0b, h1b, h0b, h1b)))


def _tree_filters_rec(bank):
    _, _, g0a, g0b, _, _, g1a, g1b = bank
    return ((
        (g0a, g1a, g0a, g1a), (g0a, g1a, g0b, g1b)),
        ((g0b, g1b, g0a, g1a), (g0b, g1b, g0b, g1b)))


def _combine_orientations(w, mag=None):
    """w: [2][2] of (N, C, 3, H, W) band stacks ordered (LH, HL, HH).
    Returns the 6-orientation complex stack (N, 6, C, H, W, 2)
    (orientation wiring: reference lowlevel2.py:69-80)."""
    deg75r, deg105i = _pm(w[0][0][:, :, 1], w[1][1][:, :, 1])
    deg105r, deg75i = _pm(w[0][1][:, :, 1], w[1][0][:, :, 1])
    deg15r, deg165i = _pm(w[0][0][:, :, 0], w[1][1][:, :, 0])
    deg165r, deg15i = _pm(w[0][1][:, :, 0], w[1][0][:, :, 0])
    deg135r, deg45i = _pm(w[0][0][:, :, 2], w[1][1][:, :, 2])
    deg45r, deg135i = _pm(w[0][1][:, :, 2], w[1][0][:, :, 2])
    yhr = jnp.stack([deg15r, deg45r, deg75r, deg105r, deg135r, deg165r],
                    axis=1)
    yhi = jnp.stack([deg15i, deg45i, deg75i, deg105i, deg135i, deg165i],
                    axis=1)
    if mag is not None:
        return jnp.sqrt(yhr ** 2 + yhi ** 2 + mag) - math.sqrt(mag)
    return jnp.stack([yhr, yhi], axis=-1)


def _split_orientations(yh):
    """Inverse of :func:`_combine_orientations`: 6-orientation complex stack
    -> [2][2] of (N, C, 3, H, W) band stacks.

    (The reference's counterpart, lowlevel2.py:120-136 / :541-557, crosses
    the 45/135-degree channels relative to its own forward wiring — one of
    the reasons its inverse never reconstructs; fixed here so
    split(combine(w)) == w exactly.)"""
    w = [[[None] * 3 for _ in range(2)] for _ in range(2)]
    w[0][0][1], w[1][1][1] = _pm(yh[:, 2, ..., 0], yh[:, 3, ..., 1])
    w[0][1][1], w[1][0][1] = _pm(yh[:, 3, ..., 0], yh[:, 2, ..., 1])
    w[0][0][0], w[1][1][0] = _pm(yh[:, 0, ..., 0], yh[:, 5, ..., 1])
    w[0][1][0], w[1][0][0] = _pm(yh[:, 5, ..., 0], yh[:, 0, ..., 1])
    w[0][0][2], w[1][1][2] = _pm(yh[:, 4, ..., 0], yh[:, 1, ..., 1])
    w[0][1][2], w[1][0][2] = _pm(yh[:, 1, ..., 0], yh[:, 4, ..., 1])
    return [[jnp.stack(w[m][n], axis=2) for n in range(2)]
            for m in range(2)]


def _cplxdual_fwd(x, J, l1, q, mode, mag, m_is_row_tree):
    """Shared 4-tree analysis.  ``m_is_row_tree`` selects between the two
    (mutually transposed) tree-index conventions the reference uses:
    DTCWTForward2 runs tree m along W (lowlevel2.py:31-34), while
    cplxdual2D runs tree m along H (lowlevel2.py:470-477)."""
    x = x / 2.0
    dec1 = _tree_filters_dec(l1)
    dec2 = _tree_filters_dec(q)

    w = [[[None] * 2 for _ in range(2)] for _ in range(J)]
    lows = [[None] * 2 for _ in range(2)]
    for m in range(2):
        for n in range(2):
            f1 = dec1[m][n] if m_is_row_tree else dec1[n][m]
            f2 = dec2[m][n] if m_is_row_tree else dec2[n][m]
            ll, bands1 = dwt2d(x, f1, J=1, mode=mode)
            w[0][m][n] = bands1[0]
            if J > 1:
                ll, bands = dwt2d(ll, f2, J=J - 1, mode=mode)
                for j in range(1, J):
                    w[j][m][n] = bands[j - 1]
            lows[m][n] = ll
    bias = 0.01 if mag else None
    yh = [_combine_orientations(w[j], mag=bias) for j in range(J)]
    return lows, yh


def cplxdual2d(x, J=3, level1="farras", qshift="qshift_a",
               mode="periodization", mag=False):
    """Complex dual-tree 2-D DTCWT via 4 DWT pyramids.

    Returns (lows, yh): lows is a [2][2] grid of per-tree lowpasses, yh a
    finest-first list of (N, 6, C, H, W, 2) complex bands (or magnitudes
    (N, 6, C, H, W) when ``mag``) — reference lowlevel2.py:444-520.
    """
    l1 = _level1(level1) if isinstance(level1, str) else level1
    q = _qshift(qshift) if isinstance(qshift, str) else qshift
    return _cplxdual_fwd(x, J, l1, q, mode, mag, m_is_row_tree=False)


def _cplxdual_inv(yl, yh, l1, q, mode, m_is_row_tree):
    rec1 = _tree_filters_rec(l1)
    rec2 = _tree_filters_rec(q)
    J = len(yh)
    w = [_split_orientations(yh[j]) for j in range(J)]

    y = None
    for m in range(2):
        for n in range(2):
            f1 = rec1[m][n] if m_is_row_tree else rec1[n][m]
            f2 = rec2[m][n] if m_is_row_tree else rec2[n][m]
            lo = yl[m][n]
            if J > 1:
                lo = idwt2d((lo, [w[j][m][n] for j in range(1, J)]), f2,
                            mode=mode)
            lo = idwt2d((lo, [w[0][m][n]]), f1, mode=mode)
            y = lo if y is None else y + lo
    return y / 2.0


def icplxdual2d(yl, yh, level1="farras", qshift="qshift_a",
                mode="periodization"):
    """Inverse of :func:`cplxdual2d`.

    (The reference's icplxdual2D is dead code — it calls its
    ``sfb2d_nonsep`` import alias with the wrong arity and cannot run,
    lowlevel2.py:564-565 — so this is a working equivalent, validated by
    perfect reconstruction.)"""
    l1 = _level1(level1) if isinstance(level1, str) else level1
    q = _qshift(qshift) if isinstance(qshift, str) else qshift
    return _cplxdual_inv(yl, yh, l1, q, mode, m_is_row_tree=False)


def _gspmd_apply(fn, tree, mesh):
    """Run an already-jitted ``fn`` over ``tree`` under GSPMD on
    ``mesh``: every array leaf is batch-sharded over 'data' (axis 0,
    replicated when not divisible) and XLA partitions the transform.
    The alt-form transforms have no sharded-matmul plan, so mesh= on
    them is batch-DP only.  ``fn`` must be a stable jitted callable
    (see :func:`_jit_cplxdual`) so repeated calls hit the compile
    cache instead of retracing."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    nd = dict(mesh.shape).get("data", 1)

    def put(a):
        if a is None or not hasattr(a, "ndim") or a.ndim == 0:
            return a
        nm = "data" if a.shape[0] % nd == 0 else None
        return jax.device_put(
            a, NamedSharding(mesh, P(nm, *([None] * (a.ndim - 1)))))

    return fn(jax.tree.map(put, tree))


@lru_cache(maxsize=None)
def _jit_cplxdual(J, l1, q, mode, fwd):
    """Jitted forward/inverse cplxdual closure, cached on the static
    filter-tap tuples so every DTCWTForward2/Inverse2 call with the
    same configuration reuses one compiled program (J is ignored for
    the inverse)."""
    import jax
    import numpy as np
    l1a = tuple(np.asarray(f) for f in l1)
    qa = tuple(np.asarray(f) for f in q)
    if fwd:
        return jax.jit(lambda z: _cplxdual_fwd(
            z, J, l1a, qa, mode, mag=False, m_is_row_tree=True))
    return jax.jit(lambda cs: _cplxdual_inv(
        cs[0], cs[1], l1a, qa, mode, m_is_row_tree=True))


class DTCWTForward2(StaticModule):
    """DTCWT as 4 parallel DWTs (reference DTCWTForward2,
    lowlevel2.py:17-82).  Call: x -> (lows [2][2], yh list)."""
    _fields = ("biort", "qshift", "J", "mode", "_l1", "_q", "mesh")

    def __init__(self, biort="farras", qshift="qshift_a", J=3,
                 mode="symmetric", mesh=None):
        self._set("biort", biort if isinstance(biort, str) else "custom")
        self._set("qshift", qshift if isinstance(qshift, str) else "custom")
        self._set("J", J)
        self._set("mode", mode)
        self._set("mesh", mesh)
        l1 = _level1(biort) if isinstance(biort, str) else biort
        q = _qshift(qshift) if isinstance(qshift, str) else qshift
        self._set("_l1", tuple(tuple(map(float, f.ravel())) for f in l1))
        self._set("_q", tuple(tuple(map(float, f.ravel())) for f in q))

    def __call__(self, x):
        run = _jit_cplxdual(self.J, self._l1, self._q, self.mode, True)
        if self.mesh is not None:
            return _gspmd_apply(run, x, self.mesh)
        return run(x)


class DTCWTInverse2(StaticModule):
    """Inverse of :class:`DTCWTForward2` (reference DTCWTInverse2,
    lowlevel2.py:85-154)."""
    _fields = ("biort", "qshift", "mode", "_l1", "_q", "mesh")

    def __init__(self, biort="farras", qshift="qshift_a", mode="symmetric",
                 mesh=None):
        self._set("biort", biort if isinstance(biort, str) else "custom")
        self._set("qshift", qshift if isinstance(qshift, str) else "custom")
        self._set("mode", mode)
        self._set("mesh", mesh)
        l1 = _level1(biort) if isinstance(biort, str) else biort
        q = _qshift(qshift) if isinstance(qshift, str) else qshift
        self._set("_l1", tuple(tuple(map(float, f.ravel())) for f in l1))
        self._set("_q", tuple(tuple(map(float, f.ravel())) for f in q))

    def __call__(self, coeffs):
        yl, yh = coeffs
        run = _jit_cplxdual(0, self._l1, self._q, self.mode, False)
        if self.mesh is not None:
            return _gspmd_apply(run, (yl, yh), self.mesh)
        return run((yl, yh))


def quad_afb2d(x, h0a, h1a, h0b, h1b, mode="zero"):
    """Single-level 4-tree ("quad") analysis (reference experiment:
    dtcwt/lowlevel2.py:259-372, fed by prep_filt_quad_afb2d:208-256).

    Runs the four (col-tree, row-tree) DWT combinations — (a,a), (a,b),
    (b,a), (b,b) — on x/2 and butterflies the bandpasses into 6 oriented
    complex subbands.  Returns (yl, yh):
      yl (N, C, H, W): the four tree lowpasses interleaved back into a
        double-size quad image (reference :364-370),
      yh (N, 6, C, H', W', 2): orientations 15..165 degrees.

    The reference batches the 16 filterings into two grouped convs; here
    each tree level is an MXU operator-matmul pair, which XLA batches.
    """
    import numpy as np
    from pytorch_wavelets_tpu.ops.afb_sfb import as_taps, _afb2d_corr

    x = x / 2
    taps = {"a": (as_taps(h0a)[::-1], as_taps(h1a)[::-1]),
            "b": (as_taps(h0b)[::-1], as_taps(h1b)[::-1])}
    ys = []
    for col_t, row_t in _QUAD_TREES:
        h0c, h1c = taps[col_t]
        h0r, h1r = taps[row_t]
        ys.append(_afb2d_corr(x, h0c, h1c, h0r, h1r, mode))
    return _quad_epilogue(ys)


_QUAD_TREES = [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")]


def _quad_epilogue(ys):
    """Shared tail of the quad analysis: per-tree (N, C, 4, H', W') band
    stacks -> (yl quad-interleaved, yh 6-orientation complex)."""
    # ours band order (LL, LH, HL, HH) with LH = row-lo/col-hi; the
    # reference's quad band order is (ll, col-lo.row-hi, col-hi.row-lo, hh)
    ll = [y[:, :, 0] for y in ys]
    b1 = [y[:, :, 2] for y in ys]     # col-lo, row-hi == ours HL
    b2 = [y[:, :, 1] for y in ys]     # col-hi, row-lo == ours LH
    b3 = [y[:, :, 3] for y in ys]

    # butterfly wiring (reference :354-362)
    deg75r, deg105i = _pm(b1[0], b1[3])
    deg105r, deg75i = _pm(b1[1], b1[2])
    deg15r, deg165i = _pm(b2[0], b2[3])
    deg165r, deg15i = _pm(b2[1], b2[2])
    deg135r, deg45i = _pm(b3[0], b3[3])
    deg45r, deg135i = _pm(b3[1], b3[2])
    yhr = jnp.stack([deg15r, deg45r, deg75r, deg105r, deg135r, deg165r],
                    axis=1)
    yhi = jnp.stack([deg15i, deg45i, deg75i, deg105i, deg135i, deg165i],
                    axis=1)
    yh = jnp.stack([yhr, yhi], axis=-1)

    # interleave the 4 tree lowpasses into a double-size quad image
    # (reference :364-370): even output rows/cols come from tree d/b
    rowa = jnp.stack([ll[1], ll[0]], axis=-1)
    rowb = jnp.stack([ll[3], ll[2]], axis=-1)
    N, C, Hp, Wp = ll[0].shape
    rowa = rowa.reshape(N, C, Hp, Wp * 2)
    rowb = rowb.reshape(N, C, Hp, Wp * 2)
    yl = jnp.stack([rowb, rowa], axis=-2).reshape(N, C, Hp * 2, Wp * 2)
    return yl, yh


def prep_filt_quad_afb2d_nonsep(h0a, h1a, h0b, h1b):
    """(16, Ly, Lx) mirrored outer-product PSF stack for the single-conv
    quad analysis: 4 bands (LL, LH, HL, HH) per tree, trees ordered
    (a,a), (a,b), (b,a), (b,b) — reference: dtcwt/lowlevel2.py:157-206
    (its stack is band-major; ours is tree-major to match the separable
    path's per-tree epilogue)."""
    import numpy as np
    from pytorch_wavelets_tpu.ops.afb_sfb import _outer_filters, as_taps
    # _outer_filters takes pywt-order taps; the [::-1, ::-1] mirror then
    # makes the stack correlation-ready (same convention as afb2d_nonsep)
    taps = {"a": (as_taps(h0a), as_taps(h1a)),
            "b": (as_taps(h0b), as_taps(h1b))}
    stacks = []
    for col_t, row_t in _QUAD_TREES:
        h0c, h1c = taps[col_t]
        h0r, h1r = taps[row_t]
        stacks.append(_outer_filters(h0c, h1c, h0r, h1r)[:, ::-1, ::-1])
    return np.concatenate(stacks, axis=0)


def quad_afb2d_nonsep(x, h0a, h1a, h0b, h1b, mode="zero"):
    """Non-separable single-conv variant of :func:`quad_afb2d` (reference:
    dtcwt/lowlevel2.py:374-441): all 16 tree/band filterings run as ONE
    strided 2-D conv over outer-product PSFs, then the same butterfly +
    quad-interleave epilogue.  Tested equal to the separable
    :func:`quad_afb2d` (tests/test_dtcwt_alt.py)."""
    from pytorch_wavelets_tpu.ops.afb_sfb import _nonsep_conv
    f = prep_filt_quad_afb2d_nonsep(h0a, h1a, h0b, h1b)
    y = _nonsep_conv(x / 2, f, mode)          # (N, C, 16, H', W')
    ys = [y[:, :, 4 * t:4 * (t + 1)] for t in range(4)]
    return _quad_epilogue(ys)
