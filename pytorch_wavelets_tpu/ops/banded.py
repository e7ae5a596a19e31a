"""Operator-matrix (banded matmul) fast path for 1-D filterbank ops.

Why: XLA lowers the depthwise separable-filter convs this library needs to
~2 GB/s effective bandwidth on TPU (measured on v5e) — the conv units want
big channel contractions, not 5..20-tap depthwise stencils.  The TPU-native
formulation is to express each linear 1-D op (analysis split, synthesis
merge, q-shift decimation/interpolation, a trous, non-decimated filter) as
a dense banded operator matrix T and evaluate it as ONE MXU matmul over
the filtered axis:  col op:  y[m, w] = sum_h T[m, h] x[h, w]
                    row op:  y[h, m] = sum_w T[m, w] x[h, w]

T is built at trace time by *probing* the verified conv-path
implementation with an N x N identity image on the host CPU (the ops are
linear, so op(I) IS the operator matrix — boundary modes, strides, phase
splits and interleaves all fold in exactly).  Probes are cached per
(op, taps, mode, N).

The extra multiply-by-zero FLOPs (N/L per output) are free next to the
bandwidth this saves; measured end-to-end DTCWT goes ~40x faster than the
conv path on v5e.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pytorch_wavelets_tpu.ops.precision import get_matmul_precision

__all__ = ["apply_col", "apply_row", "probe_op", "matmul_enabled",
           "matmul_op_enabled", "matmul_requested", "compose",
           "extend_wrap_operator", "extend_operator",
           "synthesized_or_probe",
           "MAX_MATMUL_N", "MAX_OP_MATMUL_N", "DIRECT_PROBE_N"]

# Above this axis length the COMPOSED planners fall back to the
# per-level operator path.  Measured (round 2): raising this to 17000 and
# sparse-composing made 8192-wide DTCWT run the composed pyramid at
# 832 Mpix/s — IDENTICAL to the per-level path (both at the HBM
# roofline), while the composed plan holds multi-GB dense matrices on the
# host.  So the cap stays at the value where composition still wins, and
# giant axes ride the (equally fast there) per-level extension path.
# The cap must comfortably exceed 2x the largest intended composed-image
# axis: the composed INVERSE gate checks matmul_enabled(2*d) per band
# corner size (transforms/dtcwt_xfm.py:_idtcwt2d_pyramid), and
# symmetric-mode level sizes run a few samples over the power of two
# (e.g. 4096 -> lo/hi of 2051 -> merge operator over 4102).  (Per-level
# synthesis merges gate on matmul_op_enabled and do NOT constrain this
# cap.)
MAX_MATMUL_N = 8832


def compose(A, B):
    """Host-side operator composition A @ B, sparse above a size
    threshold: composed filterbank operators are banded, so the dense
    product wastes O(n^3) host FLOPs where the sparse product costs
    O(n * band^2).  Returns a dense ndarray (downstream band planning and
    slicing want dense)."""
    if A.shape[1] >= 2048 or B.shape[1] >= 2048:
        from scipy import sparse
        out = (sparse.csr_matrix(A) @ sparse.csr_matrix(B)).toarray()
        return np.ascontiguousarray(out)
    return A @ B

# PER-LEVEL operators keep the matmul path far beyond that: above
# DIRECT_PROBE_N their matrices are synthesized from a small verified
# probe (extend_operator) instead of an O(n^2) identity probe, so the
# only cost left is the dense host transient while building
# (~(rows x n_big) f32; 32768 keeps it under ~8 GB).  The conv fallback
# is pathological on TPU for small channel counts (XLA pads NCHW convs
# ~128x in layout at these sizes), so extending the matmul envelope is
# the single-chip recipe for gigantic images.
MAX_OP_MATMUL_N = 32768
DIRECT_PROBE_N = 4096


def synthesized_or_probe(direct_fn, n, ns, row_blocks, col_blocks, shift):
    """Matrix for length ``n``: direct probe when small, otherwise
    synthesized from a probe at ``ns`` via :func:`extend_operator`
    (falling back to the direct probe when the structure doesn't admit
    extension, e.g. odd lengths breaking the affine size relation)."""
    if n <= DIRECT_PROBE_N or ns >= n:
        return direct_fn(n)
    try:
        return extend_operator(direct_fn(ns), n, row_blocks, col_blocks,
                               shift)
    except ValueError:
        return direct_fn(n)

_FORCE = None  # None = auto (matmul unless CPU backend); True/False force


def set_operator_matmul(enabled):
    """Force the operator-matmul fast path on/off (None = auto)."""
    global _FORCE
    _FORCE = enabled


def matmul_enabled(n: int) -> bool:
    return matmul_requested() and n <= MAX_MATMUL_N


def matmul_op_enabled(n: int) -> bool:
    """Per-level operator dispatch: matrices synthesize past the probe
    cap, so the matmul envelope extends to MAX_OP_MATMUL_N."""
    return matmul_requested() and n <= MAX_OP_MATMUL_N


def matmul_requested() -> bool:
    """Whether the operator-matmul path is wanted at all (backend/force
    flag), independent of axis size.  The spatially-sharded paths use
    this with :func:`extend_wrap_operator` to go past MAX_MATMUL_N: the
    probe cost that motivates the cap does not apply when big operators
    are synthesized from a small verified probe."""
    if _FORCE is not None:
        return bool(_FORCE)
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return backend != "cpu"


def extend_operator(T_small: np.ndarray, n_big: int, row_blocks: int,
                    col_blocks: int, shift) -> np.ndarray:
    """Synthesize a big filterbank operator from a small probe, any mode.

    All 1-D filterbank operators in this library are translation-invariant
    away from the axis ends: within each (row block, col block) pair, rows
    advance their band by ``a`` columns every ``p`` rows
    (``shift = (p, a)``; analysis (1, 2), non-decimated and a trous
    (1, 1), interpolating/synthesis (2, 1)).  Boundary handling — whether
    reflection folding, zero truncation, or periodization wrap-adds — only
    affects rows whose band reaches an axis end, and depends only on the
    distance to that end.

    Extension rule: rows matching the translation prediction (phase
    patterns read from the probe's middle rows) are re-anchored at
    ``n_big``'s scale; the remaining rows must form a contiguous top
    prefix / bottom suffix and are copied verbatim with each nonzero
    anchored to its nearer axis end (left-half columns keep their index,
    right-half columns shift by the axis growth — this maps periodization
    wrap-adds to the correct far columns too).  Exactness is guaranteed
    by construction because boundary rows see the identical edge
    geometry; validated against direct probes in tests/test_banded.py.

    Raises ValueError when the probe is too small to separate the
    boundary regions or the structure does not match ``shift``.
    """
    M_s, C_s = T_small.shape
    if M_s % row_blocks or C_s % col_blocks:
        raise ValueError("block structure does not divide the probe")
    m_s, c_s = M_s // row_blocks, C_s // col_blocks
    p, a = shift
    if ((n_big - c_s) * p) % a:
        raise ValueError("n_big incompatible with the shift structure")
    grow = ((n_big - c_s) * p) // a
    m_b, c_b = m_s + grow, n_big
    if m_b <= 0:
        raise ValueError("probe larger than target")
    tol = np.abs(T_small).max() * 1e-12
    out = np.zeros((row_blocks * m_b, col_blocks * c_b), T_small.dtype)
    for rb in range(row_blocks):
        for cb in range(col_blocks):
            B = T_small[rb * m_s:(rb + 1) * m_s,
                        cb * c_s:(cb + 1) * c_s]
            # phase patterns from the middle rows
            pats = {}
            for q in range(p):
                r0 = q + p * max(0, ((m_s // 2) - q) // p)
                anchor0 = a * ((r0 - q) // p)
                nz = np.nonzero(np.abs(B[r0]) > tol)[0]
                pats[q] = (nz - anchor0, B[r0][nz], r0)

            def predict(r, c_len):
                q = r % p
                offs, vals, _ = pats[q]
                cols = offs + a * ((r - q) // p)
                ok = (cols >= 0) & (cols < c_len)
                return cols, vals, bool(ok.all())

            interior = np.zeros(m_s, bool)
            for r in range(m_s):
                cols, vals, ok = predict(r, c_s)
                if not ok:
                    continue
                row = np.zeros(c_s, T_small.dtype)
                row[cols] = vals
                interior[r] = np.array_equal(row, B[r])
            if not interior.any():
                raise ValueError("probe too small: no interior rows")
            top = int(np.argmax(interior))              # first interior row
            bot = int(np.argmax(interior[::-1]))        # trailing boundary
            if not interior[top:m_s - bot].all():
                raise ValueError(
                    "boundary rows are not a contiguous prefix/suffix — "
                    "operator does not match the declared shift structure")
            half = c_s // 2
            dc = c_b - c_s

            def anchor_copy(r_src, r_dst):
                nz = np.nonzero(np.abs(B[r_src]) > tol)[0]
                left, right = nz[nz < half], nz[nz >= half]
                if left.size and right.size and \
                        int(right.min()) - int(left.max()) < c_s // 4:
                    raise ValueError(
                        "probe too small: a boundary row's band straddles "
                        "the column midpoint — use a larger small probe")
                cols = np.where(nz < half, nz, nz + dc)
                out[rb * m_b + r_dst, cb * c_b + cols] = B[r_src][nz]

            for r in range(top):                        # top boundary rows
                anchor_copy(r, r)
            for rr in range(bot):                       # bottom boundary
                anchor_copy(m_s - 1 - rr, m_b - 1 - rr)
            for r in range(top, m_b - bot):             # interior rows
                cols, vals, ok = predict(r, c_b)
                if not ok:
                    raise ValueError("probe too small: interior band "
                                     "escapes the axis")
                out[rb * m_b + r, cb * c_b + cols] = vals
    return out


def extend_wrap_operator(T_small: np.ndarray, n_big: int,
                         row_blocks: int, col_blocks: int) -> np.ndarray:
    """Synthesize a big wrap-mode (circulant) operator from a small probe.

    Wrap-mode (periodization / periodic) filterbank operators are
    block-circulant: within each (row block, col block) pair,
    ``T[r] == roll(T[0], a * r)`` with ``a = cols / rows`` of the block
    (2 for a decimating analysis, 1 for a trous, 1/2 per column for a
    synthesis merge).  The band pattern is length <= filter support,
    independent of the axis length — so probing at a small length and
    translating the band to ``n_big`` gives the EXACT big operator at
    O(support) cost instead of an O(n_big^2) identity probe.

    T_small: (row_blocks * m_s, col_blocks * c_s) verified probe.
    Circulant structure is checked exactly on the probe; a non-circulant
    operator raises ValueError.  Returns the
    (row_blocks * m_b, col_blocks * c_b) operator for ``n_big`` where
    m_b / c_b scale with n_big.
    """
    M_s, C_s = T_small.shape
    if M_s % row_blocks or C_s % col_blocks:
        raise ValueError("block structure does not divide the probe")
    m_s, c_s = M_s // row_blocks, C_s // col_blocks
    if c_s == 0 or m_s == 0:
        raise ValueError("empty probe block")
    # shift structure: every `p` rows the band advances `a` columns
    # (analysis: p=1, a=2; a trous: p=1, a=1; synthesis merge: p=2, a=1)
    if c_s % m_s == 0:
        p, a = 1, c_s // m_s
    elif m_s % c_s == 0:
        p, a = m_s // c_s, 1
    else:
        raise ValueError(f"unsupported block aspect {m_s}x{c_s}")
    if (m_s * n_big) % c_s:
        raise ValueError("n_big must scale the probe blocks integrally")
    m_b, c_b = m_s * n_big // c_s, n_big
    tol = np.abs(T_small).max() * 1e-12
    out = np.zeros((row_blocks * m_b, col_blocks * c_b), T_small.dtype)
    for rb in range(row_blocks):
        for cb in range(col_blocks):
            B = T_small[rb * m_s:(rb + 1) * m_s,
                        cb * c_s:(cb + 1) * c_s]
            for q in range(p):                # row-phase patterns
                base = B[q]
                nz = np.nonzero(np.abs(base) > tol)[0]
                if nz.size == 0:
                    continue
                offs = np.where(nz > c_s // 2, nz - c_s, nz)
                if offs.max() - offs.min() >= c_s - 2 * a:
                    raise ValueError(
                        "probe too small: band support wraps ambiguously"
                        " — use a larger small probe")
                # verify the circulant structure exactly on the probe
                for r in range(q, m_s, p):
                    if not np.array_equal(np.roll(base, a * ((r - q)
                                                             // p)), B[r]):
                        raise ValueError(
                            "operator block is not circulant — wrap-mode"
                            " extension only applies to periodic "
                            "operators")
                rows = np.arange(q, m_b, p)
                shifts = a * ((rows - q) // p)
                cols = (offs[None, :] + shifts[:, None]) % c_b
                out[rb * m_b + rows[:, None],
                    cb * c_b + cols] = base[nz][None, :]
    return out


@lru_cache(maxsize=None)
def _cpu_device():
    # local_devices, not devices: under multi-controller JAX the global
    # device list starts with process 0's devices, and probing on a
    # non-addressable device cannot be read back (tests/test_multihost.py)
    return jax.local_devices(backend="cpu")[0]


def probe_op(fn, n: int, dtype=np.float32) -> np.ndarray:
    """Extract the operator matrix of a linear column-op.

    fn maps (1, 1, n, n) -> (1, 1, ..., m, n) acting along axis -2,
    uniformly over the last axis.  Feeding the identity as the image makes
    column j of the output the response to basis vector e_j.  Runs eagerly
    on host CPU even inside a jit trace.  ``dtype=np.float64`` probes in
    double precision (honoured only when jax_enable_x64 is on).
    """
    eye = np.eye(n, dtype=dtype)[None, None]
    with jax.ensure_compile_time_eval():
        with jax.default_device(_cpu_device()):
            out = np.asarray(fn(jnp.asarray(eye)))
    # (1, 1, ..., m, n) -> (prod(band_dims) * m, n)
    return out.reshape(-1, n)


def apply_col(x, T):
    """y[..., m, w] = sum_h T[m, h] * x[..., h, w] as an MXU matmul
    (block-banded for large axes)."""
    y = _apply_banded(x, T, 2)
    if y is not None:
        return y
    Tj = jnp.asarray(T, dtype=x.dtype)
    return jnp.einsum("mh,nchw->ncmw", Tj, x,
                      precision=get_matmul_precision())


def apply_row(x, T):
    """y[..., h, m] = sum_w T[m, w] * x[..., h, w] as an MXU matmul
    (block-banded for large axes)."""
    y = _apply_banded(x, T, 3)
    if y is not None:
        return y
    Tj = jnp.asarray(T, dtype=x.dtype)
    return jnp.einsum("mw,nchw->nchm", Tj, x,
                      precision=get_matmul_precision())


# --------------------------------------------------------------------------
# Block-banded evaluation for large axes
#
# A dense operator matmul costs O(n) FLOPs per output sample; the operators
# are banded (support ~ filter length, growing 2^j for composed levels), so
# past ~512 the MXU spends most of its time multiplying zeros.  The plan
# below chunks output rows into 128-row tiles and contracts each tile only
# against its (128-aligned) column support — contraction sizes quantize to
# 128 on the MXU, so alignment costs nothing.  Periodization rows that wrap
# both ends naturally fall out of the nonzero analysis as full-width tiles.
# --------------------------------------------------------------------------

_BANDED_MIN_N = 512        # below this the dense dot is already optimal
_BANDED_MAX_RATIO = 0.75   # require >=25% FLOP saving to take the path
_BANDED_CHUNK_ROWS = 128   # MXU-native output tile

_PLAN_CACHE: dict = {}


def content_key(A: np.ndarray):
    """Collision-safe content key for caching trace-time operator
    matrices (hash() of bytes can silently collide)."""
    import hashlib
    return (A.shape, A.dtype.str, hashlib.sha1(A.tobytes()).hexdigest())


def _band_plan(T: np.ndarray):
    """[(r0, r1, [(c0, c1), ...])] output-row chunks, each with the
    128-aligned column segments covering its nonzeros (multiple segments
    handle block-concatenated operators like [even | odd] parity stacks),
    or None when chunking saves too little."""
    M, N = T.shape
    if N < _BANDED_MIN_N or M == 0 or T.size == 0:
        return None
    key = content_key(T)
    if key in _PLAN_CACHE:
        return _PLAN_CACHE[key]
    nz = np.abs(T) > (np.abs(T).max() * 1e-12 + 0.0)
    nbins = (N + 127) // 128
    chunks = []
    total = 0
    for r0 in range(0, M, _BANDED_CHUNK_ROWS):
        r1 = min(r0 + _BANDED_CHUNK_ROWS, M)
        cols = nz[r0:r1].any(axis=0)
        binmask = np.zeros(nbins, bool)
        for b in range(nbins):
            binmask[b] = cols[b * 128:(b + 1) * 128].any()
        if not binmask.any():
            binmask[0] = True
        segs = []
        b = 0
        while b < nbins:
            if binmask[b]:
                b2 = b
                while b2 + 1 < nbins and binmask[b2 + 1]:
                    b2 += 1
                segs.append((b * 128, min(N, (b2 + 1) * 128)))
                b = b2 + 1
            else:
                b += 1
        chunks.append((r0, r1, segs))
        total += (r1 - r0) * sum(c1 - c0 for c0, c1 in segs)
    plan = chunks if total <= _BANDED_MAX_RATIO * M * N else None
    _PLAN_CACHE[key] = plan
    return plan


def _apply_banded(x, T, axis):
    plan = _band_plan(T) if isinstance(T, np.ndarray) else None
    if plan is None:
        return None
    outs = []
    for r0, r1, segs in plan:
        acc = None
        for c0, c1 in segs:
            Tb = jnp.asarray(np.ascontiguousarray(T[r0:r1, c0:c1]),
                             x.dtype)
            if axis == 2:
                part = jnp.einsum("mh,nchw->ncmw", Tb, x[:, :, c0:c1, :],
                                  precision=get_matmul_precision())
            else:
                part = jnp.einsum("mw,nchw->nchm", Tb, x[:, :, :, c0:c1],
                                  precision=get_matmul_precision())
            acc = part if acc is None else acc + part
        outs.append(acc)
    return jnp.concatenate(outs, axis=axis) if len(outs) > 1 else outs[0]
