"""DTCWT module-style API (reference: dtcwt/transform2d.py)."""
from __future__ import annotations

from pytorch_wavelets_tpu.models._base import (
    StaticModule, batch_chunked, canon_dtype, cast_bands as _cast_yh,
    resolve_chunk, upcast_bands as _upcast_yh, warn_chunk_dropped,
)
from pytorch_wavelets_tpu.transforms.dtcwt_xfm import (
    dtcwt2d, dtcwt_fwd_filters, dtcwt_inv_filters, idtcwt2d,
)


def _freeze(obj):
    """Make skip_hps/include_scale hashable."""
    if isinstance(obj, (list, tuple)):
        return tuple(bool(v) for v in obj)
    return bool(obj)


def _freeze_filters(d):
    return tuple(sorted(d.items()))


def _thaw_filters(t):
    return dict(t)


class DTCWTForward(StaticModule):
    """2-D dual-tree complex wavelet forward transform (reference
    DTCWTForward, dtcwt/transform2d.py:20-147).

    Args:
        biort: level-1 filter name ('antonini', 'legall', 'near_sym_a',
            'near_sym_b') or a (h0o, h1o) tuple of arrays.
        qshift: level>=2 filter name ('qshift_06', 'qshift_a', 'qshift_b',
            'qshift_c', 'qshift_d') or a (h0a, h0b, h1a, h1b) tuple.
        J: number of levels.
        skip_hps: bool or per-level list — skip bandpass computation.
        include_scale: bool or per-level list — also return lowpasses.
        o_dim / ri_dim: where orientations and real/imag land.
        mode: boundary mode for level 1 ('symmetric' forced at J>=2).
        coeff_dtype: optional storage dtype for the bandpass pyramid
            (e.g. 'bfloat16').  The transform still computes at the
            configured matmul precision (f32-exact by default); only
            the returned yh is narrowed — a TPU HBM-bandwidth dial the
            torch reference has no analogue of.  DTCWTInverse upcasts
            automatically.  Default None (input dtype).
        batch_chunk: chunk size for running the pyramid as a sequential
            ``lax.map`` over batch chunks inside one program, bounding
            the live working set (models/_base.py batch_chunked;
            single-device, batch-leading layouts only).  Default None =
            auto: chunks of 8 inside the measured large-batch droop
            region (batch >= 32 divisible by 8, images <= 512x512 —
            measured +35%/+52% at 256^2 batch 32/64 and +25%/+32% at
            512^2, docs/performance.md); False/0 disables, an int
            forces that chunk.
    Call: x (N, C, H, W) -> (yl, yh); yh[j] has shape
    (N, C, 6, H_j, W_j, 2) for the default dims.  Skipped levels give None.
    """
    _fields = ("biort", "qshift", "J", "skip_hps", "include_scale",
               "o_dim", "ri_dim", "mode", "_filters", "mesh",
               "coeff_dtype", "batch_chunk")

    def __init__(self, biort="near_sym_a", qshift="qshift_a", J=3,
                 skip_hps=False, include_scale=False, o_dim=2, ri_dim=-1,
                 mode="symmetric", mesh=None, coeff_dtype=None,
                 batch_chunk=None):
        if o_dim % 6 == ri_dim % 6:
            raise ValueError("Orientations and real/imaginary parts must be "
                             "in different dimensions.")
        self._set("biort", biort if isinstance(biort, str) else "custom")
        self._set("qshift", qshift if isinstance(qshift, str) else "custom")
        self._set("J", J)
        self._set("skip_hps", _freeze(skip_hps))
        self._set("include_scale", _freeze(include_scale))
        self._set("o_dim", o_dim)
        self._set("ri_dim", ri_dim)
        self._set("mode", mode)
        self._set("_filters",
                  _freeze_filters(dtcwt_fwd_filters(biort, qshift)))
        self._set("mesh", mesh)
        self._set("coeff_dtype", canon_dtype(coeff_dtype))
        self._set("batch_chunk", batch_chunk)

    def _single(self, x):
        skip = self.skip_hps
        inc = self.include_scale
        yl, yh = dtcwt2d(
            x, _thaw_filters(self._filters), J=self.J,
            skip_hps=list(skip) if isinstance(skip, tuple) else skip,
            include_scale=list(inc) if isinstance(inc, tuple) else inc,
            o_dim=self.o_dim, ri_dim=self.ri_dim, mode=self.mode)
        if self.coeff_dtype is not None and yh is not None:  # J=0: yh None
            yh = _cast_yh(yh, self.coeff_dtype)
        return yl, yh

    def _batch_leading(self):
        # chunking assumes every coefficient leaf keeps the batch on
        # axis 0, which o_dim/ri_dim = 0 layouts violate
        return self.o_dim % 6 != 0 and self.ri_dim % 6 != 0

    def __call__(self, x):
        skip = self.skip_hps
        inc = self.include_scale
        if self.mesh is not None:
            if self.batch_chunk:
                warn_chunk_dropped("DTCWTForward",
                                   "mesh= sharded path does not chunk")
            from pytorch_wavelets_tpu.parallel import sharded_dtcwt2d
            yl, yh = sharded_dtcwt2d(
                x, self.mesh, _thaw_filters(self._filters), J=self.J,
                mode=self.mode,
                skip_hps=list(skip) if isinstance(skip, tuple) else skip,
                include_scale=(list(inc) if isinstance(inc, tuple)
                               else inc),
                o_dim=self.o_dim, ri_dim=self.ri_dim)
            if self.coeff_dtype is not None and yh is not None:
                yh = _cast_yh(yh, self.coeff_dtype)
            return yl, yh
        chunk = resolve_chunk(self.batch_chunk, x.shape[0],
                              x.shape[-2] * x.shape[-1], x.size)
        if chunk and self._batch_leading():
            return batch_chunked(self._single, x, chunk)
        if self.batch_chunk and not self._batch_leading():
            # only an EXPLICIT dial warrants the dropped-dial warning;
            # the auto default just declines silently
            warn_chunk_dropped(
                "DTCWTForward",
                "o_dim/ri_dim layout is not batch-leading")
        return self._single(x)


class DTCWTInverse(StaticModule):
    """2-D DTCWT inverse (reference DTCWTInverse,
    dtcwt/transform2d.py:150-254).

    Call: (yl, yh) -> x.  None entries (lowpass or any bandpass) are
    treated as zeros."""
    _fields = ("biort", "qshift", "o_dim", "ri_dim", "mode", "_filters",
               "mesh", "batch_chunk")

    def __init__(self, biort="near_sym_a", qshift="qshift_a", o_dim=2,
                 ri_dim=-1, mode="symmetric", mesh=None, batch_chunk=None):
        self._set("biort", biort if isinstance(biort, str) else "custom")
        self._set("qshift", qshift if isinstance(qshift, str) else "custom")
        self._set("o_dim", o_dim)
        self._set("ri_dim", ri_dim)
        self._set("mode", mode)
        self._set("_filters",
                  _freeze_filters(dtcwt_inv_filters(biort, qshift)))
        self._set("mesh", mesh)
        self._set("batch_chunk", batch_chunk)

    def __call__(self, coeffs):
        def inv(c):
            # upcast inside the chunk body: under batch_chunk the
            # narrow storage must stay narrow as the lax.map carry and
            # widen per chunk, or the full-batch f32 pyramid would be
            # materialized outside the scan — exactly the working set
            # the dial bounds
            cyl, cyh = c
            if cyh is not None:
                c = (cyl, _upcast_yh(cyh, cyl))
            return idtcwt2d(c, _thaw_filters(self._filters),
                            o_dim=self.o_dim, ri_dim=self.ri_dim,
                            mode=self.mode)

        if self.mesh is not None:
            if self.batch_chunk:
                warn_chunk_dropped("DTCWTInverse",
                                   "mesh= sharded path does not chunk")
            yl, yh = coeffs
            if yh is not None:
                coeffs = (yl, _upcast_yh(yh, yl))
            from pytorch_wavelets_tpu.parallel import sharded_idtcwt2d
            return sharded_idtcwt2d(
                coeffs, self.mesh, _thaw_filters(self._filters),
                mode=self.mode, o_dim=self.o_dim, ri_dim=self.ri_dim)
        chunk = self.batch_chunk
        if chunk is None:
            # auto default: size the droop test off the finest concrete
            # bandpass (its spatial dims are half the image's); only the
            # default (..., 6, H, W, 2) layout is auto-sized — other
            # o_dim/ri_dim layouts move the spatial axes, so there the
            # dial stays explicit-only
            import jax
            yl, yh = coeffs
            finest = next((h for h in (yh or [])
                           if h is not None and h.size), None)
            if finest is None or (self.o_dim % 6, self.ri_dim % 6) != (2, 5):
                chunk = 0
            else:
                elems = sum(a.size for a in jax.tree.leaves(coeffs))
                chunk = resolve_chunk(
                    None, finest.shape[0],
                    4 * finest.shape[-3] * finest.shape[-2], elems)
        else:
            chunk = resolve_chunk(chunk, 0, 0, 0)
        batch_leading = self.o_dim % 6 != 0 and self.ri_dim % 6 != 0
        if chunk and batch_leading:
            return batch_chunked(inv, coeffs, chunk)
        if self.batch_chunk and not batch_leading:
            warn_chunk_dropped(
                "DTCWTInverse",
                "o_dim/ri_dim layout is not batch-leading")
        return inv(coeffs)
