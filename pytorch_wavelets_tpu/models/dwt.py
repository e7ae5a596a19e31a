"""DWT / SWT module-style API (reference: dwt/transform2d.py,
dwt/transform1d.py)."""
from __future__ import annotations

from pytorch_wavelets_tpu.models._base import (
    StaticModule, canon_dtype as _canon_dtype, cast_bands, upcast_bands,
)
from pytorch_wavelets_tpu.transforms.dwt import (
    dec_filters, rec_filters, dwt2d, idwt2d, dwt1d, idwt1d, swt2d, iswt2d,
)


class DWTForward(StaticModule):
    """J-level 2-D DWT (reference DWTForward, dwt/transform2d.py:7-74).

    Args:
        J: number of decomposition levels.
        wave: pywt-style name, Wavelet, or (h0, h1) / 4-tuple of arrays.
        mode: 'zero' | 'symmetric' | 'reflect' | 'periodization' |
            'periodic'.
        coeff_dtype: optional storage dtype (e.g. 'bfloat16') for the
            detail bands — yh is 3/4 of the (non-redundant)
            representation's bytes, so narrowing it cuts the dominant
            HBM traffic on byte-bound shapes; :class:`DWTInverse`
            upcasts automatically (lowpass stays at compute dtype).
    Call: x (N, C, H, W) -> (yl, yh) with yh finest-first, each entry
    (N, C, 3, H', W') ordered (LH, HL, HH).
    """
    _fields = ("J", "mode", "_filters", "mesh", "coeff_dtype")

    def __init__(self, J=1, wave="db1", mode="zero", mesh=None,
                 coeff_dtype=None):
        self._set("J", J)
        self._set("mode", mode)
        self._set("_filters", dec_filters(wave))
        self._set("mesh", mesh)
        self._set("coeff_dtype", _canon_dtype(coeff_dtype))

    def __call__(self, x):
        if self.mesh is not None:
            from pytorch_wavelets_tpu.parallel import sharded_dwt2d
            yl, yh = sharded_dwt2d(x, self.mesh, wave=self._filters,
                                   J=self.J, mode=self.mode)
        else:
            yl, yh = dwt2d(x, self._filters, J=self.J, mode=self.mode)
        if self.coeff_dtype is not None:
            yh = cast_bands(yh, self.coeff_dtype)
        return yl, yh


class DWTInverse(StaticModule):
    """2-D inverse DWT (reference DWTInverse, dwt/transform2d.py:77-148).

    Call: (yl, yh) -> x.  Any yh entry may be None (treated as zeros).
    Dial-narrowed detail storage (:class:`DWTForward` ``coeff_dtype``,
    signalled by a wider yl) is upcast automatically; natively-narrow
    pipelines keep their dtype.
    """
    _fields = ("mode", "_filters", "mesh")

    def __init__(self, wave="db1", mode="zero", mesh=None):
        self._set("mode", mode)
        self._set("_filters", rec_filters(wave))
        self._set("mesh", mesh)

    def __call__(self, coeffs):
        yl, yh = coeffs
        if yh is not None:
            coeffs = (yl, upcast_bands(yh, yl))
        if self.mesh is not None:
            from pytorch_wavelets_tpu.parallel import sharded_idwt2d
            return sharded_idwt2d(coeffs, self.mesh, wave=self._filters,
                                  mode=self.mode)
        return idwt2d(coeffs, self._filters, mode=self.mode)


class DWT1DForward(StaticModule):
    """J-level 1-D DWT on (N, C, L) (reference DWT1DForward,
    dwt/transform1d.py:7-59).  ``coeff_dtype`` narrows detail-band
    storage as in :class:`DWTForward`."""
    _fields = ("J", "mode", "_filters", "mesh", "coeff_dtype")

    def __init__(self, J=1, wave="db1", mode="zero", mesh=None,
                 coeff_dtype=None):
        self._set("J", J)
        self._set("mode", mode)
        self._set("_filters", dec_filters(wave)[:2])
        self._set("mesh", mesh)
        self._set("coeff_dtype", _canon_dtype(coeff_dtype))

    def __call__(self, x):
        if self.mesh is not None:
            from pytorch_wavelets_tpu.parallel import sharded_dwt1d
            yl, yh = sharded_dwt1d(x, self.mesh, wave=self._filters,
                                   J=self.J, mode=self.mode)
        else:
            yl, yh = dwt1d(x, self._filters, J=self.J, mode=self.mode)
        if self.coeff_dtype is not None:
            yh = cast_bands(yh, self.coeff_dtype)
        return yl, yh


class DWT1DInverse(StaticModule):
    """1-D inverse DWT (reference DWT1DInverse, dwt/transform1d.py:62-115)."""
    _fields = ("mode", "_filters", "mesh")

    def __init__(self, wave="db1", mode="zero", mesh=None):
        self._set("mode", mode)
        self._set("_filters", rec_filters(wave)[:2])
        self._set("mesh", mesh)

    def __call__(self, coeffs):
        yl, yh = coeffs
        if yh is not None:
            coeffs = (yl, upcast_bands(yh, yl))
        if self.mesh is not None:
            from pytorch_wavelets_tpu.parallel import sharded_idwt1d
            return sharded_idwt1d(coeffs, self.mesh, wave=self._filters,
                                  mode=self.mode)
        return idwt1d(coeffs, self._filters, mode=self.mode)


class SWTForward(StaticModule):
    """J-level stationary (undecimated) 2-D wavelet transform (reference
    SWTForward, dwt/transform2d.py:151-212).

    ``coeff_dtype``: optional storage dtype (e.g. 'bfloat16') for the
    returned coefficient stack — the undecimated representation is
    4J full-resolution bands, so narrowing it halves the dominant HBM
    bytes on TPU; :class:`SWTInverse` upcasts automatically.

    Call: x (N, C, H, W) -> list of J arrays (N, C, 4, H, W) ordered
    (LL, LH, HL, HH)."""
    _fields = ("J", "mode", "_filters", "mesh", "coeff_dtype")

    def __init__(self, J=1, wave="db1", mode="periodization", mesh=None,
                 coeff_dtype=None):
        self._set("J", J)
        self._set("mode", mode)
        self._set("_filters", dec_filters(wave))
        self._set("mesh", mesh)
        self._set("coeff_dtype", _canon_dtype(coeff_dtype))

    def __call__(self, x):
        if self.mesh is not None:
            from pytorch_wavelets_tpu.parallel import sharded_swt2d
            out = sharded_swt2d(x, self.mesh, wave=self._filters,
                                J=self.J, mode=self.mode)
        else:
            out = swt2d(x, self._filters, J=self.J, mode=self.mode)
        if self.coeff_dtype is not None:
            out = cast_bands(out, self.coeff_dtype)
        return out


class SWTInverse(StaticModule):
    """Inverse SWT — exact inverse of :class:`SWTForward` for every
    boundary mode, via trace-time pseudo-inverses of the analysis operator
    matrices.  (The reference ships only dead code for this,
    dwt/swt_inverse.py.)  ``wave`` must name the *analysis* wavelet used by
    SWTForward (tuples are interpreted as dec filters).

    ``upcast`` (default True) upcasts sub-f32 coefficient stacks to f32
    before the merge — the contract of the :class:`SWTForward`
    ``coeff_dtype`` storage dial, which narrows *all* bands, leaving no
    in-band signal to tell dial-narrowed storage from a natively-bf16
    pipeline.  Pipelines that run bf16 end-to-end on purpose should pass
    ``upcast=False`` to keep the inverse in (and returning) the pipeline
    dtype."""
    _fields = ("mode", "_filters", "_wave", "mesh", "upcast")

    def __init__(self, wave="db1", mode="periodization", mesh=None,
                 upcast=True):
        self._set("mode", mode)
        self._set("_filters", dec_filters(wave))
        # keep the name when given one: the sharded circular path needs
        # the true synthesis bank, which only the name (or an
        # orthonormal dec tuple) can recover (parallel/sharded.py
        # _iswt_synth_filters).  Wavelet-like objects (ours or pywt's)
        # carry their name too.
        name = wave if isinstance(wave, str) else getattr(wave, "name", None)
        if name is not None and not isinstance(wave, str):
            # trust a Wavelet object's name only if it resolves in our
            # bank to the same analysis filters (a custom pywt.Wavelet
            # may carry an unknown or repurposed name)
            try:
                from pytorch_wavelets_tpu.filters import wavelet as _wv
                if dec_filters(_wv(name)) != self._filters:
                    name = None
            except ValueError:
                name = None
        self._set("_wave", name if isinstance(name, str) else None)
        self._set("mesh", mesh)
        self._set("upcast", bool(upcast))

    def __call__(self, coeffs):
        import jax.numpy as jnp
        if self.upcast:
            # upcast sub-f32 storage (SWTForward coeff_dtype) — the
            # convert fuses into the first consuming op, keeping reads
            # narrow while the merge operators stay f32-exact
            coeffs = [c.astype(jnp.float32)
                      if jnp.dtype(c.dtype).itemsize < 4 else c
                      for c in coeffs]
        if self.mesh is not None:
            from pytorch_wavelets_tpu.parallel import sharded_iswt2d
            wave = self._wave if self._wave is not None else self._filters
            return sharded_iswt2d(coeffs, self.mesh, wave=wave,
                                  mode=self.mode)
        return iswt2d(coeffs, self._filters, mode=self.mode)
