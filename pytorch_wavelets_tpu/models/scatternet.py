"""Scattering layer module API (reference: scatternet/layers.py)."""
from __future__ import annotations

import numpy as np

from pytorch_wavelets_tpu.filters import biort as _biort, qshift as _qshift
from pytorch_wavelets_tpu.models._base import (
    StaticModule, batch_chunked, resolve_scat_chunk, warn_chunk_dropped,
)
from pytorch_wavelets_tpu.ops.dtcwt_fb import prep_taps
from pytorch_wavelets_tpu.transforms.scatternet import (
    scat_layer_j1, scat_layer_j2,
)


def _tup(taps):
    return tuple(float(v) for v in np.asarray(taps).ravel())


class ScatLayer(StaticModule):
    """One order of DTCWT scattering at a single scale (reference ScatLayer,
    scatternet/layers.py:11-79).

    Call: x (N, C, H, W) -> (N, 7C, H/2, W/2) with the first C channels the
    lowpass and the next 6C the oriented magnitudes (or (N, 9, ...) when
    combine_colour).

    ``batch_chunk``: optional chunk size — run the layer as a sequential
    ``lax.map`` over batch chunks inside one program, bounding the live
    working set (models/_base.py batch_chunked; single-device only)."""
    _fields = ("biort", "mode", "magbias", "combine_colour", "_filters",
               "_bandpass_diag", "mesh", "batch_chunk")

    def __init__(self, biort="near_sym_a", mode="symmetric", magbias=1e-2,
                 combine_colour=False, mesh=None, batch_chunk=None):
        self._set("biort", biort)
        self._set("mode", mode)
        self._set("magbias", magbias)
        self._set("combine_colour", combine_colour)
        self._set("mesh", mesh)
        self._set("batch_chunk", batch_chunk)
        if biort == "near_sym_b_bp":
            h0o, _, h1o, _, h2o, _ = _biort(biort)
            filters = (("h0o", _tup(prep_taps(h0o))),
                       ("h1o", _tup(prep_taps(h1o))),
                       ("h2o", _tup(prep_taps(h2o))))
            self._set("_bandpass_diag", True)
        else:
            h0o, _, h1o, _ = _biort(biort)
            filters = (("h0o", _tup(prep_taps(h0o))),
                       ("h1o", _tup(prep_taps(h1o))))
            self._set("_bandpass_diag", False)
        self._set("_filters", filters)

    def __call__(self, x):
        if self.mesh is not None:
            if self.batch_chunk:
                warn_chunk_dropped("ScatLayer",
                                   "mesh= sharded path does not chunk")
            from pytorch_wavelets_tpu.parallel import sharded_scat_j1
            return sharded_scat_j1(x, self.mesh, dict(self._filters),
                                   mode=self.mode, magbias=self.magbias,
                                   combine_colour=self.combine_colour,
                                   bandpass_diag=self._bandpass_diag)
        return batch_chunked(
            lambda z: scat_layer_j1(
                z, dict(self._filters), mode=self.mode,
                magbias=self.magbias,
                combine_colour=self.combine_colour,
                bandpass_diag=self._bandpass_diag),
            x, self.batch_chunk)


class ScatLayerj2(StaticModule):
    """Two-scale second-order DTCWT scattering (reference ScatLayerj2,
    scatternet/layers.py:82-172).

    Call: x (N, C, H, W) -> (N, 49C, H/4, W/4) (or (N, 51, ...) when
    combine_colour).

    ``batch_chunk``: working-set dial — run the net as a sequential
    ``lax.map`` over batch chunks inside one program (models/_base.py
    batch_chunked; single-device only).  The default ``None`` is *auto*:
    chunks of 8 whenever the input sits in the measured large-batch
    droop region (batch >= 32 divisible by 8, total >= 6M elements, and
    a per-chunk working set <= ~4M elements — at the reference's
    deployment shape (128, 3, 256, 256) the measured gain is +55%;
    models/_base.py:resolve_scat_chunk).  ``False``/``0`` disables; an
    int forces a chunk size."""
    _fields = ("biort", "qshift", "mode", "magbias", "combine_colour",
               "_filters", "_bandpass_diag", "mesh", "batch_chunk")

    def __init__(self, biort="near_sym_a", qshift="qshift_a",
                 mode="symmetric", magbias=1e-2, combine_colour=False,
                 mesh=None, batch_chunk=None):
        self._set("biort", biort)
        self._set("qshift", qshift)
        self._set("mode", mode)
        self._set("magbias", magbias)
        self._set("combine_colour", combine_colour)
        if biort == "near_sym_b_bp":
            if qshift != "qshift_b_bp":
                raise ValueError("near_sym_b_bp biort requires "
                                 "qshift_b_bp qshift filters")
            h0o, _, h1o, _, h2o, _ = _biort(biort)
            (h0a, h0b, _, _, h1a, h1b, _, _,
             h2a, h2b, _, _) = _qshift("qshift_b_bp")
            filters = (("h0o", _tup(prep_taps(h0o))),
                       ("h1o", _tup(prep_taps(h1o))),
                       ("h2o", _tup(prep_taps(h2o))),
                       ("h0a", _tup(prep_taps(h0a))),
                       ("h0b", _tup(prep_taps(h0b))),
                       ("h1a", _tup(prep_taps(h1a))),
                       ("h1b", _tup(prep_taps(h1b))),
                       ("h2a", _tup(prep_taps(h2a))),
                       ("h2b", _tup(prep_taps(h2b))))
            self._set("_bandpass_diag", True)
        else:
            h0o, _, h1o, _ = _biort(biort)
            h0a, h0b, _, _, h1a, h1b, _, _ = _qshift(qshift)
            filters = (("h0o", _tup(prep_taps(h0o))),
                       ("h1o", _tup(prep_taps(h1o))),
                       ("h0a", _tup(prep_taps(h0a))),
                       ("h0b", _tup(prep_taps(h0b))),
                       ("h1a", _tup(prep_taps(h1a))),
                       ("h1b", _tup(prep_taps(h1b))))
            self._set("_bandpass_diag", False)
        self._set("_filters", filters)
        self._set("mesh", mesh)
        self._set("batch_chunk", batch_chunk)

    def __call__(self, x):
        if self.mesh is not None:
            if self.batch_chunk:
                warn_chunk_dropped("ScatLayerj2",
                                   "mesh= sharded path does not chunk")
            from pytorch_wavelets_tpu.parallel import sharded_scat_j2
            return sharded_scat_j2(x, self.mesh, dict(self._filters),
                                   mode=self.mode, magbias=self.magbias,
                                   combine_colour=self.combine_colour,
                                   bandpass_diag=self._bandpass_diag)
        chw = 1
        for d in x.shape[1:]:
            chw *= d
        chunk = resolve_scat_chunk(self.batch_chunk, x.shape[0], chw)
        return batch_chunked(
            lambda z: scat_layer_j2(
                z, dict(self._filters), mode=self.mode,
                magbias=self.magbias,
                combine_colour=self.combine_colour,
                bandpass_diag=self._bandpass_diag),
            x, chunk)
