"""Filterbank kernels (jax.numpy/lax reference path + Pallas fast path)."""
from pytorch_wavelets_tpu.ops.afb_sfb import (  # noqa: F401
    afb1d, sfb1d, afb1d_atrous, sfb1d_atrous, afb2d, sfb2d,
    afb2d_atrous, sfb2d_atrous, afb2d_nonsep, sfb2d_nonsep,
)
from pytorch_wavelets_tpu.ops.dtcwt_fb import (  # noqa: F401
    colfilter, rowfilter, coldfilt, rowdfilt, colifilt, rowifilt,
    q2c, c2q, prep_taps,
)
