"""pytorch_wavelets_tpu — a TPU-native wavelet engine in JAX.

Provides the full capability set of fbcotter/pytorch_wavelets (2-D/1-D DWT,
SWT, DTCWT, and DTCWT scattering layers) rebuilt TPU-first on
JAX/XLA/Pallas, plus the multi-device sharding layer the reference lacks.
Public surface mirrors reference pytorch_wavelets/__init__.py:1-36.
"""
import os as _os

# XLA's SpaceToBatchConverter pass hits a compiler CHECK-failure (SIGABRT)
# on the strided separable filterbank convs for some odd/small spatial
# shapes (observed on TPU v5e, jellyfish compiler).  The pass is a
# small-batch optimisation we don't benefit from; disable it defensively.
# The flag is proto-forwarded per-compile, so setting it here works even
# behind remote-compile tunnels.
_flags = _os.environ.get("XLA_FLAGS", "")
if "space-to-batch-converter" not in _flags:
    # merge with (not clobber) any user-provided pass-disable list —
    # XLA keeps only the last occurrence of a repeated flag
    _prefix = "--xla_disable_hlo_passes="
    _parts = _flags.split()
    _hits = [_i for _i, _p in enumerate(_parts) if _p.startswith(_prefix)]
    if _hits:
        # XLA keeps only the LAST occurrence of a repeated flag
        _parts[_hits[-1]] += ",space-to-batch-converter"
    else:
        _parts.append(_prefix + "space-to-batch-converter")
    _os.environ["XLA_FLAGS"] = " ".join(_parts)

from pytorch_wavelets_tpu._version import __version__  # noqa: F401
from pytorch_wavelets_tpu.ops.precision import (  # noqa: F401
    set_matmul_precision, get_matmul_precision, matmul_precision,
)
from pytorch_wavelets_tpu.models import (  # noqa: F401
    DWTForward, DWTInverse, DWT1DForward, DWT1DInverse,
    SWTForward, SWTInverse, DTCWTForward, DTCWTInverse,
    ScatLayer, ScatLayerj2,
)
from pytorch_wavelets_tpu.models._base import batch_chunked  # noqa: F401

# Aliases matching the reference (reference __init__.py:27-36)
DWT = DWTForward
IDWT = DWTInverse
DWT2D = DWT
IDWT2D = IDWT
DWT1D = DWT1DForward
IDWT1D = DWT1DInverse
DTCWT = DTCWTForward
IDTCWT = DTCWTInverse

__all__ = [
    "DWTForward", "DWTInverse", "DWT1DForward", "DWT1DInverse",
    "SWTForward", "SWTInverse", "DTCWTForward", "DTCWTInverse",
    "ScatLayer", "ScatLayerj2",
    "DWT", "IDWT", "DWT2D", "IDWT2D", "DWT1D", "IDWT1D",
    "DTCWT", "IDTCWT",
    "set_matmul_precision", "get_matmul_precision", "matmul_precision",
    "batch_chunked",
    "__version__",
]
