"""User-facing transform classes mirroring the reference module API.

Each class is a lightweight, immutable configuration object; the filters
are trace-time constants, so instances are registered as leaf-free pytrees
(all state in hashable aux data) and can be closed over or passed straight
through ``jax.jit``.
"""
from pytorch_wavelets_tpu.models.dwt import (  # noqa: F401
    DWTForward, DWTInverse, DWT1DForward, DWT1DInverse,
    SWTForward, SWTInverse,
)
from pytorch_wavelets_tpu.models.dtcwt import (  # noqa: F401
    DTCWTForward, DTCWTInverse,
)
from pytorch_wavelets_tpu.models.scatternet import (  # noqa: F401
    ScatLayer, ScatLayerj2,
)

__all__ = [
    "DWTForward", "DWTInverse", "DWT1DForward", "DWT1DInverse",
    "SWTForward", "SWTInverse", "DTCWTForward", "DTCWTInverse",
    "ScatLayer", "ScatLayerj2",
]
