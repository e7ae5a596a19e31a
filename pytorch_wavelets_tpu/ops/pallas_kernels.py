"""Pallas TPU kernels.

The workhorse is :func:`sandwich` — Y[b] = C @ X[b] @ R^T per (N*C) plane,
i.e. one whole separable filtering stage (column operator x row operator)
computed inside VMEM.  The two-einsum formulation writes the (C @ X)
intermediate back to HBM; this kernel keeps it on-chip, which matters
because the wavelet stages are bandwidth-bound.

Used with the operator matrices from ops.banded (boundary handling,
decimation and q-shift phasing are inside C and R), so one sandwich call
is a full afb2d level or a DTCWT subband quad.

Grads: the VJP of a sandwich is a sandwich with transposed operators —
registered via jax.custom_vjp so the kernel composes with autodiff.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

__all__ = ["sandwich", "sandwich_enabled"]

# VMEM is ~16 MB/core; x + intermediate + output + operators must fit.
_VMEM_LIMIT_FLOATS = 3 * 1024 * 1024

_FORCE = None


def set_sandwich(enabled):
    global _FORCE
    _FORCE = enabled


def _interpret() -> bool:
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover
        return True


def sandwich_enabled(H, W, M, K) -> bool:
    # Measured on v5e: XLA's batched two-einsum lowering beats this
    # per-plane kernel ~2.4x (it contracts all planes in one big MXU
    # matmul, which outweighs the saved intermediate HBM round-trip), so
    # the kernel is opt-in via set_sandwich(True) until a plane-batched
    # variant lands.  Off-TPU a forced sandwich runs in Pallas interpret
    # mode, which is how the kernel semantics stay under test on CPU.
    if not _HAS_PALLAS or _FORCE is None or not _FORCE:
        return False
    footprint = H * W + M * W + M * K + M * H + K * W
    return footprint <= _VMEM_LIMIT_FLOATS


def _kernel(x_ref, c_ref, r_ref, o_ref):
    t = lax.dot_general(
        c_ref[0], x_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST)
    o_ref[0] = lax.dot_general(
        t, r_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST)


def _sandwich_raw(x4, C, R):
    """x4: (B, H, W); C: (M, H); R: (K, W) -> (B, M, K)."""
    B, H, W = x4.shape
    M = C.shape[0]
    K = R.shape[0]
    return pl.pallas_call(
        _kernel,
        interpret=_interpret(),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, H), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, W), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, M, K), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, K), x4.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (M * H * W + M * W * K),
            bytes_accessed=4 * B * (H * W + M * K),
            transcendentals=0,
        ),
    )(x4, C[None], R[None])


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _sandwich_op(x, C_key, R_key):
    C, R = _mat(C_key), _mat(R_key)
    N, Ch, H, W = x.shape
    y = _sandwich_raw(x.reshape(N * Ch, H, W), jnp.asarray(C, x.dtype),
                      jnp.asarray(R, x.dtype))
    return y.reshape(N, Ch, C.shape[0], R.shape[0])


def _sandwich_fwd(x, C_key, R_key):
    return _sandwich_op(x, C_key, R_key), None


def _sandwich_bwd(C_key, R_key, _, g):
    C, R = _mat(C_key), _mat(R_key)
    N, Ch, M, K = g.shape
    dx = _sandwich_raw(g.reshape(N * Ch, M, K),
                       jnp.asarray(C.T, g.dtype),
                       jnp.asarray(R.T, g.dtype))
    return (dx.reshape(N, Ch, C.shape[1], R.shape[1]),)


_sandwich_op.defvjp(_sandwich_fwd, _sandwich_bwd)

_MATS: dict = {}


def _mat(key) -> np.ndarray:
    return _MATS[key]


def _intern(A: np.ndarray):
    # content-keyed interning so custom_vjp sees a hashable, stable token
    # per distinct operator matrix (slicing upstream creates fresh array
    # objects each trace)
    from pytorch_wavelets_tpu.ops.banded import content_key
    key = content_key(A)
    if key not in _MATS:
        _MATS[key] = A
    return key


def sandwich(x, C, R):
    """Y = C @ X @ R^T over the trailing two dims of NCHW ``x``.

    C: (M, H) numpy operator matrix, R: (K, W).  Returns (N, Ch, M, K).
    Falls back to two XLA einsums when Pallas is unavailable or the
    footprint exceeds VMEM."""
    N, Ch, H, W = x.shape
    M, K = C.shape[0], R.shape[0]
    if sandwich_enabled(H, W, M, K):
        return _sandwich_op(x, _intern(np.ascontiguousarray(C)),
                            _intern(np.ascontiguousarray(R)))
    from pytorch_wavelets_tpu.ops.banded import apply_col, apply_row
    return apply_row(apply_col(x, C), R)
