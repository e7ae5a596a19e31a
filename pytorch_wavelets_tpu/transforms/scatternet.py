"""DTCWT-based scattering layers (functional).

Reference semantics: pytorch_wavelets/scatternet/lowlevel.py and layers.py.
The reference hand-writes fused backward passes chaining the smooth
magnitude derivative with the inverse transforms
(scatternet/lowlevel.py:311-398); here the same gradients arise from JAX
autodiff composed over the custom-VJP'd level transforms — the resulting
backward computation is identical (mag ratios, adjoint transforms with
swapped q-shift trees, 1/4-nearest-upsample as the avg-pool adjoint).
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from pytorch_wavelets_tpu.transforms.dtcwt import (
    fwd_j1_op, fwd_j1_rot_op, fwd_j2plus_op, fwd_j2plus_rot_op,
)

__all__ = ["smooth_mag", "avg_pool2", "scat_layer_j1", "scat_layer_j2"]


def smooth_mag(reals, imags, bias):
    """r = sqrt(x^2 + y^2 + b^2) - b (reference SmoothMagFn,
    scatternet/lowlevel.py:49-68).  Autodiff yields dr/dx = x/r_with_bias,
    identical to the reference's saved ratios."""
    return jnp.sqrt(reals * reals + imags * imags + bias * bias) - bias


def _combined_mag(reals, imags, bias):
    """Colour-combined magnitude over the 3-channel dim 2 (reference:
    scatternet/lowlevel.py:89-92)."""
    s = (reals * reals + imags * imags).sum(axis=2, keepdims=True)
    return jnp.sqrt(s + bias * bias) - bias


def _pool_matrix(n):
    P = np.zeros((n // 2, n), dtype=np.float64)
    P[np.arange(n // 2), 2 * np.arange(n // 2)] = 0.5
    P[np.arange(n // 2), 2 * np.arange(n // 2) + 1] = 0.5
    return P


def avg_pool2(x):
    """2x2 average pool on the trailing two dims.

    Off-CPU this runs as two thin operator matmuls (MXU) — the
    reshape+mean lowering pays a strided lane-reduction pass over the
    whole array, which profiles as the single largest HBM consumer in the
    scattering forward."""
    from pytorch_wavelets_tpu.ops import banded
    from pytorch_wavelets_tpu.ops.precision import get_matmul_precision
    *lead, H, W = x.shape
    if H % 2 == 0 and W % 2 == 0 and banded.matmul_op_enabled(max(H, W)):
        Ph = jnp.asarray(_pool_matrix(H), x.dtype)
        Pw = jnp.asarray(_pool_matrix(W), x.dtype)
        y = jnp.einsum("mh,...hw->...mw", Ph, x,
                       precision=get_matmul_precision())
        return jnp.einsum("kw,...mw->...mk", Pw, y,
                          precision=get_matmul_precision())
    xr = x.reshape(*lead, H // 2, 2, W // 2, 2)
    return xr.mean(axis=(-3, -1))


def _pad_even(x):
    if x.shape[2] % 2 != 0:
        x = jnp.concatenate([x, x[:, :, -1:]], axis=2)
    if x.shape[3] % 2 != 0:
        x = jnp.concatenate([x, x[:, :, :, -1:]], axis=3)
    return x


def _pad_mod8(x):
    """Pad H and W up to a multiple of 8 by edge replication, split
    before/after like reference ScatLayerj2 (scatternet/layers.py:137-149)."""
    r, c = x.shape[2:]
    rem = r % 8
    if rem != 0:
        before, after = (8 - rem) // 2, (9 - rem) // 2
        x = jnp.concatenate([x[:, :, :before], x, x[:, :, -after:]], axis=2)
    rem = c % 8
    if rem != 0:
        before, after = (8 - rem) // 2, (9 - rem) // 2
        x = jnp.concatenate([x[:, :, :, :before], x, x[:, :, :, -after:]],
                            axis=3)
    return x


def _unstack_ri(h):
    """(..., 2) bandpass stack -> (reals, imags), inverse of the op's
    ri_dim=-1 stacking."""
    return h[..., 0], h[..., 1]


def scat_layer_j1(x, filters, mode="symmetric", magbias=1e-2,
                  combine_colour=False, bandpass_diag=False):
    """One order of scattering at one scale (reference ScatLayer,
    scatternet/layers.py:11-79 + ScatLayerj1_f/_rot_f).

    filters: dict with correlation-order tap tuples 'h0o', 'h1o' (+ 'h2o'
    when bandpass_diag).  Returns (N, 7C, H/2, W/2), or (N, 9, H/2, W/2)
    when combine_colour.
    """
    x = _pad_even(x)
    if combine_colour and x.shape[1] != 3:
        raise ValueError("combine_colour requires 3 input channels")
    front = None if bandpass_diag else _scat_levels(x, filters, mode, 1)
    if front is not None:
        ll, ((reals, imags),) = front            # ll already pooled
    else:
        if bandpass_diag:
            ll, h = fwd_j1_rot_op(x, filters["h0o"], filters["h1o"],
                                  filters["h2o"], False, 1, -1, mode)
        else:
            ll, h = fwd_j1_op(x, filters["h0o"], filters["h1o"], False, 1,
                              -1, mode)
        reals, imags = _unstack_ri(h)
        ll = avg_pool2(ll)
    if combine_colour:
        r = _combined_mag(reals, imags, magbias)  # (N, 6, 1, H/2, W/2)
        return jnp.concatenate([ll, r[:, :, 0]], axis=1)
    r = smooth_mag(reals, imags, magbias)          # (N, 6, C, H/2, W/2)
    Z = jnp.concatenate([ll[:, None], r], axis=1)  # (N, 7, C, H/2, W/2)
    b, _, c, hh, ww = Z.shape
    return Z.reshape(b, 7 * c, hh, ww)


def scat_layer_j2(x, filters, mode="symmetric", magbias=1e-2,
                  combine_colour=False, bandpass_diag=False):
    """Second-order two-scale scattering (reference ScatLayerj2,
    scatternet/layers.py:82-172 + ScatLayerj2_f/_rot_f).

    filters: dict with tap tuples 'h0o','h1o','h0a','h0b','h1a','h1b'
    (+ 'h2o','h2a','h2b' when bandpass_diag).
    Returns (N, 49C, H/4, W/4) (or (N, 51, H/4, W/4) combined-colour).
    """
    x = _pad_mod8(x)
    if combine_colour and x.shape[1] != 3:
        raise ValueError("combine_colour requires 3 input channels")

    if bandpass_diag:
        def _j1(z):
            return fwd_j1_rot_op(z, filters["h0o"], filters["h1o"],
                                 filters["h2o"], False, 1, -1, mode)

        def _j2(z):
            return fwd_j2plus_rot_op(z, filters["h0a"], filters["h1a"],
                                     filters["h0b"], filters["h1b"],
                                     filters["h2a"], filters["h2b"], False,
                                     1, -1, mode)
    else:
        def _j1(z):
            return fwd_j1_op(z, filters["h0o"], filters["h1o"], False, 1,
                             -1, mode)

        def _j2(z):
            return fwd_j2plus_op(z, filters["h0a"], filters["h1a"],
                                 filters["h0b"], filters["h1b"], False, 1,
                                 -1, mode)

    front = None if bandpass_diag else _scat_levels(x, filters, mode, 2)
    if front is not None:
        return _scat_layer_j2_composed(x, front, filters, mode, magbias,
                                       combine_colour)

    # first order, scale 1
    s0, h = _j1(x)
    reals, imags = _unstack_ri(h)
    if combine_colour:
        s1_j1 = _combined_mag(reals, imags, magbias)      # (N,6,1,H/2,W/2)
        s0, h = _j2(s0)
        reals, imags = _unstack_ri(h)
        s1_j2 = _combined_mag(reals, imags, magbias)      # (N,6,1,H/4,W/4)
        s0 = avg_pool2(s0)                                # (N,3,H/4,W/4)
        u1 = s1_j1[:, :, 0]                               # (N,6,H/2,W/2)
        u1_ll, h = _j1(u1)
        reals, imags = _unstack_ri(h)
        s2_j1 = smooth_mag(reals, imags, magbias)         # (N,6,6,H/4,W/4)
        q = s2_j1.shape
        s2_j1 = s2_j1.reshape(q[0], 36, q[3], q[4])
        s1_j1 = avg_pool2(u1_ll)                          # (N,6,H/4,W/4)
        return jnp.concatenate([s0, s1_j1, s1_j2[:, :, 0], s2_j1], axis=1)

    s1_j1 = smooth_mag(reals, imags, magbias)             # (N,6,C,H/2,W/2)
    s0, h = _j2(s0)
    reals, imags = _unstack_ri(h)
    s1_j2 = smooth_mag(reals, imags, magbias)             # (N,6,C,H/4,W/4)
    s0 = avg_pool2(s0)                                    # (N,C,H/4,W/4)
    p = s1_j1.shape
    u1 = s1_j1.reshape(p[0], 6 * p[2], p[3], p[4])
    u1_ll, h = _j1(u1)
    reals, imags = _unstack_ri(h)
    s2_j1 = smooth_mag(reals, imags, magbias)             # (N,6,6C,H/4,W/4)
    q = s2_j1.shape
    s2_j1 = s2_j1.reshape(q[0], 36, q[2] // 6, q[3], q[4])
    s1_j1 = avg_pool2(u1_ll).reshape(p[0], 6, p[2], p[3] // 2, p[4] // 2)
    Z = jnp.concatenate([s0[:, None], s1_j1, s1_j2, s2_j1], axis=1)
    b, _, c, hh, ww = Z.shape
    return Z.reshape(b, 49 * c, hh, ww)


# --------------------------------------------------------------------------
# Composed scattering front-ends
#
# The linear segments of the scattering chain (DTCWT levels + the average
# pools on their lowpasses) run through the whole-transform pyramid
# planner: the pool is one more operator composed onto the lowpass specs,
# the magnitudes consume (highr, highi) directly (no re/im interleave),
# and autodiff through the einsums gives the exact adjoints.
# --------------------------------------------------------------------------

def _pool_compose(spec):
    from pytorch_wavelets_tpu.ops import banded
    R, C = spec
    if R.shape[0] % 2 or C.shape[0] % 2:
        return None
    Rp = np.ascontiguousarray(banded.compose(_pool_matrix(R.shape[0]), R))
    Cp = np.ascontiguousarray(banded.compose(_pool_matrix(C.shape[0]), C))
    return (Rp, Cp)


@lru_cache(maxsize=64)
def _scat_front_plan(h0o, h1o, h0a, h1a, h0b, h1b, J, mode, H, W):
    """J-level analysis plan with the final lowpass pooled 2x2."""
    from pytorch_wavelets_tpu.transforms.dtcwt import _fwd_pyramid_plan
    skips = (False,) * J
    incs = (False,) * J
    plan = _fwd_pyramid_plan(h0o, h1o, h0a, h1a, h0b, h1b, J, skips, incs,
                             mode, H, W)
    if plan is None:
        return None
    last = dict(plan[-1])
    pooled = _pool_compose(last["ll"])
    if pooled is None:
        return None
    last["ll"] = pooled
    return plan[:-1] + (last,)


def _scat_levels(x, filters, mode, J):
    """Run J DTCWT analysis levels on x via the composed pyramid, with the
    final lowpass average-pooled.  Returns (pooled_ll, [(hr, hi), ...]) or
    None to signal fallback (rot filters, CPU backend, odd operator
    sizes)."""
    from pytorch_wavelets_tpu.ops import banded
    from pytorch_wavelets_tpu.ops.fused_dtcwt import analysis_pyramid
    H, W = x.shape[2], x.shape[3]
    if not (banded.matmul_enabled(H) and banded.matmul_enabled(W)):
        return None
    plan = _scat_front_plan(
        filters["h0o"], filters["h1o"],
        filters.get("h0a", filters["h0o"]),
        filters.get("h1a", filters["h1o"]),
        filters.get("h0b", filters["h0o"]),
        filters.get("h1b", filters["h1o"]), J, mode, H, W)
    if plan is None:
        return None
    lls, highs = analysis_pyramid(x, plan, 1)   # orientations on dim 1
    return lls[-1], highs


def _scat_layer_j2_composed(x, front, filters, mode, magbias,
                            combine_colour):
    """scat_layer_j2 body on the composed pyramid front (see
    :func:`_scat_levels`); the three linear segments are three pyramid
    calls with pooling folded into the lowpass operators."""
    s0, ((r1, i1), (r2, i2)) = front      # s0 = pooled ll2

    if combine_colour:
        s1_j1 = _combined_mag(r1, i1, magbias)            # (N,6,1,H/2,W/2)
        s1_j2 = _combined_mag(r2, i2, magbias)            # (N,6,1,H/4,W/4)
        u1 = s1_j1[:, :, 0]                               # (N,6,H/2,W/2)
        sec = _scat_levels(u1, filters, mode, 1)
        if sec is None:
            raise RuntimeError("composed front available but second-order "
                               "plan failed")             # pragma: no cover
        u1_ll, ((r3, i3),) = sec                          # pooled
        s2_j1 = smooth_mag(r3, i3, magbias)               # (N,6,6,H/4,W/4)
        q = s2_j1.shape
        s2_j1 = s2_j1.reshape(q[0], 36, q[3], q[4])
        return jnp.concatenate([s0, u1_ll, s1_j2[:, :, 0], s2_j1], axis=1)

    s1_j1 = smooth_mag(r1, i1, magbias)                   # (N,6,C,H/2,W/2)
    s1_j2 = smooth_mag(r2, i2, magbias)                   # (N,6,C,H/4,W/4)
    p = s1_j1.shape
    u1 = s1_j1.reshape(p[0], 6 * p[2], p[3], p[4])
    sec = _scat_levels(u1, filters, mode, 1)
    if sec is None:
        raise RuntimeError("composed front available but second-order "
                           "plan failed")                 # pragma: no cover
    u1_ll, ((r3, i3),) = sec                              # pooled
    s2_j1 = smooth_mag(r3, i3, magbias)                   # (N,6,6C,H/4,W/4)
    q = s2_j1.shape
    s2_j1 = s2_j1.reshape(q[0], 36, q[2] // 6, q[3], q[4])
    s1_j1 = u1_ll.reshape(p[0], 6, p[2], p[3] // 2, p[4] // 2)
    Z = jnp.concatenate([s0[:, None], s1_j1, s1_j2, s2_j1], axis=1)
    b, _, c, hh, ww = Z.shape
    return Z.reshape(b, 49 * c, hh, ww)
