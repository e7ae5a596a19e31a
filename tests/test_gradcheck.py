"""Numeric-vs-analytic derivative checks (jax.test_util.check_grads).

The reference carries torch.autograd.gradcheck suites but skips them as
too slow (reference tests/test_dwt_grad.py:32-51, test_dtcwt_grad.py:36-74,
test_scatnet_bwd.py:20-83); on tiny shapes with JVP/VJP checks they are
cheap enough to keep always-on.  Runs in float64 on the CPU test backend.
"""
import numpy as np
import pytest

import jax
from jax.test_util import check_grads

import pytorch_wavelets_tpu as tw
from pytorch_wavelets_tpu.transforms.dwt import dwt2d, idwt2d, dwt1d
from pytorch_wavelets_tpu.transforms.scatternet import smooth_mag

@pytest.fixture(autouse=True)
def _x64_mode():
    """Double precision scoped to this module (the reference runs its
    gradchecks in float64 too)."""
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", prev)


def _x64(shape, seed=0):
    return jax.numpy.asarray(
        np.random.RandomState(seed).randn(*shape))


# NOTE: 'symmetric' (and the other reflecting modes) intentionally fail a
# numeric Jacobian check at boundary pixels: the backward is pinned to the
# reference's convention — synthesis with reversed filters (reference
# AFB2D.backward, dwt/lowlevel.py:349-365) — which drops the pad-gather
# fold-back terms.  That convention is asserted by the adjoint-structure
# tests in test_dwt.py; the numeric check below covers the modes where the
# convention IS the exact adjoint.  (This is also why the reference ships
# its own gradcheck suite @skip'ed, reference tests/test_dwt_grad.py:32.)
@pytest.mark.parametrize("mode", ["zero", "periodization"])
def test_dwt2d_grads(mode):
    x = _x64((1, 2, 12, 12))

    def f(z):
        yl, yh = dwt2d(z, "db2", J=2, mode=mode)
        return sum(jax.numpy.sum(v ** 2) for v in [yl, *yh])

    check_grads(f, (x,), order=1, modes=["rev"], atol=1e-6, rtol=1e-6)


def test_idwt2d_grads():
    x = _x64((1, 1, 8, 8))
    yl, yh = dwt2d(x, "db2", J=1, mode="periodization")

    def f(l, h):
        return jax.numpy.sum(
            idwt2d((l, [h]), "db2", mode="periodization") ** 2)

    check_grads(f, (yl, yh[0]), order=1, modes=["rev"], atol=1e-6,
                rtol=1e-6)


def test_dwt1d_grads():
    x = _x64((1, 2, 16))

    def f(z):
        x0, hs = dwt1d(z, "db3", J=2, mode="zero")
        return sum(jax.numpy.sum(v ** 2) for v in [x0, *hs])

    check_grads(f, (x,), order=1, modes=["rev"], atol=1e-6, rtol=1e-6)


def test_dtcwt_grads():
    fwd = tw.DTCWTForward(J=2)
    inv = tw.DTCWTInverse()
    x = _x64((1, 1, 16, 16)).astype(np.float32)

    def f(z):
        yl, yh = fwd(z)
        r = inv((yl, yh))
        return (jax.numpy.sum(r ** 2) + jax.numpy.sum(yl ** 2) +
                sum(jax.numpy.sum(h ** 2) for h in yh))

    check_grads(f, (x,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


@pytest.mark.parametrize("magbias", [1e-1, 1e-2, 1e-3])
def test_smooth_mag_grads(magbias):
    r = _x64((2, 3), seed=1)
    i = _x64((2, 3), seed=2)

    def f(a, b):
        return jax.numpy.sum(smooth_mag(a, b, magbias))

    check_grads(f, (r, i), order=2, atol=1e-6, rtol=1e-6)


def test_scatlayer_grads():
    m = tw.ScatLayer()
    x = _x64((1, 2, 16, 16)).astype(np.float32)

    def f(z):
        return jax.numpy.sum(m(z) ** 2)

    check_grads(f, (x,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)
