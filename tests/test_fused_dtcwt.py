"""Parity-folded fused DTCWT levels == unfused conv path, incl. gradients
and the bandpass-diagonal (rot) variants."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_wavelets_tpu as tw
from pytorch_wavelets_tpu.ops import banded


@pytest.fixture
def force_matmul():
    banded.set_operator_matmul(True)
    yield
    banded.set_operator_matmul(None)


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def _collect(x):
    out = []
    for biort, qshift in [("near_sym_a", "qshift_a"),
                          ("near_sym_b", "qshift_b")]:
        f = tw.DTCWTForward(J=3, biort=biort, qshift=qshift)
        i = tw.DTCWTInverse(biort=biort, qshift=qshift)
        yl, yh = f(x)
        out += [yl, *yh, i((yl, yh))]
        out.append(jax.grad(
            lambda z: jnp.sum(f(z)[0]) +
            sum(jnp.sum(h ** 2) for h in f(z)[1]))(x))
    out.append(tw.ScatLayerj2(biort="near_sym_b_bp",
                              qshift="qshift_b_bp")(x))
    out.append(jax.grad(lambda z: jnp.sum(tw.ScatLayerj2(
        biort="near_sym_b_bp", qshift="qshift_b_bp")(z) ** 2))(x))
    # inverses fed Nones
    f = tw.DTCWTForward(J=2)
    yl, yh = f(x)
    i = tw.DTCWTInverse()
    out.append(i((None, yh)))
    out.append(i((yl, [None, yh[1]])))
    # non-default dim layout through the fused path
    f = tw.DTCWTForward(J=2, o_dim=1, ri_dim=3)
    i = tw.DTCWTInverse(o_dim=1, ri_dim=3)
    yl, yh = f(x)
    out += [yl, *yh, i((yl, yh))]
    return out


def test_fused_equals_unfused(force_matmul):
    x = jnp.asarray(_rand((2, 3, 64, 64)))
    fast = _collect(x)
    banded.set_operator_matmul(False)
    slow = _collect(x)
    for k, (a, b) in enumerate(zip(fast, slow)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   err_msg=f"output {k}")


def test_fused_odd_input(force_matmul):
    x = jnp.asarray(_rand((1, 2, 63, 65), seed=2))
    f = tw.DTCWTForward(J=3)
    i = tw.DTCWTInverse()
    fast = i(f(x))
    banded.set_operator_matmul(False)
    slow = i(f(x))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               atol=5e-5)
