"""Operator-matmul fast path == conv path, for every op family."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_wavelets_tpu as tw
from pytorch_wavelets_tpu.ops import banded
from pytorch_wavelets_tpu.transforms.dwt import swt2d, iswt2d


@pytest.fixture
def force_matmul():
    banded.set_operator_matmul(True)
    yield
    banded.set_operator_matmul(None)


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def _run_all(x):
    out = []
    fwd = tw.DWTForward(J=3, wave="db4", mode="symmetric")
    inv = tw.DWTInverse(wave="db4", mode="symmetric")
    yl, yh = fwd(x)
    out += [yl, *yh, inv((yl, yh))]
    fwd = tw.DWTForward(J=2, wave="db2", mode="periodization")
    yl, yh = fwd(x)
    out += [yl, *yh]
    f2 = tw.DTCWTForward(J=3, biort="near_sym_b", qshift="qshift_b")
    i2 = tw.DTCWTInverse(biort="near_sym_b", qshift="qshift_b")
    yl2, yh2 = f2(x)
    out += [yl2, *yh2, i2((yl2, yh2))]
    out.append(tw.ScatLayerj2()(x))
    sw = swt2d(x, "db2", J=2)
    out += [*sw, iswt2d(sw, "db2")]
    d1 = tw.DWT1DForward(J=2, wave="db3", mode="symmetric")
    x0, hs = d1(x[:, :, 0])
    out += [x0, *hs]
    out.append(jax.grad(lambda z: jnp.sum(tw.ScatLayerj2()(z) ** 2))(x))
    out.append(jax.grad(
        lambda z: jnp.sum(tw.DWTForward(J=2, wave="db3")(z)[0]))(x))
    return out


def test_matmul_path_matches_conv_path(force_matmul):
    x = jnp.asarray(_rand((2, 3, 64, 64)))
    fast = _run_all(x)
    banded.set_operator_matmul(False)
    slow = _run_all(x)
    for a, b in zip(fast, slow):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_matmul_path_odd_shapes(force_matmul):
    x = jnp.asarray(_rand((1, 2, 63, 49), seed=1))
    fwd = tw.DWTForward(J=2, wave="db3", mode="symmetric")
    inv = tw.DWTInverse(wave="db3", mode="symmetric")
    yl, yh = fwd(x)
    fast = inv((yl, yh))
    banded.set_operator_matmul(False)
    yl2, yh2 = fwd(x)
    slow = inv((yl2, yh2))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), atol=3e-5)


def test_matmul_disabled_above_cap(force_matmul):
    assert not banded.matmul_enabled(banded.MAX_MATMUL_N + 1)
    assert banded.matmul_enabled(64)
