"""Scattering layer parity vs the reference (reference
tests/test_scatnet_fwd.py / test_scatnet_bwd.py analogues)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_wavelets_tpu as tw
from tests.reference_oracle import load_reference

ATOL = 2e-5


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


CONFIGS = [
    dict(),
    dict(biort="near_sym_b"),
    dict(biort="near_sym_b_bp"),
    dict(magbias=1e-1),
    dict(mode="zero"),
    dict(combine_colour=True),
]


@pytest.mark.parametrize("kw", CONFIGS)
def test_scatlayer_fwd(ref, kw):
    torch, pw = ref
    x = _rand((2, 3, 32, 32))
    zt = pw.ScatLayer(**kw)(torch.from_numpy(x))
    zj = tw.ScatLayer(**kw)(jnp.asarray(x))
    assert tuple(zj.shape) == tuple(zt.shape)
    np.testing.assert_allclose(np.asarray(zj), zt.detach().numpy(),
                               atol=ATOL)


J2_CONFIGS = [
    dict(),
    dict(biort="near_sym_b_bp", qshift="qshift_b_bp"),
    dict(combine_colour=True),
    dict(magbias=1e-1),
]


@pytest.mark.parametrize("kw", J2_CONFIGS)
def test_scatlayerj2_fwd(ref, kw):
    torch, pw = ref
    x = _rand((2, 3, 32, 32), seed=1)
    zt = pw.ScatLayerj2(**kw)(torch.from_numpy(x))
    zj = tw.ScatLayerj2(**kw)(jnp.asarray(x))
    assert tuple(zj.shape) == tuple(zt.shape)
    np.testing.assert_allclose(np.asarray(zj), zt.detach().numpy(),
                               atol=ATOL)


def test_odd_input_padding(ref):
    torch, pw = ref
    x = _rand((1, 3, 31, 30), seed=2)
    zt = pw.ScatLayer()(torch.from_numpy(x))
    zj = tw.ScatLayer()(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(zj), zt.detach().numpy(),
                               atol=ATOL)
    zt = pw.ScatLayerj2()(torch.from_numpy(x))
    zj = tw.ScatLayerj2()(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(zj), zt.detach().numpy(),
                               atol=ATOL)


@pytest.mark.parametrize("cls_name,kw", [
    ("ScatLayer", dict()),
    ("ScatLayer", dict(biort="near_sym_b_bp")),
    ("ScatLayer", dict(combine_colour=True)),
    ("ScatLayerj2", dict()),
    ("ScatLayerj2", dict(biort="near_sym_b_bp", qshift="qshift_b_bp")),
    ("ScatLayerj2", dict(combine_colour=True)),
])
def test_gradients_match_reference(ref, cls_name, kw):
    torch, pw = ref
    x = _rand((2, 3, 16, 16), seed=3)
    xt = torch.from_numpy(x).requires_grad_(True)
    zt = getattr(pw, cls_name)(**kw)(xt)
    g = _rand(tuple(zt.shape), seed=4)
    zt.backward(torch.from_numpy(g))
    m = getattr(tw, cls_name)(**kw)
    _, vjp = jax.vjp(m, jnp.asarray(x))
    dx, = vjp(jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(dx), xt.grad.numpy(), atol=1e-4)


def test_bp_requires_matching_qshift():
    with pytest.raises(ValueError):
        tw.ScatLayerj2(biort="near_sym_b_bp", qshift="qshift_a")


def test_combine_colour_needs_3ch():
    m = tw.ScatLayer(combine_colour=True)
    with pytest.raises(ValueError):
        m(jnp.zeros((1, 4, 16, 16)))
