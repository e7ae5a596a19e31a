"""Real-image fixture parity (barbara / mandrill), matching the reference's
fixture strategy (reference tests/datasets.py)."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

import pytorch_wavelets_tpu as tw
from tests.reference_oracle import load_reference

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture(scope="module")
def barbara():
    d = np.load(os.path.join(FIXDIR, "barbara.npz"))
    # (512, 512, 3) -> (1, 3, 256, 256) crop for speed
    x = d["barbara"].transpose(2, 0, 1)[None, :, :256, :256]
    return np.ascontiguousarray(x, dtype=np.float32)


@pytest.fixture(scope="module")
def mandrill():
    d = np.load(os.path.join(FIXDIR, "mandrill.npz"))
    x = d["mandrill"][None, None, :256, :256]
    return np.ascontiguousarray(x, dtype=np.float32)


def test_dwt_barbara(ref, barbara):
    torch, pw = ref
    yl_t, yh_t = pw.DWTForward(J=3, wave="db4", mode="symmetric")(
        torch.from_numpy(barbara))
    yl, yh = tw.DWTForward(J=3, wave="db4", mode="symmetric")(
        jnp.asarray(barbara))
    np.testing.assert_allclose(np.asarray(yl), yl_t.numpy(), rtol=1e-5, atol=1e-3)
    for a, b in zip(yh, yh_t):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=1e-5, atol=1e-3)
    rec = tw.DWTInverse(wave="db4", mode="symmetric")((yl, yh))
    np.testing.assert_allclose(np.asarray(rec), barbara, rtol=1e-5, atol=1e-3)


def test_dtcwt_mandrill(ref, mandrill):
    torch, pw = ref
    yl_t, yh_t = pw.DTCWTForward(J=3, biort="near_sym_b",
                                 qshift="qshift_b")(
        torch.from_numpy(mandrill))
    yl, yh = tw.DTCWTForward(J=3, biort="near_sym_b", qshift="qshift_b")(
        jnp.asarray(mandrill))
    np.testing.assert_allclose(np.asarray(yl), yl_t.numpy(), rtol=1e-5, atol=1e-3)
    for a, b in zip(yh, yh_t):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=1e-5, atol=1e-3)
    rec = tw.DTCWTInverse(biort="near_sym_b", qshift="qshift_b")((yl, yh))
    np.testing.assert_allclose(np.asarray(rec), mandrill, rtol=1e-5, atol=1e-3)


def test_scatternet_barbara(ref, barbara):
    torch, pw = ref
    x = barbara[:, :, :64, :64]
    zt = pw.ScatLayerj2()(torch.from_numpy(x))
    zj = tw.ScatLayerj2()(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(zj), zt.detach().numpy(),
                               atol=1e-4)
