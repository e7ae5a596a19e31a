"""1-D DWT parity vs the reference (reference tests/test_dwt1d.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_wavelets_tpu as tw
from tests.reference_oracle import load_reference

ATOL = 1e-5


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


@pytest.mark.parametrize("wave", ["db1", "db3", "db6", "bior2.4"])
@pytest.mark.parametrize("mode", ["zero", "symmetric", "reflect",
                                  "periodization", "periodic"])
@pytest.mark.parametrize("L", [100, 101, 128])
def test_1d_matches_reference(ref, wave, mode, L):
    torch, pw = ref
    x = _rand((3, 5, L))
    x0_t, hs_t = pw.DWT1DForward(J=3, wave=wave, mode=mode)(
        torch.from_numpy(x))
    fwd = tw.DWT1DForward(J=3, wave=wave, mode=mode)
    x0, hs = fwd(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(x0), x0_t.numpy(), atol=ATOL)
    for a, b in zip(hs, hs_t):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=ATOL)
    rec_t = pw.DWT1DInverse(wave=wave, mode=mode)((x0_t, hs_t))
    rec = tw.DWT1DInverse(wave=wave, mode=mode)((x0, hs))
    np.testing.assert_allclose(np.asarray(rec), rec_t.numpy(), atol=ATOL)


def test_1d_gradients(ref):
    torch, pw = ref
    x = _rand((2, 3, 64), seed=4)
    xt = torch.from_numpy(x).requires_grad_(True)
    x0_t, hs_t = pw.DWT1DForward(J=2, wave="db4", mode="symmetric")(xt)
    g0 = _rand(tuple(x0_t.shape), seed=5)
    gh = [_rand(tuple(h.shape), seed=6 + i) for i, h in enumerate(hs_t)]
    torch.autograd.backward(
        [x0_t] + list(hs_t),
        [torch.from_numpy(g0)] + [torch.from_numpy(g) for g in gh])
    fwd = tw.DWT1DForward(J=2, wave="db4", mode="symmetric")
    _, vjp = jax.vjp(fwd, jnp.asarray(x))
    dx, = vjp((jnp.asarray(g0), [jnp.asarray(g) for g in gh]))
    np.testing.assert_allclose(np.asarray(dx), xt.grad.numpy(), atol=ATOL)


def test_1d_requires_3d():
    fwd = tw.DWT1DForward(J=1)
    with pytest.raises(ValueError):
        fwd(jnp.zeros((4, 8)))
