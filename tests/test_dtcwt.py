"""DTCWT parity vs the reference package (reference tests/test_dtcwt.py)."""
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


def _cmp_pyramid(yl, yh, yl_t, yh_t):
    if yl_t is not None:
        np.testing.assert_allclose(np.asarray(yl), yl_t.numpy(), atol=ATOL)
    for a, b in zip(yh, yh_t):
        if a is None:
            assert b is None or b.shape == () or b.numel() == 1
        else:
            np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=ATOL)


@pytest.mark.parametrize("J", [1, 2, 3, 4])
@pytest.mark.parametrize("biort,qshift", [("near_sym_a", "qshift_a"),
                                          ("near_sym_b", "qshift_b"),
                                          ("antonini", "qshift_06"),
                                          ("legall", "qshift_c")])
def test_fwd_inv_matches_reference(ref, J, biort, qshift):
    torch, pw = ref
    x = _rand((2, 3, 64, 64))
    yl_t, yh_t = pw.DTCWTForward(J=J, biort=biort, qshift=qshift)(
        torch.from_numpy(x))
    fwd = tw.DTCWTForward(J=J, biort=biort, qshift=qshift)
    yl, yh = fwd(jnp.asarray(x))
    _cmp_pyramid(yl, yh, yl_t, yh_t)
    rec_t = pw.DTCWTInverse(biort=biort, qshift=qshift)((yl_t, yh_t))
    rec = tw.DTCWTInverse(biort=biort, qshift=qshift)((yl, yh))
    np.testing.assert_allclose(np.asarray(rec), rec_t.numpy(), atol=ATOL)


@pytest.mark.parametrize("shape", [(64, 65), (65, 64), (63, 63), (100, 98)])
def test_odd_shapes(ref, shape):
    torch, pw = ref
    x = _rand((1, 2) + shape, seed=7)
    yl_t, yh_t = pw.DTCWTForward(J=3)(torch.from_numpy(x))
    yl, yh = tw.DTCWTForward(J=3)(jnp.asarray(x))
    _cmp_pyramid(yl, yh, yl_t, yh_t)
    rec_t = pw.DTCWTInverse()((yl_t, yh_t))
    rec = tw.DTCWTInverse()((yl, yh))
    np.testing.assert_allclose(np.asarray(rec), rec_t.numpy(), atol=ATOL)


def test_skip_hps(ref):
    torch, pw = ref
    x = _rand((2, 2, 64, 64), seed=1)
    skips = [True, False, True]
    yl_t, yh_t = pw.DTCWTForward(J=3, skip_hps=skips)(torch.from_numpy(x))
    yl, yh = tw.DTCWTForward(J=3, skip_hps=skips)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yl), yl_t.numpy(), atol=ATOL)
    assert yh[0] is None and yh[2] is None
    np.testing.assert_allclose(np.asarray(yh[1]), yh_t[1].numpy(), atol=ATOL)
    # inverse with missing scales
    rec_t = pw.DTCWTInverse()((yl_t, yh_t))
    rec = tw.DTCWTInverse()((yl, yh))
    np.testing.assert_allclose(np.asarray(rec), rec_t.numpy(), atol=ATOL)


def test_include_scale(ref):
    torch, pw = ref
    x = _rand((1, 2, 64, 64), seed=2)
    inc = [False, True, True]
    scales_t, yh_t = pw.DTCWTForward(J=3, include_scale=inc)(
        torch.from_numpy(x))
    scales, yh = tw.DTCWTForward(J=3, include_scale=inc)(jnp.asarray(x))
    assert scales[0] is None
    for a, b in zip(scales[1:], scales_t[1:]):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=ATOL)


@pytest.mark.parametrize("o_dim,ri_dim", [(2, -1), (1, -1), (3, 1), (2, 3)])
def test_dim_layouts(ref, o_dim, ri_dim):
    torch, pw = ref
    x = _rand((2, 2, 32, 32), seed=3)
    yl_t, yh_t = pw.DTCWTForward(J=2, o_dim=o_dim, ri_dim=ri_dim)(
        torch.from_numpy(x))
    yl, yh = tw.DTCWTForward(J=2, o_dim=o_dim, ri_dim=ri_dim)(jnp.asarray(x))
    _cmp_pyramid(yl, yh, yl_t, yh_t)
    rec_t = pw.DTCWTInverse(o_dim=o_dim, ri_dim=ri_dim)((yl_t, yh_t))
    rec = tw.DTCWTInverse(o_dim=o_dim, ri_dim=ri_dim)((yl, yh))
    np.testing.assert_allclose(np.asarray(rec), rec_t.numpy(), atol=ATOL)


def test_same_dims_raises():
    with pytest.raises(ValueError):
        tw.DTCWTForward(o_dim=2, ri_dim=2)


def test_fwd_gradients_match_reference(ref):
    torch, pw = ref
    x = _rand((2, 2, 32, 32), seed=4)
    xt = torch.from_numpy(x).requires_grad_(True)
    yl_t, yh_t = pw.DTCWTForward(J=3)(xt)
    gl = _rand(tuple(yl_t.shape), seed=5)
    gh = [_rand(tuple(h.shape), seed=6 + i) for i, h in enumerate(yh_t)]
    torch.autograd.backward(
        [yl_t] + list(yh_t),
        [torch.from_numpy(gl)] + [torch.from_numpy(g) for g in gh])
    fwd = tw.DTCWTForward(J=3)
    _, vjp = jax.vjp(fwd, jnp.asarray(x))
    dx, = vjp((jnp.asarray(gl), [jnp.asarray(g) for g in gh]))
    np.testing.assert_allclose(np.asarray(dx), xt.grad.numpy(), atol=ATOL)


def test_inv_gradients_match_reference(ref):
    torch, pw = ref
    x = _rand((1, 2, 32, 32), seed=8)
    _, pw_ = ref
    yl_t, yh_t = pw.DTCWTForward(J=2)(load_reference()[0].from_numpy(x))
    torch = load_reference()[0]
    yl_t = yl_t.detach().requires_grad_(True)
    yh_t = [h.detach().requires_grad_(True) for h in yh_t]
    rec_t = pw.DTCWTInverse()((yl_t, yh_t))
    g = _rand(tuple(rec_t.shape), seed=9)
    rec_t.backward(torch.from_numpy(g))

    fwd = tw.DTCWTForward(J=2)
    yl, yh = fwd(jnp.asarray(x))
    inv = tw.DTCWTInverse()
    _, vjp = jax.vjp(lambda a, b: inv((a, b)), yl, yh)
    dyl, dyh = vjp(jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(dyl), yl_t.grad.numpy(), atol=ATOL)
    for a, b in zip(dyh, yh_t):
        np.testing.assert_allclose(np.asarray(a), b.grad.numpy(), atol=ATOL)


def test_j0_identity():
    x = jnp.asarray(_rand((1, 1, 16, 16)))
    yl, yh = tw.DTCWTForward(J=0)(x)
    assert yh is None
    np.testing.assert_allclose(np.asarray(yl), np.asarray(x))


def test_end_to_end_jit():
    x = jnp.asarray(_rand((2, 3, 64, 64)))
    fwd = tw.DTCWTForward(J=3)
    inv = tw.DTCWTInverse()

    @jax.jit
    def roundtrip(z):
        return inv(fwd(z))

    np.testing.assert_allclose(np.asarray(roundtrip(x)), np.asarray(x),
                               atol=1e-4)


def test_deep_pyramid_parity():
    """J=4..6 (the reference tests to J=5) end-to-end vs the reference."""
    import numpy as np
    import jax.numpy as jnp
    from tests.reference_oracle import load_reference
    import pytorch_wavelets_tpu as tw

    torch, pw = load_reference()
    x = np.random.RandomState(0).randn(1, 2, 128, 128).astype(np.float32)
    for J in (4, 5, 6):
        fo, fr = tw.DTCWTForward(J=J), pw.DTCWTForward(J=J)
        yl, yh = fo(jnp.asarray(x))
        yl_r, yh_r = fr(torch.from_numpy(x))
        np.testing.assert_allclose(np.asarray(yl), yl_r.detach().numpy(),
                                   atol=2e-4)
        for a, b in zip(yh, yh_r):
            np.testing.assert_allclose(np.asarray(a), b.detach().numpy(),
                                       atol=2e-4)
        rec = tw.DTCWTInverse()((yl, yh))
        rec_r = pw.DTCWTInverse()((yl_r, yh_r))
        np.testing.assert_allclose(np.asarray(rec), rec_r.detach().numpy(),
                                   atol=2e-4)


def test_qshift32_parity():
    """The longest q-shift bank (32 taps) matches the reference e2e."""
    import numpy as np
    import jax.numpy as jnp
    from tests.reference_oracle import load_reference
    import pytorch_wavelets_tpu as tw

    torch, pw = load_reference()
    x = np.random.RandomState(0).randn(1, 2, 64, 64).astype(np.float32)
    fo = tw.DTCWTForward(J=3, qshift="qshift_32")
    fr = pw.DTCWTForward(J=3, qshift="qshift_32")
    yl, yh = fo(jnp.asarray(x))
    yl_r, yh_r = fr(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(yl), yl_r.detach().numpy(),
                               atol=2e-4)
    for a, b in zip(yh, yh_r):
        np.testing.assert_allclose(np.asarray(a), b.detach().numpy(),
                                   atol=2e-4)
    rec = tw.DTCWTInverse(qshift="qshift_32")((yl, yh))
    rec_r = pw.DTCWTInverse(qshift="qshift_32")((yl_r, yh_r))
    np.testing.assert_allclose(np.asarray(rec), rec_r.detach().numpy(),
                               atol=2e-4)
