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


def _perlevel(fn):
    """Run fn with the composed pyramid path disabled (per-level ops)."""
    import pytorch_wavelets_tpu.transforms.dtcwt_xfm as xfm
    orig = (xfm.dtcwt2d_pyramid, xfm._idtcwt2d_pyramid)
    xfm.dtcwt2d_pyramid = lambda *a, **k: None
    xfm._idtcwt2d_pyramid = lambda *a, **k: None
    try:
        return fn()
    finally:
        xfm.dtcwt2d_pyramid, xfm._idtcwt2d_pyramid = orig


# reference-supported layout combos (reference tests/test_dtcwt.py:188-189;
# ri_dim=4+ is outside the reference's get_dimensions6 envelope)
@pytest.mark.parametrize("o_dim,ri_dim", [(2, -1), (1, -1), (1, 2), (2, 3),
                                          (2, 1)])
def test_composed_pyramid_dim_layouts(force_matmul, o_dim, ri_dim):
    x = jnp.asarray(_rand((1, 2, 48, 48), seed=3))
    fwd = tw.DTCWTForward(J=3, o_dim=o_dim, ri_dim=ri_dim)
    inv = tw.DTCWTInverse(o_dim=o_dim, ri_dim=ri_dim)
    yl, yh = fwd(x)
    rec = inv((yl, yh))
    yl2, yh2 = _perlevel(lambda: fwd(x))
    rec2 = _perlevel(lambda: inv((yl2, yh2)))
    np.testing.assert_allclose(np.asarray(yl), np.asarray(yl2), atol=3e-5)
    for a, b in zip(yh, yh2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(rec2), atol=3e-5)


def test_composed_pyramid_skip_and_scales(force_matmul):
    x = jnp.asarray(_rand((1, 2, 48, 48), seed=4))
    fwd = tw.DTCWTForward(J=3, skip_hps=[True, False, False],
                          include_scale=[False, True, True])
    scales, yh = fwd(x)
    scales2, yh2 = _perlevel(lambda: fwd(x))
    assert yh[0] is None and yh2[0] is None
    assert scales[0] is None and scales2[0] is None
    for a, b in list(zip(scales[1:], scales2[1:])) + list(zip(yh[1:],
                                                              yh2[1:])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_composed_pyramid_none_highpass_inverse(force_matmul):
    x = jnp.asarray(_rand((1, 2, 48, 48), seed=5))
    fwd = tw.DTCWTForward(J=3)
    inv = tw.DTCWTInverse()
    yl, yh = fwd(x)
    rec = inv((yl, [None, yh[1], None]))
    rec2 = _perlevel(lambda: inv((yl, [None, yh[1], None])))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(rec2), atol=3e-5)
    rec3 = inv((None, yh))                     # no lowpass
    rec4 = _perlevel(lambda: inv((None, yh)))
    np.testing.assert_allclose(np.asarray(rec3), np.asarray(rec4), atol=3e-5)


def test_composed_pyramid_odd_input(force_matmul):
    x = jnp.asarray(_rand((1, 2, 47, 45), seed=6))
    fwd = tw.DTCWTForward(J=2)
    inv = tw.DTCWTInverse()
    yl, yh = fwd(x)
    rec = inv((yl, yh))
    yl2, yh2 = _perlevel(lambda: fwd(x))
    rec2 = _perlevel(lambda: inv((yl2, yh2)))
    np.testing.assert_allclose(np.asarray(yl), np.asarray(yl2), atol=3e-5)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(rec2), atol=3e-5)


def test_composed_pyramid_gradients(force_matmul):
    x = jnp.asarray(_rand((1, 1, 32, 32), seed=7))
    fwd = tw.DTCWTForward(J=2)
    inv = tw.DTCWTInverse()

    def loss(z):
        yl, yh = fwd(z)
        return (jnp.sum(inv((yl, yh)) ** 2) + jnp.sum(yl ** 2) +
                sum(jnp.sum(h ** 2) for h in yh))

    g = jax.grad(loss)(x)
    g2 = _perlevel(lambda: jax.grad(loss)(x))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2), atol=3e-4)


def test_composed_pyramid_lowpass_only_nonsym_mode(force_matmul):
    """Level-1 lowpass-only inverse uses symmetric boundaries regardless of
    mode (reference inv_j1 calls colfilter with its default there)."""
    x = jnp.asarray(_rand((1, 2, 32, 32), seed=8))
    fwd = tw.DTCWTForward(J=2, mode="zero")
    inv = tw.DTCWTInverse(mode="zero")
    yl, yh = fwd(x)
    rec = inv((yl, [None, yh[1]]))
    rec2 = _perlevel(lambda: inv((yl, [None, yh[1]])))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(rec2), atol=3e-5)


def test_inverse_accepts_empty_bandpass_arrays(force_matmul):
    """Size-0 bandpass entries (the reference's torch.tensor([]) skip
    convention) are treated as absent on both paths."""
    x = jnp.asarray(_rand((1, 2, 32, 32), seed=9))
    fwd = tw.DTCWTForward(J=2)
    inv = tw.DTCWTInverse()
    yl, yh = fwd(x)
    empty = jnp.zeros((0,), jnp.float32)
    rec_a = inv((yl, [empty, yh[1]]))
    rec_b = inv((yl, [None, yh[1]]))
    np.testing.assert_allclose(np.asarray(rec_a), np.asarray(rec_b))
    rec_c = _perlevel(lambda: inv((yl, [empty, yh[1]])))
    np.testing.assert_allclose(np.asarray(rec_a), np.asarray(rec_c),
                               atol=3e-5)


def test_block_banded_plan_matches_dense(force_matmul):
    """The multi-segment block-banded evaluation (engaged for axes >= 512)
    equals the dense operator matmul and the conv path."""
    x = jnp.asarray(_rand((1, 1, 520, 512), seed=10))
    fwd = tw.DWTForward(J=2, wave="db4", mode="symmetric")
    inv = tw.DWTInverse(wave="db4", mode="symmetric")
    yl, yh = fwd(x)
    rec = inv((yl, yh))
    banded.set_operator_matmul(False)
    yl2, yh2 = fwd(x)
    rec2 = inv((yl2, yh2))
    np.testing.assert_allclose(np.asarray(yl), np.asarray(yl2), atol=1e-4)
    for a, b in zip(yh, yh2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(rec2), atol=1e-4)
    # the plan must actually have engaged (and be multi-chunk)
    from pytorch_wavelets_tpu.ops.banded import _PLAN_CACHE
    assert any(p is not None and len(p) > 1
               for p in _PLAN_CACHE.values())
