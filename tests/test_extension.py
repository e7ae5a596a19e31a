"""Operator extension (banded.extend_operator / extend_wrap_operator):
big-axis matrices synthesized from small verified probes.

Pins (a) bit-exactness of the synthesized operators against direct
identity probes for every operator family and boundary mode, and (b) the
end-to-end dispatch: single-device transforms keep the matmul path past
banded.MAX_MATMUL_N (the conv fallback there is pathological on TPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

import pytorch_wavelets_tpu as tw
from pytorch_wavelets_tpu.ops import banded
from pytorch_wavelets_tpu.ops.afb_sfb import (
    _afb_atrous_matrix, _afb_matrix, _sfb_atrous_matrix, _sfb_matrix,
)
from pytorch_wavelets_tpu.ops.banded import extend_operator
from pytorch_wavelets_tpu.ops.dtcwt_fb import (
    _dfilt_matrix, _filter_matrix, _ifilt_matrix,
)
from pytorch_wavelets_tpu.transforms.dwt import (
    dec_filters, rec_filters, dwt2d, idwt2d,
)
from pytorch_wavelets_tpu.transforms.dtcwt_xfm import (
    dtcwt_fwd_filters, dtcwt_inv_filters,
)

NS, NB = 128, 512


def _dwt_taps(wave="db4"):
    h0c, h1c, h0r, h1r = dec_filters(wave)
    g0c, g1c, g0r, g1r = rec_filters(wave)
    rh = (tuple(np.asarray(h0r)[::-1]), tuple(np.asarray(h1r)[::-1]))
    g = (tuple(np.asarray(g0r).ravel()), tuple(np.asarray(g1r).ravel()))
    return rh, g


@pytest.mark.parametrize("mode", ["zero", "symmetric", "reflect",
                                  "periodic", "periodization"])
def test_extend_afb_exact(mode):
    rh, _ = _dwt_taps()
    Ts = _afb_matrix(rh[0], rh[1], mode, NS)
    Tb = _afb_matrix(rh[0], rh[1], mode, NB)
    E = extend_operator(np.asarray(Ts), NB, 2, 1, (1, 2))
    assert np.array_equal(E, np.asarray(Tb)), mode


@pytest.mark.parametrize("mode", ["zero", "symmetric", "reflect",
                                  "periodic", "periodization"])
def test_extend_sfb_exact(mode):
    _, g = _dwt_taps()
    Ts = _sfb_matrix(g[0], g[1], mode, NS)
    Tb = _sfb_matrix(g[0], g[1], mode, NB)
    E = extend_operator(np.asarray(Ts), NB, 1, 2, (2, 1))
    assert np.array_equal(E, np.asarray(Tb)), mode


@pytest.mark.parametrize("mode", ["periodic", "symmetric", "zero"])
@pytest.mark.parametrize("d", [1, 2, 4])
def test_extend_atrous_exact(mode, d):
    rh, g = _dwt_taps()
    Ts = _afb_atrous_matrix(rh[0], rh[1], mode, d, NS)
    Tb = _afb_atrous_matrix(rh[0], rh[1], mode, d, NB)
    assert np.array_equal(
        extend_operator(np.asarray(Ts), NB, 2, 1, (1, 1)),
        np.asarray(Tb))
    Ss = _sfb_atrous_matrix(g[0], g[1], mode, d, NS)
    Sb = _sfb_atrous_matrix(g[0], g[1], mode, d, NB)
    assert np.array_equal(
        extend_operator(np.asarray(Ss), NB, 1, 2, (1, 1)),
        np.asarray(Sb))


def test_extend_dtcwt_kernels_exact():
    ff = dtcwt_fwd_filters("near_sym_b", "qshift_b")
    fi = dtcwt_inv_filters("near_sym_b", "qshift_b")
    for taps in (ff["h0o"], ff["h1o"]):
        Ts = _filter_matrix(taps, "symmetric", NS)
        Tb = _filter_matrix(taps, "symmetric", NB)
        assert np.array_equal(
            extend_operator(np.asarray(Ts), NB, 1, 1, (1, 1)),
            np.asarray(Tb))
    for hp, (hb, ha) in ((False, (ff["h0b"], ff["h0a"])),
                         (True, (ff["h1b"], ff["h1a"]))):
        Ts = _dfilt_matrix(hb, ha, hp, NS)
        Tb = _dfilt_matrix(hb, ha, hp, NB)
        assert np.array_equal(
            extend_operator(np.asarray(Ts), NB, 1, 1, (2, 4)),
            np.asarray(Tb))
    for hp, (gb, ga) in ((False, (fi["g0b"], fi["g0a"])),
                         (True, (fi["g1b"], fi["g1a"]))):
        Ts = _ifilt_matrix(gb, ga, hp, NS)
        Tb = _ifilt_matrix(gb, ga, hp, NB)
        assert np.array_equal(
            extend_operator(np.asarray(Ts), NB, 1, 1, (4, 2)),
            np.asarray(Tb))


@pytest.fixture()
def force_matmul():
    banded.set_operator_matmul(True)
    yield
    banded.set_operator_matmul(None)


def test_sparse_compose_composed_pyramid(force_matmul):
    """Pins the scipy.sparse branch of banded.compose (operands >= 2048
    columns): a composed-pyramid DTCWT at W=2048 builds its cross-level
    operators through it; compared against the conv path."""
    x = jnp.asarray(np.random.RandomState(3).randn(1, 1, 16, 2048)
                    .astype(np.float32))
    f = tw.DTCWTForward(J=2)
    yl, yh = f(x)
    banded.set_operator_matmul(False)
    try:
        yl_c, yh_c = f(x)
    finally:
        banded.set_operator_matmul(True)
    np.testing.assert_allclose(np.asarray(yl), np.asarray(yl_c), atol=5e-5)
    for a, b in zip(yh, yh_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    # direct parity of the sparse product against the dense product
    rng = np.random.RandomState(0)
    A = (rng.rand(64, 2304) < 0.01) * rng.randn(64, 2304)
    B = (rng.rand(2304, 2048) < 0.01) * rng.randn(2304, 2048)
    np.testing.assert_allclose(banded.compose(A, B), A @ B, atol=1e-10)


@pytest.mark.parametrize("mode", ["symmetric", "periodization"])
def test_single_device_dwt_beyond_cap(force_matmul, mode):
    """The single-device matmul path now extends past MAX_MATMUL_N via
    synthesized operators (conv fallback there is pathological on TPU)."""
    W = 12288
    assert W > banded.DIRECT_PROBE_N   # matrices must be synthesized
    x = jnp.asarray(np.random.RandomState(0).randn(1, 1, 16, W)
                    .astype(np.float32))
    yl, yh = dwt2d(x, "db3", J=2, mode=mode)
    banded.set_operator_matmul(False)
    try:
        yl_c, yh_c = dwt2d(x, "db3", J=2, mode=mode)
    finally:
        banded.set_operator_matmul(True)
    np.testing.assert_allclose(np.asarray(yl), np.asarray(yl_c), atol=5e-5)
    for a, b in zip(yh, yh_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    rec = idwt2d((yl, yh), "db3", mode=mode)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=2e-4)


def test_single_device_dtcwt_beyond_cap(force_matmul):
    """DTCWT past DIRECT_PROBE_N runs on synthesized operator matrices
    (sparse-composed pyramid up to MAX_MATMUL_N, per-level ops past
    it)."""
    x = jnp.asarray(np.random.RandomState(1).randn(1, 1, 16, 12288)
                    .astype(np.float32))
    f = tw.DTCWTForward(J=2)
    inv = tw.DTCWTInverse()
    yl, yh = f(x)
    banded.set_operator_matmul(False)
    try:
        yl_c, yh_c = f(x)
    finally:
        banded.set_operator_matmul(True)
    np.testing.assert_allclose(np.asarray(yl), np.asarray(yl_c), atol=5e-5)
    for a, b in zip(yh, yh_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
    rec = inv((yl, yh))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=2e-4)
