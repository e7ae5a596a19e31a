"""Filter coefficient construction tests (no oracle needed)."""
import numpy as np
import pytest

from pytorch_wavelets_tpu.filters import wavelet, wavelist


# Published pywt values (double precision) — spot checks.
DB2_REC_LO = [0.48296291314469025, 0.836516303737469,
              0.22414386804185735, -0.12940952255092145]
DB4_REC_LO = [0.23037781330885523, 0.7148465705525415, 0.6308807679295904,
              -0.02798376941698385, -0.18703481171888114,
              0.030841381835986965, 0.032883011666982945,
              -0.010597401784997278]
BIOR24_DEC_LO = [0.0, 0.03314563036811942, -0.06629126073623884,
                 -0.17677669529663687, 0.4198446513295126,
                 0.9943689110435825, 0.4198446513295126,
                 -0.17677669529663687, -0.06629126073623884,
                 0.03314563036811942]
# CDF 9/7 (pywt bior4.4 dec_lo, padded to 10)
BIOR44_DEC_LO_CENTER = 0.8526986790094022


def test_db_values():
    np.testing.assert_allclose(wavelet("db2").rec_lo, DB2_REC_LO, atol=1e-10)
    np.testing.assert_allclose(wavelet("db4").rec_lo, DB4_REC_LO, atol=1e-10)


def test_haar_is_db1():
    np.testing.assert_allclose(wavelet("haar").rec_lo,
                               [2 ** -0.5, 2 ** -0.5], atol=1e-14)


def test_bior_values():
    np.testing.assert_allclose(wavelet("bior2.4").dec_lo, BIOR24_DEC_LO,
                               atol=1e-10)
    b44 = wavelet("bior4.4")
    assert abs(b44.dec_lo[5] - BIOR44_DEC_LO_CENTER) < 1e-10


@pytest.mark.parametrize("name", ["db1", "db2", "db8", "db16", "sym4",
                                  "sym8", "sym12", "coif1", "coif2", "coif3"])
def test_orthogonality(name):
    w = wavelet(name)
    h = np.asarray(w.rec_lo)
    L = len(h)
    assert abs(h.sum() - np.sqrt(2)) < 1e-9
    for k in range(1, L // 2):
        assert abs(np.sum(h[: L - 2 * k] * h[2 * k:])) < 1e-8, (name, k)
    assert abs(np.sum(h * h) - 1.0) < 1e-9


@pytest.mark.parametrize("name", ["db3", "sym5", "bior2.2", "bior2.4",
                                  "bior3.5", "bior4.4", "rbio2.4"])
def test_pr_identity(name):
    """G0(z)H0(z) + G1(z)H1(z) == 2 z^{-(L-1)} — the two-channel perfect
    reconstruction identity for the pywt alignment convention."""
    w = wavelet(name)
    p = (np.convolve(w.rec_lo, w.dec_lo) + np.convolve(w.rec_hi, w.dec_hi))
    L = len(w.dec_lo)
    expect = np.zeros(2 * L - 1)
    expect[L - 1] = 2.0
    np.testing.assert_allclose(p, expect, atol=1e-8)


def test_alias_cancellation():
    """G0(z)H0(-z) + G1(z)H1(-z) == 0."""
    for name in ["db4", "bior2.4", "bior4.4"]:
        w = wavelet(name)
        s = np.arange(len(w.dec_lo)) % 2
        h0m = np.asarray(w.dec_lo) * np.where(s, -1.0, 1.0)
        h1m = np.asarray(w.dec_hi) * np.where(s, -1.0, 1.0)
        p = np.convolve(w.rec_lo, h0m) + np.convolve(w.rec_hi, h1m)
        np.testing.assert_allclose(p, 0, atol=1e-8)


def test_wavelist_resolves():
    for name in wavelist():
        w = wavelet(name)
        assert len(w.dec_lo) >= 2


def test_unknown_wavelet_raises():
    with pytest.raises(ValueError):
        wavelet("nosuchwavelet7")


def test_dtcwt_banks_load():
    from pytorch_wavelets_tpu.filters import biort, qshift
    h0o, g0o, h1o, g1o = biort("near_sym_a")
    assert h0o.shape == (5, 1) and h1o.shape == (7, 1)
    q = qshift("qshift_b")
    assert all(v.shape == (14, 1) for v in q)
    with pytest.raises(ValueError):
        biort("qshift_b")  # wrong bank kind for the requested varnames


def test_dmey():
    """62-tap FIR Meyer ('dmey'): canonical center taps, sqrt2 DC gain,
    near-orthogonality at the construction's documented ~1e-6 level
    (the same caveat pywt/MATLAB carry for their dmey), and an
    end-to-end DWT round trip at that tolerance."""
    import jax.numpy as jnp

    import pytorch_wavelets_tpu as tw
    w = wavelet("dmey")
    h = np.asarray(w.rec_lo)
    assert len(h) == 62
    assert abs(h.sum() - np.sqrt(2)) < 1e-4
    c = int(np.argmax(h))
    np.testing.assert_allclose(h[c - 1:c + 2],
                               [0.4440947, 0.7437504, 0.4440947],
                               atol=2e-7)
    for k in range(1, 15):
        assert abs(np.sum(h[: 62 - 2 * k] * h[2 * k:])) < 5e-6, k
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, 2, 128, 128).astype(np.float32))
    rec = tw.DWTInverse(wave="dmey", mode="periodization")(
        tw.DWTForward(J=2, wave="dmey", mode="periodization")(x))
    # the ~1e-6 filter non-orthogonality accumulates to ~1e-4 over a
    # J=2 round trip — inherent to EVERY 62-tap Meyer truncation
    # (pywt/MATLAB dmey alike), not a transform bug
    assert float(jnp.abs(rec - x).max()) < 5e-4
