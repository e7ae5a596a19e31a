"""Pins the host-side index math in pytorch_wavelets_tpu.utils.

`reflect` is the executable specification of half-sample symmetric
extension; here it is checked against a brute-force bounce walk and
against the runtime padding op, giving the trace-time index math a live
caller (reference contract: pytorch_wavelets/utils.py:146-174)."""
import numpy as np
import jax.numpy as jnp
import pytest

from pytorch_wavelets_tpu.ops.pad import pad1d
from pytorch_wavelets_tpu.utils import (
    dwt_coeff_len, int_to_mode, mode_to_int, reflect, symm_pad_1d,
)


def _bounce(i, n):
    """Reference model: walk index i into [0, n) bouncing off the ends with
    edge repetition (half-sample symmetry)."""
    while i < 0 or i >= n:
        if i < 0:
            i = -1 - i
        else:
            i = 2 * n - 1 - i
    return i


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 13])
@pytest.mark.parametrize("m", [0, 1, 4, 9, 23])
def test_reflect_matches_bounce_walk(n, m):
    idx = symm_pad_1d(n, m)
    want = np.array([_bounce(i, n) for i in range(-m, n + m)])
    np.testing.assert_array_equal(idx, want)


@pytest.mark.parametrize("n,m", [(8, 3), (7, 6), (5, 11)])
def test_symm_pad_indices_match_pad1d(n, m):
    """Gathering with symm_pad_1d indices == the runtime symmetric pad op,
    including oversize pads (m > n)."""
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 4, n)
                    .astype(np.float32))
    got = pad1d(x, m, m, 3, "symmetric")
    want = np.asarray(x)[..., symm_pad_1d(n, m)]
    np.testing.assert_array_equal(np.asarray(got), want)


def test_reflect_float_bounds():
    # reflection about integer bounds (whole-sample) also folds correctly
    out = reflect(np.arange(-3, 7), 0.0, 3.0)
    np.testing.assert_array_equal(out, [3, 2, 1, 0, 1, 2, 3, 2, 1, 0])


def test_mode_codec_roundtrip():
    for i, name in enumerate(
            ("zero", "symmetric", "periodization", "constant", "reflect",
             "replicate", "periodic")):
        assert mode_to_int(name) == i
        assert int_to_mode(i) == name
    assert mode_to_int("per") == 2
    with pytest.raises(ValueError):
        mode_to_int("nope")
    with pytest.raises(ValueError):
        int_to_mode(7)


def test_dwt_coeff_len_matches_pywt_formula():
    # per: ceil(n/2); else floor((n + L - 1) / 2)
    assert dwt_coeff_len(10, 8, "periodization") == 5
    assert dwt_coeff_len(11, 8, "per") == 6
    assert dwt_coeff_len(10, 8, "symmetric") == 8
    assert dwt_coeff_len(127, 6, "zero") == 66
    with pytest.raises(ValueError):
        dwt_coeff_len(0, 8, "zero")


# ---------------------------------------------------------------------------
# Kingsbury test-image helpers + the orientation-selectivity invariant
# (reference contract: pytorch_wavelets/utils.py:45-101, 190-235)
# ---------------------------------------------------------------------------

def test_drawedge_geometry():
    from pytorch_wavelets_tpu.utils import drawedge
    N = 32
    c = np.array([N / 2, N / 2])
    # theta=0: horizontal edge, top of image = 1 (reference docstring).
    img = drawedge(0, c, 1, N)
    assert img.shape == (N, N)
    assert img.min() >= 0.0 and img.max() <= 1.0
    assert img[0].mean() > 0.99 and img[-1].mean() < 0.01
    # columns are constant for a horizontal edge
    assert np.allclose(img, img[:, :1])
    # the edge passes through r: value there is exactly on the ramp midpoint
    assert abs(img[N // 2, 3] - 0.5) < 1e-12
    # theta=90: vertical edge, rows constant
    img90 = drawedge(90, c, 1, N)
    assert np.allclose(img90, img90[:1, :])
    # wider transition => more intermediate pixels
    wide = drawedge(0, c, 8, N)
    mid = lambda a: ((a > 0.05) & (a < 0.95)).sum()
    assert mid(wide) > mid(img)


def test_drawcirc_geometry():
    from pytorch_wavelets_tpu.utils import drawcirc
    N = 65
    img = drawcirc(12, 2, 0, 0, N)
    assert img.shape == (N, N)
    assert img.min() >= 0.0 and img.max() <= 1.0
    c = (N + 1) // 2
    assert img[c, c] > 0.99                      # centre inside the disc
    assert img[2, 2] < 0.01                      # corner outside
    # ~50% crossing sits at the radius
    assert abs(img[c, c + 12] - 0.5) < 0.1
    # du shifts columns, dv shifts rows (the reference's transposed plane)
    sh = drawcirc(12, 2, 5, -3, N)
    assert sh[c - 3, c + 5] > 0.99
    np.testing.assert_allclose(sh[c - 3 - 10:c - 3 + 10, c + 5 - 10:c + 5 + 10],
                               img[c - 10:c + 10, c - 10:c + 10], atol=1e-6)


def test_stacked_2d_prods():
    from pytorch_wavelets_tpu.utils import (
        stacked_2d_matrix_matrix_prod, stacked_2d_matrix_vector_prod,
        stacked_2d_vector_matrix_prod)
    rng = np.random.default_rng(7)
    mats = rng.standard_normal((2, 3, 4, 5))
    vecs = rng.standard_normal((2, 3, 5))
    out = stacked_2d_matrix_vector_prod(mats, vecs)
    assert out.shape == (2, 3, 4)
    np.testing.assert_allclose(out[1, 2], mats[1, 2] @ vecs[1, 2], atol=1e-12)
    v2 = rng.standard_normal((2, 3, 4))
    out2 = stacked_2d_vector_matrix_prod(v2, mats)
    assert out2.shape == (2, 3, 5)
    np.testing.assert_allclose(out2[0, 1], mats[0, 1].T @ v2[0, 1], atol=1e-12)
    m2 = rng.standard_normal((2, 3, 5, 6))
    out3 = stacked_2d_matrix_matrix_prod(mats, m2)
    assert out3.shape == (2, 3, 4, 6)
    np.testing.assert_allclose(out3[1, 0], mats[1, 0] @ m2[1, 0], atol=1e-12)


@pytest.mark.parametrize("band,theta", list(enumerate((15, 45, 75, 105, 135, 165))))
def test_dtcwt_orientation_selectivity(band, theta):
    """The quality invariant the test-image helpers exist for: an oriented
    edge at each of the six documented angles must maximally excite exactly
    the band the docs assign to it (15..165 degree order, SURVEY 2.6 /
    reference transforms doc), at every decomposed level."""
    import pytorch_wavelets_tpu as tw
    from pytorch_wavelets_tpu.utils import drawedge
    N = 128
    img = drawedge(theta, np.array([N / 2, N / 2]), 2.0, N).astype(np.float32)
    x = jnp.asarray(img)[None, None]
    yl, yh = tw.DTCWTForward(J=3)(x)
    for lvl in (1, 2):
        h = np.asarray(yh[lvl])                      # (B,C,6,H,W,2)
        energy = np.abs(h[..., 0] + 1j * h[..., 1]).sum(axis=(0, 1, 3, 4))
        assert int(energy.argmax()) == band, (theta, lvl, energy)
        # and the response is sharply selective, not a near-tie
        runner_up = np.partition(energy, -2)[-2]
        assert energy[band] > 1.15 * runner_up, (theta, lvl, energy)
