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
