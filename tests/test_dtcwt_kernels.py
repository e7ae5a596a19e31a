"""Low-level DTCWT kernel parity vs the reference implementation.

Mirrors the reference's per-kernel suites (reference tests/test_colfilter.py,
test_coldfilt.py, test_rowfilter.py, test_rowdfilt.py) but uses the actual
reference package (torch CPU via tests.reference_oracle) as the oracle on
barbara crops, covering lowpass/highpass and several filter banks.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from pytorch_wavelets_tpu.filters import biort as _biort, qshift as _qshift
from pytorch_wavelets_tpu.ops.dtcwt_fb import (
    coldfilt, colfilter, colifilt, prep_taps, rowdfilt, rowfilter, rowifilt,
)
from tests.reference_oracle import load_reference

try:
    torch, _pw = load_reference()
except Exception:  # reference checkout absent (e.g. hosted CI)
    pytest.skip("reference package unavailable", allow_module_level=True)
from pytorch_wavelets.dtcwt import lowlevel as ref_ll  # noqa: E402


@pytest.fixture(scope="module")
def barb():
    import os
    d = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                             "barbara.npz"))
    x = d["barbara"].transpose(2, 0, 1)[None, :, :64, :68]
    return np.ascontiguousarray(x, np.float32)


def _ref_prep(taps):
    return ref_ll.prep_filt(np.asarray(taps).reshape(-1, 1), 1)


@pytest.mark.parametrize("biort_name", ["near_sym_a", "near_sym_b",
                                        "antonini"])
def test_colfilter_rowfilter(barb, biort_name):
    h0o, _, h1o, _ = _biort(biort_name)
    for taps in (h0o, h1o):
        ours_c = colfilter(jnp.asarray(barb), prep_taps(taps))
        ref_c = ref_ll.colfilter(torch.from_numpy(barb), _ref_prep(taps))
        np.testing.assert_allclose(np.asarray(ours_c), ref_c.numpy(),
                                   atol=2e-4)
        ours_r = rowfilter(jnp.asarray(barb), prep_taps(taps))
        ref_r = ref_ll.rowfilter(torch.from_numpy(barb), _ref_prep(taps))
        np.testing.assert_allclose(np.asarray(ours_r), ref_r.numpy(),
                                   atol=2e-4)


@pytest.mark.parametrize("qshift_name", ["qshift_a", "qshift_b", "qshift_c"])
@pytest.mark.parametrize("highpass", [False, True])
def test_coldfilt_rowdfilt(barb, qshift_name, highpass):
    h0a, h0b, _, _, h1a, h1b, _, _ = _qshift(qshift_name)
    ha, hb = (h1a, h1b) if highpass else (h0a, h0b)
    ours = coldfilt(jnp.asarray(barb), prep_taps(ha), prep_taps(hb),
                    highpass=highpass)
    ref = ref_ll.coldfilt(torch.from_numpy(barb), _ref_prep(ha),
                          _ref_prep(hb), highpass=highpass)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4)
    ours = rowdfilt(jnp.asarray(barb), prep_taps(ha), prep_taps(hb),
                    highpass=highpass)
    ref = ref_ll.rowdfilt(torch.from_numpy(barb), _ref_prep(ha),
                          _ref_prep(hb), highpass=highpass)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4)


@pytest.mark.parametrize("qshift_name", ["qshift_a", "qshift_b"])
@pytest.mark.parametrize("highpass", [False, True])
def test_colifilt_rowifilt(barb, qshift_name, highpass):
    h0a, h0b, _, _, h1a, h1b, _, _ = _qshift(qshift_name)
    ha, hb = (h1a, h1b) if highpass else (h0a, h0b)
    ours = colifilt(jnp.asarray(barb), prep_taps(ha), prep_taps(hb),
                    highpass=highpass)
    ref = ref_ll.colifilt(torch.from_numpy(barb), _ref_prep(ha),
                          _ref_prep(hb), highpass=highpass)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4)
    ours = rowifilt(jnp.asarray(barb), prep_taps(ha), prep_taps(hb),
                    highpass=highpass)
    ref = ref_ll.rowifilt(torch.from_numpy(barb), _ref_prep(ha),
                          _ref_prep(hb), highpass=highpass)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4)


def test_q2c_c2q_roundtrip(barb):
    from pytorch_wavelets_tpu.ops.dtcwt_fb import c2q, q2c
    y = jnp.asarray(barb[:, :, :32, :32])
    (w1r, w1i), (w2r, w2i) = q2c(y)
    back = c2q((w1r, w1i), (w2r, w2i))
    np.testing.assert_allclose(np.asarray(back), np.asarray(y), atol=1e-4)
