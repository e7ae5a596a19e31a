"""Full o_dim/ri_dim layout matrix vs the reference oracle.

Mirrors (and extends) the reference's layout tests
(/root/reference/tests/test_dtcwt.py:188-214,297-319): every one of the
30 (o_dim, ri_dim) pairs is checked forward against the executed
reference, and inverse/roundtrip on both the conv and the forced-matmul
paths.  On the 7 layouts where exactly one of o_dim/ri_dim is >= 4 the
reference's own DTCWTInverse crashes (its get_dimensions6 mislabels the
H/W axes); ours inverts all 30 (docs/parity.md, Known divergences)."""
import numpy as np
import pytest

import jax.numpy as jnp

import pytorch_wavelets_tpu as tw
from pytorch_wavelets_tpu.ops import banded
from tests.reference_oracle import load_reference

ALL_PAIRS = [(o, r) for o in range(6) for r in range(6) if o != r]
# layouts whose inverse crashes in the reference (one of o/ri >= 4, the
# other's axis labels off by one in its get_dimensions6)
REF_INV_BROKEN = {(0, 4), (1, 4), (2, 4), (3, 4), (4, 0), (4, 1), (4, 2)}


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture()
def force_matmul():
    banded.set_operator_matmul(True)
    yield
    banded.set_operator_matmul(None)


def _x():
    return np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)


@pytest.mark.parametrize("o_dim,ri_dim", ALL_PAIRS)
def test_layout_forward_matches_reference(ref, o_dim, ri_dim):
    torch, pw = ref
    X = _x()
    Yl, Yh = pw.DTCWTForward(J=2, o_dim=o_dim,
                             ri_dim=ri_dim)(torch.from_numpy(X))
    yl, yh = tw.DTCWTForward(J=2, o_dim=o_dim,
                             ri_dim=ri_dim)(jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(yl), Yl.numpy(), atol=1e-5)
    for a, b in zip(yh, Yh):
        assert a.shape == tuple(b.shape)
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=1e-5)


@pytest.mark.parametrize("o_dim,ri_dim", ALL_PAIRS)
def test_layout_roundtrip(o_dim, ri_dim):
    """inv(fwd(x)) == x for every layout, including the 7 the reference
    inverse cannot handle."""
    X = _x()
    f = tw.DTCWTForward(J=2, o_dim=o_dim, ri_dim=ri_dim)
    inv = tw.DTCWTInverse(o_dim=o_dim, ri_dim=ri_dim)
    rec = inv(f(jnp.asarray(X)))
    np.testing.assert_allclose(np.asarray(rec), X, atol=1e-4)


@pytest.mark.parametrize("o_dim,ri_dim",
                         sorted(set(ALL_PAIRS) - REF_INV_BROKEN))
def test_layout_inverse_matches_reference(ref, o_dim, ri_dim):
    torch, pw = ref
    X = _x()
    Yl, Yh = pw.DTCWTForward(J=2, o_dim=o_dim,
                             ri_dim=ri_dim)(torch.from_numpy(X))
    Xr = pw.DTCWTInverse(o_dim=o_dim, ri_dim=ri_dim)((Yl, Yh)).numpy()
    inv = tw.DTCWTInverse(o_dim=o_dim, ri_dim=ri_dim)
    rec = inv((jnp.asarray(Yl.numpy()),
               [jnp.asarray(h.numpy()) for h in Yh]))
    np.testing.assert_allclose(np.asarray(rec), Xr, atol=1e-5)


@pytest.mark.parametrize("o_dim,ri_dim", sorted(REF_INV_BROKEN))
def test_layout_reference_inverse_broken(ref, o_dim, ri_dim):
    """Pin the divergence: the reference inverse raises on these layouts
    (if a reference release ever fixes them, this alerts us to re-verify
    value parity instead)."""
    torch, pw = ref
    X = _x()
    Yl, Yh = pw.DTCWTForward(J=2, o_dim=o_dim,
                             ri_dim=ri_dim)(torch.from_numpy(X))
    with pytest.raises(Exception):
        pw.DTCWTInverse(o_dim=o_dim, ri_dim=ri_dim)((Yl, Yh))


@pytest.mark.parametrize("o_dim,ri_dim",
                         [(1, 2), (2, 4), (4, 1), (3, 0), (5, 2)])
def test_layout_roundtrip_matmul(force_matmul, o_dim, ri_dim):
    """Representative layouts on the forced operator-matmul path."""
    X = _x()
    f = tw.DTCWTForward(J=2, o_dim=o_dim, ri_dim=ri_dim)
    inv = tw.DTCWTInverse(o_dim=o_dim, ri_dim=ri_dim)
    rec = inv(f(jnp.asarray(X)))
    np.testing.assert_allclose(np.asarray(rec), X, atol=1e-4)
