"""Seeded fuzz: operator-matmul path == conv path over random configs.

The two implementations are derived from each other (matmul operators are
probed from the conv path), but boundary-mode arithmetic, odd shapes,
parity splits and banded chunking all have corner cases; this sweep walks
a reproducible sample of the configuration space on both paths.
(A bug of exactly this class — multi-period wrap padding on images smaller
than the dilated filter — shipped before this test existed.)
"""
import numpy as np
import pytest

import jax.numpy as jnp

import pytorch_wavelets_tpu as tw
from pytorch_wavelets_tpu.ops import banded
from pytorch_wavelets_tpu.transforms.dwt import swt2d, iswt2d


@pytest.fixture
def force_matmul():
    banded.set_operator_matmul(True)
    yield
    banded.set_operator_matmul(False)
    # leave disabled briefly so the comparison body can re-run, then auto
    banded.set_operator_matmul(None)


def _both_paths(fn):
    banded.set_operator_matmul(True)
    fast = [np.asarray(v) for v in fn()]
    banded.set_operator_matmul(False)
    slow = [np.asarray(v) for v in fn()]
    banded.set_operator_matmul(None)
    return fast, slow


WAVES = ["db1", "db2", "db3", "db4", "sym3", "bior2.2"]
MODES = ["zero", "symmetric", "reflect", "periodic", "periodization"]


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_dwt2d(seed):
    rng = np.random.RandomState(1000 + seed)
    H = int(rng.randint(7, 70))
    W = int(rng.randint(7, 70))
    wave = WAVES[rng.randint(len(WAVES))]
    mode = MODES[rng.randint(len(MODES))]
    J = int(rng.randint(1, 4))
    x = jnp.asarray(rng.randn(1, 2, H, W).astype(np.float32))
    fwd = tw.DWTForward(J=J, wave=wave, mode=mode)
    inv = tw.DWTInverse(wave=wave, mode=mode)

    def run():
        yl, yh = fwd(x)
        return [yl, *yh, inv((yl, yh))]

    fast, slow = _both_paths(run)
    for a, b in zip(fast, slow):
        np.testing.assert_allclose(
            a, b, atol=5e-5,
            err_msg=f"wave={wave} mode={mode} J={J} shape={(H, W)}")


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_swt2d(seed):
    rng = np.random.RandomState(2000 + seed)
    H = int(rng.randint(6, 40))
    W = int(rng.randint(6, 40))
    wave = WAVES[rng.randint(len(WAVES))]
    mode = ["periodic", "periodization"][rng.randint(2)]
    J = int(rng.randint(1, 3))
    x = jnp.asarray(rng.randn(1, 1, H, W).astype(np.float32))

    def run():
        c = swt2d(x, wave, J=J, mode=mode)
        return [*c, iswt2d(c, wave, mode=mode)]

    fast, slow = _both_paths(run)
    for a, b in zip(fast, slow):
        np.testing.assert_allclose(
            a, b, atol=5e-5,
            err_msg=f"wave={wave} mode={mode} J={J} shape={(H, W)}")
    # reconstruction exactness on the conv path
    np.testing.assert_allclose(slow[-1], np.asarray(x), atol=5e-5)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_dtcwt(seed):
    rng = np.random.RandomState(3000 + seed)
    H = int(rng.randint(16, 80))
    W = int(rng.randint(16, 80))
    pairs = [("near_sym_a", "qshift_a"), ("near_sym_b", "qshift_b"),
             ("antonini", "qshift_06"), ("legall", "qshift_c")]
    biort, qshift = pairs[rng.randint(len(pairs))]
    J = int(rng.randint(1, 4))
    x = jnp.asarray(rng.randn(1, 2, H, W).astype(np.float32))
    fwd = tw.DTCWTForward(J=J, biort=biort, qshift=qshift)
    inv = tw.DTCWTInverse(biort=biort, qshift=qshift)

    def run():
        yl, yh = fwd(x)
        return [yl, *yh, inv((yl, yh))]

    fast, slow = _both_paths(run)
    for a, b in zip(fast, slow):
        np.testing.assert_allclose(
            a, b, atol=5e-5,
            err_msg=f"{biort}/{qshift} J={J} shape={(H, W)}")


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_dwt1d(seed):
    rng = np.random.RandomState(4000 + seed)
    L = int(rng.randint(9, 130))
    wave = WAVES[rng.randint(len(WAVES))]
    mode = MODES[rng.randint(len(MODES))]
    J = int(rng.randint(1, 4))
    x = jnp.asarray(rng.randn(2, 3, L).astype(np.float32))
    fwd = tw.DWT1DForward(J=J, wave=wave, mode=mode)
    inv = tw.DWT1DInverse(wave=wave, mode=mode)

    def run():
        x0, hs = fwd(x)
        return [x0, *hs, inv((x0, hs))]

    fast, slow = _both_paths(run)
    for a, b in zip(fast, slow):
        np.testing.assert_allclose(
            a, b, atol=5e-5,
            err_msg=f"wave={wave} mode={mode} J={J} L={L}")


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_dials(seed):
    """coeff_dtype x batch_chunk x mode interactions: the dials must be
    semantics-preserving (chunk exactly; dtype to storage tolerance) on
    both the conv and operator-matmul paths."""
    rng = np.random.RandomState(7000 + seed)
    fam = ("dwt", "dtcwt", "swt")[rng.randint(3)]
    N = int(rng.choice([2, 4, 8]))
    H = int(rng.randint(3, 9)) * 8
    W = int(rng.randint(3, 9)) * 8
    J = int(rng.randint(1, 3))
    cd = rng.randint(2) == 1
    chunk = int(rng.choice([0, 2, N]))  # 0: off; N: no-op fallback
    x = jnp.asarray(rng.randn(N, 2, H, W).astype(np.float32))
    kw = {"coeff_dtype": "bfloat16"} if cd else {}

    if fam == "dwt":
        mode = MODES[rng.randint(len(MODES))]
        base = tw.DWTInverse(wave="db2", mode=mode)(
            tw.DWTForward(J=J, wave="db2", mode=mode)(x))
        out = tw.DWTInverse(wave="db2", mode=mode)(
            tw.DWTForward(J=J, wave="db2", mode=mode, **kw)(x))
    elif fam == "dtcwt":
        base = tw.DTCWTInverse()(tw.DTCWTForward(J=J)(x))
        out = tw.DTCWTInverse(batch_chunk=chunk or None)(
            tw.DTCWTForward(J=J, batch_chunk=chunk or None, **kw)(x))
    else:
        mode = ("periodization", "symmetric")[rng.randint(2)]
        base = tw.SWTInverse(wave="db2", mode=mode)(
            tw.SWTForward(J=J, wave="db2", mode=mode)(x))
        out = tw.SWTInverse(wave="db2", mode=mode)(
            tw.SWTForward(J=J, wave="db2", mode=mode, **kw)(x))

    tol = 5e-2 if cd else 1e-5
    scale = float(np.abs(np.asarray(base)).max()) or 1.0
    err = float(np.abs(np.asarray(out) - np.asarray(base)).max()) / scale
    assert err < tol, (fam, N, H, W, J, cd, chunk, err)
    assert out.dtype == base.dtype
