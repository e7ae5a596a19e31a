"""Randomized sharded == single-device fuzz over the strategy machinery.

Samples (family, wave, J, shape, mesh layout, dispatch path) combinations
the enumerated tests don't cover, exercising every strategy kind (shard /
gather / local) and both mesh shapes.  Seeded for reproducibility."""
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_wavelets_tpu.ops import banded
from pytorch_wavelets_tpu.parallel import make_mesh
from pytorch_wavelets_tpu.parallel.sharded import (
    sharded_dwt2d, sharded_idwt2d, sharded_swt2d, sharded_iswt2d,
    sharded_dtcwt2d,
)
from pytorch_wavelets_tpu.transforms.dwt import dwt2d, swt2d
from pytorch_wavelets_tpu.transforms.dtcwt_xfm import (
    dtcwt2d, dtcwt_fwd_filters,
)

_RNG = random.Random(20260817)

MESHES = [(4, 2, 1), (2, 2, 2), (2, 4, 1)]
WAVES = ["db1", "db2", "db3", "db4", "sym4"]


def _configs(n):
    out = []
    for _ in range(n):
        n_d, n_sp, n_h = _RNG.choice(MESHES)
        wave = _RNG.choice(WAVES)
        J = _RNG.choice([1, 2, 3, 4])
        H = _RNG.choice([32, 64, 96]) * max(n_h, 1)
        W = n_sp * (2 ** J) * _RNG.choice([2, 4, 8])
        N = n_d * _RNG.choice([1, 2])
        C = _RNG.choice([1, 3])
        out.append((n_d, n_sp, n_h, wave, J, N, C, H, W))
    return out


@pytest.fixture(autouse=True)
def force_matmul():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    banded.set_operator_matmul(True)
    yield
    banded.set_operator_matmul(None)


@pytest.mark.parametrize("cfg", _configs(6))
def test_fuzz_sharded_dwt_roundtrip(cfg):
    n_d, n_sp, n_h, wave, J, N, C, H, W = cfg
    mesh = make_mesh(n_data=n_d, n_spatial=n_sp, n_spatial_h=n_h)
    # H must also divide for 2-D meshes
    if n_h > 1:
        H = n_h * (2 ** J) * max(1, H // (n_h * 2 ** J))
    x = jnp.asarray(np.random.RandomState(hash(cfg) % 2 ** 31)
                    .randn(N, C, H, W).astype(np.float32))
    yl_s, yh_s = sharded_dwt2d(x, mesh, wave=wave, J=J)
    yl, yh = dwt2d(x, wave, J=J, mode="periodization")
    np.testing.assert_allclose(np.asarray(yl_s), np.asarray(yl),
                               atol=5e-5, err_msg=str(cfg))
    for a, b in zip(yh_s, yh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, err_msg=str(cfg))
    rec = sharded_idwt2d((yl_s, yh_s), mesh, wave=wave)
    # PR only holds while the coarse level stays >= the filter support
    from pytorch_wavelets_tpu.filters import wavelet
    L = len(wavelet(wave).dec_lo)
    if min(H, W) // 2 ** J >= L:
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x),
                                   atol=2e-4, err_msg=str(cfg))


def _ragged_configs(n):
    """Odd / ragged / non-divisible shapes for the zero-embedded
    boundary-mode paths (VERDICT r2 task 7: fuzz odd shapes)."""
    out = []
    for _ in range(n):
        n_d, n_sp, n_h = _RNG.choice(MESHES)
        wave = _RNG.choice(WAVES)
        J = _RNG.choice([1, 2, 3])
        mode = _RNG.choice(["zero", "symmetric", "reflect"])
        H = _RNG.choice([31, 45, 57, 64])
        W = _RNG.choice([33, 47, 59, 96])
        N = n_d * _RNG.choice([1, 2])
        out.append((n_d, n_sp, n_h, wave, J, mode, N, H, W))
    return out


@pytest.mark.parametrize("cfg", _ragged_configs(6))
def test_fuzz_sharded_dwt_modes_ragged(cfg):
    """Non-circular modes on odd/ragged axes: sharded == single-device
    forward, and the inverse round-trips (cropped to the input — odd
    reconstructions are one sample longer, reference semantics)."""
    n_d, n_sp, n_h, wave, J, mode, N, H, W = cfg
    mesh = make_mesh(n_data=n_d, n_spatial=n_sp, n_spatial_h=n_h)
    x = jnp.asarray(np.random.RandomState(hash(cfg) % 2 ** 31)
                    .randn(N, 2, H, W).astype(np.float32))
    yl_s, yh_s = sharded_dwt2d(x, mesh, wave=wave, J=J, mode=mode)
    yl, yh = dwt2d(x, wave, J=J, mode=mode)
    np.testing.assert_allclose(np.asarray(yl_s), np.asarray(yl),
                               atol=5e-5, err_msg=str(cfg))
    for a, b in zip(yh_s, yh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, err_msg=str(cfg))
    rec = sharded_idwt2d((yl_s, yh_s), mesh, wave=wave, mode=mode)
    from pytorch_wavelets_tpu.filters import wavelet
    L = len(wavelet(wave).dec_lo)
    if min(yl.shape[-2:]) >= L:
        np.testing.assert_allclose(np.asarray(rec[:, :, :H, :W]),
                                   np.asarray(x), atol=2e-4,
                                   err_msg=str(cfg))


@pytest.mark.parametrize("cfg", [
    (od, rd, H, W)
    for od, rd in _RNG.sample([(1, 3), (3, 5), (4, 0), (5, 1)], 3)
    for H, W in [_RNG.choice([(32, 48), (31, 57), (45, 33)])]])
def test_fuzz_sharded_dtcwt_layouts(cfg):
    """Nondefault o_dim/ri_dim layouts (+ odd sizes) through the sharded
    DTCWT == single-device (VERDICT r2 task 7: fuzz nondefault
    layouts)."""
    od, rd, H, W = cfg
    mesh = make_mesh(n_data=4, n_spatial=2)
    ff = dtcwt_fwd_filters("near_sym_a", "qshift_a")
    x = jnp.asarray(np.random.RandomState(hash(cfg) % 2 ** 31)
                    .randn(4, 2, H, W).astype(np.float32))
    yl_s, yh_s = sharded_dtcwt2d(x, mesh, ff, J=2, o_dim=od, ri_dim=rd)
    yl, yh = dtcwt2d(x, ff, J=2, o_dim=od, ri_dim=rd)
    np.testing.assert_allclose(np.asarray(yl_s), np.asarray(yl),
                               atol=5e-5, err_msg=str(cfg))
    for a, b in zip(yh_s, yh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, err_msg=str(cfg))


@pytest.mark.parametrize("cfg", _configs(4))
def test_fuzz_sharded_swt_roundtrip(cfg):
    n_d, n_sp, n_h, wave, J, N, C, H, W = cfg
    J = min(J, 3)
    mesh = make_mesh(n_data=n_d, n_spatial=n_sp, n_spatial_h=n_h)
    x = jnp.asarray(np.random.RandomState(hash(cfg) % 2 ** 31)
                    .randn(N, C, H, W).astype(np.float32))
    got = sharded_swt2d(x, mesh, wave=wave, J=J)
    want = swt2d(x, wave, J=J, mode="periodic")
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=5e-5, err_msg=str(cfg))
    rec = sharded_iswt2d(got, mesh, wave=wave)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=2e-4,
                               err_msg=str(cfg))
