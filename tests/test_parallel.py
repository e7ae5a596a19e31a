"""Sharded == single-device equivalence on an 8-virtual-device CPU mesh.

The reference has no distributed layer (SURVEY.md §2.9); these tests pin
the TPU-native feature-add: batch DP + spatial tiling with ring ppermute
halo exchange (explicit shard_map path) and GSPMD-partitioned transforms.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import pytorch_wavelets_tpu as tw
from pytorch_wavelets_tpu.parallel import (
    make_mesh, sharded_dwt2d, sharded_idwt2d, sharded_dtcwt2d,
    sharded_scat_j2, sharded_swt2d, sharded_iswt2d,
)
from pytorch_wavelets_tpu.transforms.dwt import dwt2d, idwt2d, swt2d
from pytorch_wavelets_tpu.transforms.dtcwt_xfm import (
    dtcwt2d, dtcwt_fwd_filters,
)
from pytorch_wavelets_tpu.transforms.scatternet import scat_layer_j2


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(n_data=4, n_spatial=2)


@pytest.mark.parametrize("wave", ["db2", "db4"])
def test_halo_dwt_matches_single_device(mesh, wave):
    x = jnp.asarray(_rand((8, 3, 64, 64)))
    yl_s, yh_s = sharded_dwt2d(x, mesh, wave=wave, J=3)
    yl, yh = dwt2d(x, wave, J=3, mode="periodization")
    np.testing.assert_allclose(np.asarray(yl_s), np.asarray(yl), atol=1e-5)
    for a, b in zip(yh_s, yh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("wave", ["db2", "db4"])
def test_halo_idwt_roundtrip(mesh, wave):
    x = jnp.asarray(_rand((8, 3, 64, 64), seed=1))
    coeffs = sharded_dwt2d(x, mesh, wave=wave, J=2)
    rec = sharded_idwt2d(coeffs, mesh, wave=wave)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-4)


def test_halo_dwt_uneven_raises(mesh):
    x = jnp.asarray(_rand((8, 3, 64, 60)))
    with pytest.raises(ValueError):
        sharded_dwt2d(x, mesh, wave="db2", J=3)


def test_gspmd_dtcwt_matches_single_device(mesh):
    x = jnp.asarray(_rand((8, 2, 64, 64), seed=2))
    filters = dtcwt_fwd_filters("near_sym_a", "qshift_a")
    yl_s, yh_s = sharded_dtcwt2d(x, mesh, filters, J=2)
    yl, yh = dtcwt2d(x, filters, J=2)
    np.testing.assert_allclose(np.asarray(yl_s), np.asarray(yl), atol=1e-5)
    for a, b in zip(yh_s, yh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_gspmd_scatternet_matches_single_device(mesh):
    x = jnp.asarray(_rand((8, 3, 32, 32), seed=3))
    m = tw.ScatLayerj2()
    filters = dict(m._filters)
    z_s = sharded_scat_j2(x, mesh, filters)
    z = scat_layer_j2(x, filters)
    np.testing.assert_allclose(np.asarray(z_s), np.asarray(z), atol=1e-5)


def test_batch_dp_sharding_preserved(mesh):
    """Outputs of a jit'd DWT keep the batch sharding (no implicit
    gather-to-one-device)."""
    x = jax.device_put(jnp.asarray(_rand((8, 3, 64, 64), seed=4)),
                       NamedSharding(mesh, P("data", None, None, None)))
    fwd = tw.DWTForward(J=2, wave="db2")
    yl, yh = jax.jit(fwd)(x)
    assert "data" in str(yl.sharding)


def test_dryrun_multichip_entrypoint():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as g
    g.dryrun_multichip(8)


@pytest.mark.parametrize("wave", ["db2", "db4"])
def test_halo_swt_matches_single_device(mesh, wave):
    x = jnp.asarray(np.random.RandomState(2).randn(4, 2, 32, 64)
                    .astype(np.float32))
    got = sharded_swt2d(x, mesh, wave=wave, J=2)
    want = swt2d(x, wave, J=2, mode="periodic")
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-5)


def test_halo_iswt_roundtrip(mesh):
    x = jnp.asarray(np.random.RandomState(3).randn(4, 2, 32, 64)
                    .astype(np.float32))
    coeffs = sharded_swt2d(x, mesh, wave="db3", J=2)
    rec = sharded_iswt2d(coeffs, mesh, wave="db3")
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=2e-5)


def test_halo_dwt_odd_height(mesh):
    """Odd H (unsharded axis) takes the periodization make-even repeat,
    matching the single-device pyramid."""
    x = jnp.asarray(np.random.RandomState(4).randn(4, 1, 7, 32)
                    .astype(np.float32))
    yl, yh = sharded_dwt2d(x, mesh, wave="db2", J=1)
    yl2, yh2 = dwt2d(x, "db2", J=1, mode="periodization")
    np.testing.assert_allclose(np.asarray(yl), np.asarray(yl2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(yh[0]), np.asarray(yh2[0]),
                               atol=2e-5)


def test_halo_idwt_odd_height_roundtrip(mesh):
    """Odd-H sharded pyramid inverts (regression: the inverse missed the
    crop of the replicated make-even row between levels)."""
    x = jnp.asarray(np.random.RandomState(5).randn(4, 1, 65, 64)
                    .astype(np.float32))
    yl, yh = sharded_dwt2d(x, mesh, wave="db2", J=2)
    rec = sharded_idwt2d((yl, yh), mesh, wave="db2")
    # periodization with odd H reconstructs the evened signal; the first
    # 65 rows equal the input (matches the single-device pyramid)
    np.testing.assert_allclose(np.asarray(rec[:, :, :65]),
                               np.asarray(x), atol=2e-5)
