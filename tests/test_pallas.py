"""Pallas sandwich kernel semantics (interpret mode on CPU).

The kernel is opt-in on TPU (the XLA two-einsum lowering currently wins —
see ops/pallas_kernels.py), but its semantics and custom VJP are pinned
here so it cannot rot while disabled by default.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_wavelets_tpu.ops import pallas_kernels as pk
from pytorch_wavelets_tpu.ops.banded import apply_col, apply_row


@pytest.fixture
def force_sandwich():
    pk.set_sandwich(True)
    yield
    pk.set_sandwich(None)


def _ref(x, C, R):
    return apply_row(apply_col(x, C), R)


def test_sandwich_disabled_by_default():
    assert not pk.sandwich_enabled(64, 64, 64, 64)


def test_sandwich_matches_einsum(force_sandwich):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, 32, 48).astype(np.float32))
    C = rng.randn(24, 32).astype(np.float32)
    R = rng.randn(40, 48).astype(np.float32)
    assert pk.sandwich_enabled(32, 48, 24, 40)
    got = pk.sandwich(x, C, R)
    want = _ref(x, C, R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_sandwich_custom_vjp(force_sandwich):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 2, 16, 24).astype(np.float32))
    C = rng.randn(12, 16).astype(np.float32)
    R = rng.randn(20, 24).astype(np.float32)
    g = jax.grad(lambda z: jnp.sum(pk.sandwich(z, C, R) ** 2))(x)
    pk.set_sandwich(False)
    g_ref = jax.grad(lambda z: jnp.sum(_ref(z, C, R) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-3)


def test_sandwich_vmem_cap(force_sandwich):
    assert not pk.sandwich_enabled(4096, 4096, 4096, 4096)
