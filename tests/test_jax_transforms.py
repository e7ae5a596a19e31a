"""Composability with JAX function transforms.

The reference is an nn.Module library; the TPU build's API is pure
functions of arrays, so the whole surface must compose with jit / vmap /
grad / jax.checkpoint (rematerialisation is the standard HBM-for-FLOPs
dial on TPU training steps — a scatternet front under ``jax.checkpoint``
stops storing its intermediate pyramids between forward and backward).
These tests pin that contract on CPU shapes.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_wavelets_tpu as tw


def _x(seed, shape):
    return jnp.asarray(np.random.RandomState(seed)
                       .randn(*shape).astype(np.float32))


def test_scatternet_remat_grad_matches():
    """jax.checkpoint through ScatLayerj2: same values and gradients,
    recompute-in-backward instead of storing the pyramids."""
    x = _x(0, (2, 3, 32, 32))
    scat = tw.ScatLayerj2()

    def loss(fn, z):
        return jnp.sum(fn(z) ** 2)

    plain = jax.jit(jax.grad(lambda z: loss(scat, z)))
    remat = jax.jit(jax.grad(lambda z: loss(jax.checkpoint(scat), z)))
    np.testing.assert_allclose(np.asarray(plain(x)), np.asarray(remat(x)),
                               atol=1e-5)


def test_dtcwt_remat_grad_matches():
    x = _x(1, (1, 2, 32, 32))
    fwd = tw.DTCWTForward(J=2)
    inv = tw.DTCWTInverse()

    def rt(z):
        return inv(fwd(z))

    def loss(fn, z):
        return jnp.sum(fn(z) ** 2)

    plain = jax.jit(jax.grad(lambda z: loss(rt, z)))
    remat = jax.jit(jax.grad(lambda z: loss(jax.checkpoint(rt), z)))
    np.testing.assert_allclose(np.asarray(plain(x)), np.asarray(remat(x)),
                               atol=1e-5)


def test_dtcwt_vmap_matches_batched():
    """vmap over a leading ensemble axis == folding it into N."""
    xs = _x(2, (3, 1, 2, 16, 16))
    fwd = tw.DTCWTForward(J=2)
    inv = tw.DTCWTInverse()
    rt = lambda z: inv(fwd(z))
    v = jax.vmap(rt)(xs)
    flat = rt(xs.reshape(3 * 1, 2, 16, 16)).reshape(xs.shape)
    np.testing.assert_allclose(np.asarray(v), np.asarray(flat), atol=1e-5)


def test_scatternet_vmap():
    xs = _x(3, (2, 1, 3, 16, 16))
    scat = tw.ScatLayer()
    v = jax.vmap(scat)(xs)
    flat = scat(xs.reshape(2, 3, 16, 16))
    np.testing.assert_allclose(np.asarray(v.reshape(flat.shape)),
                               np.asarray(flat), atol=1e-5)


def test_swt_scan_chain():
    """lax.scan carry through an SWT round trip (analysis/synthesis dtype
    and shape stability under repeated application)."""
    x = _x(4, (1, 1, 16, 16))
    fwd = tw.SWTForward(J=1, wave="db2")
    inv = tw.SWTInverse(wave="db2")

    def step(c, _):
        return inv(fwd(c)), jnp.sum(c)

    out, sums = jax.jit(
        lambda z: jax.lax.scan(step, z, None, length=3))(x)
    assert out.shape == x.shape and out.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-3)


def test_grad_of_vmap_dwt():
    xs = _x(5, (2, 1, 1, 16, 16))
    fwd = tw.DWTForward(J=2, wave="db2")

    def loss(z):
        yl, yh = jax.vmap(fwd)(z)
        return jnp.sum(yl ** 2) + sum(jnp.sum(h ** 2) for h in yh)

    g = jax.jit(jax.grad(loss))(xs)
    assert g.shape == xs.shape
    assert bool(jnp.all(jnp.isfinite(g)))
