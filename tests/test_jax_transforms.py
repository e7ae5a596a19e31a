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


def test_batch_chunk_dtcwt_matches():
    """batch_chunk=k runs the pyramid as a sequential lax.map over batch
    chunks (working-set dial) — results identical to the plain path."""
    x = _x(6, (8, 2, 16, 16))
    f0, g0 = tw.DTCWTForward(J=2), tw.DTCWTInverse()
    f1 = tw.DTCWTForward(J=2, batch_chunk=4)
    g1 = tw.DTCWTInverse(batch_chunk=4)
    yl0, yh0 = f0(x)
    yl1, yh1 = jax.jit(f1)(x)
    np.testing.assert_allclose(np.asarray(yl0), np.asarray(yl1), atol=1e-5)
    for a, b in zip(yh0, yh1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    r0 = g0((yl0, yh0))
    r1 = jax.jit(g1)((yl1, yh1))
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=1e-5)


def test_batch_chunk_fallbacks():
    """Non-divisible batches and non-batch-leading layouts fall back to
    the single-program path rather than mis-chunking."""
    x = _x(7, (6, 2, 16, 16))
    # batch 6 not divisible by 4 -> fallback, and the silently-ignored
    # dial warns so the user knows chunking is not happening
    f = tw.DTCWTForward(J=1, batch_chunk=4)
    with pytest.warns(UserWarning, match="batch_chunk=4 ignored"):
        yl, yh = f(x)
    yl0, yh0 = tw.DTCWTForward(J=1)(x)
    np.testing.assert_allclose(np.asarray(yl), np.asarray(yl0), atol=1e-5)
    # batch <= chunk is a benign no-op: must stay silent
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        tw.DTCWTForward(J=1, batch_chunk=8)(x)
    # o_dim=0 puts orientations on axis 0 (batch N=6 == 6 orientations,
    # the trap case) -> layout guard must refuse to chunk, and the
    # dropped dial warns (model-level guard, models/_base.py)
    f0 = tw.DTCWTForward(J=1, o_dim=0, ri_dim=-1, batch_chunk=3)
    g0 = tw.DTCWTInverse(o_dim=0, ri_dim=-1, batch_chunk=3)
    with pytest.warns(UserWarning, match="batch_chunk ignored"):
        ylo, yho = f0(x)
    ref_ylo, ref_yho = tw.DTCWTForward(J=1, o_dim=0, ri_dim=-1)(x)
    np.testing.assert_allclose(np.asarray(yho[0]), np.asarray(ref_yho[0]),
                               atol=1e-5)
    r = g0((ylo, yho))
    np.testing.assert_allclose(
        np.asarray(r),
        np.asarray(tw.DTCWTInverse(o_dim=0, ri_dim=-1)((ylo, yho))),
        atol=1e-5)


def test_batch_chunk_scatternet_matches():
    x = _x(8, (8, 3, 32, 32))
    s0 = tw.ScatLayerj2()
    s1 = tw.ScatLayerj2(batch_chunk=2)
    np.testing.assert_allclose(np.asarray(s0(x)),
                               np.asarray(jax.jit(s1)(x)), atol=1e-5)
    j0 = tw.ScatLayer()
    j1 = tw.ScatLayer(batch_chunk=4)
    np.testing.assert_allclose(np.asarray(j0(x)),
                               np.asarray(jax.jit(j1)(x)), atol=1e-5)


def test_batch_chunk_grad_matches():
    x = _x(9, (4, 1, 16, 16))
    s0 = tw.ScatLayerj2()
    s1 = tw.ScatLayerj2(batch_chunk=2)
    g0 = jax.grad(lambda z: jnp.sum(s0(z) ** 2))(x)
    g1 = jax.jit(jax.grad(lambda z: jnp.sum(s1(z) ** 2)))(x)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-4)


def test_batch_chunk_force_matmul_matches():
    """The chunk body must also be correct on the TPU operator-matmul /
    composed-pyramid paths (CPU default exercises only the conv path):
    force the matmul path and compare chunked vs plain inside lax.map.
    Covers trace-time operator probing occurring inside the scan-body
    trace (all matrices are built at trace time, before lax.map lowers)."""
    from pytorch_wavelets_tpu.ops import banded
    banded.set_operator_matmul(True)
    try:
        x = _x(10, (8, 2, 32, 32))
        f0, g0 = tw.DTCWTForward(J=2), tw.DTCWTInverse()
        f1 = tw.DTCWTForward(J=2, batch_chunk=4)
        g1 = tw.DTCWTInverse(batch_chunk=4)
        yl0, yh0 = f0(x)
        yl1, yh1 = jax.jit(f1)(x)
        np.testing.assert_allclose(np.asarray(yl0), np.asarray(yl1),
                                   atol=1e-5)
        for a, b in zip(yh0, yh1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)
        r1 = jax.jit(g1)((yl1, yh1))
        np.testing.assert_allclose(np.asarray(g0((yl0, yh0))),
                                   np.asarray(r1), atol=1e-5)
        s0 = tw.ScatLayerj2()
        s1 = tw.ScatLayerj2(batch_chunk=4)
        np.testing.assert_allclose(np.asarray(s0(x[:, :1])),
                                   np.asarray(jax.jit(s1)(x[:, :1])),
                                   atol=1e-5)
    finally:
        banded.set_operator_matmul(None)


def test_batch_chunk_auto_default():
    """batch_chunk=None is 'auto': inside the measured droop region
    (batch >= 32 divisible by 8, images <= 256x256, >= 6M elements) the
    DTCWT models chunk to 8 by themselves; outside it, or with
    batch_chunk=False, they run unchunked (models/_base.py
    resolve_chunk; measured basis in docs/performance.md)."""
    import pytorch_wavelets_tpu.models.dtcwt as mdt

    calls = []
    orig = mdt.batch_chunked

    def spy(fn, args, chunk):
        calls.append(chunk)
        return orig(fn, args, chunk)

    mdt.batch_chunked = spy
    try:
        xb = _x(11, (32, 3, 256, 256))
        f_auto = tw.DTCWTForward(J=1)
        yl, yh = f_auto(xb)
        assert calls == [8], calls
        # identical to the explicitly-unchunked result
        yl0, yh0 = tw.DTCWTForward(J=1, batch_chunk=False)(xb)
        assert calls == [8], calls          # False really disables
        np.testing.assert_allclose(np.asarray(yl), np.asarray(yl0),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(yh[0]), np.asarray(yh0[0]),
                                   atol=1e-5)
        # the inverse auto-sizes off the finest bandpass
        r = tw.DTCWTInverse()((yl, yh))
        assert calls == [8, 8], calls
        r0 = tw.DTCWTInverse(batch_chunk=0)((yl, yh))
        assert calls == [8, 8], calls       # 0 also disables
        np.testing.assert_allclose(np.asarray(r), np.asarray(r0),
                                   atol=1e-5)
        # outside the droop region auto declines: small batch ...
        f_auto(_x(12, (8, 3, 256, 256)))
        assert calls == [8, 8], calls
        # ... batch not divisible by 8 ...
        f_auto(_x(13, (36, 3, 256, 256)))
        assert calls == [8, 8], calls
        # ... image larger than the measured regime ...
        f_auto(_x(14, (32, 1, 1024, 1024)))
        assert calls == [8, 8], calls
        # ... or a working set below the droop threshold
        f_auto(_x(15, (32, 3, 64, 64)))
        assert calls == [8, 8], calls
        # auto + non-batch-leading layout declines SILENTLY (only an
        # explicit dial warrants the dropped-dial warning)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            tw.DTCWTForward(J=1, o_dim=0, ri_dim=-1)(
                _x(16, (32, 3, 256, 256)))
        assert calls == [8, 8], calls
    finally:
        mdt.batch_chunked = orig


def test_scat_batch_chunk_auto_default():
    """ScatLayerj2's batch_chunk=None is 'auto' with the scat-specific
    boundary: chunks of 8 when batch >= 64 (divisible by 8), total
    >= 6M elements, AND the per-chunk working set stays under ~4M
    elements — the measured regime where chunking gains both forward
    (+34..55%) and with gradients (+8%); batch 32 is excluded because
    there differentiating through the chunk loop measured -15%
    (models/_base.py:resolve_scat_chunk; on-chip basis in
    docs/performance.md)."""
    import pytorch_wavelets_tpu.models.scatternet as msc

    calls = []
    orig = msc.batch_chunked

    def spy(fn, args, chunk):
        calls.append(chunk)
        return orig(fn, args, chunk)

    msc.batch_chunked = spy
    try:
        xb = _x(21, (64, 2, 256, 256))
        f_auto = tw.ScatLayerj2()
        y = f_auto(xb)
        assert calls == [8], calls
        # identical to the explicitly-unchunked result (ulp-level
        # reassociation differences only)
        y0 = tw.ScatLayerj2(batch_chunk=False)(xb)
        assert calls == [8, 0], calls       # False really disables
        np.testing.assert_allclose(np.asarray(y), np.asarray(y0),
                                   atol=1e-5)
        # outside the regime auto declines: batch below the measured
        # always-wins threshold (32 gains fwd but loses -15% with
        # gradients — the default must not regress training) ...
        f_auto(_x(22, (32, 3, 256, 256)))
        assert calls == [8, 0, 0], calls
        # ... batch not divisible by 8 ...
        f_auto(_x(23, (68, 2, 256, 256)))
        assert calls == [8, 0, 0, 0], calls
        # ... per-chunk working set past the measured boundary (C=10 and
        # 512^2 both measured flat-to-negative on chip; resolver-level —
        # driving a >32M-element array through CPU scat here would be
        # all runtime, no extra coverage) ...
        from pytorch_wavelets_tpu.models._base import resolve_scat_chunk
        assert resolve_scat_chunk(None, 64, 10 * 256 * 256) == 0
        assert resolve_scat_chunk(None, 64, 3 * 512 * 512) == 0
        # ... or a total working set below the droop threshold
        f_auto(_x(25, (64, 3, 64, 64)))
        assert calls == [8, 0, 0, 0, 0], calls
        # an explicit int still forces the size everywhere
        tw.ScatLayerj2(batch_chunk=16)(xb)
        assert calls[-1] == 16, calls
        # ScatLayer (j1) keeps the explicit-only dial: no auto chunking
        tw.ScatLayer()(xb)
        assert calls[-1] in (None, 0), calls
    finally:
        msc.batch_chunked = orig
