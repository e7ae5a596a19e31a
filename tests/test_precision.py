"""Matmul precision policy: API semantics + the fast paths honour it.

The numerical effect (bf16 pass counts) only exists on TPU; on the CPU
test backend all levels are exact f32, so here we check plumbing, not
error magnitudes (those are asserted by the TPU verify recipe).
"""
import numpy as np
import pytest
from jax import lax

import pytorch_wavelets_tpu as tw
from pytorch_wavelets_tpu.ops import precision


def test_default_is_highest():
    assert precision.get_matmul_precision() == lax.Precision.HIGHEST


def test_set_and_reset():
    tw.set_matmul_precision("high")
    try:
        assert precision.get_matmul_precision() == lax.Precision.HIGH
    finally:
        tw.set_matmul_precision("highest")
    assert precision.get_matmul_precision() == lax.Precision.HIGHEST


def test_context_manager_restores():
    with tw.matmul_precision("default"):
        assert precision.get_matmul_precision() == lax.Precision.DEFAULT
    assert precision.get_matmul_precision() == lax.Precision.HIGHEST


def test_unknown_level_rejected():
    with pytest.raises(ValueError):
        tw.set_matmul_precision("bf16x9")


def test_transform_runs_under_each_level():
    x = np.random.RandomState(0).randn(1, 2, 64, 64).astype(np.float32)
    fwd = tw.DTCWTForward(J=2)
    inv = tw.DTCWTInverse()
    ref = None
    for level in ("highest", "high", "default"):
        with tw.matmul_precision(level):
            yl, yh = fwd(x)
            rec = np.asarray(inv((yl, yh)))
        assert rec.shape == x.shape
        if ref is None:
            ref = rec
        # CPU backend: all levels exact, so results agree tightly
        np.testing.assert_allclose(rec, ref, atol=1e-5)


def test_coeff_dtype_bf16_storage():
    """DTCWTForward(coeff_dtype='bfloat16') narrows only the bandpass
    storage (an HBM-bandwidth dial on byte-bound TPU shapes); the
    inverse upcasts automatically and the round-trip error stays at
    bf16 mantissa level."""
    import jax.numpy as jnp
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 3, 64, 64).astype(np.float32))
    f = tw.DTCWTForward(J=3, coeff_dtype="bfloat16")
    g = tw.DTCWTInverse()
    yl, yh = f(x)
    assert yl.dtype == jnp.float32
    assert all(h.dtype == jnp.bfloat16 for h in yh)
    r = g((yl, yh))
    rel = float(jnp.abs(r - x).max() / jnp.abs(x).max())
    assert rel < 5e-3
    # plain f32 path untouched by the dial's default
    yl0, yh0 = tw.DTCWTForward(J=3)(x)
    assert all(h.dtype == jnp.float32 for h in yh0)


def test_swt_coeff_dtype_bf16_storage():
    """SWTForward(coeff_dtype='bfloat16') narrows the 4J-band
    undecimated stack; SWTInverse upcasts and round-trips at bf16
    mantissa level."""
    import jax.numpy as jnp
    x = jnp.asarray(np.random.RandomState(1)
                    .randn(2, 2, 32, 32).astype(np.float32))
    f = tw.SWTForward(J=2, wave="db2", coeff_dtype="bfloat16")
    cs = f(x)
    assert all(c.dtype == jnp.bfloat16 for c in cs)
    r = tw.SWTInverse(wave="db2")(cs)
    rel = float(jnp.abs(r - x).max() / jnp.abs(x).max())
    assert rel < 2e-2


def test_native_bf16_pipeline_preserved():
    """A natively-narrow pipeline (bf16 in, no coeff_dtype dial) keeps
    its dtype through the inverse: yl is bf16 too, which is the
    unambiguous signal that the narrow yh is pipeline dtype, not
    dial-narrowed storage — so inv(fwd(x)) is a valid fori_loop carry."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    x = jnp.asarray(np.random.RandomState(2)
                    .randn(1, 2, 32, 32)).astype(jnp.bfloat16)
    f = tw.DTCWTForward(J=2)
    g = tw.DTCWTInverse()
    yl, yh = f(x)
    assert yl.dtype == jnp.bfloat16
    r = g((yl, yh))
    assert r.dtype == jnp.bfloat16
    # jitted loop carry keeps its type (the benchmark-chaining pattern)
    out = jax.jit(lambda z: lax.fori_loop(
        0, 2, lambda i, a: g(f(a)), z))(x)
    assert out.dtype == jnp.bfloat16


def test_dial_round_trip_returns_f32():
    """With the dial on (f32 yl, bf16 yh) the inverse upcasts and
    returns f32 — fori_loop-chainable against an f32 input."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    x = jnp.asarray(np.random.RandomState(3)
                    .randn(1, 2, 32, 32).astype(np.float32))
    f = tw.DTCWTForward(J=2, coeff_dtype="bfloat16")
    g = tw.DTCWTInverse()
    assert g(f(x)).dtype == jnp.float32
    out = jax.jit(lambda z: lax.fori_loop(
        0, 2, lambda i, a: g(f(a)), z))(x)
    assert out.dtype == jnp.float32


def test_swt_native_bf16_opt_out():
    """SWT cannot infer dial-vs-native from the stacks (the dial narrows
    every band), so SWTInverse(upcast=False) is the explicit opt-out
    that keeps a natively-bf16 pipeline in its dtype."""
    import jax.numpy as jnp
    x = jnp.asarray(np.random.RandomState(4)
                    .randn(1, 1, 16, 16)).astype(jnp.bfloat16)
    cs = tw.SWTForward(J=1, wave="db2")(x)
    assert all(c.dtype == jnp.bfloat16 for c in cs)
    r = tw.SWTInverse(wave="db2", upcast=False)(cs)
    assert r.dtype == jnp.bfloat16
    # default keeps the dial contract: sub-f32 stacks upcast to f32
    r32 = tw.SWTInverse(wave="db2")(cs)
    assert r32.dtype == jnp.float32


def test_dwt_coeff_dtype_bf16_storage():
    """DWTForward(coeff_dtype='bfloat16') narrows the detail bands (3/4
    of the non-redundant representation); DWTInverse upcasts on the
    dial's signature and round-trips at bf16 mantissa level, while a
    natively-bf16 pipeline keeps its dtype."""
    import jax.numpy as jnp
    x = jnp.asarray(np.random.RandomState(5)
                    .randn(2, 2, 32, 32).astype(np.float32))
    f = tw.DWTForward(J=2, wave="db2", coeff_dtype="bfloat16")
    g = tw.DWTInverse(wave="db2")
    yl, yh = f(x)
    assert yl.dtype == jnp.float32
    assert all(h.dtype == jnp.bfloat16 for h in yh)
    r = g((yl, yh))
    assert r.dtype == jnp.float32
    rel = float(jnp.abs(r - x).max() / jnp.abs(x).max())
    assert rel < 2e-2
    # native narrow pipeline untouched
    xb = x.astype(jnp.bfloat16)
    ylb, yhb = tw.DWTForward(J=2, wave="db2")(xb)
    assert g((ylb, yhb)).dtype == jnp.bfloat16


def test_dwt1d_coeff_dtype_bf16_storage():
    import jax.numpy as jnp
    x = jnp.asarray(np.random.RandomState(6)
                    .randn(2, 3, 64).astype(np.float32))
    f = tw.DWT1DForward(J=2, wave="db2", coeff_dtype="bfloat16")
    g = tw.DWT1DInverse(wave="db2")
    yl, yh = f(x)
    assert all(h.dtype == jnp.bfloat16 for h in yh)
    r = g((yl, yh))
    assert r.dtype == jnp.float32
    rel = float(jnp.abs(r - x).max() / jnp.abs(x).max())
    assert rel < 2e-2
