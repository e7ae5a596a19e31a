"""4-DWT DTCWT formulation parity vs reference lowlevel2."""
import numpy as np
import pytest

import jax.numpy as jnp

from pytorch_wavelets_tpu.transforms.dtcwt_alt import (
    DTCWTForward2, DTCWTInverse2, cplxdual2d, icplxdual2d,
)
from tests.reference_oracle import load_reference

ATOL = 2e-5


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_forward2_matches_reference(ref):
    torch, _ = ref
    from pytorch_wavelets.dtcwt.lowlevel2 import DTCWTForward2 as RefF
    x = _rand((2, 3, 64, 64))
    lows_t, yh_t = RefF(J=3)(torch.from_numpy(x))
    lows, yh = DTCWTForward2(J=3)(jnp.asarray(x))
    for m in range(2):
        for n in range(2):
            np.testing.assert_allclose(np.asarray(lows[m][n]),
                                       lows_t[m][n].numpy(), atol=ATOL)
    for a, b in zip(yh, yh_t):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=ATOL)
    # NOTE: the reference's DTCWTInverse2 does not invert its own forward
    # (45/135-degree wiring crossed vs DTCWTForward2; its roundtrip error
    # is ~4.5 on randn input) — so the inverse oracle is perfect
    # reconstruction, not the reference.
    rec = DTCWTInverse2()((lows, yh))
    np.testing.assert_allclose(np.asarray(rec), x, atol=1e-4)


def test_cplxdual_matches_reference(ref):
    torch, _ = ref
    from pytorch_wavelets.dtcwt.lowlevel2 import cplxdual2D
    x = _rand((1, 2, 64, 64), seed=1)
    # reference default periodization mode crashes in its own mypad for
    # atrous-free afb2d? No - afb2d supports periodization; use both modes
    for mode in ["periodization", "symmetric"]:
        lows_t, yh_t = cplxdual2D(torch.from_numpy(x), J=2, mode=mode)
        lows, yh = cplxdual2d(jnp.asarray(x), J=2, mode=mode)
        for m in range(2):
            for n in range(2):
                np.testing.assert_allclose(np.asarray(lows[m][n]),
                                           lows_t[m][n].numpy(), atol=ATOL)
        for a, b in zip(yh, yh_t):
            np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=ATOL)
        rec = icplxdual2d(lows, yh, mode=mode)
        np.testing.assert_allclose(np.asarray(rec), x, atol=1e-4)


def test_cplxdual_mag(ref):
    torch, _ = ref
    from pytorch_wavelets.dtcwt.lowlevel2 import cplxdual2D
    x = _rand((1, 1, 32, 32), seed=2)
    _, yh_t = cplxdual2D(torch.from_numpy(x), J=1, mode="symmetric",
                         mag=True)
    _, yh = cplxdual2d(jnp.asarray(x), J=1, mode="symmetric", mag=True)
    np.testing.assert_allclose(np.asarray(yh[0]), yh_t[0].numpy(),
                               atol=ATOL)


def test_quad_afb2d_vs_reference():
    """quad_afb2d matches the reference's 4-tree batched-conv experiment
    (reference dtcwt/lowlevel2.py:259-372) bit-for-float."""
    import numpy as np
    import jax.numpy as jnp
    from tests.reference_oracle import load_reference
    from pytorch_wavelets_tpu.transforms.dtcwt_alt import (
        quad_afb2d, quad_afb2d_nonsep)
    from pytorch_wavelets_tpu.filters import qshift

    torch, _ = load_reference()
    from pytorch_wavelets.dtcwt.lowlevel2 import (
        prep_filt_quad_afb2d, quad_afb2d as ref_quad)

    h0a, h0b, _, _, h1a, h1b, _, _ = qshift("qshift_a")
    x = np.random.RandomState(0).randn(2, 3, 64, 64).astype(np.float32)
    for mode in ("zero", "symmetric"):
        cols, rows = prep_filt_quad_afb2d(h0a, h1a, h0b, h1b)
        yl_r, yh_r = ref_quad(torch.from_numpy(x), cols, rows, mode=mode)
        yl_o, yh_o = quad_afb2d(jnp.asarray(x), h0a, h1a, h0b, h1b,
                                mode=mode)
        np.testing.assert_allclose(np.asarray(yl_o), yl_r.numpy(),
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(yh_o), yh_r.numpy(),
                                   atol=3e-5)
    # the single-conv (16 outer-product PSFs) variant is a distinct
    # implementation; pin it band-for-band against the separable path
    for mode in ("zero", "symmetric", "reflect", "periodization"):
        yl2, yh2 = quad_afb2d_nonsep(jnp.asarray(x), h0a, h1a, h0b, h1b,
                                     mode=mode)
        yl1, yh1 = quad_afb2d(jnp.asarray(x), h0a, h1a, h0b, h1b,
                              mode=mode)
        np.testing.assert_allclose(np.asarray(yl2), np.asarray(yl1),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(yh2), np.asarray(yh1),
                                   atol=2e-5)


def test_cplxdual_farras_roundtrip():
    """farras level-1 bank (4-DWT formulation) reconstructs exactly."""
    import numpy as np
    import jax.numpy as jnp
    from pytorch_wavelets_tpu.transforms.dtcwt_alt import (cplxdual2d,
                                                           icplxdual2d)

    x = np.random.RandomState(0).randn(1, 2, 64, 64).astype(np.float32)
    yl, yh = cplxdual2d(jnp.asarray(x), J=2, level1="farras",
                        qshift="qshift_a")
    rec = icplxdual2d(yl, yh, level1="farras", qshift="qshift_a")
    np.testing.assert_allclose(np.asarray(rec), x, atol=2e-5)


def test_form2_mesh_optin():
    """DTCWTForward2/Inverse2 mesh= (batch-DP GSPMD — the alt forms
    have no sharded-matmul plan) matches the single-device transform
    and round-trips, including a batch that does not divide 'data'."""
    import jax
    from pytorch_wavelets_tpu.parallel import make_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=4, n_spatial=2)
    x = jnp.asarray(_rand((4, 2, 32, 32), seed=83))
    ylr, yhr = DTCWTForward2(J=2)(x)
    ylm, yhm = DTCWTForward2(J=2, mesh=mesh)(x)
    for a, b in zip(jax.tree.leaves(ylr), jax.tree.leaves(ylm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5)
    for a, b in zip(jax.tree.leaves(yhr), jax.tree.leaves(yhm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5)
    rec = DTCWTInverse2(mesh=mesh)((ylm, yhm))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x),
                               atol=1e-4)
    x3 = x[:3]
    yl3, yh3 = DTCWTForward2(J=2, mesh=mesh)(x3)
    rec3 = DTCWTInverse2(mesh=mesh)((yl3, yh3))
    np.testing.assert_allclose(np.asarray(rec3), np.asarray(x3),
                               atol=1e-4)
