#!/usr/bin/env python
"""Spatially-sharded DWT across a device mesh (virtual CPU devices here;
the same code runs unchanged on a TPU slice).

    python examples/multi_device.py
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from pytorch_wavelets_tpu.parallel import make_mesh, sharded_dwt2d, \
    sharded_idwt2d
from pytorch_wavelets_tpu.transforms.dwt import dwt2d


def main():
    mesh = make_mesh(n_data=2, n_spatial=4)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(4, 3, 128, 256).astype(np.float32))
    yl, yh = sharded_dwt2d(x, mesh, wave="db4", J=3)
    rec = sharded_idwt2d((yl, yh), mesh, wave="db4")
    yl_ref, _ = dwt2d(x, "db4", J=3, mode="periodization")
    print("devices:", len(jax.devices()),
          "| sharded == single-device:",
          bool(np.allclose(np.asarray(yl), np.asarray(yl_ref), atol=2e-5)),
          "| reconstruction err:",
          float(jnp.abs(rec - x).max()))

    # full 2-D (HxW) image tiling: H over 'spatial_h', W over 'spatial'
    # (operator-matmul path; on CPU it must be forced)
    from pytorch_wavelets_tpu.ops import banded
    banded.set_operator_matmul(True)
    try:
        mesh2d = make_mesh(n_data=2, n_spatial=2, n_spatial_h=2)
        yl2, yh2 = sharded_dwt2d(x, mesh2d, wave="db4", J=2)
        rec2 = sharded_idwt2d((yl2, yh2), mesh2d, wave="db4")
        print("2-D tiling reconstruction err:",
              float(jnp.abs(rec2 - x).max()))

        # same thing through the module API: every model class takes
        # mesh= and delegates to the sharded functional path — including
        # the reference's 'zero' default mode on ragged (odd) sizes via
        # the zero-embedded operator scheme
        import pytorch_wavelets_tpu as tw
        xfm = tw.DWTForward(J=2, wave="db4", mode="zero", mesh=mesh)
        ifm = tw.DWTInverse(wave="db4", mode="zero", mesh=mesh)
        x_odd = x[:, :, :125, :251]
        rec3 = ifm(xfm(x_odd))      # odd sizes reconstruct one sample
        rec3 = rec3[:, :, :125, :251]   # longer (reference semantics)
        print("module-API (mesh=, mode='zero', odd size) err:",
              float(jnp.abs(rec3 - x_odd).max()))

        # DTCWT and scatternet ride the same mesh= opt-in (spatially
        # sharded composed pyramids; past the composed cap a per-level
        # sharded plan takes over for giant images)
        dt_f = tw.DTCWTForward(J=2, mesh=mesh)
        dt_i = tw.DTCWTInverse(mesh=mesh)
        rec4 = dt_i(dt_f(x))
        print("sharded DTCWT reconstruction err:",
              float(jnp.abs(rec4 - x).max()))
        scat = tw.ScatLayerj2(mesh=mesh)
        z = scat(x)
        print("sharded ScatLayerj2 out:", tuple(z.shape))
    finally:
        banded.set_operator_matmul(None)


if __name__ == "__main__":
    main()
