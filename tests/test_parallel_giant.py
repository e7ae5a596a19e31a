"""Giant-image sharded DTCWT: the per-level sharded matmul path past the
composed-pyramid cap (VERDICT r2 missing #1 / task 1).

Split into its own file because the W=12288 compile on the 8-virtual-
device CPU mesh takes ~10 minutes on one core — run it with a generous
timeout:  timeout 1500 python -m pytest tests/test_parallel_giant.py -q

No reference analogue — SURVEY.md §2.9 "decompose 2-D images larger than
one chip": a single image wider than the single-chip composed matmul
envelope decomposes across the mesh with only ring-halo traffic, the one
regime where spatial sharding beats (communication-free) batch-DP."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # ~19 min of CPU compile for 2 tests

import jax
import jax.numpy as jnp

from pytorch_wavelets_tpu.ops import banded
from pytorch_wavelets_tpu.parallel import make_mesh
from pytorch_wavelets_tpu.parallel.sharded import (
    _sharded_dtcwt2d_perlevel, _sharded_idtcwt2d_perlevel,
)
from pytorch_wavelets_tpu.transforms.dtcwt_xfm import (
    dtcwt2d, dtcwt_fwd_filters, dtcwt_inv_filters,
)


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(n_data=4, n_spatial=2)


@pytest.fixture()
def force_matmul():
    banded.set_operator_matmul(True)
    yield
    banded.set_operator_matmul(None)


def test_mm_dtcwt_beyond_matmul_cap(mesh, force_matmul):
    """Giant-image DTCWT fwd+inv at W=12288: past banded.MAX_MATMUL_N the
    per-level sharded matmul path runs (every level's operators
    synthesized from small verified probes, sharded through
    banded_shard).  Oracle: the conv path — the semantics source of truth
    and the single-device dispatch for such axes off-TPU."""
    W = 12288
    assert W > banded.MAX_MATMUL_N     # composed planners refuse this
    assert W > banded.DIRECT_PROBE_N   # operators must be synthesized
    ff = dtcwt_fwd_filters("near_sym_a", "qshift_a")
    fi = dtcwt_inv_filters("near_sym_a", "qshift_a")
    x = jnp.asarray(_rand((4, 1, 8, W), seed=53))
    out = _sharded_dtcwt2d_perlevel(x, mesh, ff, 2, "symmetric")
    assert out is not None, "per-level sharded path not taken at W=12288"
    inv = _sharded_idtcwt2d_perlevel((out[0], out[1]), mesh, fi,
                                     "symmetric")
    assert inv is not None
    np.testing.assert_allclose(np.asarray(inv), np.asarray(x), atol=2e-4)
    banded.set_operator_matmul(False)   # conv-path oracle
    try:
        yl, yh = dtcwt2d(x, ff, J=2)
    finally:
        banded.set_operator_matmul(True)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(yl),
                               atol=5e-5)
    for a, b in zip(out[1], yh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5)


def test_mm_scat_beyond_matmul_cap(mesh, force_matmul):
    """Giant-image ScatLayerj2 at W=9216: past banded.MAX_MATMUL_N the
    scatternet runs the per-level sharded fronts (orders 1+2 then the
    second order over first-order magnitudes, pooling local).  Oracle:
    the single-device conv path."""
    W = 9216
    assert W > banded.MAX_MATMUL_N
    from pytorch_wavelets_tpu.parallel.sharded import (
        _sharded_scat_j2_matmul,
    )
    from pytorch_wavelets_tpu.transforms.scatternet import scat_layer_j2
    from pytorch_wavelets_tpu.models.scatternet import ScatLayerj2
    filters = dict(ScatLayerj2()._filters)
    x = jnp.asarray(_rand((4, 1, 16, W), seed=59))
    out = _sharded_scat_j2_matmul(x, mesh, filters, "symmetric", 1e-2)
    assert out is not None, "per-level scat front not taken at W=9216"
    banded.set_operator_matmul(False)   # conv-path oracle
    try:
        ref = scat_layer_j2(x, filters, mode="symmetric", magbias=1e-2)
    finally:
        banded.set_operator_matmul(True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4)
