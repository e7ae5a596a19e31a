"""Two-process multihost smoke test (CPU, local coordinator).

Exercises `parallel.initialize_multihost` (a pass-through to
`jax.distributed.initialize` that no other test touches) end to end: two
OS processes each contribute one CPU device, a ('data', 'spatial') mesh
spans both, and one sharded DWT step runs with per-process local batch
shards — the multi-host feeding recipe documented in docs/parallel.md.
No reference analogue (SURVEY.md §2.9)."""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from pytorch_wavelets_tpu.parallel import initialize_multihost, make_mesh
initialize_multihost(coordinator_address=sys.argv[1], num_processes=2,
                     process_id=int(sys.argv[2]))
import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import NamedSharding, PartitionSpec as P
from pytorch_wavelets_tpu.transforms.dwt import dwt2d

pid = int(sys.argv[2])
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()

mesh = make_mesh(n_data=2, n_spatial=1)
x = np.random.RandomState(0).randn(4, 2, 32, 32).astype(np.float32)
sh = NamedSharding(mesh, P("data", None, None, None))
xg = jax.make_array_from_process_local_data(
    sh, x[2 * pid:2 * (pid + 1)], global_shape=x.shape)

yl, yh = jax.jit(lambda z: dwt2d(z, "db2", J=2, mode="periodization"))(xg)
yl_full = multihost_utils.process_allgather(yl, tiled=True)

# eager single-device truth on this process's local device
yl_ref, _ = dwt2d(jnp.asarray(x), "db2", J=2, mode="periodization")
err = float(np.abs(np.asarray(yl_full) - np.asarray(yl_ref)).max())
assert err < 1e-5, err

# forced-matmul sharded path: W tiled over 'spatial' across the TWO
# PROCESSES, so the per-operator ring collective-permutes in
# parallel/banded_shard.py actually cross the process boundary
from pytorch_wavelets_tpu.ops import banded
from pytorch_wavelets_tpu.parallel import sharded_dwt2d
banded.set_operator_matmul(True)
mesh_sp = make_mesh(n_data=1, n_spatial=2)
sh_sp = NamedSharding(mesh_sp, P("data", None, None, "spatial"))
xg2 = jax.make_array_from_process_local_data(
    sh_sp, x[:, :, :, 16 * pid:16 * (pid + 1)], global_shape=x.shape)
yl_s, yh_s = sharded_dwt2d(xg2, mesh_sp, wave="db2", J=2)
yl_sf = multihost_utils.process_allgather(yl_s, tiled=True)
err2 = float(np.abs(np.asarray(yl_sf) - np.asarray(yl_ref)).max())
assert err2 < 1e-5, err2

# and a zero-embedded boundary-mode pyramid across the same two hosts
yl_z, yh_z = sharded_dwt2d(xg2, mesh_sp, wave="db2", J=2, mode="zero")
yl_zref, _ = dwt2d(jnp.asarray(x), "db2", J=2, mode="zero")
yl_zf = multihost_utils.process_allgather(yl_z, tiled=True)
err3 = float(np.abs(np.asarray(yl_zf) - np.asarray(yl_zref)).max())
assert err3 < 1e-5, err3

# and a sharded composed DTCWT step (stage-1 halo ppermutes + stage-2
# column ops) with the W axis split across the two processes
from pytorch_wavelets_tpu.parallel import sharded_dtcwt2d
from pytorch_wavelets_tpu.transforms.dtcwt_xfm import (
    dtcwt2d, dtcwt_fwd_filters,
)
ff = dtcwt_fwd_filters("near_sym_a", "qshift_a")
yl_d, yh_d = sharded_dtcwt2d(xg2, mesh_sp, ff, J=2)
yl_dref, yh_dref = dtcwt2d(jnp.asarray(x), ff, J=2)
yl_df = multihost_utils.process_allgather(yl_d, tiled=True)
yh_df = multihost_utils.process_allgather(yh_d[0], tiled=True)
err4 = max(
    float(np.abs(np.asarray(yl_df) - np.asarray(yl_dref)).max()),
    float(np.abs(np.asarray(yh_df) - np.asarray(yh_dref[0])).max()))
assert err4 < 1e-5, err4
print("MULTIHOST_OK", err, err2, err3, err4)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_dwt(tmp_path):
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    env.pop("JAX_NUM_PROCESSES", None)
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [
        subprocess.Popen([sys.executable, str(script), addr, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, cwd="/root/repo", text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out, f"worker {i} output:\n{out[-3000:]}"
