"""Mesh/topology helpers (TPU-native feature-add over the reference).

Axes convention: ('data', 'spatial') — NCHW batches shard over 'data', the
image W axis shards over 'spatial'.  On a pod slice both axes ride ICI;
across hosts, jax.distributed handles DCN setup.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "spatial_sharding",
           "initialize_multihost"]


def make_mesh(n_data: int | None = None, n_spatial: int = 1,
              n_spatial_h: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'spatial') mesh over the available devices, or a
    ('data', 'spatial_h', 'spatial') mesh when ``n_spatial_h > 1`` (2-D
    image tiling: H over 'spatial_h', W over 'spatial')."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // (n_spatial * n_spatial_h)
    if n_data * n_spatial * n_spatial_h != n:
        raise ValueError(
            f"mesh {n_data}x{n_spatial_h}x{n_spatial} != {n} devices")
    if n_spatial_h > 1:
        arr = np.asarray(devices).reshape(n_data, n_spatial_h, n_spatial)
        return Mesh(arr, axis_names=("data", "spatial_h", "spatial"))
    arr = np.asarray(devices).reshape(n_data, n_spatial)
    return Mesh(arr, axis_names=("data", "spatial"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-DP sharding for NCHW arrays: N over 'data'."""
    return NamedSharding(mesh, P("data", None, None, None))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Batch + spatial-tile sharding: N over 'data', W over 'spatial'."""
    return NamedSharding(mesh, P("data", None, None, "spatial"))


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Thin wrapper over jax.distributed.initialize for multi-host pods."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
