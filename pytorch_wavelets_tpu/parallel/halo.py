"""Ring halo exchange for spatially-sharded filterbanks.

Inside a shard_map, each device holds a contiguous tile of the image axis.
A filterbank step needs `left`/`right` neighbouring samples (the filter
support) — exchanged here with `lax.ppermute` over the mesh ring, exactly
the on-mesh equivalent of the reference's local pad-gather
(reference mypad, dwt/lowlevel.py:28-88).  At the global image boundary the
halo instead implements the boundary mode (wrap/symmetric/zero), selected
with a same-shape `where` so shapes stay static.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["halo_exchange_1d"]


def _edge(x, axis, start, size):
    return lax.slice_in_dim(x, start, start + size, axis=axis)


def halo_exchange_1d(x, axis: int, axis_name: str, left: int, right: int,
                     boundary: str = "wrap"):
    """Attach (left, right) halos to the local tile ``x`` along ``axis``.

    boundary: behaviour at the global image edge —
      'wrap'      : ring exchange all the way around (periodization),
      'symmetric' : half-sample reflection of the tile's own edge,
      'zero'      : zeros.
    Interior tile edges always receive true neighbour data via ppermute.
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    parts = []
    W = x.shape[axis]
    if max(left, right) > W:
        raise ValueError(
            f"halo ({left}, {right}) exceeds the local tile width {W} on "
            f"axis {axis}: a single ring exchange only reaches the "
            "immediate neighbour — reduce the level count J or the number "
            "of spatial shards")

    if left > 0:
        # my left halo = right edge of my left neighbour (src i -> dst i+1)
        mine_tail = _edge(x, axis, W - left, left)
        ring = lax.ppermute(mine_tail, axis_name,
                            [(i, (i + 1) % n) for i in range(n)])
        if boundary == "wrap":
            halo = ring
        elif boundary == "symmetric":
            refl = jnp.flip(_edge(x, axis, 0, left), axis=axis)
            halo = jnp.where(idx == 0, refl, ring)
        elif boundary == "zero":
            halo = jnp.where(idx == 0, jnp.zeros_like(ring), ring)
        else:
            raise ValueError(f"unsupported halo boundary: {boundary}")
        parts.append(halo)

    parts.append(x)

    if right > 0:
        mine_head = _edge(x, axis, 0, right)
        ring = lax.ppermute(mine_head, axis_name,
                            [(i, (i - 1) % n) for i in range(n)])
        if boundary == "wrap":
            halo = ring
        elif boundary == "symmetric":
            refl = jnp.flip(_edge(x, axis, W - right, right), axis=axis)
            halo = jnp.where(idx == n - 1, refl, ring)
        elif boundary == "zero":
            halo = jnp.where(idx == n - 1, jnp.zeros_like(ring), ring)
        else:
            raise ValueError(f"unsupported halo boundary: {boundary}")
        parts.append(halo)

    return jnp.concatenate(parts, axis=axis)
