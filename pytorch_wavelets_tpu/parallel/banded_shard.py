"""Sharded evaluation of banded operator matrices (the TPU fast path).

The single-device fast path applies each 1-D filterbank op as a dense
banded operator matmul (ops/banded.py).  Those einsums contract the very
image axis spatial sharding tiles, so letting GSPMD partition them would
all-gather the full axis on every stage.  Instead, this module splits the
operator by *output rows* at trace time: shard i computes its row chunk
from its own input tile plus a fixed halo — the nonzero band of a row
chunk only reaches `halo` samples beyond its home tile — exchanged once
per operator with `lax.ppermute` (parallel/halo.py).

Communication per operator apply is exactly the band overhang (filter
support, growing with composed level depth), never the full axis — the
same volume the conv-path halo exchange ships, now for the matmul path.

Block structure: probed operators stack several sub-operators on the
row axis (e.g. [lowpass; highpass] of an analysis split, parity-split row
operators of a DTCWT level) and some consume several concatenated inputs
on the column axis (e.g. synthesis merges reading [lo | hi]).  Each block
is tiled over the mesh axis independently so the local row/column layout
mirrors the global one; slicing logic written against global offsets
divides through by the shard count unchanged.

No reference analogue (SURVEY.md §2.9 — the reference has no distributed
layer); this is the sharded form of the operator algebra in ops/banded.py.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np
from jax import lax

from pytorch_wavelets_tpu.ops.precision import get_matmul_precision
from pytorch_wavelets_tpu.parallel.halo import halo_exchange_1d

__all__ = ["ShardedOp", "build_sharded_op", "apply_sharded_op"]


class ShardedOp(NamedTuple):
    """Trace-time plan for one sharded operator apply.

    halo_left / halo_right: samples to exchange per input block.
    blocks: (n_shards, M_local, win_total) stacked per-shard matrices,
        win_total = sum over column blocks of (tile + halo_left +
        halo_right).  Selected by ``lax.axis_index`` at run time.
    col_tiles: per column block, the local tile width (for bookkeeping).
    wrap: whether halos wrap at the global boundary (ring) or are zero
        outside (boundary behaviour folded into the matrix).
    band_plan: block-banded evaluation plan for the LOCAL chunk —
        [(r0, r1, [(c0, c1), ...])] output-row chunks with the
        128-aligned column segments covering the union of all shards'
        nonzeros (same geometry for every shard, so one plan serves the
        axis_index-selected matrix) — or None for a dense local dot.
        Without this, large-image sharded applies would pay the dense
        O(tile) FLOPs per output the single-device path already avoids
        (ops/banded.py block-banding).
    """
    halo_left: int
    halo_right: int
    blocks: np.ndarray
    col_tiles: tuple
    wrap: bool
    band_plan: object = None


def _chunks(sizes: Sequence[int], n: int):
    """Per-block (offset, size) with the divisibility check."""
    out = []
    ofs = 0
    for s in sizes:
        if s % n:
            raise ValueError(
                f"operator block of size {s} does not divide over {n} "
                "shards — choose a shard count dividing every per-level "
                "output length")
        out.append((ofs, s))
        ofs += s
    return out


def build_sharded_op(T, n: int, row_blocks: Sequence[int],
                     col_blocks: Sequence[int], wrap: bool) -> ShardedOp:
    """Split operator ``T`` (M, K) into per-shard row-chunk matrices.

    row_blocks / col_blocks: sizes of the stacked sub-operators on each
    axis (sum to M / K); every block is tiled into ``n`` equal parts.
    ``wrap=True`` folds out-of-range columns circularly (periodization
    operators couple the two image ends); ``wrap=False`` zero-fills them
    (symmetric/zero-mode operators have no mass outside the axis).

    Raises ValueError when a block does not divide by ``n`` or the needed
    halo exceeds one tile (a single ring hop only reaches the immediate
    neighbour).
    """
    T = np.asarray(T)
    M, K = T.shape
    if sum(row_blocks) != M or sum(col_blocks) != K:
        raise ValueError("row/col block sizes must sum to the operator "
                         f"shape {T.shape}")
    rb = _chunks(row_blocks, n)
    cb = _chunks(col_blocks, n)
    nz = np.abs(T) > (np.abs(T).max() * 1e-12 + 0.0)

    # halo = max overhang of any row chunk's nonzero band beyond its home
    # column tile, measured per column block
    hl = hr = 0
    for (rofs, rsz) in rb:
        rloc = rsz // n
        for i in range(n):
            cols = np.nonzero(nz[rofs + i * rloc:
                                 rofs + (i + 1) * rloc].any(axis=0))[0]
            for (cofs, csz) in cb:
                w = csz // n
                local = cols[(cols >= cofs) & (cols < cofs + csz)] - cofs
                home0, home1 = i * w, (i + 1) * w
                for c in local:
                    if home0 <= c < home1:
                        continue
                    if wrap:
                        lov = (home0 - c) % csz
                        rov = (c - (home1 - 1)) % csz
                        if lov <= rov:
                            hl = max(hl, int(lov))
                        else:
                            hr = max(hr, int(rov))
                    elif c < home0:
                        hl = max(hl, int(home0 - c))
                    else:
                        hr = max(hr, int(c - home1 + 1))
    min_tile = min(csz // n for _, csz in cb)
    if max(hl, hr) > min_tile:
        raise ValueError(
            f"sharded operator needs a ({hl}, {hr}) halo but the smallest "
            f"local tile is {min_tile}: one ring exchange only reaches the "
            "immediate neighbour — reduce the level count or shard count")

    m_local = sum(s // n for _, s in rb)
    win_total = sum(s // n + hl + hr for _, s in cb)
    B = np.zeros((n, m_local, win_total), dtype=T.dtype)
    for i in range(n):
        r_out = 0
        for (rofs, rsz) in rb:
            rloc = rsz // n
            rows = T[rofs + i * rloc: rofs + (i + 1) * rloc]
            c_out = 0
            for (cofs, csz) in cb:
                w = csz // n
                cols = np.arange(i * w - hl, (i + 1) * w + hr)
                if wrap:
                    gcols = cols % csz
                    sub = rows[:, cofs + gcols].copy()
                    # a window wider than the block aliases some source
                    # columns into several positions; the halo'd input
                    # carries the same sample at each, so keep exactly one
                    # occurrence of the weight
                    seen: set = set()
                    for p, c in enumerate(gcols):
                        if c in seen:
                            sub[:, p] = 0.0
                        else:
                            seen.add(c)
                else:
                    sub = np.zeros((rloc, w + hl + hr), dtype=T.dtype)
                    valid = (cols >= 0) & (cols < csz)
                    sub[:, valid] = rows[:, cofs + cols[valid]]
                B[i, r_out:r_out + rloc,
                  c_out:c_out + w + hl + hr] = sub
                c_out += w + hl + hr
            r_out += rloc

    # block-banded local plan: the union of all shards' nonzeros has the
    # same banded geometry on every shard (boundary folding only removes
    # mass), so one chunked plan serves the runtime-selected matrix —
    # reuses the single-device planner over the union support
    from pytorch_wavelets_tpu.ops.banded import _band_plan
    union = np.abs(B).max(axis=0)
    band_plan = _band_plan(union)
    return ShardedOp(hl, hr, np.ascontiguousarray(B),
                     tuple(s // n for _, s in cb), wrap, band_plan)


def apply_sharded_op(parts, op: ShardedOp, axis: int, axis_name: str):
    """Apply a sharded operator along ``axis`` inside a shard_map.

    parts: local arrays, one per column block (each holding this shard's
    tile of that block's axis).  Halos are exchanged per block, the
    halo'd blocks concatenated, and the shard's own matrix chunk —
    selected from the stacked constant with ``lax.axis_index`` — applied
    as one MXU contraction.  Returns the local chunk of the output rows.
    """
    boundary = "wrap" if op.wrap else "zero"
    halod = [halo_exchange_1d(p, axis, axis_name, op.halo_left,
                              op.halo_right, boundary=boundary)
             for p in parts]
    x = halod[0] if len(halod) == 1 else jnp.concatenate(halod, axis=axis)
    i = lax.axis_index(axis_name)
    spec = ("mh,nchw->ncmw" if axis in (2, -2) else "mw,nchw->nchm")
    cat_axis = 2 if axis in (2, -2) else 3

    def dot(Bsub, xsub):
        Bi = lax.dynamic_index_in_dim(
            jnp.asarray(Bsub, dtype=x.dtype), i, axis=0, keepdims=False)
        return jnp.einsum(spec, Bi, xsub,
                          precision=get_matmul_precision())

    if op.band_plan is None:
        return dot(op.blocks, x)
    # block-banded: contract each 128-row output chunk only against its
    # column-support segments (mirrors ops.banded._apply_banded)
    outs = []
    for r0, r1, segs in op.band_plan:
        acc = None
        for c0, c1 in segs:
            xs = (x[:, :, c0:c1, :] if cat_axis == 2
                  else x[:, :, :, c0:c1])
            part = dot(np.ascontiguousarray(op.blocks[:, r0:r1, c0:c1]),
                       xs)
            acc = part if acc is None else acc + part
        outs.append(acc)
    return (jnp.concatenate(outs, axis=cat_axis) if len(outs) > 1
            else outs[0])
