"""Sharded multilevel transforms.

Two complementary strategies (SURVEY.md §2.9):

* **Explicit shard_map path** (`sharded_dwt2d` / `sharded_idwt2d`,
  periodization mode): the image W axis is tiled over the 'spatial' mesh
  axis and each level exchanges exactly the filter-support halo columns via
  ring ppermute, then runs the local dense conv.  This is the
  hand-scheduled, production path — communication is L-1 columns per level
  over ICI, nothing else.

* **GSPMD path** (`sharded_dtcwt2d`, `sharded_scat_j2`, and any other mode):
  jit with NamedSharding constraints; XLA's SPMD partitioner inserts the
  halo exchanges automatically.  Because the kernels are gather-free
  (pad = slice+concat), the partitioner produces clean collective-permutes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from pytorch_wavelets_tpu.ops.afb_sfb import _conv_axis
from pytorch_wavelets_tpu.parallel.halo import halo_exchange_1d
from pytorch_wavelets_tpu.transforms.dwt import dec_filters, rec_filters
from pytorch_wavelets_tpu.transforms.dtcwt_xfm import dtcwt2d
from pytorch_wavelets_tpu.transforms.scatternet import scat_layer_j2

__all__ = ["sharded_dwt2d", "sharded_idwt2d", "sharded_swt2d",
           "sharded_iswt2d", "sharded_dtcwt2d", "sharded_scat_j2"]


# --------------------------------------------------------------------------
# Explicit halo-exchange DWT (periodization mode)
# --------------------------------------------------------------------------

def _afb1d_per_sharded(x, kernels, axis, axis_name):
    """Local periodization analysis step with ring halo exchange.

    Equivalent to the single-device circular pad (front L-1-L2, back L2-1)
    in ops.afb_sfb._afb1d_corr, but the pad columns come from the mesh
    neighbours."""
    L = kernels.shape[1]
    L2 = L // 2
    xp = halo_exchange_1d(x, axis, axis_name, L - 1 - L2, max(L2 - 1, 0),
                          boundary="wrap")
    return _conv_axis(xp, kernels, axis, stride=2)


def _afb1d_per_local(x, kernels, axis):
    from pytorch_wavelets_tpu.ops.pad import pad1d
    if x.shape[axis] % 2 == 1:
        # periodization repeats the last sample to even the axis
        # (reference dwt/lowlevel.py:138-140)
        last = lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis],
                                axis=axis)
        x = jnp.concatenate([x, last], axis=axis)
    L = kernels.shape[1]
    L2 = L // 2
    xp = pad1d(x, L - 1 - L2, max(L2 - 1, 0), axis, "periodic")
    return _conv_axis(xp, kernels, axis, stride=2)


def _sfb1d_per_sharded(lo, hi, g0, g1, axis, axis_name):
    """Local periodization synthesis step with halo exchange.

    Derivation: the single-device path is transpose-conv + wrap-add +
    roll(1 - L/2); circularly this is y[m] = sum_k grev[k] u[(m+k-L2) mod N]
    with u the zero-interleaved upsampling of the coefficients.  Per tile
    that needs ceil(L2/2) left / L2//2 right coefficient halos."""
    L = len(g0)
    L2 = L // 2
    hl, hr = (L2 + 1) // 2, L2 // 2
    k = np.stack([np.asarray(g0)[::-1], np.asarray(g1)[::-1]])
    lo_h = halo_exchange_1d(lo, axis, axis_name, hl, hr, boundary="wrap")
    hi_h = halo_exchange_1d(hi, axis, axis_name, hl, hr, boundary="wrap")
    Wl = lo.shape[axis]
    # upsample x2 (zeros interleaved), keeping a static shape
    def up2(z):
        shape = list(z.shape)
        zs = jnp.stack([z, jnp.zeros_like(z)], axis=axis + 1)
        shape[axis] = shape[axis] * 2
        return zs.reshape(shape)

    u_lo, u_hi = up2(lo_h), up2(hi_h)
    start = 2 * hl - L2
    length = 2 * Wl + L - 1
    u_lo = lax.slice_in_dim(u_lo, start, start + length, axis=axis)
    u_hi = lax.slice_in_dim(u_hi, start, start + length, axis=axis)
    y = (_conv_axis(u_lo, k[0:1], axis) + _conv_axis(u_hi, k[1:2], axis))
    return y[:, :, 0]


def _sfb1d_per_local(lo, hi, g0, g1, axis):
    from pytorch_wavelets_tpu.ops.afb_sfb import _sfb1d_conv
    return _sfb1d_conv(lo, hi, np.asarray(g0), np.asarray(g1),
                       "periodization", axis)


def sharded_dwt2d(x, mesh, wave="db4", J=3):
    """J-level periodization-mode 2-D DWT with N sharded over 'data' and W
    sharded over 'spatial'; per-level ring halo exchange along W.

    Returns the same (yl, yh) pyramid as transforms.dwt.dwt2d.  Requires
    W / n_spatial divisible by 2**J."""
    h0c, h1c, h0r, h1r = dec_filters(wave)
    rh = np.stack([np.asarray(h0r)[::-1], np.asarray(h1r)[::-1]])
    rc = np.stack([np.asarray(h0c)[::-1], np.asarray(h1c)[::-1]])
    n_sp = mesh.shape["spatial"]
    if x.shape[-1] % (n_sp * 2 ** J):
        raise ValueError("W must divide evenly across spatial shards for "
                         f"J={J}")

    def local(xl):
        yh = []
        ll = xl
        for _ in range(J):
            N, C = ll.shape[:2]
            lohi = _afb1d_per_sharded(ll, rh, 3, "spatial")
            lohi = lohi.reshape(N, C * 2, *lohi.shape[3:])
            y = _afb1d_per_local(lohi, rc, 2)
            y = y.reshape(N, C, 2, 2, *y.shape[3:])
            y = y.reshape(N, C, 4, *y.shape[4:])
            ll = y[:, :, 0]
            yh.append(y[:, :, 1:])
        return ll, yh

    spec_in = P("data", None, None, "spatial")
    spec_out = (P("data", None, None, "spatial"),
                [P("data", None, None, None, "spatial")] * J)
    fn = shard_map(local, mesh=mesh, in_specs=(spec_in,),
                   out_specs=spec_out)
    return fn(x)


def sharded_idwt2d(coeffs, mesh, wave="db4"):
    """Inverse of :func:`sharded_dwt2d` (periodization mode)."""
    g0c, g1c, g0r, g1r = rec_filters(wave)
    yl, yh = coeffs
    J = len(yh)

    def local(ll, highs):
        for h in highs[::-1]:
            # odd-H pyramids: the synthesized lowpass is one replicated
            # row longer than the next level's bands — crop to match
            ll = ll[:, :, :h.shape[-2]]
            lo = _sfb1d_per_local(ll, h[:, :, 0], g0c, g1c, 2)
            hi = _sfb1d_per_local(h[:, :, 1], h[:, :, 2], g0c, g1c, 2)
            ll = _sfb1d_per_sharded(lo, hi, g0r, g1r, 3, "spatial")
        return ll

    spec_l = P("data", None, None, "spatial")
    spec_h = [P("data", None, None, None, "spatial")] * J
    fn = shard_map(local, mesh=mesh, in_specs=(spec_l, spec_h),
                   out_specs=spec_l)
    return fn(yl, yh)


# --------------------------------------------------------------------------
# GSPMD-partitioned paths (any transform / mode)
# --------------------------------------------------------------------------

def sharded_dtcwt2d(x, mesh, filters, J=3, mode="symmetric"):
    """DTCWT forward with batch sharded over 'data' and W over 'spatial';
    XLA's SPMD partitioner inserts the halo exchanges."""
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None,
                                                 "spatial")))

    @partial(jax.jit,
             out_shardings=None)
    def run(z):
        return dtcwt2d(z, filters, J=J, mode=mode)

    return run(xs)


def sharded_scat_j2(x, mesh, filters, mode="symmetric", magbias=1e-2):
    """Second-order scatternet, batch-DP over 'data', W over 'spatial'."""
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None,
                                                 "spatial")))

    @jax.jit
    def run(z):
        return scat_layer_j2(z, filters, mode=mode, magbias=magbias)

    return run(xs)


# --------------------------------------------------------------------------
# Explicit halo-exchange SWT (undecimated; wrap modes)
# --------------------------------------------------------------------------

def _afb1d_atrous_sharded(x, kernels, axis, axis_name, dilation):
    """Undecimated analysis step; the a-trous pad (L2-d, L2) comes from the
    ring neighbours (cf. ops.afb_sfb._afb1d_atrous_corr_conv)."""
    L = kernels.shape[1]
    L2 = (L * dilation) // 2
    xp = halo_exchange_1d(x, axis, axis_name, L2 - dilation, L2,
                          boundary="wrap")
    return _conv_axis(xp, kernels, axis, rhs_dilation=dilation)


def _afb1d_atrous_local(x, kernels, axis, dilation):
    from pytorch_wavelets_tpu.ops.pad import pad1d
    L = kernels.shape[1]
    L2 = (L * dilation) // 2
    xp = pad1d(x, L2 - dilation, L2, axis, "periodic")
    return _conv_axis(xp, kernels, axis, rhs_dilation=dilation)


def _sfb1d_atrous_sharded(lo, hi, g0, g1, axis, axis_name, dilation):
    """Undecimated synthesis step with ring halos (cf.
    ops.afb_sfb._sfb1d_atrous_conv_conv)."""
    L = len(g0)
    Ld = L * dilation
    L2 = Ld // 2
    k = np.stack([np.asarray(g0)[::-1], np.asarray(g1)[::-1]])
    front, back = L2, Ld - dilation - L2
    lo_h = halo_exchange_1d(lo, axis, axis_name, front, back,
                            boundary="wrap")
    hi_h = halo_exchange_1d(hi, axis, axis_name, front, back,
                            boundary="wrap")
    y = (_conv_axis(lo_h, k[0:1], axis, rhs_dilation=dilation) +
         _conv_axis(hi_h, k[1:2], axis, rhs_dilation=dilation))
    return 0.5 * y[:, :, 0]


def _sfb1d_atrous_local(lo, hi, g0, g1, axis, dilation):
    from pytorch_wavelets_tpu.ops.afb_sfb import _sfb1d_atrous_conv_conv
    return _sfb1d_atrous_conv_conv(lo, hi, np.asarray(g0), np.asarray(g1),
                                   "periodic", axis, dilation)


def sharded_swt2d(x, mesh, wave="db2", J=2):
    """J-level undecimated (SWT) 2-D transform, N over 'data', W over
    'spatial', with per-level dilated ring halo exchange along W.

    Returns the same list of (N, C, 4, H, W) coefficient arrays as
    transforms.dwt.swt2d (periodization mode).  Per-level communication is
    the dilated filter support: (L-1)*2^j columns."""
    h0c, h1c, h0r, h1r = dec_filters(wave)
    rh = np.stack([np.asarray(h0r)[::-1], np.asarray(h1r)[::-1]])
    rc = np.stack([np.asarray(h0c)[::-1], np.asarray(h1c)[::-1]])

    def local(xl):
        out = []
        ll = xl
        for j in range(J):
            d = 2 ** j
            N, C = ll.shape[:2]
            lohi = _afb1d_atrous_sharded(ll, rh, 3, "spatial", d)
            lohi = lohi.reshape(N, C * 2, *lohi.shape[3:])
            y = _afb1d_atrous_local(lohi, rc, 2, d)
            y = y.reshape(N, C, 2, 2, *y.shape[3:])
            y = y.reshape(N, C, 4, *y.shape[4:])
            ll = y[:, :, 0]
            out.append(y)
        return out

    spec_in = P("data", None, None, "spatial")
    spec_out = [P("data", None, None, None, "spatial")] * J
    fn = shard_map(local, mesh=mesh, in_specs=(spec_in,),
                   out_specs=spec_out)
    return fn(x)


def sharded_iswt2d(coeffs, mesh, wave="db2"):
    """Inverse of :func:`sharded_swt2d`."""
    g0c, g1c, g0r, g1r = rec_filters(wave)
    J = len(coeffs)

    def local(cs):
        ll = cs[-1][:, :, 0]
        for j in range(J - 1, -1, -1):
            d = 2 ** j
            c = cs[j]
            lh, hl, hh = c[:, :, 1], c[:, :, 2], c[:, :, 3]
            lo = _sfb1d_atrous_local(ll, lh, g0c, g1c, 2, d)
            hi = _sfb1d_atrous_local(hl, hh, g0c, g1c, 2, d)
            ll = _sfb1d_atrous_sharded(lo, hi, g0r, g1r, 3, "spatial", d)
        return ll

    spec = [P("data", None, None, None, "spatial")] * J
    fn = shard_map(local, mesh=mesh, in_specs=(spec,),
                   out_specs=P("data", None, None, "spatial"))
    return fn(list(coeffs))
