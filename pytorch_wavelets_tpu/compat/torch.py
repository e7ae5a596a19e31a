"""Drop-in ``torch.nn`` wrappers around the JAX wavelet engine.

A user of the reference fbcotter/pytorch_wavelets can point their imports
at this module and keep the rest of their torch code unchanged:
constructor signatures, input/output structures (``(yl, [yh, ...])``
tuples, band ordering, orientation order), and gradients all match the
reference modules (reference pytorch_wavelets/dwt/transform2d.py:12-191,
dtcwt/transform2d.py, scatternet/layers.py).  The computation itself runs
on the JAX engine — TPU when one is attached — with torch<->JAX transfer
staged through host memory.

Autodiff bridging: each wrapped module routes its flattened tensor
arguments through a single :class:`torch.autograd.Function` whose forward
calls the jitted JAX model and whose backward applies the JAX VJP
(forward recomputation inside one jitted program, compiled once per input
signature and cached).  Higher-order torch autodiff is not supported
through the bridge (one VJP level, like the reference's own custom
Functions).

dtype notes: torch bfloat16 inputs are staged through float32 on the host
(numpy has no native bfloat16); JAX bfloat16 outputs likewise return as
float32 torch tensors.  float64 inputs are computed in float32 unless JAX
x64 is enabled.

Known deviation: ``SWTForward`` returns the documented per-level
``(N, C, 4, H, W)`` stacks for any J.  The reference's own SWT instead
returns channel-interleaved ``(N, 4C, H, W)`` tensors and crashes for
J>1 (reference dwt/transform2d.py:206-211 vs its docstring) — we follow
its documented contract, not the bug.

This path exists for incremental migration and for parity testing against
the reference; the native JAX API (``pytorch_wavelets_tpu.DTCWTForward``
etc.) is the production path — use it to avoid the host staging.
"""
import numpy as np

import jax
from jax.tree_util import tree_flatten, tree_unflatten

import torch

import pytorch_wavelets_tpu as tw

__all__ = [
    "DWTForward", "DWTInverse", "DWT1DForward", "DWT1DInverse",
    "SWTForward", "SWTInverse", "DTCWTForward", "DTCWTInverse",
    "ScatLayer", "ScatLayerj2",
    "DWT", "IDWT", "DWT2D", "IDWT2D", "DWT1D", "IDWT1D",
    "DTCWT", "IDTCWT",
]


def _to_jax(t):
    t = t.detach()
    if t.dtype == torch.bfloat16:  # numpy cannot represent bf16
        t = t.to(torch.float32)
    return jax.numpy.asarray(np.ascontiguousarray(t.cpu().numpy()))


def _to_torch(a):
    a = np.asarray(a)
    if a.dtype.name == "bfloat16":  # ml_dtypes array torch can't ingest
        a = a.astype(np.float32)
    # copy: the buffer JAX hands back is read-only and may be a transfer
    # view; torch.from_numpy requires a writable owner
    return torch.from_numpy(np.array(a))


_TORCH_TO_NP = {
    torch.float32: np.float32, torch.float64: np.float64,
    torch.float16: np.float16, torch.bfloat16: np.float32,
    torch.int32: np.int32, torch.int64: np.int64,
}


class _Bridge:
    """jit-cached forward and VJP programs for one configured JAX model."""

    def __init__(self, model):
        self._model = model
        self._fwd = jax.jit(self._flat_fwd, static_argnums=0)
        self._bwd = jax.jit(self._flat_bwd, static_argnums=0)
        self._out_trees = {}

    def _flat_fwd(self, in_tree, flat_in):
        out = self._model(tree_unflatten(in_tree, list(flat_in)))
        return tuple(tree_flatten(out)[0])

    def _flat_bwd(self, in_tree, flat_in, flat_ct):
        def f(flat):
            out = self._model(tree_unflatten(in_tree, list(flat)))
            return tuple(tree_flatten(out)[0])

        _, vjp = jax.vjp(f, tuple(flat_in))
        (grads,) = vjp(tuple(flat_ct))
        return tuple(grads)

    def out_tree(self, in_tree, torch_leaves):
        """Output treedef for this input signature (abstract eval, cached)."""
        sig = tuple((tuple(t.shape), t.dtype) for t in torch_leaves)
        tree = self._out_trees.get((in_tree, sig))
        if tree is None:
            specs = tuple(
                jax.ShapeDtypeStruct(
                    tuple(t.shape),
                    jax.dtypes.canonicalize_dtype(_TORCH_TO_NP[t.dtype]))
                for t in torch_leaves)
            out = jax.eval_shape(
                lambda flat: self._model(tree_unflatten(in_tree, list(flat))),
                specs)
            tree = tree_flatten(out)[1]
            self._out_trees[(in_tree, sig)] = tree
        return tree


class _JaxFn(torch.autograd.Function):
    @staticmethod
    def forward(ctx, bridge, in_tree, *flat_in):
        ctx.bridge, ctx.in_tree = bridge, in_tree
        ctx.save_for_backward(*flat_in)
        jout = bridge._fwd(in_tree, tuple(_to_jax(t) for t in flat_in))
        ctx.out_meta = [(tuple(a.shape), a.dtype) for a in jout]
        return tuple(_to_torch(a) for a in jout)

    @staticmethod
    def backward(ctx, *flat_ct):
        jin = tuple(_to_jax(t) for t in ctx.saved_tensors)
        cts = tuple(
            jax.numpy.zeros(shape, dtype) if ct is None else
            _to_jax(ct).astype(dtype)
            for ct, (shape, dtype) in zip(flat_ct, ctx.out_meta))
        grads = ctx.bridge._bwd(ctx.in_tree, jin, cts)
        return (None, None) + tuple(_to_torch(g) for g in grads)


class _WrappedModule(torch.nn.Module):
    """torch.nn.Module facade over one configured JAX model."""

    _jax_cls = None  # set by subclasses

    def __init__(self, *args, **kwargs):
        super().__init__()
        self._jax_model = self._jax_cls(*args, **kwargs)
        self._bridge = _Bridge(self._jax_model)

    def forward(self, x):
        # the reference marks skipped/absent coefficient levels with empty
        # or 0-dim placeholder tensors (reference dtcwt/transform2d.py:225,
        # 244 checks `shape != torch.Size([])`); the native JAX API uses
        # None — translate on the way in ...
        x = jax.tree_util.tree_map(
            lambda t: None if (isinstance(t, torch.Tensor)
                               and (t.ndim == 0 or t.numel() == 0)) else t,
            x)
        flat_in, in_tree = tree_flatten(x)
        bad = [type(t).__name__ for t in flat_in
               if not isinstance(t, torch.Tensor)]
        if bad:
            raise TypeError(
                f"{type(self).__name__} expects torch tensors "
                f"(got leaf types {bad}); use the native JAX API "
                "(pytorch_wavelets_tpu) for JAX arrays")
        out_tree = self._bridge.out_tree(in_tree, flat_in)
        flat_out = _JaxFn.apply(self._bridge, in_tree, *flat_in)
        out = tree_unflatten(out_tree, list(flat_out))
        # ... and back out: None -> 0-dim placeholder, so downstream code
        # written against the reference (including its own inverse) works
        return jax.tree_util.tree_map(
            lambda v: torch.zeros(()) if v is None else v, out,
            is_leaf=lambda v: v is None)

    def extra_repr(self):
        return repr(self._jax_model)

    # torch.save / deepcopy / DataLoader-worker pickling: the bridge holds
    # jitted closures that cannot pickle — drop it and rebuild on load
    # (the underlying JAX models are immutable config pytrees, pickle-safe)
    def __getstate__(self):
        state = dict(self.__dict__)
        state.pop("_bridge")
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._bridge = _Bridge(self._jax_model)


def _wrap(jax_cls):
    cls = type(jax_cls.__name__, (_WrappedModule,), {
        "_jax_cls": jax_cls,
        "__doc__": (f"torch.nn.Module facade over "
                    f"pytorch_wavelets_tpu.{jax_cls.__name__}; same "
                    "signature/semantics as the reference module.\n\n"
                    + (jax_cls.__doc__ or "")),
    })
    return cls


DWTForward = _wrap(tw.DWTForward)
DWTInverse = _wrap(tw.DWTInverse)
DWT1DForward = _wrap(tw.DWT1DForward)
DWT1DInverse = _wrap(tw.DWT1DInverse)
SWTForward = _wrap(tw.SWTForward)
SWTInverse = _wrap(tw.SWTInverse)
DTCWTForward = _wrap(tw.DTCWTForward)
DTCWTInverse = _wrap(tw.DTCWTInverse)
ScatLayer = _wrap(tw.ScatLayer)
ScatLayerj2 = _wrap(tw.ScatLayerj2)

# Aliases matching the reference package root (reference __init__.py:27-36)
DWT = DWTForward
IDWT = DWTInverse
DWT2D = DWT
IDWT2D = IDWT
DWT1D = DWT1DForward
IDWT1D = DWT1DInverse
DTCWT = DTCWTForward
IDTCWT = DTCWTInverse
