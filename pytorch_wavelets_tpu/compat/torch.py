"""Drop-in ``torch.nn`` wrappers around the JAX wavelet engine.

A user of the reference fbcotter/pytorch_wavelets can point their imports
at this module and keep the rest of their torch code unchanged:
constructor signatures, input/output structures (``(yl, [yh, ...])``
tuples, band ordering, orientation order), devices, and gradients all
match the reference modules (reference
pytorch_wavelets/dwt/transform2d.py:12-191, dtcwt/transform2d.py,
scatternet/layers.py).  The computation itself runs on the JAX engine —
TPU when one is attached — with torch<->JAX transfer staged through host
memory (outputs and gradients are returned on the input's torch device).

Autodiff bridging: each wrapped module routes its flattened tensor
arguments through a single :class:`torch.autograd.Function` whose forward
calls the jitted JAX model and whose backward applies the JAX VJP to the
subset of inputs torch asked gradients for (forward recomputation inside
one jitted program).  The jit caches key on the model config itself
(models are immutable value-equal pytrees), so equal-config module
instances — including fresh inline constructions in a training loop —
share one compilation.  Higher-order torch autodiff is not supported
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
from functools import partial

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
    if t.device.type == "cpu":
        try:  # zero-copy staging via the dlpack protocol. In-place
            # mutation hazards on the shared buffer are pinned by the
            # dlpack-contract tests in tests/test_torch_compat.py:
            # fwd->mutate->bwd errors via torch's version counter, and
            # outputs never alias this buffer.
            return jax.numpy.from_dlpack(t.contiguous())
        except Exception:
            pass
    return jax.numpy.asarray(np.ascontiguousarray(t.cpu().numpy()))


def _to_torch(a, device):
    if str(getattr(a, "dtype", "bfloat16")) != "bfloat16":
        try:  # zero-copy when torch can ingest the device buffer
            # directly (CPU<->CPU; fails cleanly for TPU buffers).
            # Results of a jitted execution are fresh XLA allocations
            # referenced only through this capsule, so handing them to
            # torch (including for in-place use) is safe — tested, not
            # asserted: tests/test_torch_compat.py pins output/input
            # non-aliasing (incl. the J=0 passthrough), in-place output
            # mutation isolation, and save/load round trips.
            return torch.from_dlpack(a).to(device)
        except Exception:
            pass
    a = np.asarray(a)
    if a.dtype.name == "bfloat16":  # ml_dtypes array torch can't ingest
        a = a.astype(np.float32)
    # copy: the buffer JAX hands back is read-only and may be a transfer
    # view; torch.from_numpy requires a writable owner
    return torch.from_numpy(np.array(a)).to(device)


def _is_placeholder(t):
    """The reference's marks for a skipped/absent coefficient level: a
    0-dim tensor (its own forward emits these; its inverse checks
    ``shape != torch.Size([])``, reference dtcwt/transform2d.py:225,244)
    or the documented ``torch.tensor([])`` (:206)."""
    return isinstance(t, torch.Tensor) and (
        t.ndim == 0 or tuple(t.shape) == (0,))


# Module-level jitted programs with the model as a *static* argument:
# models are immutable, value-equal, hashable config pytrees
# (models/_base.py:42-49), so every equal-config module instance hits the
# same compilation cache entry.

@partial(jax.jit, static_argnums=(0, 1))
def _jax_fwd(model, in_tree, flat_in):
    return model(tree_unflatten(in_tree, list(flat_in)))


@partial(jax.jit, static_argnums=(0, 1, 2))
def _jax_vjp(model, in_tree, needs, flat_in, flat_ct):
    """VJP w.r.t. the inputs with needs[i]=True (others are constants)."""
    def f(diff):
        it = iter(diff)
        flat = [next(it) if n else a for a, n in zip(flat_in, needs)]
        out = model(tree_unflatten(in_tree, flat))
        return tuple(tree_flatten(out)[0])

    _, vjp = jax.vjp(f, tuple(a for a, n in zip(flat_in, needs) if n))
    (grads,) = vjp(tuple(flat_ct))
    return grads


class _JaxFn(torch.autograd.Function):
    @staticmethod
    def forward(ctx, model, in_tree, out_box, *flat_in):
        ctx.model, ctx.in_tree = model, in_tree
        ctx.save_for_backward(*flat_in)
        out = _jax_fwd(model, in_tree, tuple(_to_jax(t) for t in flat_in))
        flat_out, out_tree = tree_flatten(out)
        out_box.append(out_tree)
        ctx.out_meta = [(tuple(a.shape), a.dtype) for a in flat_out]
        dev = flat_in[0].device if flat_in else torch.device("cpu")
        return tuple(_to_torch(a, dev) for a in flat_out)

    @staticmethod
    def backward(ctx, *flat_ct):
        needs = tuple(ctx.needs_input_grad[3:])
        none_grads = (None, None, None) + (None,) * len(needs)
        if not any(needs):
            return none_grads
        jin = tuple(_to_jax(t) for t in ctx.saved_tensors)
        cts = tuple(
            jax.numpy.zeros(shape, dtype) if ct is None else
            _to_jax(ct).astype(dtype)
            for ct, (shape, dtype) in zip(flat_ct, ctx.out_meta))
        jgrads = iter(_jax_vjp(ctx.model, ctx.in_tree, needs, jin, cts))
        grads = tuple(
            _to_torch(next(jgrads), t.device) if n else None
            for t, n in zip(ctx.saved_tensors, needs))
        return (None, None, None) + grads


class _WrappedModule(torch.nn.Module):
    """torch.nn.Module facade over one configured JAX model."""

    _jax_cls = None  # set by subclasses

    def __init__(self, *args, **kwargs):
        super().__init__()
        self._jax_model = self._jax_cls(*args, **kwargs)

    def forward(self, x):
        # the reference marks skipped/absent coefficient levels with
        # placeholder tensors; the native JAX API uses None — translate
        # on the way in ...
        x = jax.tree_util.tree_map(
            lambda t: None if _is_placeholder(t) else t, x)
        flat_in, in_tree = tree_flatten(x)
        bad = [type(t).__name__ for t in flat_in
               if not isinstance(t, torch.Tensor)]
        if bad:
            raise TypeError(
                f"{type(self).__name__} expects torch tensors "
                f"(got leaf types {bad}); use the native JAX API "
                "(pytorch_wavelets_tpu) for JAX arrays")
        out_box = []
        flat_out = _JaxFn.apply(self._jax_model, in_tree, out_box, *flat_in)
        out = tree_unflatten(out_box[0], list(flat_out))
        # ... and back out: None -> 0-dim placeholder, so downstream code
        # written against the reference (including its own inverse) works
        dev = flat_in[0].device if flat_in else torch.device("cpu")
        return jax.tree_util.tree_map(
            lambda v: torch.zeros((), device=dev) if v is None else v, out,
            is_leaf=lambda v: v is None)

    def extra_repr(self):
        return repr(self._jax_model)

    def _load_from_state_dict(self, state_dict, prefix, *args, **kwargs):
        # checkpoints saved from networks containing REFERENCE wavelet
        # modules carry their registered filter buffers (h0_col, g0_o,
        # ...); our filters are config-derived, so consume any keys under
        # this module's prefix instead of failing strict load_state_dict
        for k in [k for k in state_dict if k.startswith(prefix)]:
            del state_dict[k]
        super()._load_from_state_dict(state_dict, prefix, *args, **kwargs)


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
