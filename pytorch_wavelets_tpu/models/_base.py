"""Base machinery for transform config classes: leaf-free pytrees."""
from __future__ import annotations

import jax


class StaticModule:
    """Immutable config object registered as a pytree with zero leaves.

    All attributes are static (hashable) aux data; instances can therefore
    cross ``jax.jit`` boundaries either by closure or as arguments (each
    distinct config compiles once, like the reference's per-module CUDA
    graphs)."""

    _fields: tuple = ()

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)

        def flatten(m):
            return (), tuple(getattr(m, f) for f in cls._fields)

        def unflatten(aux, _):
            obj = object.__new__(cls)
            for f, v in zip(cls._fields, aux):
                object.__setattr__(obj, f, v)
            return obj

        jax.tree_util.register_pytree_node(cls, flatten, unflatten)

    def __setattr__(self, k, v):
        raise AttributeError(f"{type(self).__name__} is immutable")

    def _set(self, k, v):
        object.__setattr__(self, k, v)

    def __repr__(self):
        args = ", ".join(f"{f}={getattr(self, f)!r}" for f in self._fields
                         if not f.startswith("_"))
        return f"{type(self).__name__}({args})"

    def __eq__(self, other):
        return (type(self) is type(other) and
                all(getattr(self, f) == getattr(other, f)
                    for f in self._fields))

    def __hash__(self):
        return hash((type(self).__name__,) +
                    tuple(getattr(self, f) for f in self._fields))
