"""Tiny pytree-dataclass helper for op/chain state containers."""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta_fields: tuple[str, ...] = ()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    ``meta_fields`` are static (hashed into the treedef); everything else is a
    leaf/child. State containers (NCO phases, FIR tails, AGC envelopes, ...)
    use this so whole ``ChainState`` trees ride through jit/scan/shard_map.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = tuple(f.name for f in dataclasses.fields(c) if f.name not in meta_fields)
        jax.tree_util.register_dataclass(c, data_fields, meta_fields)
        return c

    return wrap if cls is None else wrap(cls)


def replace(obj, **kw):
    return dataclasses.replace(obj, **kw)
