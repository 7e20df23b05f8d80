"""Pytree dataclass helper.

``pytree_dataclass`` registers a frozen dataclass as a JAX pytree where fields marked
``static()`` become hashable aux data (compile-time constants) and all other fields are
array leaves. This is how static mesh/topology metadata rides alongside device arrays
through ``jit``/``shard_map`` without retracing games.
"""

from __future__ import annotations

import dataclasses

import jax


def static(**kwargs):
    """Mark a dataclass field as static pytree metadata."""
    meta = dict(kwargs.pop("metadata", {}) or {})
    meta["static"] = True
    return dataclasses.field(metadata=meta, **kwargs)


def pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    return cls
