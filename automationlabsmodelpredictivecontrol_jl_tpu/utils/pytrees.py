"""Pytree dataclass helper.

Small wrapper over ``jax.tree_util.register_dataclass`` giving us frozen
dataclasses whose array fields are pytree leaves and whose ``static``
fields (strings, ints used for shapes, callables) are part of the treedef.

This is the shared vocabulary layer of the framework (the analogue of the
reference's ``src/types/types.jl``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax


def static_field(**kwargs: Any) -> Any:
    """A dataclass field that is part of the pytree *structure* (not a leaf)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type) -> type:
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields declared with :func:`static_field` become aux data; everything
    else is a child (leaf / sub-pytree).
    """
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

    def _replace(self, **updates: Any):
        return dataclasses.replace(self, **updates)

    cls.replace = _replace
    return cls
