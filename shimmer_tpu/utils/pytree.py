"""Pytree dataclass helper.

Every record type that flows through jitted code (rays, interactions, spectra
bundles, film state, ...) is a frozen dataclass registered as a JAX pytree via
``jax.tree_util.register_dataclass``.  Fields are data leaves by default;
static (hashable, shape-determining) fields are marked with ``static_field()``.

This replaces the reference's Rust structs/enums (e.g. ``Ray`` at
/root/reference/src/ray.rs:53-99) with batched struct-of-arrays records: every
field holds an array with leading batch dims instead of a scalar, so one
record describes a whole wavefront of rays.
"""

from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

_T = TypeVar("_T")


def static_field(**kwargs):
    """A dataclass field treated as static metadata (not traced) under jit."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type[_T]) -> type[_T]:
    """Decorator: frozen dataclass registered as a JAX pytree node."""
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


def replace(obj: _T, **changes) -> _T:
    """``dataclasses.replace`` re-export for pytree dataclasses."""
    return dataclasses.replace(obj, **changes)
