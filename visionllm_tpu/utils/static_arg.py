"""Static-argument wrapper for lifted transforms.

jax.checkpoint (flax nn.remat) traces every leaf of every argument
pytree, so a plain Python tuple of ints — e.g. the deformable-attention
``spatial_shapes`` — turns into tracers inside the rematerialized body
and breaks shape-static code (``for (h, w) in spatial_shapes`` +
``reshape(B, h, w, C)``). Wrapping the value in :class:`Static` moves it
into the pytree *treedef* (``jax.tree_util.register_static``), so it
rides through remat/jit/scan boundaries untouched as compile-time data.

Usage::

    layer(x, spatial_shapes=Static(shapes), ...)   # caller
    shapes = unwrap(spatial_shapes)                # callee (accepts both)
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class Static:
    """Hashable compile-time value that pytree transforms pass through."""

    value: Any


def unwrap(x: Any) -> Any:
    return x.value if isinstance(x, Static) else x
