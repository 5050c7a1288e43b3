"""Mesh construction, sharding helpers, and multi-host init for the engine."""

from .distributed import maybe_init_distributed, multihost_mesh_shape
from .mesh import (
    get_mesh,
    hierarchical_topk_merge,
    linear_rank,
    make_mesh,
    replicated,
    row_axes,
    row_sharded,
)

__all__ = [
    "get_mesh",
    "hierarchical_topk_merge",
    "linear_rank",
    "make_mesh",
    "maybe_init_distributed",
    "multihost_mesh_shape",
    "replicated",
    "row_axes",
    "row_sharded",
]
