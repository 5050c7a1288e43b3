"""Mesh construction and sharding helpers for the TPU engine."""

from .mesh import get_mesh, make_mesh, replicated, row_sharded

__all__ = ["get_mesh", "make_mesh", "replicated", "row_sharded"]
