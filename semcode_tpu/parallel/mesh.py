"""Device-mesh construction and sharding helpers.

The engine scales across chips the TPU way: a `jax.sharding.Mesh` over all
local devices, arrays annotated with `NamedSharding`, and XLA collectives
inserted automatically (the reference instead delegated scale-out to an
external Milvus server over gRPC — SURVEY.md section 2 rows 23-24).

The primary axis is ``"data"``: the vector corpus is row-sharded over it, and
per-shard top-k results are merged with an all-gather that rides ICI.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Persistent compilation cache: compiles on the TPU service cost minutes per
# distinct jit shape; cache them across processes (ingest CLI, API server,
# bench all share the same kernels).
_CACHE_DIR = os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "semcode_tpu_jax"),
)
try:  # pragma: no cover - config knobs vary across jax versions
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001 - cache is an optimization, never fatal
    pass

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = (DATA_AXIS,),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh; defaults to a 1-D mesh over every local device."""
    devs = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devs),)
    if int(np.prod(shape)) != len(devs):
        raise ValueError(
            f"mesh shape {tuple(shape)} does not match {len(devs)} devices"
        )
    arr = np.asarray(devs, dtype=object).reshape(tuple(shape))
    return Mesh(arr, axis_names)


def parse_mesh_shape(spec: str) -> Optional[Tuple[int, ...]]:
    """Parse ``"8"`` / ``"4x2"`` style mesh shape strings ('' -> None)."""
    spec = spec.strip()
    if not spec:
        return None
    return tuple(int(part) for part in spec.replace("X", "x").split("x"))


@lru_cache(maxsize=None)
def _cached_default_mesh(n_devices: int, axis_names: Tuple[str, ...]) -> Mesh:
    return make_mesh((n_devices,), axis_names)


def get_mesh(
    shape_spec: str = "", axis_names: Tuple[str, ...] = (DATA_AXIS,)
) -> Mesh:
    """The process-wide mesh used by the index engine.

    ``shape_spec`` comes from ``settings.mesh_shape``; empty means a 1-D mesh
    over all local devices (the common single-host case).
    """
    shape = parse_mesh_shape(shape_spec)
    if shape is None:
        return _cached_default_mesh(len(jax.devices()), axis_names)
    return make_mesh(shape, axis_names)


def row_sharded(mesh: Mesh, axis: str = DATA_AXIS, ndim: int = 2) -> NamedSharding:
    """Sharding for an array split along dim 0 (corpus rows / cluster lists)."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    return NamedSharding(mesh, P(*([None] * ndim)))


def round_up(value: int, multiple: int) -> int:
    if multiple <= 0:
        return value
    return ((value + multiple - 1) // multiple) * multiple


def pad_bucket(n: int, floor: int = 8) -> int:
    """Next power-of-two batch bucket (>= floor): bounds the number of
    distinct jit shapes, which matters when each compile costs minutes."""
    b = floor
    while b < n:
        b *= 2
    return b


def row_axes(mesh: Mesh) -> Tuple[str, ...]:
    """Mesh axes the corpus rows shard over.

    Single host: the 1-D ``("data",)`` mesh. Multi-host: every axis whose
    name is a row-sharding axis — convention is ``("dcn", "data")``, hosts
    outermost, so per-shard top-k results merge over ICI ("data") FIRST and
    only the tiny reduced candidate sets cross DCN. Axes named "model" are
    reserved for tensor parallelism (training) and never shard corpus rows.
    """
    return tuple(ax for ax in mesh.axis_names if ax != MODEL_AXIS)


def linear_rank(mesh: Mesh, axes: Tuple[str, ...]):
    """Global shard rank inside shard_map: row-major over ``axes``.

    Static strides come from the mesh shape, so this traces to a couple of
    scalar ops.
    """
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    rank = 0
    for ax in axes:
        rank = rank * sizes[ax] + jax.lax.axis_index(ax)
    return rank.astype("int32") if hasattr(rank, "astype") else rank


def hierarchical_topk_merge(scores, ids, k: int, axes: Tuple[str, ...]):
    """Merge per-shard (Q, k') top-k candidates across the mesh, innermost
    axis first.

    With a 2-level ``("dcn", "data")`` mesh this is the ICI-then-DCN merge:
    all-gather + reduce over the fast intra-host axis first, so each host
    sends only (Q, k) — not (Q, k * chips_per_host) — across the slow
    inter-host fabric. Runs inside shard_map; returns replicated arrays.
    """
    import jax.numpy as jnp

    for ax in reversed(axes):
        scores = jax.lax.all_gather(scores, ax, axis=1, tiled=True)
        ids = jax.lax.all_gather(ids, ax, axis=1, tiled=True)
        kk = min(k, scores.shape[1])
        scores, pos = jax.lax.top_k(scores, kk)
        ids = jnp.take_along_axis(ids, pos, axis=1)
    return scores, ids
