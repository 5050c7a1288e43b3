"""Flat (exact) vector index, sharded over the device mesh.

The TPU-native replacement for a brute-force scan: the corpus lives in HBM as
an ``(capacity, dim)`` matrix row-sharded over the mesh's ``data`` axis; a
query batch is one jit step — per-shard MXU matmul (bf16 storage, f32
accumulation), per-shard ``lax.top_k``, then an all-gather of the tiny
``(Q, k)`` candidate sets and a final merge. No gRPC hop, no host round-trip.

This index is also the recall oracle for the IVF index (SURVEY.md section 7
step 1). Capability parity target: reference
src/semcode/storage/milvus_store.py:135-148 (search) with exact instead of
approximate results.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import get_mesh, pad_bucket, round_up, row_axes
from .scan import exact_scan, exact_scan_batched, resolve_rescore_width

_NEG_INF = np.float32(-3.0e38)

# above this f32-mirror footprint the fused device rescore falls back to the
# two-level int8 residual mirror (auto mode), and above the residual budget
# to host rescoring (HBM budget guards)
DEVICE_RESCORE_MAX_BYTES = 4 << 30
RESIDUAL_RESCORE_MAX_BYTES = 6 << 30


def _storage_dtype(name: str):
    return {
        "bfloat16": jnp.bfloat16,
        "float32": jnp.float32,
        "int8": jnp.int8,
    }.get(name, jnp.bfloat16)


def quantize_rows(x: np.ndarray):
    """Symmetric per-row int8 quantization: returns (int8 values, f32 scales)."""
    scale = np.maximum(np.abs(x).max(axis=-1), 1e-12) / 127.0
    q = np.clip(np.rint(x / scale[..., None]), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def quantize_residual(x: np.ndarray, qx: np.ndarray, scales: np.ndarray):
    """Second-level int8 quantization of the reconstruction residual.

    ``r = x - qx * scale`` has |r| <= scale/2, so its own per-row scale is
    ~1/254 of the first level: the two-level reconstruction carries ~16
    bits of mantissa (per-element error <= scale/508 ~ 1e-6 relative for
    unit-norm rows) — rank-exact for the rescore stage at HALF the gather
    bytes of an f32 mirror. Returns (int8 residual, f32 residual scales).
    """
    r = x - qx.astype(np.float32) * scales[..., None]
    rs = np.maximum(np.abs(r).max(axis=-1), 1e-20) / 127.0
    rq = np.clip(np.rint(r / rs[..., None]), -127, 127).astype(np.int8)
    return rq, rs.astype(np.float32)


def split_rescore(payload):
    """Normalize a rescore payload (None | f32 mirror | (resid, rscales))
    into the (rescore, resid, rscales) operand triple scan.exact_scan takes."""
    if payload is None:
        return None, None, None
    if isinstance(payload, tuple):
        return None, payload[0], payload[1]
    return payload, None, None


def pad_allow(allow) -> np.ndarray:
    """Pad an allowed-tag list to a power-of-two bucket with -1 sentinels
    (tags are >= 0, so -1 never matches) — bounds jit recompiles to
    log2(max allow size) variants."""
    a = np.asarray(allow, dtype=np.int32).ravel()
    if a.size == 0:
        raise ValueError("allow_tags must be non-empty (empty = no results)")
    n = 8
    while n < a.size:
        n *= 2
    out = np.full((n,), -1, dtype=np.int32)
    out[: a.size] = a
    return out


class FlatIndex:
    """Exact-scan index over a row-sharded HBM matrix.

    Host-authoritative storage: a float32 numpy buffer (amortized growth)
    mirrors the device array so snapshots, growth, and IVF builds never read
    back from HBM.
    """

    kind = "flat"

    def __init__(
        self,
        dim: int,
        *,
        metric: str = "ip",
        dtype: str = "bfloat16",
        mesh: Optional[Mesh] = None,
        capacity: int = 0,
        device_rescore: Optional[bool] = None,  # None = auto by HBM budget
        approx_topk: bool = True,
        approx_recall_target: float = 0.95,
        score_dtype: str = "auto",  # auto | float32 | float16
        fetch_width: int = 0,  # 0 = auto (max(4k, 128)); rescore candidate pool
        scan_impl: str = "auto",  # auto | xla | pallas (exact-scan kernel)
        rescore_mode: str = "auto",  # auto | f32 | residual | off
        rescore_width: int = 0,  # top-W gather slice; 0 = auto, -1 = full fetch
    ):
        if metric not in ("ip", "cosine", "l2"):
            raise ValueError(f"unknown metric: {metric}")
        if score_dtype not in ("auto", "float32", "float16"):
            raise ValueError(f"unknown score_dtype: {score_dtype}")
        if scan_impl not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown scan_impl: {scan_impl}")
        if rescore_mode not in ("auto", "f32", "residual", "off"):
            raise ValueError(f"unknown rescore_mode: {rescore_mode}")
        self.dim = int(dim)
        self.metric = metric
        self.mesh = mesh if mesh is not None else get_mesh()
        self._row_axes = row_axes(self.mesh)
        sizes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        self.n_shards = int(np.prod([sizes[a] for a in self._row_axes]))
        self._dtype = _storage_dtype(dtype)
        self._device_rescore = device_rescore
        self.rescore_mode = rescore_mode
        self.approx_topk = bool(approx_topk)
        self.approx_recall_target = float(approx_recall_target)
        self.score_dtype = score_dtype
        self.fetch_width = int(fetch_width)
        self.rescore_width = int(rescore_width)
        self.scan_impl = scan_impl
        # rows must split evenly across shards AND stay lane-aligned
        import math

        self._row_multiple = math.lcm(self.n_shards * 8, 128)
        self.capacity = round_up(max(capacity, self._row_multiple), self._row_multiple)
        self.size = 0  # rows allocated (including tombstones)
        self.n_live = 0  # rows alive
        self._host = np.zeros((self.capacity, self.dim), dtype=np.float32)
        self._alive = np.zeros((self.capacity,), dtype=bool)
        # int32 row tags for device-side filtered search (0 = untagged)
        self._tags = np.zeros((self.capacity,), dtype=np.int32)
        # device state: one atomically-swapped tuple
        # (vecs, norms, valid, scales-or-None, f32-rescore-mirror-or-None,
        # tags) so lock-free readers always see a consistent set of arrays
        self._dev: Optional[tuple] = None
        self._dirty = True  # device arrays need (re)materialization

    # -- host <-> device ------------------------------------------------------

    def _vec_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(self._row_axes, None))

    def _norm_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(self._row_axes))

    def _score_dtype(self, rescore) -> str:
        """Experimental knob. fp16 is only safe when the fused f32 rescore
        re-orders the fetched candidates; measured on a v5e chip (1M x 384,
        int8 + rescore) it is QPS-neutral (71.3k vs 71.1k) because XLA fuses
        selection into the matmul epilogue without materializing the (Q, R)
        score matrix in HBM — so auto stays float32."""
        if self.score_dtype == "float16" and rescore is None:
            return "float32"  # nothing re-orders the quantized fp16 scores
        if self.score_dtype != "auto":
            return self.score_dtype
        return "float32"

    def _rescore_kind(self) -> str:
        """Fused device-rescore policy: 'f32' (exact mirror), 'residual'
        (two-level int8, int8 storage only), or 'none'.

        Explicit ``rescore_mode`` wins; otherwise the legacy tri-state
        ``device_rescore`` flag; otherwise auto by HBM budget: f32 mirror if
        it fits DEVICE_RESCORE_MAX_BYTES, else the residual mirror (1/4 the
        footprint) if IT fits — so 1M x 3072 keeps exact-grade final
        ordering on one 16 GB chip instead of dropping to raw int8 order."""
        if self._dtype == jnp.float32:
            return "none"  # storage is already exact
        if self.rescore_mode == "off":
            return "none"
        if self.rescore_mode == "f32":
            return "f32"
        if self.rescore_mode == "residual":
            # residual reconstruction needs the int8 corpus + scales
            return "residual" if self._dtype == jnp.int8 else "f32"
        if self._device_rescore is False:
            return "none"
        if self._device_rescore is True:
            return "f32"
        if self.capacity * self.dim * 4 <= DEVICE_RESCORE_MAX_BYTES:
            return "f32"
        if (
            self._dtype == jnp.int8
            and self.capacity * (self.dim + 4) <= RESIDUAL_RESCORE_MAX_BYTES
        ):
            return "residual"
        return "none"

    def _materialize(self) -> tuple:
        """Push the host buffer to (sharded) device arrays."""
        host = self._host
        scales_dev = None
        scales = None
        if self._dtype == jnp.int8:
            host, scales = quantize_rows(host)
            scales_dev = jax.device_put(scales, self._norm_sharding())
        elif self._dtype == jnp.bfloat16:
            import ml_dtypes

            host = host.astype(ml_dtypes.bfloat16)
        vecs = jax.device_put(host, self._vec_sharding())
        norms = jax.device_put(
            np.sum(self._host.astype(np.float32) ** 2, axis=1),
            self._norm_sharding(),
        )
        valid = jax.device_put(self._alive, self._norm_sharding())
        kind = self._rescore_kind()
        if kind == "f32":
            rescore = jax.device_put(self._host, self._vec_sharding())
        elif kind == "residual":
            rq, rs = quantize_residual(self._host, host, scales)
            rescore = (
                jax.device_put(rq, self._vec_sharding()),
                jax.device_put(rs, self._norm_sharding()),
            )
        else:
            rescore = None
        tags = jax.device_put(self._tags, self._norm_sharding())
        dev = (vecs, norms, valid, scales_dev, rescore, tags)
        self._dev = dev  # single atomic swap
        self._dirty = False
        return dev

    @property
    def device_rescore_active(self) -> bool:
        """True when searches already return exact-grade rescored results
        — via the f32 mirror or the two-level int8 residual — so the store
        skips its host-side rescore."""
        dev = self._dev
        if dev is not None:
            return dev[4] is not None
        return self._rescore_kind() != "none"

    def _ensure_device(self) -> tuple:
        """Reader-side snapshot. Materialization is a WRITER responsibility
        (writers call it eagerly after dirtying mutations) because it reads
        the host buffers, which only writers may touch; a stale-but-consistent
        snapshot is always safe to search."""
        dev = self._dev
        if dev is None:
            dev = self._materialize()
        return dev

    # -- mutation ---------------------------------------------------------------

    def _grow(self, min_capacity: int) -> None:
        new_cap = round_up(max(min_capacity, self.capacity * 2), self._row_multiple)
        host = np.zeros((new_cap, self.dim), dtype=np.float32)
        host[: self.size] = self._host[: self.size]
        alive = np.zeros((new_cap,), dtype=bool)
        alive[: self.size] = self._alive[: self.size]
        tags = np.zeros((new_cap,), dtype=np.int32)
        tags[: self.size] = self._tags[: self.size]
        self._host = host
        self._alive = alive
        self._tags = tags
        self.capacity = new_cap
        self._dirty = True

    def _prepare(self, x: np.ndarray) -> np.ndarray:
        x = np.ascontiguousarray(x, dtype=np.float32)
        if x.ndim != 2 or x.shape[1] != self.dim:
            raise ValueError(f"expected (n, {self.dim}) vectors, got {x.shape}")
        if self.metric == "cosine":
            norms = np.linalg.norm(x, axis=1, keepdims=True)
            x = x / np.maximum(norms, 1e-12)
        return x

    def _coerce_tags(self, tags, n: int) -> np.ndarray:
        if tags is None:
            return np.zeros((n,), dtype=np.int32)
        tags = np.asarray(tags, dtype=np.int32).ravel()
        if tags.shape[0] != n:
            raise ValueError(f"expected {n} tags, got {tags.shape[0]}")
        return tags

    def add(self, x: np.ndarray, tags=None) -> np.ndarray:
        """Append rows; returns assigned row ids. ``tags`` (optional int32
        per row, >= 0) enable device-side filtered search; None = tag 0."""
        x = self._prepare(x)
        n = x.shape[0]
        if n == 0:
            return np.zeros((0,), dtype=np.int64)
        tags = self._coerce_tags(tags, n)
        if self.size + n > self.capacity:
            self._grow(self.size + n)
        rows = np.arange(self.size, self.size + n, dtype=np.int64)
        self._host[rows] = x
        self._alive[rows] = True
        self._tags[rows] = tags
        self.size += n
        self.n_live += n
        self._write_device(rows, x, tags)
        if self._dirty:
            self._materialize()  # eager: readers never materialize dirty state
        return rows

    def gather_f32(self, rows: np.ndarray):
        """Exact f32 values for the given row ids from the host buffer.
        Returns ``(vals, ok)``; ``ok`` masks out-of-bounds ids (stale ids
        racing a compaction). Same surface as ``IVFIndex.gather_f32``."""
        rows = np.asarray(rows, dtype=np.int64)
        ok = (rows >= 0) & (rows < self._host.shape[0])
        return self._host[np.where(ok, rows, 0)], ok

    def update_rows(self, rows: np.ndarray, x: np.ndarray, tags=None) -> None:
        """Overwrite existing rows in place (upsert path)."""
        x = self._prepare(x)
        rows = np.asarray(rows, dtype=np.int64)
        tags = self._coerce_tags(tags, x.shape[0])
        self.n_live += int(np.sum(~self._alive[rows]))
        self._host[rows] = x
        self._alive[rows] = True
        self._tags[rows] = tags
        self._write_device(rows, x, tags)

    def remove(self, rows: np.ndarray) -> None:
        """Tombstone rows; they stop appearing in search results."""
        rows = np.asarray(rows, dtype=np.int64)
        rows = rows[self._alive[rows]]
        if rows.size == 0:
            return
        self._alive[rows] = False
        self.n_live -= int(rows.size)
        dev = self._dev
        if not self._dirty and dev is not None:
            valid = _clear_valid(dev[2], jnp.asarray(rows, jnp.int32))
            self._dev = (dev[0], dev[1], valid, dev[3], dev[4], dev[5])

    def _write_device(self, rows: np.ndarray, x: np.ndarray, tags) -> None:
        """Incremental scatter into the device arrays (keeps HBM warm)."""
        dev = self._dev
        if self._dirty or dev is None:
            return  # will materialize lazily before the next search
        rows_d = jnp.asarray(rows, dtype=jnp.int32)
        rescore = dev[4]
        if rescore is not None and not isinstance(rescore, tuple):
            # keep the f32 mirror in lockstep
            rescore = _scatter_mirror(rescore, rows_d, jnp.asarray(x))
        tags_dev = _scatter_tags(dev[5], rows_d, jnp.asarray(tags))
        if self._dtype == jnp.int8:
            qx, scales = quantize_rows(x)
            if isinstance(rescore, tuple):  # residual mirror in lockstep
                rq, rs = quantize_residual(x, qx, scales)
                rescore = (
                    _scatter_mirror(rescore[0], rows_d, jnp.asarray(rq)),
                    _scatter_tags(rescore[1], rows_d, jnp.asarray(rs)),
                )
            vecs, norms, valid, scl = _scatter_rows_q(
                dev[0],
                dev[1],
                dev[2],
                dev[3],
                rows_d,
                jnp.asarray(qx),
                jnp.asarray(scales),
                jnp.asarray(np.sum(x.astype(np.float32) ** 2, axis=1)),
            )
            self._dev = (vecs, norms, valid, scl, rescore, tags_dev)
        else:
            vecs, norms, valid = _scatter_rows(
                dev[0], dev[1], dev[2], rows_d, jnp.asarray(x)
            )
            self._dev = (vecs, norms, valid, dev[3], rescore, tags_dev)

    # -- search -----------------------------------------------------------------

    def _storage_name(self) -> str:
        return {jnp.int8: "int8", jnp.bfloat16: "bfloat16"}.get(
            self._dtype, "float32"
        )

    @property
    def rows_allocated(self) -> int:
        """Upper bound (exclusive) of valid row ids — INCLUDING tombstoned
        rows. The id-validity bound for scrubbing device results; ``size``
        happens to equal it here, but IVFIndex.size counts LIVE rows only,
        so callers must use this property, not ``size``."""
        return self.size

    def _approx(self) -> bool:
        """approx_max_k only pays (and only lowers natively) on TPU."""
        return self.approx_topk and jax.default_backend() == "tpu"

    def _scan_impl(self) -> str:
        """Exact-scan kernel routing. 'auto' keeps the XLA path — it never
        loses on throughput (7.5x at 384 dims large batch; ties within 2%
        at 3072 dims where XLA fuses the int8->bf16 convert into the dot;
        docs/BENCHMARKS.md dispatch-economics A/B). 'pallas' forces the
        fused top-2 kernel (ops/scan_kernel2) — same throughput at wide
        dims but ~60x faster compile (3 s vs 200+ s chained), the
        fast-warmup option; via the interpreter off-TPU."""
        if self.scan_impl != "pallas" or self.dim % 128 != 0:
            return "xla"
        return (
            "pallas" if jax.default_backend() == "tpu" else "pallas-interpret"
        )

    def _fetch_width(self, k: int, shard_rows: int, rescore) -> int:
        """Per-shard candidate width. With the fused rescore active we
        over-fetch so approx-selection/storage-precision misses are recovered
        by the exact f32 re-ranking; without it there is nothing to re-rank.
        ``fetch_width`` overrides the auto pool (recall lever: a wider pool
        recovers more int8-ranking misses at ~linear gather cost)."""
        if rescore is None:
            return min(k, shard_rows)
        if self.fetch_width > 0:
            return min(max(self.fetch_width, k), shard_rows)
        if isinstance(rescore, tuple):
            # residual tier: the SELECTION pool is nearly free now that the
            # gather is governed by rescore_width, and wide-dim int8
            # displacement (noise ~ sqrt(d)) makes a deeper pool pay in
            # recall: 400k x 3072 sweep, fetch 64 -> 96 at W=32 lifts
            # recall@10 0.9979 -> 0.9992 at equal QPS (docs/BENCHMARKS.md
            # round 4; the old 64-wide pool dated from full-pool gathers)
            return min(max(4 * k, 96), shard_rows)
        return min(max(4 * k, 128), shard_rows)

    def _rescore_width(self, k: int, rescore) -> int:
        """Top-W gather slice for the fused rescore — shared auto policy
        in scan.resolve_rescore_width (the gather only needs candidates
        exact re-ranking could promote; recall measured IDENTICAL from
        W=32 to the full pool, QPS 153k -> 199k at 1M x 384 — docs
        round 4). Auto defers to an explicitly widened fetch_width."""
        return resolve_rescore_width(
            self.rescore_width, self.fetch_width, k, rescore
        )

    def search(
        self, queries: np.ndarray, k: int = 10, allow_tags=None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k search; returns (scores f32 (Q,k), ids int64 (Q,k), -1 = empty).

        ``allow_tags``: optional sequence of allowed row tags — rows tagged
        otherwise are masked on device before selection (filtered search)."""
        q = np.ascontiguousarray(np.atleast_2d(queries), dtype=np.float32)
        if q.shape[1] != self.dim:
            raise ValueError(f"expected queries of dim {self.dim}, got {q.shape}")
        n_q = q.shape[0]
        if self.n_live == 0:
            return (
                np.full((n_q, k), _NEG_INF, dtype=np.float32),
                np.full((n_q, k), -1, dtype=np.int64),
            )
        if self.metric == "cosine":
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        dev = self._ensure_device()
        vecs, norms, valid, scales, rescore, tags = dev
        q_pad = pad_bucket(n_q)
        if q_pad != n_q:
            q = np.pad(q, ((0, q_pad - n_q), (0, 0)))
        # shapes come from the snapshot, not live attributes (lock-free reads).
        # per-shard top_k is bounded by shard rows, but the merged pool holds
        # n_shards * k_shard candidates — so k up to that is still servable.
        shard_rows = vecs.shape[0] // self.n_shards
        k_shard = min(k, shard_rows)
        k_eff = min(k, k_shard * self.n_shards)
        resc_f32, resid, rscl = split_rescore(rescore)
        scores, ids = exact_scan(
            self.mesh,
            vecs,
            norms,
            valid,
            scales if scales is not None else norms,
            resc_f32,
            jax.device_put(q, NamedSharding(self.mesh, P(None, None))),
            k_shard,
            self._fetch_width(k, shard_rows, rescore),
            self.metric,
            self._storage_name(),
            self._approx(),
            self.approx_recall_target,
            k_eff,
            self._score_dtype(rescore),
            tags if allow_tags is not None else None,
            jnp.asarray(pad_allow(allow_tags)) if allow_tags is not None else None,
            self._scan_impl(),
            resid,
            rscl,
            self._rescore_width(k, rescore),
        )
        scores = np.asarray(scores[:n_q]).astype(np.float32)
        ids = np.asarray(ids[:n_q]).astype(np.int64)
        invalid = ids >= self.size
        scores = np.where(invalid | (scores <= _NEG_INF / 2), _NEG_INF, scores)
        ids = np.where(invalid | (scores <= _NEG_INF / 2), -1, ids)
        if k_eff < k:
            scores = np.pad(scores, ((0, 0), (0, k - k_eff)), constant_values=_NEG_INF)
            ids = np.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
        return scores, ids

    def search_device(self, q_dev: jax.Array, k: int, allow_tags=None):
        """Device-to-device search: no host transfers or syncs.

        ``q_dev`` must be a replicated device array of shape (Q, dim) with Q a
        multiple of 8, already metric-normalized. Returns device arrays
        (scores, ids). Used for pipelined high-throughput serving/benchmarks
        where multiple batches are kept in flight.
        """
        vecs, norms, valid, scales, rescore, tags = self._ensure_device()
        shard_rows = vecs.shape[0] // self.n_shards
        k = min(k, shard_rows)
        resc_f32, resid, rscl = split_rescore(rescore)
        return exact_scan(
            self.mesh,
            vecs,
            norms,
            valid,
            scales if scales is not None else norms,
            resc_f32,
            q_dev,
            k,
            self._fetch_width(k, shard_rows, rescore),
            self.metric,
            self._storage_name(),
            self._approx(),
            self.approx_recall_target,
            None,
            self._score_dtype(rescore),
            tags if allow_tags is not None else None,
            jnp.asarray(pad_allow(allow_tags)) if allow_tags is not None else None,
            self._scan_impl(),
            resid,
            rscl,
            self._rescore_width(k, rescore),
        )

    def search_device_batched(self, qs_dev: jax.Array, k: int, allow_tags=None):
        """``search_device`` over B batches in ONE device dispatch.

        ``qs_dev``: (B, Q, dim) replicated, metric-normalized. Returns
        (scores (B, Q, k), ids (B, Q, k)) device arrays. Identical math to B
        ``search_device`` calls; one launch instead of B — the launch fee is
        larger than the scan itself on service-tunnel TPUs (see
        scan.exact_scan_batched), so this is the high-throughput serving
        entry point.
        """
        vecs, norms, valid, scales, rescore, tags = self._ensure_device()
        shard_rows = vecs.shape[0] // self.n_shards
        k = min(k, shard_rows)
        resc_f32, resid, rscl = split_rescore(rescore)
        return exact_scan_batched(
            self.mesh,
            vecs,
            norms,
            valid,
            scales if scales is not None else norms,
            resc_f32,
            qs_dev,
            k,
            self._fetch_width(k, shard_rows, rescore),
            self.metric,
            self._storage_name(),
            self._approx(),
            self.approx_recall_target,
            None,
            self._score_dtype(rescore),
            tags if allow_tags is not None else None,
            jnp.asarray(pad_allow(allow_tags)) if allow_tags is not None else None,
            self._scan_impl(),
            resid,
            rscl,
            self._rescore_width(k, rescore),
        )

    # -- maintenance ---------------------------------------------------------------

    def compacted(self) -> Tuple["FlatIndex", np.ndarray]:
        """Build a NEW index holding only the live rows, renumbered densely.

        Returns (new_index, remap). The store installs the new index and
        remapped row dicts in one view swap, so lock-free readers never mix
        compacted row numbering with pre-compaction maps (see
        VectorStore.compact)."""
        live = np.flatnonzero(self._alive[: self.size])
        remap = np.full(self.size, -1, dtype=np.int64)
        remap[live] = np.arange(live.size)
        new = FlatIndex(
            self.dim,
            metric=self.metric,
            dtype=self._storage_name(),
            mesh=self.mesh,
            capacity=int(live.size),
            device_rescore=self._device_rescore,
            approx_topk=self.approx_topk,
            approx_recall_target=self.approx_recall_target,
            score_dtype=self.score_dtype,
            fetch_width=self.fetch_width,
            scan_impl=self.scan_impl,
            rescore_mode=self.rescore_mode,
            rescore_width=self.rescore_width,
        )
        if live.size:
            # rows are already metric-normalized; add()'s re-normalization is
            # a no-op for unit rows
            new.add(self._host[live], tags=self._tags[live])
        return new, remap

    def compact(self) -> np.ndarray:
        """Drop tombstoned rows and renumber densely.

        Returns the remap array (old row -> new row, -1 for dropped rows) so
        callers can renumber their row-keyed maps. Materializes eagerly so
        lock-free readers never see stale row numbering."""
        live = np.flatnonzero(self._alive[: self.size])
        remap = np.full(self.size, -1, dtype=np.int64)
        remap[live] = np.arange(live.size)
        n = int(live.size)
        self._host[:n] = self._host[live]
        self._tags[:n] = self._tags[live]
        self._host[n : self.size] = 0.0
        self._tags[n : self.size] = 0
        self._alive[: self.size] = False
        self._alive[:n] = True
        self.size = n
        self.n_live = n
        self._dirty = True
        self._materialize()
        return remap

    # -- persistence ---------------------------------------------------------------

    def state_dict(self) -> dict:
        return {
            "kind": self.kind,
            "dim": self.dim,
            "metric": self.metric,
            "size": self.size,
            "vectors": self._host[: self.size].copy(),
            "alive": self._alive[: self.size].copy(),
            "tags": self._tags[: self.size].copy(),
        }

    @classmethod
    def from_state(cls, state: dict, **kwargs) -> "FlatIndex":
        idx = cls(int(state["dim"]), metric=str(state["metric"]), **kwargs)
        vecs = np.asarray(state["vectors"], dtype=np.float32)
        if vecs.size:
            # rows were normalized already if cosine; bypass _prepare's re-norm
            n = vecs.shape[0]
            if idx.size + n > idx.capacity:
                idx._grow(idx.size + n)
            idx._host[:n] = vecs
            alive = state.get("alive")
            alive = (
                np.asarray(alive, dtype=bool)
                if alive is not None
                else np.ones(n, dtype=bool)
            )
            idx._alive[:n] = alive
            tags = state.get("tags")
            if tags is not None:
                idx._tags[:n] = np.asarray(tags, dtype=np.int32)
            idx.size = n
            idx.n_live = int(alive.sum())
            idx._dirty = True
        return idx


@jax.jit
def _scatter_rows(vecs, norms, valid, rows, x):
    new_norms = jnp.sum(x.astype(jnp.float32) ** 2, axis=1)
    vecs = vecs.at[rows].set(x.astype(vecs.dtype))
    norms = norms.at[rows].set(new_norms)
    valid = valid.at[rows].set(True)
    return vecs, norms, valid


@jax.jit
def _scatter_rows_q(vecs, norms, valid, scales, rows, qx, row_scales, row_norms):
    vecs = vecs.at[rows].set(qx)
    norms = norms.at[rows].set(row_norms)
    valid = valid.at[rows].set(True)
    scales = scales.at[rows].set(row_scales)
    return vecs, norms, valid, scales


@jax.jit
def _clear_valid(valid, rows):
    return valid.at[rows].set(False)


@jax.jit
def _scatter_mirror(rescore, rows, x):
    return rescore.at[rows].set(x)


@jax.jit
def _scatter_tags(tags, rows, t):
    return tags.at[rows].set(t)
