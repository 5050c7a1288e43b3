"""IVF_FLAT-equivalent ANN index on TPU.

The reference delegates ANN entirely to an external Milvus server (IVF_FLAT,
metric IP, nlist=128, nprobe=16 — reference src/semcode/storage/milvus_store.py
:76-85,:141-147). Here the whole thing is in-process and TPU-resident:

- **Build**: k-means coarse quantizer trained on device (`ops.kmeans_fit`),
  then vectors are laid out in capacity-padded cluster blocks
  ``data[nlist, cmax, dim]`` so every shape is static for XLA.
- **Sharding**: cluster lists are row-sharded over the mesh ``data`` axis;
  centroids are replicated. Each query probes ``nprobe`` clusters; every shard
  scans the probed clusters it owns and contributes a local top-k, and the
  tiny ``(Q, k)`` candidate sets are all-gathered and merged — collectives
  ride ICI, no host round-trip.
- **Scan**: one jit step — centroid scores (MXU), per-query probe selection,
  a `lax.scan` over probe slots with gathered cluster blocks (bf16 storage,
  f32 accumulation) and a running top-k merge.
- **Streaming inserts**: coarse assignment on device, scatter into free
  cluster slots; layout rebuilds (cluster overflow / retrain) are amortized.

Tombstones (``ids == -1``) support upsert-by-id from the store layer.
"""

from __future__ import annotations

from functools import partial
import collections
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..logger import get_logger
from ..ops.kmeans import balanced_assign, kmeans_fit, topm_clusters
from ..parallel.mesh import (
    get_mesh,
    hierarchical_topk_merge,
    linear_rank,
    pad_bucket,
    round_up,
    row_axes,
)
from .flat import DEVICE_RESCORE_MAX_BYTES, pad_allow, quantize_rows
from .scan import exact_scan, rescore_global

log = get_logger("index.ivf")


# One atomically-swapped device snapshot (lock-free readers).
#
# The padded cluster layout (data/ids/sqnorms/scales/centroids) serves the
# probing path; the flat row-major mirror (fvecs/fvalid/fnorms/fscales,
# position == global row id) serves the exact path — it reads 1/fill times
# fewer bytes than scanning the padded layout, and frescore (f32) feeds the
# fused exact re-ranking in scan.exact_scan. Fields:
#   data       (nlist, cmax, d) storage dtype
#   ids        (nlist, cmax) int32 row ids, -1 = empty/tombstone
#   sqnorms    (nlist, cmax) f32
#   scales     (nlist, cmax) f32 or None (int8 only)
#   centroids  (nlist, d) f32 replicated
#   fvecs      (R, d) storage dtype flat mirror
#   fvalid     (R,) bool
#   fnorms     (R,) f32
#   fscales    (R,) f32 (int8) or placeholder
#   frescore   (R, d) f32 or None
#   ftags      (R,) int32 row tags (device-side filtered search)
#
# A plain collections.namedtuple, NOT typing.NamedTuple: annotation-carrying
# NamedTuples break under typeguard's instrumentation (the generated __new__
# lives in the namedtuple factory namespace, where no annotation name —
# not even builtins under thread races — can be resolved).
_Dev = collections.namedtuple(
    "_Dev",
    [
        "data", "ids", "sqnorms", "scales", "centroids",
        "fvecs", "fvalid", "fnorms", "fscales", "frescore", "ftags",
    ],
)

_NEG_INF = np.float32(-3.0e38)


def _storage_dtype(name: str):
    return {
        "bfloat16": jnp.bfloat16,
        "float32": jnp.float32,
        "int8": jnp.int8,
    }.get(name, jnp.bfloat16)


class IVFIndex:
    """Inverted-file index with capacity-padded cluster blocks on TPU."""

    kind = "ivf"

    def __init__(
        self,
        dim: int,
        *,
        nlist: int = 128,
        nprobe: int = 16,
        metric: str = "ip",
        dtype: str = "bfloat16",
        mesh: Optional[Mesh] = None,
        kmeans_iters: int = 12,
        seed: int = 0,
        use_pallas: str = "auto",  # auto | always | never
        balance_cap: float = 2.0,  # cluster capacity cap, x mean occupancy
        approx_topk: bool = True,  # lax.approx_max_k in full scans (TPU-fast)
        approx_recall_target: float = 0.95,  # per-shard approx_max_k target
        device_rescore: Optional[bool] = None,  # None = auto by HBM budget
        score_dtype: str = "auto",  # auto | float32 | float16 (exact path)
    ):
        if metric not in ("ip", "cosine", "l2"):
            raise ValueError(f"unknown metric: {metric}")
        if score_dtype not in ("auto", "float32", "float16"):
            raise ValueError(f"unknown score_dtype: {score_dtype}")
        self.dim = int(dim)
        self.metric = metric
        self.mesh = mesh if mesh is not None else get_mesh()
        self._row_axes = row_axes(self.mesh)
        _sizes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        self.n_shards = int(np.prod([_sizes[a] for a in self._row_axes]))
        self.nlist = round_up(int(nlist), self.n_shards)
        self.nprobe = min(int(nprobe), self.nlist)
        self.kmeans_iters = kmeans_iters
        self.seed = seed
        self.use_pallas = use_pallas
        self.balance_cap = float(balance_cap)
        self.approx_topk = bool(approx_topk)
        self.approx_recall_target = float(approx_recall_target)
        self._dtype = _storage_dtype(dtype)
        self.device_rescore = device_rescore
        self.score_dtype = score_dtype
        import math

        self._row_multiple = math.lcm(self.n_shards * 8, 128)
        self._mirror_cap = 0  # flat-mirror rows currently materialized

        # host-authoritative storage
        self._host = np.zeros((0, self.dim), dtype=np.float32)
        self.size = 0  # live rows (excluding tombstones)
        self._n_rows = 0  # total rows ever added (= len of host buffer used)
        self._assign = np.zeros((0,), dtype=np.int32)
        self._loc = np.zeros((0, 2), dtype=np.int32)  # row -> (cluster, slot)
        self._alive = np.zeros((0,), dtype=bool)
        # int32 row tags for device-side filtered search (0 = untagged)
        self._tags = np.zeros((0,), dtype=np.int32)
        self.centroids: Optional[np.ndarray] = None  # (nlist, dim) f32
        self._counts = np.zeros((self.nlist,), dtype=np.int32)  # slots used
        self.cmax = 0

        # device state: one atomically-swapped _Dev snapshot so lock-free
        # readers always see a consistent set of arrays
        self._dev: Optional[_Dev] = None
        self._dirty = True

    # -- helpers ---------------------------------------------------------------

    @property
    def is_trained(self) -> bool:
        return self.centroids is not None

    def _prepare(self, x: np.ndarray) -> np.ndarray:
        x = np.ascontiguousarray(x, dtype=np.float32)
        if x.ndim != 2 or x.shape[1] != self.dim:
            raise ValueError(f"expected (n, {self.dim}) vectors, got {x.shape}")
        if self.metric == "cosine":
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return x

    def _append_host(self, x: np.ndarray, tags: np.ndarray) -> np.ndarray:
        n = x.shape[0]
        rows = np.arange(self._n_rows, self._n_rows + n, dtype=np.int64)
        self._host = np.concatenate([self._host, x], axis=0)
        self._tags = np.concatenate([self._tags, tags])
        self._assign = np.concatenate(
            [self._assign, np.full(n, -1, dtype=np.int32)]
        )
        self._loc = np.concatenate(
            [self._loc, np.full((n, 2), -1, dtype=np.int32)], axis=0
        )
        self._alive = np.concatenate([self._alive, np.ones(n, dtype=bool)])
        self._n_rows += n
        self.size += n
        return rows

    # -- build -------------------------------------------------------------------

    def train(self, x: Optional[np.ndarray] = None) -> None:
        """Train the coarse quantizer (on provided sample or current rows)."""
        sample = self._prepare(x) if x is not None else self._host[self._alive]
        if sample.shape[0] == 0:
            raise ValueError("cannot train IVF on an empty corpus")
        self.centroids, _ = kmeans_fit(
            sample, self.nlist, iters=self.kmeans_iters, seed=self.seed
        )

    def add(self, x: np.ndarray, tags=None) -> np.ndarray:
        """Append rows; trains the quantizer on first call. Returns row ids.
        ``tags`` (optional int32 per row, >= 0) enable device-side filtered
        search on the exact path; None = tag 0."""
        x = self._prepare(x)
        if x.shape[0] == 0:
            return np.zeros((0,), dtype=np.int64)
        if tags is None:
            tags = np.zeros((x.shape[0],), dtype=np.int32)
        else:
            tags = np.asarray(tags, dtype=np.int32).ravel()
            if tags.shape[0] != x.shape[0]:
                raise ValueError(
                    f"expected {x.shape[0]} tags, got {tags.shape[0]}"
                )
        rows = self._append_host(x, tags)
        if not self.is_trained:
            self.train()
            self._rebuild_layout()
            self._materialize()
            return rows
        if self.cmax == 0:
            self._rebuild_layout()
            self._materialize()
            return rows
        # streaming placement: nearest candidate cluster with a free slot
        cands = topm_clusters(x, self.centroids, m=4)
        assign = np.empty(len(rows), dtype=np.int32)
        counts = self._counts.copy()
        overflow = False
        for i, row_cands in enumerate(cands):
            for c in row_cands:
                if counts[c] < self.cmax:
                    assign[i] = c
                    counts[c] += 1
                    break
            else:
                overflow = True
                break
        if overflow:
            self._rebuild_layout()
        else:
            self._place_rows(rows, assign)
        if self._dirty:
            self._materialize()  # eager: readers never materialize dirty state
        return rows

    def remove(self, rows: np.ndarray) -> None:
        """Tombstone rows (device slots masked via ids == -1)."""
        rows = np.asarray(rows, dtype=np.int64)
        rows = rows[self._alive[rows]]
        if rows.size == 0:
            return
        self._alive[rows] = False
        self.size -= int(rows.size)
        locs = self._loc[rows]
        placed = locs[:, 0] >= 0
        dev = self._dev
        if not self._dirty and dev is not None:
            new = dev
            if placed.any():
                c = jnp.asarray(locs[placed, 0])
                s = jnp.asarray(locs[placed, 1])
                new = new._replace(ids=_tombstone(new.ids, c, s))
            new = new._replace(
                fvalid=_clear_mirror_valid(
                    new.fvalid, jnp.asarray(rows, jnp.int32)
                )
            )
            self._dev = new

    def _place_rows(self, rows: np.ndarray, assign: np.ndarray) -> None:
        """Assign slots for new rows and scatter them into the device layout."""
        # vectorized slot assignment: rows headed to the same cluster take
        # consecutive slots starting at the cluster's current count
        order = np.argsort(assign, kind="stable")
        sorted_assign = assign[order]
        group_start = np.zeros(len(order), dtype=np.int64)
        new_group = np.flatnonzero(np.diff(sorted_assign)) + 1
        group_start[new_group] = new_group
        np.maximum.accumulate(group_start, out=group_start)
        rank_in_group = np.arange(len(order), dtype=np.int64) - group_start
        slots = np.empty(len(assign), dtype=self._counts.dtype)
        slots[order] = self._counts[sorted_assign] + rank_in_group
        np.add.at(self._counts, assign, 1)
        self._assign[rows] = assign
        self._loc[rows, 0] = assign
        self._loc[rows, 1] = slots
        dev = self._dev
        if self._dirty or dev is None:
            return
        if int(rows.max()) >= self._mirror_cap:
            # flat mirror is out of headroom: fall back to a full rebuild
            self._dirty = True
            return
        x = self._host[rows]
        rows_d = jnp.asarray(rows, dtype=jnp.int32)
        norms_d = jnp.asarray(np.sum(x.astype(np.float32) ** 2, axis=1))
        ftags = _scatter_mirror_tags(
            dev.ftags, rows_d, jnp.asarray(self._tags[rows])
        )
        frescore = dev.frescore
        if frescore is not None:
            frescore = _scatter_mirror_rows(frescore, rows_d, jnp.asarray(x))
        if self._dtype == jnp.int8:
            qx, scales = quantize_rows(x)
            data, ids, sqnorms, scl = _scatter_slots_q(
                dev.data,
                dev.ids,
                dev.sqnorms,
                dev.scales,
                jnp.asarray(assign),
                jnp.asarray(slots),
                jnp.asarray(qx),
                jnp.asarray(scales),
                norms_d,
                rows_d,
            )
            fvecs, fvalid, fnorms, fscales = _scatter_flat_q(
                dev.fvecs, dev.fvalid, dev.fnorms, dev.fscales,
                rows_d, jnp.asarray(qx), jnp.asarray(scales), norms_d,
            )
            self._dev = dev._replace(
                data=data, ids=ids, sqnorms=sqnorms, scales=scl,
                fvecs=fvecs, fvalid=fvalid, fnorms=fnorms, fscales=fscales,
                frescore=frescore, ftags=ftags,
            )
        else:
            data, ids, sqnorms = _scatter_slots(
                dev.data,
                dev.ids,
                dev.sqnorms,
                jnp.asarray(assign),
                jnp.asarray(slots),
                jnp.asarray(x),
                rows_d,
            )
            fvecs, fvalid, fnorms = _scatter_flat(
                dev.fvecs, dev.fvalid, dev.fnorms, rows_d,
                jnp.asarray(x), norms_d,
            )
            self._dev = dev._replace(
                data=data, ids=ids, sqnorms=sqnorms,
                fvecs=fvecs, fvalid=fvalid, fnorms=fnorms, frescore=frescore,
                ftags=ftags,
            )

    def _rebuild_layout(self) -> None:
        """Re-pack live rows into capacity-padded cluster blocks (host side).

        Assignment is capacity-balanced: clusters are capped near the mean
        occupancy and excess points spill to their next-nearest cluster, so
        the padded layout stays dense (bounded cmax = bounded scan HBM
        traffic) even on skewed corpora.
        """
        live = np.flatnonzero(self._alive)
        x = self._host[live]
        mean = max(1.0, live.size / self.nlist)
        cap = max(8, int(np.ceil(mean * self.balance_cap)))
        # m=8 spill candidates: enough fallthrough that the cap actually holds
        # on skewed corpora (fill stays high -> exact scans stay cheap)
        cands = topm_clusters(x, self.centroids, m=min(8, self.nlist))
        assign = balanced_assign(cands, self.nlist, cap)
        self._assign[live] = assign
        counts = np.bincount(assign, minlength=self.nlist).astype(np.int32)
        # headroom so streaming inserts don't immediately re-trigger a rebuild;
        # the pallas scan kernel needs lane-aligned (128) cluster blocks
        slot_align = 128 if self._pallas_eligible() else 8
        self.cmax = max(
            slot_align, round_up(int(counts.max() * 1.1) + 8, slot_align)
        )
        order = np.argsort(assign, kind="stable")
        sorted_rows = live[order]
        sorted_assign = assign[order]
        starts = np.zeros(self.nlist + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        slots = np.arange(len(order), dtype=np.int64) - starts[sorted_assign]
        self._loc[sorted_rows, 0] = sorted_assign
        self._loc[sorted_rows, 1] = slots.astype(np.int32)
        self._counts = counts
        self._dirty = True
        log.info(
            "ivf_layout_rebuilt",
            nlist=self.nlist,
            cmax=self.cmax,
            rows=int(live.size),
            fill=float(live.size / max(self.nlist * self.cmax, 1)),
        )

    def _materialize(self) -> tuple:
        """Push the packed layout to sharded device arrays.

        Fills the padded host staging buffer directly in the storage dtype,
        streaming rows in batches — a full-f32 staging copy of the padded
        layout would spike host RAM ~4x at 3072-d/1M scale.
        """
        live = np.flatnonzero(self._alive)
        if self._dtype == jnp.int8:
            np_dtype = np.int8
        elif self._dtype == jnp.bfloat16:
            import ml_dtypes

            np_dtype = ml_dtypes.bfloat16
        else:
            np_dtype = np.float32
        data = np.zeros((self.nlist, self.cmax, self.dim), dtype=np_dtype)
        ids = np.full((self.nlist, self.cmax), -1, dtype=np.int32)
        sqnorms = np.zeros((self.nlist, self.cmax), dtype=np.float32)
        scales = (
            np.zeros((self.nlist, self.cmax), dtype=np.float32)
            if self._dtype == jnp.int8
            else None
        )
        step = 200_000
        for lo in range(0, live.size, step):
            rows = live[lo : lo + step]
            vals = self._host[rows]
            c, s = self._loc[rows, 0], self._loc[rows, 1]
            ids[c, s] = rows.astype(np.int32)
            sqnorms[c, s] = np.sum(vals.astype(np.float32) ** 2, axis=1)
            if scales is not None:
                qvals, qscales = quantize_rows(vals)
                data[c, s] = qvals
                scales[c, s] = qscales
            else:
                data[c, s] = vals.astype(np_dtype)
        # ---- flat row-major mirror (exact path; position == row id) --------
        mcap = round_up(
            self._n_rows + max(1024, self._n_rows // 8), self._row_multiple
        )
        fvecs = np.zeros((mcap, self.dim), dtype=np_dtype)
        fvalid = np.zeros((mcap,), dtype=bool)
        fnorms = np.zeros((mcap,), dtype=np.float32)
        fscales = np.zeros((mcap,), dtype=np.float32)
        want_rescore = self._rescore_enabled(mcap)
        frescore = (
            np.zeros((mcap, self.dim), dtype=np.float32) if want_rescore else None
        )
        for lo in range(0, self._n_rows, step):
            hi = min(lo + step, self._n_rows)
            vals = self._host[lo:hi]
            fnorms[lo:hi] = np.sum(vals.astype(np.float32) ** 2, axis=1)
            if self._dtype == jnp.int8:
                qvals, qscales = quantize_rows(vals)
                fvecs[lo:hi] = qvals
                fscales[lo:hi] = qscales
            else:
                fvecs[lo:hi] = vals.astype(np_dtype)
            if frescore is not None:
                frescore[lo:hi] = vals
        fvalid[: self._n_rows] = self._alive
        ftags = np.zeros((mcap,), dtype=np.int32)
        ftags[: self._n_rows] = self._tags
        self._mirror_cap = mcap

        axes = self._row_axes
        shard3 = NamedSharding(self.mesh, P(axes, None, None))
        shard2 = NamedSharding(self.mesh, P(axes, None))
        rshard2 = NamedSharding(self.mesh, P(axes, None))
        rshard1 = NamedSharding(self.mesh, P(axes))
        dev = _Dev(
            data=jax.device_put(data, shard3),
            ids=jax.device_put(ids, shard2),
            sqnorms=jax.device_put(sqnorms, shard2),
            scales=jax.device_put(scales, shard2) if scales is not None else None,
            centroids=jax.device_put(
                np.ascontiguousarray(self.centroids, dtype=np.float32),
                NamedSharding(self.mesh, P(None, None)),
            ),
            fvecs=jax.device_put(fvecs, rshard2),
            fvalid=jax.device_put(fvalid, rshard1),
            fnorms=jax.device_put(fnorms, rshard1),
            fscales=jax.device_put(fscales, rshard1),
            frescore=(
                jax.device_put(frescore, rshard2) if frescore is not None else None
            ),
            ftags=jax.device_put(ftags, rshard1),
        )
        self._dev = dev  # single atomic swap
        self._dirty = False
        return dev

    def _rescore_enabled(self, mirror_rows: int) -> bool:
        """Fused f32 device rescore: on for lossy storage when the mirror
        fits the HBM budget (or forced via the constructor flag)."""
        if self._dtype == jnp.float32:
            return False  # storage is already exact
        if self.device_rescore is not None:
            return bool(self.device_rescore)
        return mirror_rows * self.dim * 4 <= DEVICE_RESCORE_MAX_BYTES

    @property
    def device_rescore_active(self) -> bool:
        """True when exact-path searches already return f32-rescored results
        (the store then skips its host-side rescore)."""
        dev = self._dev
        if dev is not None:
            return dev.frescore is not None
        return self._rescore_enabled(max(self._n_rows, 1))

    def _ensure_device(self) -> tuple:
        """Reader-side snapshot. Materialization is a WRITER responsibility
        (writers call it eagerly after layout rebuilds) because it reads host
        buffers only writers may touch; a stale-but-consistent snapshot is
        always safe to search."""
        dev = self._dev
        if dev is None:
            dev = self._materialize()
        return dev

    # -- search ------------------------------------------------------------------

    def _pallas_eligible(self) -> bool:
        if self.use_pallas == "never":
            return False
        return self.metric in ("ip", "cosine") and self.dim % 128 == 0

    def _approx(self) -> bool:
        """approx_max_k only pays (and only lowers natively) on TPU."""
        return self.approx_topk and jax.default_backend() == "tpu"

    def _storage_name(self) -> str:
        return {jnp.int8: "int8", jnp.bfloat16: "bfloat16"}.get(
            self._dtype, "float32"
        )

    def _fetch_width(self, k: int, shard_rows: int, rescore) -> int:
        """Per-shard candidate width for the exact path (see FlatIndex)."""
        if rescore is None:
            return min(k, shard_rows)
        return min(max(4 * k, 128), shard_rows)

    def _score_dtype(self, rescore) -> str:
        """Experimental knob (see FlatIndex._score_dtype: measured
        QPS-neutral on chip, so auto stays float32)."""
        if self.score_dtype == "float16" and rescore is None:
            return "float32"  # nothing re-orders the quantized fp16 scores
        if self.score_dtype != "auto":
            return self.score_dtype
        return "float32"

    def _pallas_mode(self) -> str:
        """'off' | 'compiled' | 'interpret' (interpret covers CPU test meshes)."""
        if not self._pallas_eligible() or self.cmax % 128 != 0:
            return "off"
        if jax.default_backend() == "tpu":
            return "compiled"
        return "interpret" if self.use_pallas == "always" else "off"

    def _pick_mode(self, n_q_padded: int, nprobe: int, k: int) -> str:
        """Cost-based scan selection (HBM reads dominate on TPU).

        Per-query probing reads Q * nprobe * cmax rows; a single masked full
        scan of the padded layout reads nlist * cmax rows once for the whole
        batch and is a dense MXU matmul — strictly cheaper for large batches.
        Exactness caveat: with ``approx_topk`` on a TPU backend the full
        scan's per-shard selection is ``lax.approx_max_k`` at
        ``approx_recall_target`` and the scoring precision is the storage
        dtype, so the scan covers every row but is NOT bit-exact — the store
        recovers exact order by over-fetching and f32-rescoring on the host
        (store._fetch_k / _rescore_host). With ``approx_topk=False`` and f32
        storage the scan is exact.
        """
        ivf_rows = n_q_padded * nprobe * self.cmax
        scan_rows = self.nlist * self.cmax
        if nprobe >= self.nlist or scan_rows <= ivf_rows:
            return "exact"
        return "ivf"

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        nprobe: Optional[int] = None,
        mode: str = "auto",  # auto | ivf | exact
        allow_tags=None,  # device-side filter: forces the exact path
    ) -> Tuple[np.ndarray, np.ndarray]:
        q = np.ascontiguousarray(np.atleast_2d(queries), dtype=np.float32)
        if q.shape[1] != self.dim:
            raise ValueError(f"expected queries of dim {self.dim}, got {q.shape}")
        n_q = q.shape[0]
        if self.size == 0 or not self.is_trained:
            return (
                np.full((n_q, k), _NEG_INF, dtype=np.float32),
                np.full((n_q, k), -1, dtype=np.int64),
            )
        if self.metric == "cosine":
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        dev = self._ensure_device()
        np_probe = min(nprobe or self.nprobe, dev.data.shape[0])
        q_pad = pad_bucket(n_q)
        if q_pad != n_q:
            q = np.pad(q, ((0, q_pad - n_q), (0, 0)))
        # shapes come from the snapshot, not live attributes (lock-free reads);
        # per-shard top_k bounds the SHARD selection width by shard rows, but
        # the merged pool holds n_shards * k_shard candidates
        q_dev = jax.device_put(q, NamedSharding(self.mesh, P(None, None)))
        if allow_tags is not None:
            # tag masking lives on the flat mirror; the probing layout is
            # cluster-addressed and unfiltered, so filtered searches take the
            # exact path (still the fastest path at serving batch sizes)
            mode = "exact"
        if mode == "auto":
            mode = self._pick_mode(q.shape[0], np_probe, k)
        quantized = self._dtype == jnp.int8
        if mode == "exact":
            shard_rows = dev.fvecs.shape[0] // self.n_shards
            k_shard = min(k, shard_rows)
            k_eff = min(k, k_shard * self.n_shards)
            scores, ids = exact_scan(
                self.mesh, dev.fvecs, dev.fnorms, dev.fvalid, dev.fscales,
                dev.frescore, q_dev, k_shard,
                self._fetch_width(k, shard_rows, dev.frescore),
                self.metric, self._storage_name(), self._approx(),
                self.approx_recall_target, k_eff,
                self._score_dtype(dev.frescore),
                dev.ftags if allow_tags is not None else None,
                jnp.asarray(pad_allow(allow_tags))
                if allow_tags is not None
                else None,
            )
        else:
            rows_total = dev.data.shape[0] * dev.data.shape[1]
            # with the f32 mirror available, over-fetch candidates so the
            # post-merge exact rescore can recover int8-ranking misses
            # (64 keeps the pallas kernel eligible; exact top-64 of the
            # integer scores virtually always contains the true top-k)
            fetch = max(4 * k, 64) if dev.frescore is not None else k
            k_shard = min(
                fetch, dev.data.shape[1] * np_probe, rows_total // self.n_shards
            )
            k_eff = min(k, k_shard * self.n_shards)
            scales = dev.scales if dev.scales is not None else dev.sqnorms
            scores, ids = _ivf_search(
                self.mesh,
                dev.data,
                dev.ids,
                dev.sqnorms,
                scales,
                dev.centroids,
                q_dev,
                k_shard,
                np_probe,
                self.metric,
                self._pallas_mode(),
                quantized,
                min(fetch, k_shard * self.n_shards),
            )
            if dev.frescore is not None:
                scores, ids = _resort(
                    rescore_global(
                        self.mesh, dev.frescore, dev.fnorms, q_dev, ids,
                        self.metric,
                    ),
                    ids,
                )
            scores, ids = scores[:, :k_eff], ids[:, :k_eff]
        scores = np.asarray(scores[:n_q]).astype(np.float32)
        ids = np.asarray(ids[:n_q]).astype(np.int64)
        bad = (ids < 0) | (scores <= _NEG_INF / 2)
        scores = np.where(bad, _NEG_INF, scores)
        ids = np.where(bad, -1, ids)
        if k_eff < k:
            scores = np.pad(scores, ((0, 0), (0, k - k_eff)), constant_values=_NEG_INF)
            ids = np.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
        return scores, ids

    def search_device(
        self, q_dev, k: int, nprobe: Optional[int] = None, mode: str = "auto",
        allow_tags=None,
    ):
        """Device-to-device IVF search (see FlatIndex.search_device)."""
        dev = self._ensure_device()
        np_probe = min(nprobe or self.nprobe, dev.data.shape[0])
        if allow_tags is not None:
            mode = "exact"  # see search(): tag masking rides the flat mirror
        if mode == "auto":
            mode = self._pick_mode(q_dev.shape[0], np_probe, k)
        if mode == "exact":
            shard_rows = dev.fvecs.shape[0] // self.n_shards
            k = min(k, shard_rows)
            return exact_scan(
                self.mesh, dev.fvecs, dev.fnorms, dev.fvalid, dev.fscales,
                dev.frescore, q_dev, k,
                self._fetch_width(k, shard_rows, dev.frescore),
                self.metric, self._storage_name(), self._approx(),
                self.approx_recall_target, None,
                self._score_dtype(dev.frescore),
                dev.ftags if allow_tags is not None else None,
                jnp.asarray(pad_allow(allow_tags))
                if allow_tags is not None
                else None,
            )
        rows_total = dev.data.shape[0] * dev.data.shape[1]
        fetch = max(4 * k, 64) if dev.frescore is not None else k
        k_shard = min(
            fetch, dev.data.shape[1] * np_probe, rows_total // self.n_shards
        )
        k_eff = min(k, k_shard * self.n_shards)
        scales = dev.scales if dev.scales is not None else dev.sqnorms
        scores, ids = _ivf_search(
            self.mesh,
            dev.data,
            dev.ids,
            dev.sqnorms,
            scales,
            dev.centroids,
            q_dev,
            k_shard,
            np_probe,
            self.metric,
            self._pallas_mode(),
            self._dtype == jnp.int8,
            min(fetch, k_shard * self.n_shards),
        )
        if dev.frescore is not None:
            scores, ids = _resort(
                rescore_global(
                    self.mesh, dev.frescore, dev.fnorms, q_dev, ids, self.metric
                ),
                ids,
            )
        return scores[:, :k_eff], ids[:, :k_eff]

    # -- maintenance / persistence -------------------------------------------------

    def retrain(self) -> None:
        """Re-train the quantizer on the live corpus and re-pack the layout."""
        self.train()
        self._rebuild_layout()
        self._materialize()

    def compact(self) -> np.ndarray:
        """Drop tombstoned rows from host storage and re-pack.

        Returns the remap array (old row -> new row, -1 for dropped rows) so
        callers can renumber their own row-keyed maps. Materializes eagerly:
        compaction renumbers rows, so serving the stale pre-compaction device
        arrays would return ids that dereference the wrong vectors.
        """
        live = np.flatnonzero(self._alive)
        remap = np.full(self._n_rows, -1, dtype=np.int64)
        remap[live] = np.arange(live.size)
        self._host = self._host[live].copy()
        self._assign = self._assign[live].copy()
        self._loc = self._loc[live].copy()
        self._tags = self._tags[live].copy()
        self._alive = np.ones(live.size, dtype=bool)
        self._n_rows = int(live.size)
        self.size = int(live.size)
        self._rebuild_layout()
        self._materialize()
        return remap

    def state_dict(self) -> dict:
        live = np.flatnonzero(self._alive)
        return {
            "kind": self.kind,
            "dim": self.dim,
            "metric": self.metric,
            "nlist": self.nlist,
            "nprobe": self.nprobe,
            "centroids": None if self.centroids is None else self.centroids.copy(),
            "vectors": self._host[live].copy(),
            "assignments": self._assign[live].copy(),
            "rows": live.copy(),
            "tags": self._tags[live].copy(),
        }

    @classmethod
    def from_state(cls, state: dict, **kwargs) -> "IVFIndex":
        idx = cls(
            int(state["dim"]),
            nlist=int(state["nlist"]),
            nprobe=int(state["nprobe"]),
            metric=str(state["metric"]),
            **kwargs,
        )
        vecs = np.asarray(state["vectors"], dtype=np.float32)
        if state.get("centroids") is not None:
            idx.centroids = np.asarray(state["centroids"], dtype=np.float32)
        if vecs.size:
            n = vecs.shape[0]
            idx._host = vecs.copy()
            idx._assign = np.asarray(state["assignments"], dtype=np.int32).copy()
            tags = state.get("tags")
            idx._tags = (
                np.asarray(tags, dtype=np.int32).copy()
                if tags is not None
                else np.zeros((n,), dtype=np.int32)
            )
            idx._loc = np.full((n, 2), -1, dtype=np.int32)
            idx._alive = np.ones(n, dtype=bool)
            idx._n_rows = n
            idx.size = n
            if not idx.is_trained:
                idx.train()
            idx._rebuild_layout()
        return idx


@jax.jit
def _scatter_slots(data, ids, sqnorms, clusters, slots, x, rows):
    data = data.at[clusters, slots].set(x.astype(data.dtype))
    ids = ids.at[clusters, slots].set(rows)
    sqnorms = sqnorms.at[clusters, slots].set(
        jnp.sum(x.astype(jnp.float32) ** 2, axis=1)
    )
    return data, ids, sqnorms


@jax.jit
def _scatter_slots_q(
    data, ids, sqnorms, scales, clusters, slots, qx, row_scales, row_norms, rows
):
    data = data.at[clusters, slots].set(qx)
    ids = ids.at[clusters, slots].set(rows)
    sqnorms = sqnorms.at[clusters, slots].set(row_norms)
    scales = scales.at[clusters, slots].set(row_scales)
    return data, ids, sqnorms, scales


@jax.jit
def _tombstone(ids, clusters, slots):
    return ids.at[clusters, slots].set(-1)


@jax.jit
def _resort(scores, ids):
    """Order (scores, ids) by descending score (post-rescore)."""
    s, pos = jax.lax.top_k(scores, scores.shape[1])
    return s, jnp.take_along_axis(ids, pos, axis=1)


@jax.jit
def _clear_mirror_valid(fvalid, rows):
    return fvalid.at[rows].set(False)


@jax.jit
def _scatter_mirror_tags(ftags, rows, t):
    return ftags.at[rows].set(t)


@jax.jit
def _scatter_mirror_rows(frescore, rows, x):
    return frescore.at[rows].set(x)


@jax.jit
def _scatter_flat(fvecs, fvalid, fnorms, rows, x, norms):
    fvecs = fvecs.at[rows].set(x.astype(fvecs.dtype))
    fvalid = fvalid.at[rows].set(True)
    fnorms = fnorms.at[rows].set(norms)
    return fvecs, fvalid, fnorms


@jax.jit
def _scatter_flat_q(fvecs, fvalid, fnorms, fscales, rows, qx, scales, norms):
    fvecs = fvecs.at[rows].set(qx)
    fvalid = fvalid.at[rows].set(True)
    fnorms = fnorms.at[rows].set(norms)
    fscales = fscales.at[rows].set(scales)
    return fvecs, fvalid, fnorms, fscales


@partial(jax.jit, static_argnums=(0, 7, 8, 9, 10, 11, 12))
def _ivf_search(mesh, data, ids, sqnorms, scales, centroids, q, k, nprobe,
                metric, pallas_mode="off", quantized=False, k_out=None):
    """Fused IVF query step: probe selection + sharded cluster scans + merge.

    ``k`` is the per-shard running-top-k width; the final merge over the
    n_shards*k candidate pool returns ``k_out`` (default k) columns."""
    if k_out is None:
        k_out = k
    axes = row_axes(mesh)
    _sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_shards = int(np.prod([_sizes[a] for a in axes]))
    k_out = min(k_out, k * n_shards)
    nlist = data.shape[0]
    nlist_s = nlist // n_shards
    cmax = data.shape[1]

    # ---- probe selection (replicated; tiny) ----
    qc = jax.lax.dot_general(
        q,
        centroids,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Q, nlist)
    if metric == "l2":
        c_sq = jnp.sum(centroids * centroids, axis=1)[None, :]
        probe_scores = 2.0 * qc - c_sq
    else:
        probe_scores = qc
    _, probes = jax.lax.top_k(probe_scores, nprobe)  # (Q, nprobe) int32

    def shard_fn(data_s, ids_s, sqn_s, scl_s, qq, probes_s):
        me = linear_rank(mesh, axes)
        base = me * nlist_s
        owned = (probes_s // nlist_s) == me  # (Q, nprobe)
        local = jnp.clip(probes_s - base, 0, nlist_s - 1)
        n_q = qq.shape[0]

        if pallas_mode != "off" and k <= 64:
            from ..ops.kernels import ivf_scan_shard

            s_loc, i_loc = ivf_scan_shard(
                data_s,
                ids_s,
                qq,
                local,
                owned.astype(jnp.int32),
                k=k,
                interpret=(pallas_mode == "interpret"),
                vma=frozenset(axes),
                scales_s=scl_s,
            )
            return hierarchical_topk_merge(s_loc, i_loc, k_out, axes)

        if quantized:
            # exact-int scoring, matching the pallas kernel and scan.py:
            # both operands are ints <= 127 (exact in bf16), the dot is the
            # exact integer product, rescaled by query x row scales
            from .scan import quantize_queries_device

            q_int, q_scl = quantize_queries_device(qq)
        else:
            q_int, q_scl = qq, None

        def step(carry, inputs):
            best_s, best_i = carry
            pl, own = inputs  # (Q,), (Q,)
            blocks = data_s[pl]  # (Q, cmax, d) gather
            if quantized:
                scores = jnp.einsum(
                    "qd,qcd->qc",
                    q_int,
                    blocks.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                ) * q_scl[:, None]
            else:
                scores = jnp.einsum(
                    "qd,qcd->qc",
                    qq,
                    blocks.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                )
            ids_blk = ids_s[pl]  # (Q, cmax)
            if quantized:
                scores = scores * scl_s[pl]
            if metric == "l2":
                scores = 2.0 * scores - sqn_s[pl]
            valid = (ids_blk >= 0) & own[:, None]
            scores = jnp.where(valid, scores, _NEG_INF)
            merged_s = jnp.concatenate([best_s, scores], axis=1)
            merged_i = jnp.concatenate([best_i, ids_blk], axis=1)
            s, pos = jax.lax.top_k(merged_s, k)
            i = jnp.take_along_axis(merged_i, pos, axis=1)
            return (s, i), None

        init = (
            jax.lax.pcast(
                jnp.full((n_q, k), _NEG_INF, dtype=jnp.float32),
                tuple(axes),
                to="varying",
            ),
            jax.lax.pcast(
                jnp.full((n_q, k), -1, dtype=jnp.int32), tuple(axes), to="varying"
            ),
        )
        (best_s, best_i), _ = jax.lax.scan(
            step, init, (local.T, owned.T)
        )
        # ICI-first merge; only (Q, k_out) crosses the outer (DCN) axis
        return hierarchical_topk_merge(best_s, best_i, k_out, axes)

    top_s, top_ids = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(axes, None, None),
            P(axes, None),
            P(axes, None),
            P(axes, None),
            P(None, None),
            P(None, None),
        ),
        out_specs=(P(None, None), P(None, None)),
        # the hierarchical all_gather+top_k merge returns replicated values
        # the static vma checker can't infer (and the pallas interpreter's
        # vma propagation trips over mixed varying/unvarying operands)
        check_vma=False,
    )(data, ids, sqnorms, scales, q, probes)
    if metric == "l2":
        qnorm = jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        top_s = top_s - qnorm
    return top_s, top_ids
