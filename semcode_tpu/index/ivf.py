"""IVF_FLAT-equivalent ANN index on TPU.

The reference delegates ANN entirely to an external Milvus server (IVF_FLAT,
metric IP, nlist=128, nprobe=16 — reference src/semcode/storage/milvus_store.py
:76-85,:141-147). Here the whole thing is in-process and TPU-resident:

- **Device-authoritative storage** (round-3 redesign): the row-major flat
  mirror in HBM — storage-dtype vectors + scales + norms (+ optional f32
  rescore mirror) — IS the corpus. The host keeps only O(N) metadata
  (liveness, cluster assignment, slot map, tags). Ingest uploads raw f32
  chunks (host->device DMA) and quantizes/normalizes ON DEVICE; builds,
  re-packs and compactions gather from the mirror on device. No step ever
  runs an O(N*dim) pass on the host CPU — on shared/throttled build hosts
  (observed: ~0.03 GB/s memcpy) host-side quantize/stage passes dominated
  the round-2 1M-row build 5x over the device work.
- **Build**: k-means coarse quantizer trained on device (`ops.kmeans`),
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

from contextlib import contextmanager
from functools import lru_cache, partial
import collections
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..logger import get_logger
from ..ops.kmeans import balanced_assign, kmeans_fit_dev
from ..parallel.mesh import (
    get_mesh,
    hierarchical_topk_merge,
    linear_rank,
    pad_bucket,
    round_up,
    row_axes,
)
from .flat import (
    DEVICE_RESCORE_MAX_BYTES,
    RESIDUAL_RESCORE_MAX_BYTES,
    pad_allow,
    split_rescore,
)
from .scan import (
    exact_scan,
    exact_scan_batched,
    rescore_global,
    rescore_global_residual,
    resolve_rescore_width,
)

log = get_logger("index.ivf")


# One atomically-swapped device snapshot (lock-free readers).
#
# The padded cluster layout (data/ids/sqnorms/scales/centroids) serves the
# probing path; the flat row-major mirror (fvecs/fvalid/fnorms/fscales,
# position == global row id) serves the exact path — it reads 1/fill times
# fewer bytes than scanning the padded layout, and frescore (f32) feeds the
# fused exact re-ranking in scan.exact_scan. The MIRROR arrays are the
# authoritative storage (see module docstring). Fields:
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

# The mirror half on its own (writer-side working state; _Dev references the
# same immutable arrays, so swapping _Dev snapshots stays atomic for readers).
_Mirror = collections.namedtuple(
    "_Mirror", ["fvecs", "fvalid", "fnorms", "fscales", "frescore", "ftags"]
)

_NEG_INF = np.float32(-3.0e38)

# rows per device chunk for ingest / pack / gather steps: bounds transient
# HBM (chunk * dim * 4B) and keeps one jit shape for the common case
_CHUNK_ROWS = 131072


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
        fetch_width: int = 0,  # 0 = auto (max(4k, 128)); rescore candidate pool
        rescore_width: int = 0,  # top-W gather slice; 0 = auto, -1 = full fetch
        scan_impl: str = "auto",  # auto | xla | pallas (exact-scan kernel)
        rescore_mode: str = "auto",  # auto | f32 | residual | off
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
        self.rescore_mode = rescore_mode
        self.score_dtype = score_dtype
        self.fetch_width = int(fetch_width)
        self.rescore_width = int(rescore_width)
        self.scan_impl = scan_impl
        import math

        self._row_multiple = math.lcm(self.n_shards * 8, 128)
        self._mirror_cap = 0  # flat-mirror rows currently materialized

        # host metadata (O(N), amortized-growth buffers; NO vector payloads)
        self.size = 0  # live rows (excluding tombstones)
        self._n_rows = 0  # total rows ever added
        self._meta_cap = 0
        self._assign = np.zeros((0,), dtype=np.int32)
        self._loc = np.zeros((0, 2), dtype=np.int32)  # row -> (cluster, slot)
        self._alive = np.zeros((0,), dtype=bool)
        # int32 row tags for device-side filtered search (0 = untagged)
        self._tags = np.zeros((0,), dtype=np.int32)
        self.centroids: Optional[np.ndarray] = None  # (nlist, dim) f32
        self._counts = np.zeros((self.nlist,), dtype=np.int32)  # slots used
        self.cmax = 0

        # device state: the authoritative mirror + one atomically-swapped
        # _Dev snapshot so lock-free readers always see consistent arrays
        self._mir: Optional[_Mirror] = None
        self._dev: Optional[_Dev] = None
        self._dirty = True
        # host f32 copy, maintained incrementally ONLY when the f32 device
        # mirror is off (the store's host rescore then needs it); otherwise
        # hydrated on demand for persistence
        self._host_cache: Optional[np.ndarray] = None
        self._host_ingest_only = True  # False once a device array is added
        self._bulk = False  # inside a bulk() block: defer layout/materialize
        # pending tail: streaming inserts at full-HBM operating points land
        # in a small exact-scanned side buffer instead of copy-on-write
        # scattering into multi-GB mirrors (see _add_pending)
        self._pend: Optional[tuple] = None  # (vecs, ids, tags, n_used)

    # -- helpers ---------------------------------------------------------------

    @property
    def is_trained(self) -> bool:
        return self.centroids is not None

    @property
    def _host(self) -> np.ndarray:
        """Full-precision host copy of rows 0..n_rows (hydrated from device
        when not incrementally maintained; persistence/diagnostics only)."""
        if self._host_cache is not None:
            return self._host_cache[: self._n_rows]
        return self.hydrate_host()

    def hydrate_host(self) -> np.ndarray:
        """Fetch the f32 corpus (n_rows, dim) from the device mirror."""
        self._fold_pending()  # pending rows live only in the side buffer
        n = self._n_rows
        if n == 0 or self._mir is None:
            return np.zeros((0, self.dim), dtype=np.float32)
        if n * self.dim * 4 > 1 << 30:
            log.warning("hydrate_host_large", rows=n, dim=self.dim)
        mir = self._mir
        out = np.empty((n, self.dim), dtype=np.float32)
        for lo in range(0, n, _CHUNK_ROWS):
            hi = min(lo + _CHUNK_ROWS, n)
            idx = jnp.arange(lo, hi, dtype=jnp.int32)
            out[lo:hi] = np.asarray(self._f32_chunk(idx))
        return out

    def _check_vectors(self, x, *, device_ok: bool = True):
        if isinstance(x, jax.Array):
            if not device_ok:
                x = np.asarray(x)
            elif x.ndim != 2 or x.shape[1] != self.dim:
                raise ValueError(
                    f"expected (n, {self.dim}) vectors, got {x.shape}"
                )
            else:
                return x
        x = np.ascontiguousarray(x, dtype=np.float32)
        if x.ndim != 2 or x.shape[1] != self.dim:
            raise ValueError(f"expected (n, {self.dim}) vectors, got {x.shape}")
        return x

    def _extend_meta_capacity(self, need: int) -> None:
        """Pre-size the host metadata buffers (no rows appended)."""
        if need > self._meta_cap:
            self._extend_meta_grow(max(need, max(1024, self._meta_cap * 2)))

    def _extend_meta_grow(self, new_cap: int) -> None:
        for name, fill in (
            ("_assign", -1),
            ("_alive", False),
            ("_tags", 0),
        ):
            old = getattr(self, name)
            buf = np.full((new_cap,), fill, dtype=old.dtype)
            buf[: self._n_rows] = old[: self._n_rows]
            setattr(self, name, buf)
        loc = np.full((new_cap, 2), -1, dtype=np.int32)
        loc[: self._n_rows] = self._loc[: self._n_rows]
        self._loc = loc
        if self._host_cache is not None:
            host = np.zeros((new_cap, self.dim), dtype=np.float32)
            host[: self._n_rows] = self._host_cache[: self._n_rows]
            self._host_cache = host
        self._meta_cap = new_cap

    def _extend_meta(self, n: int, tags: np.ndarray) -> np.ndarray:
        """Append n rows to the host metadata buffers; returns new row ids."""
        need = self._n_rows + n
        if need > self._meta_cap:
            self._extend_meta_grow(max(need, max(1024, self._meta_cap * 2)))
        rows = np.arange(self._n_rows, need, dtype=np.int64)
        self._alive[rows] = True
        self._tags[rows] = tags
        self._n_rows = need
        self.size += n
        return rows

    # -- device mirror (authoritative storage) ---------------------------------

    def _mirror_target_cap(self, n_rows: int) -> int:
        return round_up(
            n_rows + max(1024, n_rows // 8), self._row_multiple
        )

    def _shard2(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(self._row_axes, None))

    def _shard1(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(self._row_axes))

    def _zeros(self, shape, dtype, sharding):
        return _zeros_fn(shape, dtype, sharding)()

    def _rescore_kind(self, mirror_rows: int) -> str:
        """Fused device-rescore policy: 'f32', 'residual' (two-level int8,
        int8 storage only) or 'none' — see FlatIndex._rescore_kind. The
        residual tier keeps exact-grade final ordering at footprints where
        the f32 mirror cannot fit (1M x 3072 = 12.3 GB f32 vs 3.5 GB
        residual on a 16 GB chip)."""
        if self._dtype == jnp.float32:
            return "none"  # storage is already exact
        if self.rescore_mode == "off":
            return "none"
        if self.rescore_mode == "f32":
            return "f32"
        if self.rescore_mode == "residual":
            return "residual" if self._dtype == jnp.int8 else "f32"
        if self.device_rescore is False:
            return "none"
        if self.device_rescore is True:
            return "f32"
        if mirror_rows * self.dim * 4 <= DEVICE_RESCORE_MAX_BYTES:
            return "f32"
        if (
            self._dtype == jnp.int8
            and mirror_rows * (self.dim + 4) <= RESIDUAL_RESCORE_MAX_BYTES
        ):
            return "residual"
        return "none"

    def _ensure_mirror(self, need_rows: int, *, exact: bool = False) -> None:
        """Create or grow the device mirror to hold ``need_rows`` rows.

        ``exact`` allocates exactly ``need_rows`` (lane-rounded) with NO
        growth headroom: the exact scan's cost is linear in ALLOCATED
        mirror rows (tombstone-masked slots still burn HBM reads and MXU
        MACs), so a bulk build with a declared row count must not carry
        the +12.5% amortization pad — measured 1M x 384 chained: the pad
        alone cost ~15% flagship QPS (docs/BENCHMARKS.md round 4)."""
        if self._mir is not None and need_rows <= self._mirror_cap:
            return
        mcap = (round_up(max(need_rows, 1), self._row_multiple)
                if exact else self._mirror_target_cap(need_rows))
        s2, s1 = self._shard2(), self._shard1()

        def _fresh_rescore(kind):
            if kind == "f32":
                return self._zeros((mcap, self.dim), jnp.float32, s2)
            if kind == "residual":
                return (
                    self._zeros((mcap, self.dim), jnp.int8, s2),
                    self._zeros((mcap,), jnp.float32, s1),
                )
            return None

        if self._mir is None:
            kind = self._rescore_kind(mcap)
            self._mir = _Mirror(
                fvecs=self._zeros((mcap, self.dim), self._dtype, s2),
                fvalid=self._zeros((mcap,), jnp.bool_, s1),
                fnorms=self._zeros((mcap,), jnp.float32, s1),
                fscales=self._zeros((mcap,), jnp.float32, s1),
                frescore=_fresh_rescore(kind),
                ftags=self._zeros((mcap,), jnp.int32, s1),
            )
            if kind == "none" and self._dtype != jnp.float32:
                # the store's host rescore needs f32 somewhere: keep it on host
                self._host_cache = np.zeros(
                    (max(self._meta_cap, 1024), self.dim), dtype=np.float32
                )
            self._mirror_cap = mcap
            return
        mir = self._mir
        new_kind = self._rescore_kind(mcap) if mir.frescore is not None else "none"
        is_resid = isinstance(mir.frescore, tuple)
        old_kind = "none" if mir.frescore is None else (
            "residual" if is_resid else "f32"
        )
        if old_kind != "none" and new_kind == "none":
            log.warning("frescore_dropped_on_growth", rows=need_rows)
            if self._host_ingest_only:
                # host-fed store: back-fill the host cache before dropping
                # the f32 mirror so exactness survives the transition
                host = self.hydrate_host()
                cache = np.zeros((self._meta_cap, self.dim), dtype=np.float32)
                cache[: host.shape[0]] = host
                self._host_cache = cache
            # device-fed corpora skip the back-fill (fetching GBs to a
            # throttled host would undo the device-resident build); final
            # ordering falls back to exact-integer int8 scoring
        if old_kind == "f32" and new_kind == "f32":
            frescore = jax.device_put(_pad_rows(mir.frescore, mcap), s2)
        elif old_kind == "residual" and new_kind in ("residual", "f32"):
            # an existing residual never upgrades to f32 on growth (the
            # dropped bits are gone); pad it in place
            frescore = (
                jax.device_put(_pad_rows(mir.frescore[0], mcap), s2),
                jax.device_put(_pad_rows(mir.frescore[1], mcap), s1),
            )
        elif old_kind == "f32" and new_kind == "residual":
            # downgrade across the HBM budget: requantize the residual FROM
            # the f32 mirror on device, then free the mirror — exact-grade
            # ordering survives growth past DEVICE_RESCORE_MAX_BYTES
            log.info("frescore_downgraded_to_residual", rows=need_rows)
            rq, rs = _requantize_residual(mir.frescore, mir.fvecs, mir.fscales)
            frescore = (
                jax.device_put(_pad_rows(rq, mcap), s2),
                jax.device_put(_pad_rows(rs, mcap), s1),
            )
        else:
            frescore = None
        grown = _Mirror(
            fvecs=jax.device_put(_pad_rows(mir.fvecs, mcap), s2),
            fvalid=jax.device_put(_pad_rows(mir.fvalid, mcap), s1),
            fnorms=jax.device_put(_pad_rows(mir.fnorms, mcap), s1),
            fscales=jax.device_put(_pad_rows(mir.fscales, mcap), s1),
            frescore=frescore,
            ftags=jax.device_put(_pad_rows(mir.ftags, mcap), s1),
        )
        self._mir = grown
        self._mirror_cap = mcap
        # the padded cluster layout is untouched by mirror growth; refresh
        # the reader snapshot so searches see the grown mirror
        if self._dev is not None and not self._dirty:
            self._dev = self._dev._replace(**grown._asdict())

    def _ingest_rows(self, x, rows: np.ndarray, tags: np.ndarray) -> None:
        """Scatter new/updated rows into the device mirror (chunked).

        ``x``: (n, dim) f32 numpy array or device array, NOT yet
        metric-normalized. Quantization/normalization run on device.
        """
        mir = self._mir
        n = rows.shape[0]
        cache = self._host_cache
        if isinstance(x, jax.Array):
            self._host_ingest_only = False
        # exclusive bulk build with no reader snapshot: scatter in place
        # (donated buffers) instead of double-buffering the whole mirror
        donate = self._bulk and self._dev is None
        scatter_q = _scatter_flat_q_donated if donate else _scatter_flat_q
        scatter_f = _scatter_flat_donated if donate else _scatter_flat
        scatter_r = (
            _scatter_mirror_rows_donated if donate else _scatter_mirror_rows
        )
        scatter_r2 = _scatter_resid_donated if donate else _scatter_resid
        for lo in range(0, n, _CHUNK_ROWS):
            hi = min(lo + _CHUNK_ROWS, n)
            xc = x[lo:hi]
            xd = xc if isinstance(xc, jax.Array) else jnp.asarray(xc)
            if self.metric == "cosine":
                xd = _normalize_rows(xd)
            rows_d = jnp.asarray(rows[lo:hi].astype(np.int32))
            tags_d = jnp.asarray(tags[lo:hi])
            rq = rs = None
            if self._dtype == jnp.int8:
                if isinstance(mir.frescore, tuple):
                    qx, scl, nrm, rq, rs = _prep_rows_q2(xd)
                else:
                    qx, scl, nrm = _prep_rows_q(xd)
                fvecs, fvalid, fnorms, fscales = scatter_q(
                    mir.fvecs, mir.fvalid, mir.fnorms, mir.fscales,
                    rows_d, qx, scl, nrm,
                )
            else:
                nrm = _row_norms(xd)
                fvecs, fvalid, fnorms = scatter_f(
                    mir.fvecs, mir.fvalid, mir.fnorms, rows_d, xd, nrm
                )
                fscales = mir.fscales
            frescore = mir.frescore
            if isinstance(frescore, tuple):
                frescore = scatter_r2(
                    frescore[0], frescore[1], rows_d, rq, rs
                )
            elif frescore is not None:
                frescore = scatter_r(frescore, rows_d, xd)
            ftags = _scatter_mirror_tags(mir.ftags, rows_d, tags_d)
            mir = _Mirror(fvecs, fvalid, fnorms, fscales, frescore, ftags)
            # rebind immediately: with donation the previous buffers are
            # deleted, and an error later in the loop must not leave
            # self._mir pointing at invalidated arrays
            self._mir = mir
            if cache is not None:
                if isinstance(xc, jax.Array):
                    # fetching every device chunk back to a throttled host
                    # would undo the device-authoritative build; drop the
                    # cache and hydrate on demand if persistence needs it
                    log.warning("host_cache_dropped_for_device_ingest")
                    self._host_cache = cache = None
                elif self.metric == "cosine":
                    # normalize on host rather than fetching the device copy
                    cache[rows[lo:hi]] = xc / np.maximum(
                        np.linalg.norm(xc, axis=1, keepdims=True), 1e-12
                    )
                else:
                    cache[rows[lo:hi]] = xc

    def _f32_chunk(self, idx_dev):
        """Gather f32(-grade) rows from the mirror by row id (on device).
        With the residual mirror the reconstruction carries ~16 bits of
        mantissa (see flat.quantize_residual) — exact enough for k-means
        samples, host rescores and persistence round trips."""
        mir = self._mir
        if isinstance(mir.frescore, tuple):
            return _gather_dequant2(
                mir.fvecs, mir.fscales, mir.frescore[0], mir.frescore[1],
                idx_dev,
            )
        if mir.frescore is not None:
            return _gather_f32(mir.frescore, idx_dev)
        if self._dtype == jnp.int8:
            return _gather_dequant(mir.fvecs, mir.fscales, idx_dev)
        return _gather_f32(mir.fvecs, idx_dev)

    def gather_f32(self, rows: np.ndarray):
        """Exact f32 values for the given row ids, host-side, gathering ONLY
        those rows (never the whole corpus — the ``_host`` property hydrates
        O(N*dim) and exists for persistence/diagnostics, not the search
        path). Returns ``(vals, ok)`` where ``ok`` marks in-bounds ids
        (stale ids racing a compaction are masked, not dereferenced)."""
        rows = np.asarray(rows, dtype=np.int64)
        ok = (rows >= 0) & (rows < self._n_rows)
        safe = np.where(ok, rows, 0)
        if self._host_cache is not None:
            return self._host_cache[safe], ok
        if self._mir is None or self._n_rows == 0:
            return np.zeros((rows.shape[0], self.dim), dtype=np.float32), ok
        out = np.empty((rows.shape[0], self.dim), dtype=np.float32)
        for lo in range(0, rows.shape[0], _CHUNK_ROWS):
            hi = min(lo + _CHUNK_ROWS, rows.shape[0])
            idx = jnp.asarray(safe[lo:hi].astype(np.int32))
            out[lo:hi] = np.asarray(self._f32_chunk(idx))
        return out, ok

    def _topm_rows(self, rows: np.ndarray, m: int) -> np.ndarray:
        """Per-row m nearest clusters, computed on device from the mirror."""
        cent = jnp.asarray(self.centroids, dtype=jnp.float32)
        out = np.empty((rows.shape[0], m), dtype=np.int32)
        for lo in range(0, rows.shape[0], _CHUNK_ROWS):
            hi = min(lo + _CHUNK_ROWS, rows.shape[0])
            idx = jnp.asarray(rows[lo:hi].astype(np.int32))
            xd = self._f32_chunk(idx)
            out[lo:hi] = np.asarray(_topm_dev(xd, cent, m))
        return out

    # -- build -------------------------------------------------------------------

    def train(self, x: Optional[np.ndarray] = None) -> None:
        """Train the coarse quantizer (on provided sample or current rows)."""
        if x is not None:
            x = self._check_vectors(x, device_ok=False)
            if self.metric == "cosine":
                x = x / np.maximum(
                    np.linalg.norm(x, axis=1, keepdims=True), 1e-12
                )
            sample_dev = jnp.asarray(x)
        else:
            live = np.flatnonzero(self._alive[: self._n_rows])
            if live.size == 0:
                raise ValueError("cannot train IVF on an empty corpus")
            from ..ops.kmeans import TRAIN_POINTS_PER_CENTROID

            max_train = self.nlist * TRAIN_POINTS_PER_CENTROID
            if live.size > max_train:
                rng = np.random.default_rng(self.seed)
                live = rng.choice(live, size=max_train, replace=False)
            sample_dev = self._f32_chunk(jnp.asarray(live.astype(np.int32)))
        if sample_dev.shape[0] == 0:
            raise ValueError("cannot train IVF on an empty corpus")
        self.centroids = kmeans_fit_dev(
            sample_dev, self.nlist, iters=self.kmeans_iters, seed=self.seed
        )

    @contextmanager
    def bulk(self, expected_rows: Optional[int] = None):
        """Deferred-materialization ingest for large streamed builds.

        Inside the block, ``add()`` only uploads rows into the device mirror;
        training, cluster placement and the padded-layout materialization all
        happen ONCE when the block exits. For a multi-GB corpus streamed in
        chunks this removes every intermediate re-pack — each one transiently
        holds old layout + new layout + mirror in HBM (the 1M x 3072 int8
        build OOMs exactly there without bulk mode) — and is also faster:
        one k-means + one balanced assignment + one scatter pass total.

        ``expected_rows`` pre-sizes the mirror so chunked adds never trigger
        a grow-copy (2x mirror transient).

        Searching inside the block serves the pre-bulk snapshot if one
        exists; on a fresh index it raises (there is nothing consistent to
        scan yet). Not for concurrent use: callers hold the store write lock
        or own the index outright (the benchmark build).
        """
        if self._bulk:
            raise RuntimeError("bulk() blocks do not nest")
        if expected_rows is not None and expected_rows > 0:
            self._extend_meta_capacity(expected_rows)
            # exact: the caller declared the build size — no growth pad
            # (the pad is scanned forever after; see _ensure_mirror)
            self._ensure_mirror(max(expected_rows, 1), exact=True)
        self._bulk = True
        try:
            yield self
        finally:
            self._bulk = False
            if self._n_rows > 0:
                if not self.is_trained:
                    self.train()
                self._rebuild_layout()
                self._materialize()

    def add(self, x, tags=None) -> np.ndarray:
        """Append rows; trains the quantizer on first call. Returns row ids.

        ``x`` may be a numpy array or an already-on-device jax array (the
        benchmark generates corpora on device; no host round trip).
        ``tags`` (optional int32 per row, >= 0) enable device-side filtered
        search on the exact path; None = tag 0."""
        x = self._check_vectors(x)
        if x.shape[0] == 0:
            return np.zeros((0,), dtype=np.int64)
        n = x.shape[0]
        if tags is None:
            tags = np.zeros((n,), dtype=np.int32)
        else:
            tags = np.asarray(tags, dtype=np.int32).ravel()
            if tags.shape[0] != n:
                raise ValueError(f"expected {n} tags, got {tags.shape[0]}")
        if self._use_pending(n):
            return self._add_pending(x, tags)
        rows = self._extend_meta(n, tags)
        self._ensure_mirror(self._n_rows)
        self._ingest_rows(x, rows, tags)
        if self._bulk:
            # layout/materialization deferred to bulk() exit; the mirror is
            # authoritative so nothing is lost if the block exits early
            self._dirty = True
            return rows
        if not self.is_trained:
            self.train()
            self._rebuild_layout()
            self._materialize()
            return rows
        if self.cmax == 0:
            self._rebuild_layout()
            self._materialize()
            return rows
        self._stream_place(rows)
        return rows

    def _stream_place(self, rows: np.ndarray) -> None:
        """Streaming placement: nearest candidate cluster with a free slot;
        a full layout rebuild when every candidate cluster is full."""
        cands = self._topm_rows(rows, m=min(4, self.nlist))
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

    # -- pending tail (full-HBM streaming inserts) -----------------------------

    # streaming adds scatter copy-on-write into the authoritative mirror;
    # past this footprint the functional copy (old + new mirror live across
    # the op, plus the residual tier) exceeds the free HBM of a loaded chip
    # (measured: 10M x 384 int8 + residual at 15.9/16 GB OOMs on a single
    # 256-row add), so inserts land in a small exact-scanned side buffer
    # merged into every search instead — the LSM pattern, TPU-sized
    PENDING_THRESHOLD_BYTES = 2 << 30
    PENDING_CAP = 8192

    def _scatter_copy_bytes(self) -> int:
        """Transient bytes a copy-on-write mirror scatter materializes."""
        mir = self._mir
        if mir is None:
            return 0
        total = mir.fvecs.nbytes
        if isinstance(mir.frescore, tuple):
            total += mir.frescore[0].nbytes
        elif mir.frescore is not None:
            total += mir.frescore.nbytes
        return total

    def _use_pending(self, n: int) -> bool:
        return (
            not self._bulk
            and self.is_trained
            and self.cmax > 0
            and n <= self.PENDING_CAP
            and self._scatter_copy_bytes() > self.PENDING_THRESHOLD_BYTES
        )

    def _add_pending(self, x, tags: np.ndarray) -> np.ndarray:
        n = x.shape[0]
        pend = self._pend
        used = 0 if pend is None else pend[3]
        if used + n > self.PENDING_CAP:
            # fold the tail into the main layout (one big scatter, the
            # cost this path amortizes PENDING_CAP rows deep); on a chip
            # whose HBM cannot take even that, the fold raises loudly —
            # bounded streaming capacity is the honest single-chip limit
            self._fold_pending()
            used = 0
        rows = self._extend_meta(n, tags)
        xd = jnp.asarray(x, dtype=jnp.float32)
        if self._pend is None:
            P, d = self.PENDING_CAP, self.dim
            self._pend = (
                jnp.zeros((P, d), jnp.float32),
                jnp.full((P,), -1, jnp.int32),
                jnp.zeros((P,), jnp.int32),
                0,
            )
            used = 0
        vecs, pids, ptags, _ = self._pend
        rows32 = jnp.asarray(rows.astype(np.int32))
        idx = jnp.arange(used, used + n, dtype=jnp.int32)
        self._pend = (
            _pend_set(vecs, idx, xd),
            _pend_set(pids, idx, rows32),
            _pend_set(ptags, idx, jnp.asarray(tags)),
            used + n,
        )
        self._host_ingest_only = self._host_ingest_only and not isinstance(
            x, jax.Array
        )
        return rows

    def _fold_pending(self, place: bool = True) -> None:
        """Scatter the pending tail into the authoritative mirror (+ layout
        placement unless the caller is about to rebuild the layout anyway).
        Readers briefly miss the folded rows (pending cleared before the
        placement lands) — the usual stale-but-consistent snapshot trade."""
        pend = self._pend
        self._pend = None
        if pend is None or pend[3] == 0:
            return
        vecs, pids, ptags, n = pend
        pid_np = np.asarray(pids[:n])
        mask = pid_np >= 0  # tombstoned-in-pending rows drop here
        if not mask.any():
            return
        rows = pid_np[mask].astype(np.int64)
        keep = jnp.asarray(np.flatnonzero(mask).astype(np.int32))
        self._ensure_mirror(self._n_rows)
        self._ingest_rows(
            vecs[keep], rows, np.asarray(ptags[:n])[mask]
        )
        if place:
            self._stream_place(rows)

    def _merge_pending_into(self, scores, ids, q_dev, allow_tags=None):
        """Chain the pending-tail exact scan onto in-flight (scores, ids)."""
        pend = self._pend
        if pend is None or pend[3] == 0:
            return scores, ids
        vecs, pids, ptags, _ = pend
        allow = (
            jnp.asarray(pad_allow(allow_tags))
            if allow_tags is not None
            else None
        )
        return _merge_pending(
            scores, ids, q_dev, vecs, pids, ptags, self.metric, allow
        )

    def _merge_pending_into_batched(self, scores, ids, qs_dev, allow_tags=None):
        pend = self._pend
        if pend is None or pend[3] == 0:
            return scores, ids
        vecs, pids, ptags, _ = pend
        allow = (
            jnp.asarray(pad_allow(allow_tags))
            if allow_tags is not None
            else None
        )
        return _merge_pending_batched(
            scores, ids, qs_dev, vecs, pids, ptags, self.metric, allow
        )

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
        rows_d = jnp.asarray(rows, jnp.int32)
        pend = self._pend
        if pend is not None and pend[3] > 0:
            vecs, pids, ptags, n_used = pend
            self._pend = (
                vecs, _pend_tombstone(pids, rows_d), ptags, n_used
            )
        if self._mir is not None:
            self._mir = self._mir._replace(
                fvalid=_clear_mirror_valid(self._mir.fvalid, rows_d)
            )
        dev = self._dev
        if not self._dirty and dev is not None:
            new = dev._replace(fvalid=self._mir.fvalid)
            if placed.any():
                c = jnp.asarray(locs[placed, 0])
                s = jnp.asarray(locs[placed, 1])
                new = new._replace(ids=_tombstone(new.ids, c, s))
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
        mir = self._mir
        rows_d = jnp.asarray(rows.astype(np.int32))
        c_d = jnp.asarray(assign)
        s_d = jnp.asarray(slots.astype(np.int32))
        if self._dtype == jnp.int8:
            data, ids, sqnorms, scl = _pack_rows_q(
                dev.data, dev.ids, dev.sqnorms, dev.scales,
                mir.fvecs, mir.fnorms, mir.fscales, rows_d, c_d, s_d,
            )
            self._dev = dev._replace(
                data=data, ids=ids, sqnorms=sqnorms, scales=scl,
                **mir._asdict(),
            )
        else:
            data, ids, sqnorms = _pack_rows(
                dev.data, dev.ids, dev.sqnorms,
                mir.fvecs, mir.fnorms, rows_d, c_d, s_d,
            )
            self._dev = dev._replace(
                data=data, ids=ids, sqnorms=sqnorms, **mir._asdict()
            )

    def _rebuild_layout(self) -> None:
        """Re-pack live rows into capacity-padded cluster blocks.

        Assignment is capacity-balanced: clusters are capped near the mean
        occupancy and excess points spill to their next-nearest cluster, so
        the padded layout stays dense (bounded cmax = bounded scan HBM
        traffic) even on skewed corpora. Candidate clusters are scored on
        device; only the (N, m) int32 candidate table and the O(N) greedy
        assignment run on host.
        """
        # pending rows live only in the side buffer; the re-pack below reads
        # every live row from the mirror, so fold first (no placement — this
        # rebuild assigns everything)
        self._fold_pending(place=False)
        live = np.flatnonzero(self._alive[: self._n_rows])
        mean = max(1.0, live.size / self.nlist)
        cap = max(8, int(np.ceil(mean * self.balance_cap)))
        # m=8 spill candidates: enough fallthrough that the cap actually holds
        # on skewed corpora (fill stays high -> exact scans stay cheap)
        cands = self._topm_rows(live, m=min(8, self.nlist))
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
        """(Re)build the padded cluster layout from the device mirror.

        All vector bytes move HBM->HBM (device gathers + scatters); the host
        contributes only the int32 location table and the liveness/tag
        refresh (O(N) uploads, which ride DMA — fast even on throttled
        hosts)."""
        self._ensure_mirror(max(self._n_rows, 1))
        mir = self._mir
        # refresh liveness/tags from the host authority (covers external
        # _tags writes, e.g. store.load re-deriving tags)
        mcap = self._mirror_cap
        fvalid_h = np.zeros((mcap,), dtype=bool)
        fvalid_h[: self._n_rows] = self._alive[: self._n_rows]
        ftags_h = np.zeros((mcap,), dtype=np.int32)
        ftags_h[: self._n_rows] = self._tags[: self._n_rows]
        mir = mir._replace(
            fvalid=jax.device_put(fvalid_h, self._shard1()),
            ftags=jax.device_put(ftags_h, self._shard1()),
        )
        self._mir = mir

        live = np.flatnonzero(self._alive[: self._n_rows])
        c_all = self._loc[live, 0]
        s_all = self._loc[live, 1]
        quant = self._dtype == jnp.int8
        shard3 = NamedSharding(self.mesh, P(self._row_axes, None, None))
        shard2c = NamedSharding(self.mesh, P(self._row_axes, None))
        data = self._zeros((self.nlist, self.cmax, self.dim), self._dtype, shard3)
        ids = _full_fn((self.nlist, self.cmax), -1, jnp.int32, shard2c)()
        sqnorms = self._zeros((self.nlist, self.cmax), jnp.float32, shard2c)
        scales = (
            self._zeros((self.nlist, self.cmax), jnp.float32, shard2c)
            if quant
            else None
        )
        # chunk so the transient (chunk, dim) gather stays bounded at high
        # dim — budget counts BYTES (the gather materializes f32 before the
        # storage-dtype cast, so 4 B/element regardless of storage dtype)
        chunk = max(8192, min(_CHUNK_ROWS, (256 << 20) // max(self.dim * 4, 1)))
        for lo in range(0, live.size, chunk):
            hi = min(lo + chunk, live.size)
            rows_d = jnp.asarray(live[lo:hi].astype(np.int32))
            c_d = jnp.asarray(c_all[lo:hi])
            s_d = jnp.asarray(s_all[lo:hi])
            if quant:
                data, ids, sqnorms, scales = _pack_rows_q_donated(
                    data, ids, sqnorms, scales,
                    mir.fvecs, mir.fnorms, mir.fscales, rows_d, c_d, s_d,
                )
            else:
                data, ids, sqnorms = _pack_rows_donated(
                    data, ids, sqnorms, mir.fvecs, mir.fnorms, rows_d, c_d, s_d
                )
        dev = _Dev(
            data=data,
            ids=ids,
            sqnorms=sqnorms,
            scales=scales,
            centroids=jax.device_put(
                np.ascontiguousarray(self.centroids, dtype=np.float32),
                NamedSharding(self.mesh, P(None, None)),
            ),
            **mir._asdict(),
        )
        self._dev = dev  # single atomic swap
        self._dirty = False
        return dev

    @property
    def device_rescore_active(self) -> bool:
        """True when exact-path searches already return exact-grade rescored
        results — via the f32 mirror or the two-level int8 residual — so the
        store skips its host-side rescore."""
        mir = self._mir
        if mir is not None:
            return mir.frescore is not None
        return self._rescore_kind(max(self._n_rows, 1)) != "none"

    def _ensure_device(self) -> tuple:
        """Reader-side snapshot. Materialization is a WRITER responsibility
        (writers call it eagerly after layout rebuilds) because it reads host
        buffers only writers may touch; a stale-but-consistent snapshot is
        always safe to search."""
        dev = self._dev
        if dev is None:
            if self._bulk:
                raise RuntimeError(
                    "index is inside a bulk() ingest and has no materialized "
                    "snapshot yet; finish the bulk block before searching"
                )
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
        """Per-shard candidate width for the exact path (see FlatIndex).
        ``fetch_width`` overrides the auto pool (recall lever: a wider pool
        recovers more int8-ranking misses at ~linear gather cost)."""
        if rescore is None:
            return min(k, shard_rows)
        if self.fetch_width > 0:
            return min(max(self.fetch_width, k), shard_rows)
        if isinstance(rescore, tuple):
            # residual tier: selection is nearly free once the gather is
            # governed by rescore_width, and wide-dim int8 displacement
            # makes the deeper pool pay in recall (400k x 3072 at W=32:
            # fetch 96 -> 0.9992 recall@10 vs 64 -> 0.9979 at equal QPS;
            # docs/BENCHMARKS.md round 4)
            return min(max(4 * k, 96), shard_rows)
        return min(max(4 * k, 128), shard_rows)

    def _rescore_width(self, k: int, rescore) -> int:
        """Top-W gather slice (shared policy: scan.resolve_rescore_width;
        see FlatIndex._rescore_width)."""
        return resolve_rescore_width(
            self.rescore_width, self.fetch_width, k, rescore
        )

    def _score_dtype(self, rescore) -> str:
        """Experimental knob (see FlatIndex._score_dtype: measured
        QPS-neutral on chip, so auto stays float32)."""
        if self.score_dtype == "float16" and rescore is None:
            return "float32"  # nothing re-orders the quantized fp16 scores
        if self.score_dtype != "auto":
            return self.score_dtype
        return "float32"

    @property
    def rows_allocated(self) -> int:
        """Upper bound (exclusive) of valid row ids — INCLUDING tombstoned
        rows (``size`` counts live rows only and SHRINKS on delete, so it is
        NOT an id bound: after deletions, live rows carry ids >= size)."""
        return self._n_rows

    def _scan_impl(self) -> str:
        """Exact-scan kernel routing (see FlatIndex._scan_impl)."""
        if self.scan_impl != "pallas" or self.dim % 128 != 0:
            return "xla"
        return (
            "pallas" if jax.default_backend() == "tpu" else "pallas-interpret"
        )

    def _pallas_mode(self) -> str:
        """'off' | 'compiled' | 'interpret' (interpret covers CPU test meshes)."""
        if not self._pallas_eligible() or self.cmax % 128 != 0:
            return "off"
        if jax.default_backend() == "tpu":
            return "compiled"
        return "interpret" if self.use_pallas == "always" else "off"

    # Per-row fixed overhead of the probing kernel expressed in
    # dim-equivalent bytes: sequential grid-step launches, the in-VMEM
    # probe-mask pass and the k-pass top-k fold all cost the same per row
    # whether the row is 384 or 3072 bytes wide, so probing amortizes
    # better the wider the rows. Calibrated against two v5e measurements
    # (1M rows, nlist=1024, cmax=2176, int8, batch 8):
    #   dim  384: exact 2288 QPS vs probing  818 QPS -> overhead ~1.8k
    #   dim 3072: exact 1444 QPS vs probing 3615 QPS (nprobe 16) -> ~1.2k
    # (the model with 1536 predicts the 3072 speedup within 3%).
    _PROBE_ROW_OVERHEAD = 1536.0

    def _pick_mode(self, n_q_padded: int, nprobe: int, k: int) -> str:
        """Cost-based scan selection (HBM reads dominate on TPU).

        The cluster-major kernel reads each PROBED cluster once per batch
        (not once per query), so probing costs U * cmax * (dim + overhead)
        bytes where U is the expected number of distinct probed clusters
        over the whole batch; the exact path reads the flat mirror once,
        N * dim bytes, as one dense MXU matmul. Probing therefore wins on
        wide rows at small batch (few distinct clusters, overhead amortized
        by dim) and loses at large batch (the union saturates toward nlist
        while the exact scan's cost is batch-invariant).
        Exactness caveat: with ``approx_topk`` on a TPU backend the full
        scan's per-shard selection is ``lax.approx_max_k`` at
        ``approx_recall_target`` and the scoring precision is the storage
        dtype, so the scan covers every row but is NOT bit-exact — the store
        recovers exact order by over-fetching and f32-rescoring on the host
        (store._fetch_k / _rescore_host). With ``approx_topk=False`` and f32
        storage the scan is exact.
        """
        if nprobe >= self.nlist:
            return "exact"
        # expected distinct clusters probed by the batch (draws with
        # replacement across queries; exact enough for a cost model)
        draws = n_q_padded * nprobe
        u_expect = self.nlist * (1.0 - (1.0 - 1.0 / self.nlist) ** draws)
        ivf_bytes = u_expect * self.cmax * (self.dim + self._PROBE_ROW_OVERHEAD)
        # the exact path scans the flat mirror (one read per row), not the
        # padded layout
        scan_rows = self._mirror_cap or (self.nlist * self.cmax)
        if scan_rows * self.dim <= ivf_bytes:
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
            if self._bulk and self.size > 0:
                raise RuntimeError(
                    "index is inside a bulk() ingest with no materialized "
                    "snapshot; finish the bulk block before searching"
                )
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
            resc_f32, resid, rscl = split_rescore(dev.frescore)
            scores, ids = exact_scan(
                self.mesh, dev.fvecs, dev.fnorms, dev.fvalid, dev.fscales,
                resc_f32, q_dev, k_shard,
                self._fetch_width(k, shard_rows, dev.frescore),
                self.metric, self._storage_name(), self._approx(),
                self.approx_recall_target, k_eff,
                self._score_dtype(dev.frescore),
                dev.ftags if allow_tags is not None else None,
                jnp.asarray(pad_allow(allow_tags))
                if allow_tags is not None
                else None,
                self._scan_impl(),
                resid,
                rscl,
                self._rescore_width(k, dev.frescore),
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
            scores, ids = self._rescore_merged(dev, q_dev, scores, ids)
            scores, ids = scores[:, :k_eff], ids[:, :k_eff]
        scores, ids = self._merge_pending_into(scores, ids, q_dev, allow_tags)
        scores = np.asarray(scores[:n_q]).astype(np.float32)
        ids = np.asarray(ids[:n_q]).astype(np.int64)
        bad = (ids < 0) | (scores <= _NEG_INF / 2)
        scores = np.where(bad, _NEG_INF, scores)
        ids = np.where(bad, -1, ids)
        if k_eff < k:
            scores = np.pad(scores, ((0, 0), (0, k - k_eff)), constant_values=_NEG_INF)
            ids = np.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
        return scores, ids

    def _rescore_merged(self, dev, q_dev, scores, ids):
        """Post-merge exact re-ranking of probing-path candidates via the
        f32 mirror (rescore_global) or the two-level int8 residual
        (rescore_global_residual); no-op when no device rescore is active."""
        if dev.frescore is None:
            return scores, ids
        if isinstance(dev.frescore, tuple):
            exact = rescore_global_residual(
                self.mesh, dev.fvecs, dev.fscales, dev.frescore[0],
                dev.frescore[1], dev.fnorms, q_dev, ids, self.metric,
            )
        else:
            exact = rescore_global(
                self.mesh, dev.frescore, dev.fnorms, q_dev, ids, self.metric
            )
        return _resort(exact, ids)

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
            resc_f32, resid, rscl = split_rescore(dev.frescore)
            scores, ids = exact_scan(
                self.mesh, dev.fvecs, dev.fnorms, dev.fvalid, dev.fscales,
                resc_f32, q_dev, k,
                self._fetch_width(k, shard_rows, dev.frescore),
                self.metric, self._storage_name(), self._approx(),
                self.approx_recall_target, None,
                self._score_dtype(dev.frescore),
                dev.ftags if allow_tags is not None else None,
                jnp.asarray(pad_allow(allow_tags))
                if allow_tags is not None
                else None,
                self._scan_impl(),
                resid,
                rscl,
                self._rescore_width(k, dev.frescore),
            )
            return self._merge_pending_into(scores, ids, q_dev, allow_tags)
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
        scores, ids = self._rescore_merged(dev, q_dev, scores, ids)
        return self._merge_pending_into(
            scores[:, :k_eff], ids[:, :k_eff], q_dev, allow_tags
        )

    def search_device_batched(
        self, qs_dev, k: int, allow_tags=None, mode: str = "exact",
        nprobe: Optional[int] = None,
    ):
        """Search over B query batches in ONE device dispatch.

        ``qs_dev``: (B, Q, dim) replicated, metric-normalized. Identical math
        to B ``search_device`` calls; one launch instead of B (the fixed
        launch fee dominates the scan's device time on service-tunnel TPUs —
        see scan.exact_scan_batched). ``mode``: "exact" scans the flat
        mirror; "probe" chains the nprobe cluster-scan path — in its winning
        regime (wide rows, small batch) a single probe step's device time is
        far below the launch fee, so chunking multiplies measured throughput.
        """
        if mode not in ("exact", "probe"):
            raise ValueError(
                f"search_device_batched mode must be 'exact' or 'probe', "
                f"got {mode!r} (no 'auto' here: the chained launch commits "
                f"all B batches to one path)"
            )
        dev = self._ensure_device()
        if allow_tags is not None:
            mode = "exact"  # tag masking rides the flat mirror (see search())
        if mode == "exact":
            shard_rows = dev.fvecs.shape[0] // self.n_shards
            k = min(k, shard_rows)
            resc_f32, resid, rscl = split_rescore(dev.frescore)
            scores, ids = exact_scan_batched(
                self.mesh, dev.fvecs, dev.fnorms, dev.fvalid, dev.fscales,
                resc_f32, qs_dev, k,
                self._fetch_width(k, shard_rows, dev.frescore),
                self.metric, self._storage_name(), self._approx(),
                self.approx_recall_target, None,
                self._score_dtype(dev.frescore),
                dev.ftags if allow_tags is not None else None,
                jnp.asarray(pad_allow(allow_tags))
                if allow_tags is not None
                else None,
                self._scan_impl(),
                resid,
                rscl,
                self._rescore_width(k, dev.frescore),
            )
            return self._merge_pending_into_batched(
                scores, ids, qs_dev, allow_tags
            )
        np_probe = min(nprobe or self.nprobe, dev.data.shape[0])
        rows_total = dev.data.shape[0] * dev.data.shape[1]
        fetch = max(4 * k, 64) if dev.frescore is not None else k
        k_shard = min(
            fetch, dev.data.shape[1] * np_probe, rows_total // self.n_shards
        )
        k_eff = min(k, k_shard * self.n_shards)
        scales = dev.scales if dev.scales is not None else dev.sqnorms
        resc_f32, resid, rscl = split_rescore(dev.frescore)
        scores, ids = _ivf_probe_batched(
            self.mesh, dev.data, dev.ids, dev.sqnorms, scales, dev.centroids,
            resc_f32, dev.fnorms, qs_dev, k_shard, np_probe, self.metric,
            self._pallas_mode(), self._dtype == jnp.int8,
            min(fetch, k_shard * self.n_shards),
            dev.fvecs, dev.fscales, resid, rscl,
        )
        return self._merge_pending_into_batched(
            scores[:, :, :k_eff], ids[:, :, :k_eff], qs_dev, allow_tags
        )

    # -- maintenance / persistence -------------------------------------------------

    def retrain(self) -> None:
        """Re-train the quantizer on the live corpus and re-pack the layout."""
        self.train()
        self._rebuild_layout()
        self._materialize()

    def compacted(self) -> Tuple["IVFIndex", np.ndarray]:
        """Build a NEW index holding only the live rows, renumbered densely.

        Returns (new_index, remap) where remap maps old row -> new row (-1
        for dropped rows). The caller (store.compact) installs the new index
        and freshly-built row maps in ONE view swap, so lock-free readers
        can never mix post-compaction device state with pre-compaction row
        maps (the round-2 in-place compact had exactly that race)."""
        # the gather below reads every live row from the mirror; fold the
        # pending tail in first (writer-side mutation, same lock)
        self._fold_pending()
        live = np.flatnonzero(self._alive[: self._n_rows])
        remap = np.full(self._n_rows, -1, dtype=np.int64)
        remap[live] = np.arange(live.size)
        new = IVFIndex(
            self.dim,
            nlist=self.nlist,
            nprobe=self.nprobe,
            metric=self.metric,
            dtype=self._storage_name(),
            mesh=self.mesh,
            kmeans_iters=self.kmeans_iters,
            seed=self.seed,
            use_pallas=self.use_pallas,
            balance_cap=self.balance_cap,
            approx_topk=self.approx_topk,
            approx_recall_target=self.approx_recall_target,
            device_rescore=self.device_rescore,
            score_dtype=self.score_dtype,
            fetch_width=self.fetch_width,
            scan_impl=self.scan_impl,
            rescore_mode=self.rescore_mode,
            rescore_width=self.rescore_width,
        )
        new.centroids = (
            None if self.centroids is None else self.centroids.copy()
        )
        n = int(live.size)
        if n == 0:
            return new, remap
        new_rows = new._extend_meta(n, self._tags[live])
        new._ensure_mirror(n)
        # device-to-device renumbering gather: no host vector traffic
        mir, new_mir = self._mir, new._mir
        cache = new._host_cache
        for lo in range(0, n, _CHUNK_ROWS):
            hi = min(lo + _CHUNK_ROWS, n)
            src = jnp.asarray(live[lo:hi].astype(np.int32))
            dst = jnp.asarray(new_rows[lo:hi].astype(np.int32))
            tags_d = jnp.asarray(self._tags[live[lo:hi]])
            if self._dtype == jnp.int8:
                fvecs, fvalid, fnorms, fscales = _scatter_flat_q(
                    new_mir.fvecs, new_mir.fvalid, new_mir.fnorms,
                    new_mir.fscales, dst, mir.fvecs[src],
                    mir.fscales[src], mir.fnorms[src],
                )
            else:
                fvecs, fvalid, fnorms = _scatter_flat(
                    new_mir.fvecs, new_mir.fvalid, new_mir.fnorms,
                    dst, mir.fvecs[src], mir.fnorms[src],
                )
                fscales = new_mir.fscales
            frescore = new_mir.frescore
            if frescore is not None and mir.frescore is not None:
                old_resid = isinstance(mir.frescore, tuple)
                if isinstance(frescore, tuple):
                    if old_resid:
                        rq, rs = mir.frescore[0][src], mir.frescore[1][src]
                    else:  # auto-kind flip across the rebuild: re-derive
                        rq, rs = _requantize_residual(
                            mir.frescore[src], mir.fvecs[src],
                            mir.fscales[src],
                        )
                    frescore = _scatter_resid(
                        frescore[0], frescore[1], dst, rq, rs
                    )
                else:
                    xs = (
                        _gather_dequant2(
                            mir.fvecs, mir.fscales, mir.frescore[0],
                            mir.frescore[1], src,
                        )
                        if old_resid
                        else mir.frescore[src]
                    )
                    frescore = _scatter_mirror_rows(frescore, dst, xs)
            ftags = _scatter_mirror_tags(new_mir.ftags, dst, tags_d)
            new_mir = _Mirror(fvecs, fvalid, fnorms, fscales, frescore, ftags)
            if cache is not None:
                if self._host_cache is not None:
                    cache[lo:hi] = self._host_cache[live[lo:hi]]
                else:
                    cache[lo:hi] = np.asarray(
                        self._f32_chunk(src), dtype=np.float32
                    )
        new._mir = new_mir
        if not new.is_trained:
            new.train()
        new._rebuild_layout()
        new._materialize()
        return new, remap

    def compact(self) -> np.ndarray:
        """Drop tombstoned rows and re-pack IN PLACE (legacy surface).

        Internally builds the compacted index as a new object and adopts its
        state, so readers holding the previous ``_dev`` snapshot keep seeing
        a consistent pre-compaction corpus; prefer ``compacted()`` +
        a caller-side swap when row maps must change atomically too.
        Returns the remap array (old row -> new row, -1 for dropped rows).
        """
        new, remap = self.compacted()
        for name in (
            "size", "_n_rows", "_meta_cap", "_assign", "_loc", "_alive",
            "_tags", "centroids", "_counts", "cmax", "_mir", "_dirty",
            "_host_cache", "_mirror_cap", "_pend",
        ):
            setattr(self, name, getattr(new, name))
        self._dev = new._dev  # last: readers swap to the new snapshot whole
        return remap

    def state_dict(self) -> dict:
        # the host hydration below reads the mirror; pending-tail rows live
        # only in the side buffer until folded
        self._fold_pending()
        live = np.flatnonzero(self._alive[: self._n_rows])
        host = self._host
        return {
            "kind": self.kind,
            "dim": self.dim,
            "metric": self.metric,
            "nlist": self.nlist,
            "nprobe": self.nprobe,
            "centroids": None if self.centroids is None else self.centroids.copy(),
            "vectors": host[live].copy(),
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
            tags = state.get("tags")
            tags = (
                np.asarray(tags, dtype=np.int32)
                if tags is not None
                else np.zeros((vecs.shape[0],), dtype=np.int32)
            )
            # saved vectors are already metric-normalized; add() would
            # re-normalize (a no-op for unit rows) via the device path
            idx.add(vecs, tags=tags)
        return idx


@lru_cache(maxsize=None)
def _zeros_fn(shape, dtype, sharding):
    """Cached jitted allocators: device-side zeros/full in the requested
    sharding, without staging a host buffer (host allocs can be ~20 MB/s on
    throttled build VMs) and without re-tracing per call."""
    return jax.jit(partial(jnp.zeros, shape, dtype), out_shardings=sharding)


@lru_cache(maxsize=None)
def _full_fn(shape, fill, dtype, sharding):
    return jax.jit(
        partial(jnp.full, shape, fill, dtype), out_shardings=sharding
    )


@jax.jit
def _normalize_rows(x):
    x = x.astype(jnp.float32)
    n = jnp.linalg.norm(x, axis=1, keepdims=True)
    return x / jnp.maximum(n, 1e-12)


@jax.jit
def _row_norms(x):
    return jnp.sum(x.astype(jnp.float32) ** 2, axis=1)


@jax.jit
def _prep_rows_q(x):
    """On-device symmetric per-row int8 quantization + sqnorms.

    Matches flat.quantize_rows (host) and scan.quantize_queries_device."""
    x = x.astype(jnp.float32)
    norms = jnp.sum(x * x, axis=1)
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-12) / 127.0
    qx = jnp.clip(jnp.round(x / scale[:, None]), -127, 127).astype(jnp.int8)
    return qx, scale.astype(jnp.float32), norms


@jax.jit
def _prep_rows_q2(x):
    """_prep_rows_q + second-level residual quantization, one device pass.

    Matches flat.quantize_residual (host): the int8 residual carries ~8 more
    mantissa bits, so the two-level reconstruction is rank-exact for the
    fused rescore at half the gather bytes of an f32 mirror."""
    x = x.astype(jnp.float32)
    norms = jnp.sum(x * x, axis=1)
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-12) / 127.0
    qx = jnp.clip(jnp.round(x / scale[:, None]), -127, 127).astype(jnp.int8)
    r = x - qx.astype(jnp.float32) * scale[:, None]
    rs = jnp.maximum(jnp.max(jnp.abs(r), axis=1), 1e-20) / 127.0
    rq = jnp.clip(jnp.round(r / rs[:, None]), -127, 127).astype(jnp.int8)
    return qx, scale.astype(jnp.float32), norms, rq, rs.astype(jnp.float32)


@jax.jit
def _requantize_residual(frescore, fvecs, fscales):
    """Residual re-quantization FROM the f32 mirror (device pass), used when
    mirror growth crosses the f32 HBM budget and downgrades to residual."""
    r = frescore - fvecs.astype(jnp.float32) * fscales[:, None]
    rs = jnp.maximum(jnp.max(jnp.abs(r), axis=1), 1e-20) / 127.0
    rq = jnp.clip(jnp.round(r / rs[:, None]), -127, 127).astype(jnp.int8)
    return rq, rs.astype(jnp.float32)


@jax.jit
def _gather_dequant2(fvecs, fscales, fresid, frscl, idx):
    """Two-level dequantizing gather: corpus int8 + residual int8 -> ~f32."""
    return (
        fvecs[idx].astype(jnp.float32) * fscales[idx][:, None]
        + fresid[idx].astype(jnp.float32) * frscl[idx][:, None]
    )


@jax.jit
def _gather_f32(src, idx):
    return src[idx].astype(jnp.float32)


@jax.jit
def _gather_dequant(fvecs, fscales, idx):
    return fvecs[idx].astype(jnp.float32) * fscales[idx][:, None]


@partial(jax.jit, static_argnums=(2,))
def _topm_dev(x, centroids, m):
    """Per-row m nearest clusters (monotone in -||x-c||^2), on device."""
    xc = jax.lax.dot_general(
        x,
        centroids,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    c_sq = jnp.sum(centroids * centroids, axis=1)[None, :]
    _, idx = jax.lax.top_k(xc - 0.5 * c_sq, m)
    return idx.astype(jnp.int32)


@partial(jax.jit, static_argnums=(1,))
def _pad_rows(arr, new_rows):
    pad = new_rows - arr.shape[0]
    return jnp.pad(arr, ((0, pad),) + ((0, 0),) * (arr.ndim - 1))


def _pack_rows_impl(data, ids, sqnorms, fvecs, fnorms, rows, clusters, slots):
    """Scatter mirror rows into the padded cluster layout (device gather)."""
    data = data.at[clusters, slots].set(fvecs[rows].astype(data.dtype))
    ids = ids.at[clusters, slots].set(rows)
    sqnorms = sqnorms.at[clusters, slots].set(fnorms[rows])
    return data, ids, sqnorms


def _pack_rows_q_impl(
    data, ids, sqnorms, scales, fvecs, fnorms, fscales, rows, clusters, slots
):
    data = data.at[clusters, slots].set(fvecs[rows])
    ids = ids.at[clusters, slots].set(rows)
    sqnorms = sqnorms.at[clusters, slots].set(fnorms[rows])
    scales = scales.at[clusters, slots].set(fscales[rows])
    return data, ids, sqnorms, scales


# _place_rows updates READER-VISIBLE arrays (the current _Dev snapshot): no
# donation, scatter-copies keep the old snapshot intact for in-flight reads.
_pack_rows = jax.jit(_pack_rows_impl)
_pack_rows_q = jax.jit(_pack_rows_q_impl)
# _materialize builds FRESH padded arrays no reader has seen yet: donating
# the accumulators packs in place — without it the chunked scatter holds two
# copies of the (nlist, cmax, dim) layout (2 x 6.8 GB at 1M x 3072) and OOMs.
_pack_rows_donated = jax.jit(_pack_rows_impl, donate_argnums=(0, 1, 2))
_pack_rows_q_donated = jax.jit(_pack_rows_q_impl, donate_argnums=(0, 1, 2, 3))


@jax.jit
def _tombstone(ids, clusters, slots):
    return ids.at[clusters, slots].set(-1)


@jax.jit
def _resort(scores, ids):
    """Order (scores, ids) by descending score (post-rescore)."""
    s, pos = jax.lax.top_k(scores, scores.shape[1])
    return s, jnp.take_along_axis(ids, pos, axis=1)


@partial(jax.jit, static_argnums=(0, 9, 10, 11, 12, 13, 14))
def _ivf_probe_batched(mesh, data, ids, sqnorms, scales, centroids, frescore,
                       fnorms, qs, k, nprobe, metric, pallas_mode, quantized,
                       k_out, fvecs=None, fscales=None, fresid=None,
                       frscl=None):
    """B probing searches (+ optional global exact rescore) in ONE dispatch.

    lax.scan over the leading axis of ``qs`` (B, Q, d); each iteration is
    the same traced graph as `_ivf_search` (+ rescore_global[_residual] +
    _resort) — the nested jitted calls inline. See scan.exact_scan_batched
    for the launch-fee economics this amortizes."""

    def body(carry, q):
        s, i = _ivf_search(
            mesh, data, ids, sqnorms, scales, centroids, q, k, nprobe,
            metric, pallas_mode, quantized, k_out,
        )
        if frescore is not None:
            s, i = _resort(
                rescore_global(mesh, frescore, fnorms, q, i, metric), i
            )
        elif fresid is not None:
            s, i = _resort(
                rescore_global_residual(
                    mesh, fvecs, fscales, fresid, frscl, fnorms, q, i, metric
                ),
                i,
            )
        return carry, (s, i)

    _, (ss, ii) = jax.lax.scan(body, 0, qs)
    return ss, ii


@jax.jit
def _pend_set(arr, idx, vals):
    return arr.at[idx].set(vals.astype(arr.dtype))


@jax.jit
def _pend_tombstone(pids, rows):
    hit = (pids[:, None] == rows[None, :]).any(axis=1)
    return jnp.where(hit, -1, pids)


def _pending_merge_core(scores, ids, q, pvecs, pids, ptags, metric, allow):
    """Exact-scan the pending tail and fold it into (scores, ids).

    Score conventions match the main paths exactly: ip = dot on the raw
    stored vectors, cosine = dot on unit rows (queries arrive normalized),
    l2 = -||q - x||^2 (scan.py's convention)."""
    k = scores.shape[1]
    qf = q.astype(jnp.float32)
    pv = pvecs
    if metric == "cosine":
        pv = pv / jnp.maximum(
            jnp.linalg.norm(pv, axis=1, keepdims=True), 1e-9
        )
    ps = jax.lax.dot_general(
        qf, pv, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if metric == "l2":
        pn = jnp.sum(pv * pv, axis=1)
        qn = jnp.sum(qf * qf, axis=1, keepdims=True)
        ps = 2.0 * ps - pn[None, :] - qn
    valid = pids >= 0
    if allow is not None:
        valid = valid & (ptags[:, None] == allow[None, :]).any(axis=1)
    ps = jnp.where(valid[None, :], ps, _NEG_INF)
    all_s = jnp.concatenate([scores, ps], axis=1)
    all_i = jnp.concatenate(
        [ids.astype(jnp.int32), jnp.broadcast_to(pids[None, :], ps.shape)],
        axis=1,
    )
    s, pos = jax.lax.top_k(all_s, k)
    return s, jnp.take_along_axis(all_i, pos, axis=1)


@partial(jax.jit, static_argnums=(6,))
def _merge_pending(scores, ids, q, pvecs, pids, ptags, metric, allow=None):
    return _pending_merge_core(
        scores, ids, q, pvecs, pids, ptags, metric, allow
    )


@partial(jax.jit, static_argnums=(6,))
def _merge_pending_batched(
    scores, ids, qs, pvecs, pids, ptags, metric, allow=None
):
    """(B, Q, k) results + (B, Q, d) queries: vmapped pending merge."""
    return jax.vmap(
        lambda s, i, q: _pending_merge_core(
            s, i, q, pvecs, pids, ptags, metric, allow
        )
    )(scores, ids, qs)


@jax.jit
def _clear_mirror_valid(fvalid, rows):
    return fvalid.at[rows].set(False)


@jax.jit
def _scatter_mirror_tags(ftags, rows, t):
    return ftags.at[rows].set(t)


def _scatter_mirror_rows_impl(frescore, rows, x):
    return frescore.at[rows].set(x.astype(jnp.float32))


def _scatter_flat_impl(fvecs, fvalid, fnorms, rows, x, norms):
    fvecs = fvecs.at[rows].set(x.astype(fvecs.dtype))
    fvalid = fvalid.at[rows].set(True)
    fnorms = fnorms.at[rows].set(norms)
    return fvecs, fvalid, fnorms


def _scatter_flat_q_impl(fvecs, fvalid, fnorms, fscales, rows, qx, scales,
                         norms):
    fvecs = fvecs.at[rows].set(qx)
    fvalid = fvalid.at[rows].set(True)
    fnorms = fnorms.at[rows].set(norms)
    fscales = fscales.at[rows].set(scales)
    return fvecs, fvalid, fnorms, fscales


_scatter_mirror_rows = jax.jit(_scatter_mirror_rows_impl)
_scatter_flat = jax.jit(_scatter_flat_impl)
_scatter_flat_q = jax.jit(_scatter_flat_q_impl)
# donated variants for exclusive bulk builds: without donation every ingest
# scatter double-buffers the whole mirror (old + new fvecs live across the
# call), which alone is 2 x 3.07 GB at 1M x 3072 int8 and OOMs the 16 GB
# chip once the corpus-generation chunk (2.5 GB) sits beside it. Donation
# is ONLY safe when no reader snapshot can alias the mirror buffers
# (self._dev is None inside bulk()); the streaming path keeps the
# functional copies because _Dev shares the mirror arrays with readers.
def _scatter_resid_impl(fresid, frscl, rows, rq, rs):
    return fresid.at[rows].set(rq), frscl.at[rows].set(rs)


_scatter_mirror_rows_donated = jax.jit(
    _scatter_mirror_rows_impl, donate_argnums=(0,)
)
_scatter_flat_donated = jax.jit(_scatter_flat_impl, donate_argnums=(0, 1, 2))
_scatter_flat_q_donated = jax.jit(
    _scatter_flat_q_impl, donate_argnums=(0, 1, 2, 3)
)
_scatter_resid = jax.jit(_scatter_resid_impl)
_scatter_resid_donated = jax.jit(_scatter_resid_impl, donate_argnums=(0, 1))


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

        from ..ops.kernels import ivf_scan_shard, preferred_q_chunk

        # q_chunk == -1: even with dim slabs + cluster row-splits, some
        # shape combinations cannot meet the VMEM budget (huge Q x huge
        # cmax); those route to the XLA gather-scan below instead of
        # failing the Mosaic scoped-vmem allocation at compile time.
        # q_chunk < n_q: large batches run the kernel over query
        # sub-batches that keep full-cmax blocks (see preferred_q_chunk
        # — row-splitting multiplies the top-k fold count and cost 2.3x
        # probing throughput at the round-4 flagship batch).
        q_chunk = preferred_q_chunk(n_q, cmax, data_s.shape[2], quantized)
        if pallas_mode != "off" and k <= 64 and q_chunk > 0:
            kernel_kw = dict(
                k=k,
                interpret=(pallas_mode == "interpret"),
                vma=frozenset(axes),
                scales_s=scl_s,
            )
            if q_chunk < n_q:
                n_chunks = n_q // q_chunk

                def chunk_call(args):
                    qq_c, local_c, owned_c = args
                    return ivf_scan_shard(
                        data_s, ids_s, qq_c, local_c, owned_c, **kernel_kw
                    )

                s_loc, i_loc = jax.lax.map(
                    chunk_call,
                    (
                        qq.reshape(n_chunks, q_chunk, -1),
                        local.reshape(n_chunks, q_chunk, -1),
                        owned.astype(jnp.int32).reshape(
                            n_chunks, q_chunk, -1
                        ),
                    ),
                )
                s_loc = s_loc.reshape(n_q, -1)
                i_loc = i_loc.reshape(n_q, -1)
            else:
                s_loc, i_loc = ivf_scan_shard(
                    data_s, ids_s, qq, local, owned.astype(jnp.int32),
                    **kernel_kw,
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
