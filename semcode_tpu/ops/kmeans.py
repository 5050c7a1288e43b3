"""Batched Lloyd's k-means on TPU.

The IVF coarse quantizer is trained entirely on device: the full Lloyd
iteration loop runs inside ONE jit (`lax.fori_loop`), so a build is a single
dispatch regardless of iteration count — assignment is an MXU matmul + argmin,
the centroid update is a one-hot matmul, and empty clusters re-seed from
pre-drawn random sample rows. Training uses a subsample of the corpus
(<= 256 points per centroid, the faiss/Milvus default) which is
recall-neutral and bounds build cost; the final full-corpus assignment pass
streams in batches. (The reference delegates all of this to the Milvus
server; see SURVEY.md section 2 row 20.)
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

TRAIN_POINTS_PER_CENTROID = 256


@jax.jit
def _assign_step(x, centroids):
    """Return (assignments, min_dists) for one batch. x:(B,d) f32, c:(K,d) f32."""
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 is constant per row.
    xc = jax.lax.dot_general(
        x,
        centroids,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, K)
    c_sq = jnp.sum(centroids * centroids, axis=1)[None, :]
    d2 = c_sq - 2.0 * xc
    assign = jnp.argmin(d2, axis=1).astype(jnp.int32)
    mind = jnp.min(d2, axis=1) + jnp.sum(x * x, axis=1)
    return assign, jnp.maximum(mind, 0.0)


@partial(jax.jit, static_argnums=(1,))
def _kmeanspp_init(x, k, key):
    """k-means++ (D^2 sampling) as one fused scan — avoids the random-init
    failure mode where a dense region grabs two centroids and a real cluster
    is orphaned. O(k * S * d) on the MXU, one dispatch."""
    s, d = x.shape
    x_sq = jnp.sum(x * x, axis=1)
    first = jax.random.randint(key, (), 0, s)
    c0 = x[first]
    mind0 = jnp.maximum(x_sq - 2.0 * (x @ c0) + jnp.sum(c0 * c0), 0.0)
    keys = jax.random.split(key, k)

    def step(carry, key_i):
        mind, _ = carry
        total = jnp.maximum(jnp.sum(mind), 1e-12)
        u = jax.random.uniform(key_i) * total
        idx = jnp.searchsorted(jnp.cumsum(mind), u)
        idx = jnp.clip(idx, 0, s - 1)
        c = x[idx]
        d2 = jnp.maximum(x_sq - 2.0 * (x @ c) + jnp.sum(c * c), 0.0)
        return (jnp.minimum(mind, d2), 0), c

    (_, _), centers = jax.lax.scan(step, (mind0, 0), keys[1:])
    return jnp.concatenate([c0[None, :], centers], axis=0)


@partial(jax.jit, static_argnums=(2,))
def _lloyd(x, init_centroids, iters, reseed_rows):
    """Full Lloyd loop in one jit. x:(S,d), init:(K,d), reseed:(iters,K) i32."""
    k = init_centroids.shape[0]

    def body(i, centroids):
        xc = jax.lax.dot_general(
            x,
            centroids,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        c_sq = jnp.sum(centroids * centroids, axis=1)[None, :]
        assign = jnp.argmin(c_sq - 2.0 * xc, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)  # (S, K)
        sums = jax.lax.dot_general(
            onehot,
            x,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        counts = jnp.sum(onehot, axis=0)
        new_c = sums / jnp.maximum(counts[:, None], 1.0)
        empty = counts < 0.5
        candidates = x[reseed_rows[i]]  # (K, d) random sample rows
        return jnp.where(empty[:, None], candidates, new_c)

    return jax.lax.fori_loop(0, iters, body, init_centroids)


def kmeans_fit_dev(
    sample_dev,
    n_clusters: int,
    *,
    iters: int = 12,
    seed: int = 0,
) -> np.ndarray:
    """Fit k-means on an ALREADY-ON-DEVICE f32 sample; returns centroids.

    The device-authoritative IVF build path gathers its training subsample
    from the HBM-resident mirror, so no corpus bytes touch the host — on
    throttled shared hosts the round-2 host-side sample gather alone cost
    minutes. Only the (K, d) centroids are fetched back.
    """
    s, d = sample_dev.shape
    k = int(n_clusters)
    rng = np.random.default_rng(seed)
    if s <= k:
        sample = np.asarray(sample_dev, dtype=np.float32)
        centroids = np.zeros((k, d), dtype=np.float32)
        centroids[:s] = sample
        if 0 < s < k:
            centroids[s:] = sample[rng.integers(0, s, size=k - s)]
        return centroids
    init = _kmeanspp_init(sample_dev, k, jax.random.PRNGKey(seed))
    reseed = rng.integers(0, s, size=(iters, k)).astype(np.int32)
    return np.asarray(
        _lloyd(sample_dev, init, int(iters), jnp.asarray(reseed)),
        dtype=np.float32,
    )


def kmeans_fit(
    x: np.ndarray,
    n_clusters: int,
    *,
    iters: int = 12,
    batch_size: int = 131072,
    seed: int = 0,
    tol: float = 1e-4,  # kept for API compat; loop is fixed-iteration
) -> Tuple[np.ndarray, np.ndarray]:
    """Fit k-means; returns (centroids (K,d) f32, assignments (N,) int32)."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    n, d = x.shape
    k = int(n_clusters)
    rng = np.random.default_rng(seed)
    if n <= k:
        centroids = np.zeros((k, d), dtype=np.float32)
        centroids[:n] = x
        if 0 < n < k:
            centroids[n:] = x[rng.integers(0, n, size=k - n)]
        return centroids, np.arange(n, dtype=np.int32) % max(k, 1)

    # faiss-style training subsample: enough points per centroid, bounded cost
    max_train = k * TRAIN_POINTS_PER_CENTROID
    if n > max_train:
        sample = x[rng.choice(n, size=max_train, replace=False)]
    else:
        sample = x
    init = np.asarray(
        _kmeanspp_init(jnp.asarray(sample), k, jax.random.PRNGKey(seed))
    )
    reseed = rng.integers(0, sample.shape[0], size=(iters, k)).astype(np.int32)
    centroids = np.asarray(
        _lloyd(jnp.asarray(sample), jnp.asarray(init), int(iters), jnp.asarray(reseed))
    )

    assign_all = assign_clusters(x, centroids, batch_size=batch_size)
    return centroids, assign_all


def assign_clusters(
    x: np.ndarray, centroids: np.ndarray, batch_size: int = 131072
) -> np.ndarray:
    """Coarse-quantizer assignment of new vectors (streaming insert path)."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    c = jnp.asarray(centroids, dtype=jnp.float32)
    out = np.zeros(x.shape[0], dtype=np.int32)
    for b in range(0, x.shape[0], batch_size):
        xb = jnp.asarray(x[b : b + batch_size])
        assign, _ = _assign_step(xb, c)
        out[b : b + assign.shape[0]] = np.asarray(assign)
    return out


@partial(jax.jit, static_argnums=(2,))
def _topm_step(x, centroids, m):
    xc = jax.lax.dot_general(
        x,
        centroids,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    c_sq = jnp.sum(centroids * centroids, axis=1)[None, :]
    score = xc - 0.5 * c_sq  # monotone in -||x-c||^2
    _, idx = jax.lax.top_k(score, m)
    return idx.astype(jnp.int32)


def topm_clusters(
    x: np.ndarray, centroids: np.ndarray, m: int = 4, batch_size: int = 131072
) -> np.ndarray:
    """Per-point m nearest clusters (for capacity-balanced assignment)."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    c = jnp.asarray(centroids, dtype=jnp.float32)
    out = np.zeros((x.shape[0], m), dtype=np.int32)
    for b in range(0, x.shape[0], batch_size):
        xb = jnp.asarray(x[b : b + batch_size])
        out[b : b + xb.shape[0]] = np.asarray(_topm_step(xb, c, m))
    return out


def balanced_assign(
    candidates: np.ndarray,
    n_clusters: int,
    cap: int,
    counts: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Greedy capacity-capped assignment with spill to next-nearest cluster.

    Keeps every cluster at <= cap entries so the capacity-padded TPU layout is
    dense (bounded cmax = bounded scan bandwidth), trading a small recall hit:
    a spilled point lands in its 2nd..mth nearest cluster, which a query
    probing nprobe >= 2 clusters usually still reaches. Points whose m
    candidates are ALL full are redistributed to the least-loaded clusters
    (strict cap: they stay reachable through the exact-scan/rescore paths,
    and the padded layout never blows up on hot regions).
    """
    n, m = candidates.shape
    base = (
        counts.astype(np.int64)
        if counts is not None
        else np.zeros(n_clusters, dtype=np.int64)
    )
    assign = candidates[:, 0].astype(np.int32).copy()

    def overflow_points():
        order = np.argsort(assign, kind="stable")
        sorted_assign = assign[order]
        block_start = np.searchsorted(sorted_assign, sorted_assign)
        rank = np.arange(n) - block_start + base[sorted_assign]
        return order[rank >= cap]

    # eviction rounds, fully vectorized: points beyond a cluster's remaining
    # capacity fall through to their next-nearest candidate
    for r in range(1, m):
        evict = overflow_points()
        if evict.size == 0:
            return assign
        assign[evict] = candidates[evict, r]
    # strict pass: pack the remaining overflow into clusters with free space
    evict = overflow_points()
    if evict.size:
        occ = np.bincount(assign, minlength=n_clusters) + base
        free_slots = np.maximum(cap - occ, 0)
        # clusters repeated by their free capacity, least-loaded first
        order = np.argsort(-free_slots, kind="stable")
        targets = np.repeat(order, free_slots[order])
        take = min(evict.size, targets.size)
        assign[evict[:take]] = targets[:take].astype(np.int32)
        # if space genuinely ran out (cap * n_clusters < n), leave the rest
    return assign
