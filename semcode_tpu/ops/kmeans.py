"""Batched Lloyd's k-means on TPU.

The IVF coarse quantizer is trained entirely on device: assignment is one MXU
matmul (argmin of ||x - c||^2 via the -2x.c + ||c||^2 expansion) and the
centroid update is a one-hot matmul (counts + sums in f32), so every Lloyd
iteration is a single fused jit step. Empty clusters are re-seeded from the
points currently farthest from their centroid — matching the behavior class of
Milvus/faiss k-means (the reference delegates this entirely to the Milvus
server; see SURVEY.md section 2 row 20).

Training data bigger than one device batch is handled by minibatch epochs with
running (sum, count) accumulators.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnums=())
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


@jax.jit
def _accumulate(x, assign, sums, counts):
    onehot = jax.nn.one_hot(assign, sums.shape[0], dtype=jnp.float32)  # (B, K)
    sums = sums + jax.lax.dot_general(
        onehot,
        x,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    counts = counts + jnp.sum(onehot, axis=0)
    return sums, counts


def kmeans_fit(
    x: np.ndarray,
    n_clusters: int,
    *,
    iters: int = 12,
    batch_size: int = 65536,
    seed: int = 0,
    tol: float = 1e-4,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fit k-means; returns (centroids (K,d) f32, assignments (N,) int32)."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    n, d = x.shape
    k = int(n_clusters)
    rng = np.random.default_rng(seed)
    if n <= k:
        centroids = np.zeros((k, d), dtype=np.float32)
        centroids[:n] = x
        if n < k:
            centroids[n:] = x[rng.integers(0, max(n, 1), size=k - n)] if n else 0.0
        return centroids, np.arange(n, dtype=np.int32) % max(k, 1)

    # init: random distinct samples (k-means++ is overkill for IVF training and
    # serializes badly; random init + enough Lloyd iterations matches recall)
    centroids = jnp.asarray(x[rng.choice(n, size=k, replace=False)])

    n_batches = (n + batch_size - 1) // batch_size
    prev_inertia = np.inf
    assign_all = np.zeros(n, dtype=np.int32)
    for it in range(iters):
        sums = jnp.zeros((k, d), dtype=jnp.float32)
        counts = jnp.zeros((k,), dtype=jnp.float32)
        inertia = 0.0
        farthest_val = -np.inf
        farthest_idx = 0
        for b in range(n_batches):
            xb = jnp.asarray(x[b * batch_size : (b + 1) * batch_size])
            assign, mind = _assign_step(xb, centroids)
            sums, counts = _accumulate(xb, assign, sums, counts)
            mind_np = np.asarray(mind)
            inertia += float(mind_np.sum())
            assign_all[b * batch_size : b * batch_size + xb.shape[0]] = np.asarray(
                assign
            )
            bi = int(mind_np.argmax())
            if mind_np[bi] > farthest_val:
                farthest_val = float(mind_np[bi])
                farthest_idx = b * batch_size + bi
        counts_np = np.asarray(counts)
        new_centroids = np.asarray(sums) / np.maximum(counts_np[:, None], 1.0)
        empty = counts_np < 0.5
        if empty.any():
            # re-seed empties: farthest point + random samples
            idxs = rng.choice(n, size=int(empty.sum()), replace=False)
            idxs[0] = farthest_idx
            new_centroids[empty] = x[idxs]
        centroids = jnp.asarray(new_centroids)
        if prev_inertia - inertia <= tol * max(abs(prev_inertia), 1.0) and it > 0:
            break
        prev_inertia = inertia

    # final assignment pass with the converged centroids
    for b in range(n_batches):
        xb = jnp.asarray(x[b * batch_size : (b + 1) * batch_size])
        assign, _ = _assign_step(xb, centroids)
        assign_all[b * batch_size : b * batch_size + xb.shape[0]] = np.asarray(assign)
    return np.asarray(centroids), assign_all


def assign_clusters(
    x: np.ndarray, centroids: np.ndarray, batch_size: int = 65536
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
    x: np.ndarray, centroids: np.ndarray, m: int = 4, batch_size: int = 65536
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
    probing nprobe >= 2 clusters usually still reaches. If all m candidates
    are full, the least-full candidate takes the overflow (cap is then
    exceeded; the caller re-pads).
    """
    n, m = candidates.shape
    base = (
        counts.astype(np.int64)
        if counts is not None
        else np.zeros(n_clusters, dtype=np.int64)
    )
    assign = candidates[:, 0].astype(np.int32).copy()
    # eviction rounds, fully vectorized: points beyond a cluster's remaining
    # capacity fall through to their next-nearest candidate
    for r in range(1, m):
        order = np.argsort(assign, kind="stable")
        sorted_assign = assign[order]
        block_start = np.searchsorted(sorted_assign, sorted_assign)
        rank = np.arange(n) - block_start + base[sorted_assign]
        evict = order[rank >= cap]
        if evict.size == 0:
            return assign
        assign[evict] = candidates[evict, r]
    return assign
