"""k-means + balanced assignment unit coverage."""

import numpy as np

from semcode_tpu.ops.kmeans import (
    assign_clusters,
    balanced_assign,
    kmeans_fit,
    topm_clusters,
)


def test_kmeans_separated_clusters(rng):
    d, k = 16, 4
    centers = rng.standard_normal((k, d)).astype(np.float32) * 10
    x = np.concatenate(
        [c + 0.1 * rng.standard_normal((50, d)).astype(np.float32) for c in centers]
    )
    centroids, assign = kmeans_fit(x, k, iters=8, seed=0)
    assert centroids.shape == (k, d)
    # quantization error must be noise-scale, far below inter-center distance
    # (k-means may split/merge specific clusters; the error bound is robust)
    err = np.linalg.norm(x - centroids[assign], axis=1)
    assert float(err.mean()) < 2.0, err.mean()
    # streaming assignment agrees with training assignment
    again = assign_clusters(x, centroids)
    np.testing.assert_array_equal(again, assign)


def test_kmeans_fewer_points_than_clusters(rng):
    x = rng.standard_normal((3, 8)).astype(np.float32)
    centroids, assign = kmeans_fit(x, 16, seed=0)
    assert centroids.shape == (16, 8)
    assert assign.shape == (3,)


def test_balanced_assign_respects_cap(rng):
    n, k, cap, m = 1000, 10, 120, 4
    # adversarial: everyone's first choice is cluster 0
    cands = np.zeros((n, m), dtype=np.int32)
    cands[:, 1] = rng.integers(0, k, n)
    cands[:, 2] = rng.integers(0, k, n)
    cands[:, 3] = rng.integers(0, k, n)
    assign = balanced_assign(cands, k, cap)
    counts = np.bincount(assign, minlength=k)
    assert counts.max() <= cap, counts
    assert counts.sum() == n


def test_balanced_assign_strict_overflow_redistribution():
    # all candidates point at cluster 0, cap forces redistribution anywhere
    n, k, cap = 300, 8, 50
    cands = np.zeros((n, 4), dtype=np.int32)
    assign = balanced_assign(cands, k, cap)
    counts = np.bincount(assign, minlength=k)
    assert counts.max() <= cap
    assert counts.sum() == n


def test_topm_orders_by_distance(rng):
    d = 8
    centroids = np.eye(4, d).astype(np.float32) * 5
    x = centroids[2:3] + 0.01
    top = topm_clusters(x, centroids, m=3)
    assert top[0, 0] == 2
