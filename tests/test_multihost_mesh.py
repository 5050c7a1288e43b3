"""Two-level ("dcn", "data") mesh: the simulated multi-host topology.

Corpus rows shard over BOTH axes; per-shard top-k merges hierarchically —
all-gather + reduce over the intra-host ICI axis first, so only (Q, k)
crosses the simulated DCN axis (parallel/mesh.py hierarchical_topk_merge).
Covers the reference's scale-out boundary (Milvus over gRPC,
reference src/semcode/storage/milvus_store.py:39-48) the TPU way.
"""

import numpy as np
import pytest

from semcode_tpu.index.flat import FlatIndex
from semcode_tpu.index.ivf import IVFIndex
from semcode_tpu.parallel.mesh import make_mesh, row_axes


@pytest.fixture(scope="module")
def mesh2x4():
    return make_mesh((2, 4), ("dcn", "data"))


def _oracle(x, q, k):
    scores = q @ x.T
    ids = np.argsort(-scores, axis=1)[:, :k]
    return np.take_along_axis(scores, ids, axis=1), ids


def test_row_axes_excludes_model():
    mesh = make_mesh((2, 2, 2), ("dcn", "data", "model"))
    assert row_axes(mesh) == ("dcn", "data")


def test_flat_hierarchical_merge_matches_oracle(mesh2x4, rng):
    n, d, k = 4000, 64, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[:16] + 0.02 * rng.standard_normal((16, d)).astype(np.float32)
    idx = FlatIndex(d, metric="ip", dtype="int8", mesh=mesh2x4)
    assert idx.n_shards == 8
    idx.add(x)
    s, ids = idx.search(q, k=k)
    ref_s, ref_ids = _oracle(x, q, k)
    np.testing.assert_array_equal(ids, ref_ids)
    np.testing.assert_allclose(s, ref_s, rtol=2e-6)


def test_ivf_both_modes_on_two_level_mesh(mesh2x4, rng):
    n, d, k = 4000, 64, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[rng.choice(n, 16, replace=False)] + 0.02 * rng.standard_normal(
        (16, d)
    ).astype(np.float32)
    idx = IVFIndex(
        d, nlist=32, nprobe=32, metric="ip", dtype="int8", mesh=mesh2x4
    )
    idx.add(x)
    ref_s, ref_ids = _oracle(x, q, k)
    # exact mode: flat-mirror scan + fused rescore, hierarchical merge
    s, ids = idx.search(q, k=k, mode="exact")
    np.testing.assert_array_equal(ids, ref_ids)
    # probing with full probe + rescore_global: also exact
    s, ids = idx.search(q, k=k, mode="ivf")
    np.testing.assert_array_equal(np.sort(ids, 1), np.sort(ref_ids, 1))


def test_streaming_and_tombstones_on_two_level_mesh(mesh2x4, rng):
    d, k = 32, 5
    x1 = rng.standard_normal((1200, d)).astype(np.float32)
    idx = IVFIndex(
        d, nlist=16, nprobe=16, metric="ip", dtype="float32", mesh=mesh2x4
    )
    idx.add(x1)
    _ = idx.search(x1[:1], k=1)
    x2 = rng.standard_normal((300, d)).astype(np.float32)
    idx.add(x2)
    allx = np.concatenate([x1, x2])
    q = x2[:8] + 0.01
    _, ids = idx.search(q, k=k)
    _, ref = _oracle(allx, q, k)
    np.testing.assert_array_equal(np.sort(ids, 1), np.sort(ref, 1))
    victim = int(ref[0, 0])
    idx.remove(np.array([victim]))
    _, ids = idx.search(q[:1], k=k)
    assert victim not in ids[0].tolist()
