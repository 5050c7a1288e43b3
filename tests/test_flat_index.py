"""FlatIndex correctness vs a numpy brute-force oracle, on an 8-shard mesh."""

import numpy as np
import pytest

from semcode_tpu.index.flat import FlatIndex


def _oracle(x, q, k, metric):
    if metric == "cosine":
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        scores = q @ x.T
    elif metric == "ip":
        scores = q @ x.T
    else:  # l2: higher score = closer
        scores = -np.sum((q[:, None, :] - x[None, :, :]) ** 2, axis=-1)
    ids = np.argsort(-scores, axis=1)[:, :k]
    return np.take_along_axis(scores, ids, axis=1), ids


@pytest.mark.parametrize("metric", ["ip", "cosine", "l2"])
def test_flat_matches_oracle(mesh8, rng, metric):
    n, d, k = 1000, 64, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((7, d)).astype(np.float32)
    idx = FlatIndex(d, metric=metric, dtype="float32", mesh=mesh8)
    idx.add(x)
    scores, ids = idx.search(q, k=k)
    ref_scores, ref_ids = _oracle(x, q, k, metric)
    assert set(map(tuple, ids)) == set(map(tuple, ref_ids)) or np.array_equal(
        ids, ref_ids
    ), f"ids mismatch: {ids[0]} vs {ref_ids[0]}"
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-4, atol=1e-3)


def test_flat_incremental_add(mesh8, rng):
    d = 32
    idx = FlatIndex(d, metric="ip", dtype="float32", mesh=mesh8)
    x1 = rng.standard_normal((100, d)).astype(np.float32)
    x2 = rng.standard_normal((50, d)).astype(np.float32)
    rows1 = idx.add(x1)
    # force device materialization, then add more (exercises the scatter path)
    _ = idx.search(x1[:1], k=5)
    rows2 = idx.add(x2)
    assert rows1.tolist() == list(range(100))
    assert rows2.tolist() == list(range(100, 150))
    allx = np.concatenate([x1, x2])
    q = rng.standard_normal((3, d)).astype(np.float32)
    scores, ids = idx.search(q, k=10)
    _, ref_ids = _oracle(allx, q, 10, "ip")
    np.testing.assert_array_equal(ids, ref_ids)


def test_flat_growth_and_update(mesh8, rng):
    d = 16
    idx = FlatIndex(d, metric="ip", dtype="float32", mesh=mesh8, capacity=128)
    x = rng.standard_normal((500, d)).astype(np.float32)  # forces growth
    idx.add(x)
    assert idx.capacity >= 500
    # overwrite row 0 with a vector identical to a probe -> becomes top hit
    probe = rng.standard_normal((1, d)).astype(np.float32) * 10
    idx.update_rows(np.array([0]), probe)
    _, ids = idx.search(probe, k=1)
    assert ids[0, 0] == 0


def test_flat_empty_and_small(mesh8, rng):
    d = 8
    idx = FlatIndex(d, metric="ip", dtype="float32", mesh=mesh8)
    scores, ids = idx.search(rng.standard_normal((2, d)).astype(np.float32), k=5)
    assert (ids == -1).all()
    idx.add(rng.standard_normal((3, d)).astype(np.float32))
    scores, ids = idx.search(rng.standard_normal((2, d)).astype(np.float32), k=5)
    assert (ids[:, :3] >= 0).all() and (ids[:, 3:] == -1).all()


def test_flat_bf16_recall(mesh8, rng):
    # bf16 storage must keep recall@10 high vs the f32 oracle
    n, d, k = 2000, 128, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((16, d)).astype(np.float32)
    idx = FlatIndex(d, metric="ip", dtype="bfloat16", mesh=mesh8)
    idx.add(x)
    _, ids = idx.search(q, k=k)
    _, ref_ids = _oracle(x, q, k, "ip")
    recall = np.mean(
        [len(set(a) & set(b)) / k for a, b in zip(ids.tolist(), ref_ids.tolist())]
    )
    assert recall >= 0.9, f"bf16 recall too low: {recall}"


def test_flat_state_roundtrip(mesh8, rng):
    d = 24
    idx = FlatIndex(d, metric="cosine", dtype="float32", mesh=mesh8)
    x = rng.standard_normal((200, d)).astype(np.float32)
    idx.add(x)
    state = idx.state_dict()
    idx2 = FlatIndex.from_state(state, dtype="float32", mesh=mesh8)
    q = rng.standard_normal((4, d)).astype(np.float32)
    s1, i1 = idx.search(q, k=7)
    s2, i2 = idx2.search(q, k=7)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_flat_int8_recall(mesh8, rng):
    n, d, k = 2000, 128, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((16, d)).astype(np.float32)
    idx = FlatIndex(d, metric="ip", dtype="int8", mesh=mesh8)
    idx.add(x)
    _ = idx.search(q[:1], k=1)  # materialize, then exercise the int8 scatter
    x2 = rng.standard_normal((100, d)).astype(np.float32)
    idx.add(x2)
    allx = np.concatenate([x, x2])
    _, ids = idx.search(q, k=k)
    ref_ids = np.argsort(-(q @ allx.T), axis=1)[:, :k]
    recall = np.mean(
        [len(set(a) & set(b)) / k for a, b in zip(ids.tolist(), ref_ids.tolist())]
    )
    assert recall >= 0.85, f"int8 recall too low: {recall}"


def test_flat_f16_scores_with_rescore_match_oracle(mesh8, rng):
    """Forced fp16 score matrix (experimental knob; measured QPS-neutral on
    chip, auto stays f32): the fused rescore must keep final ordering exact
    vs the numpy oracle."""
    n, d, k = 2000, 128, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[:16] + 0.05 * rng.standard_normal((16, d)).astype(np.float32)
    idx = FlatIndex(d, metric="ip", dtype="int8", mesh=mesh8,
                    device_rescore=True, score_dtype="float16")
    idx.add(x)
    vecs, norms, valid, scales, rescore, _tags = idx._ensure_device()
    assert rescore is not None
    assert idx._score_dtype(rescore) == "float16"
    # auto (and fp16-without-rescore) resolve to f32
    auto_idx = FlatIndex(d, metric="ip", dtype="int8", mesh=mesh8)
    assert auto_idx._score_dtype(rescore) == "float32"
    assert idx._score_dtype(None) == "float32"
    _, ids = idx.search(q, k=k)
    ref_ids = np.argsort(-(q @ x.T), axis=1)[:, :k]
    recall = np.mean(
        [len(set(a) & set(b)) / k for a, b in zip(ids.tolist(), ref_ids.tolist())]
    )
    assert recall >= 0.95, f"f16-score recall too low: {recall}"
    # forcing f32 scores must also work and agree on the top hit
    idx32 = FlatIndex(d, metric="ip", dtype="int8", mesh=mesh8,
                      device_rescore=True, score_dtype="float32")
    idx32.add(x)
    _, ids32 = idx32.search(q, k=k)
    np.testing.assert_array_equal(ids[:, 0], ids32[:, 0])


def test_flat_allow_tags_masks_on_device(mesh8, rng):
    n, d, k = 1000, 64, 5
    x = rng.standard_normal((n, d)).astype(np.float32)
    tags = (np.arange(n) % 3).astype(np.int32)  # three tenants
    idx = FlatIndex(d, metric="ip", dtype="float32", mesh=mesh8)
    idx.add(x, tags=tags)
    q = x[:8]
    _, ids = idx.search(q, k=k, allow_tags=[1])
    assert (ids >= 0).all()
    assert (tags[ids.ravel()] == 1).all()  # only tenant-1 rows surface
    # oracle: best tenant-1 row for each query
    masked = np.where((tags == 1)[None, :], q @ x.T, -np.inf)
    np.testing.assert_array_equal(ids[:, 0], np.argmax(masked, axis=1))
    # unfiltered search unaffected
    _, ids_all = idx.search(q, k=1)
    np.testing.assert_array_equal(ids_all[:, 0], np.arange(8))


@pytest.mark.parametrize("metric", ["cosine", "l2"])
def test_flat_allow_tags_other_metrics(mesh8, rng, metric):
    """Tag masking composes with cosine/l2 scoring (the mask folds into the
    liveness vector before the metric-specific score transform)."""
    n, d, k = 600, 32, 5
    x = rng.standard_normal((n, d)).astype(np.float32)
    tags = (np.arange(n) % 2).astype(np.int32)
    idx = FlatIndex(d, metric=metric, dtype="float32", mesh=mesh8)
    idx.add(x, tags=tags)
    q = x[:4] * (1.7 if metric == "cosine" else 1.0)
    _, ids = idx.search(q, k=k, allow_tags=[0])
    assert (ids >= 0).all() and (tags[ids.ravel()] == 0).all()
    if metric == "cosine":
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        scores = qn @ xn.T
    else:
        scores = -np.sum((q[:, None, :] - x[None, :, :]) ** 2, axis=-1)
    masked = np.where((tags == 0)[None, :], scores, -np.inf)
    np.testing.assert_array_equal(ids[:, 0], np.argmax(masked, axis=1))


def test_flat_update_rows_moves_tags(mesh8, rng):
    """Upserting a row into a different tenant must move its tag."""
    d = 16
    idx = FlatIndex(d, metric="ip", dtype="float32", mesh=mesh8)
    x = rng.standard_normal((50, d)).astype(np.float32)
    idx.add(x, tags=np.zeros(50, dtype=np.int32))
    _ = idx.search(x[:1], k=1)  # materialize; update goes via scatter
    strong = (x[7] * 10).astype(np.float32)
    idx.update_rows(np.array([7]), strong[None, :], tags=np.array([3]))
    _, ids = idx.search(strong[None, :], k=1, allow_tags=[3])
    assert ids[0, 0] == 7
    _, ids0 = idx.search(strong[None, :], k=1, allow_tags=[0])
    assert ids0[0, 0] != 7  # no longer visible under the old tenant
