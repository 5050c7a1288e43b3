"""Exact-scan engine v2: int8 integer-exact scoring + fused f32 device rescore.

Design contract (index/scan.py): with int8 storage, quantized queries, and
the f32 rescore mirror, final ids/scores EXACTLY match the f32 brute-force
oracle whenever the true top-k survive the candidate fetch — which a
128-deep fetch guarantees on these corpora.
"""

import numpy as np

from semcode_tpu.index.flat import FlatIndex
from semcode_tpu.index.ivf import IVFIndex


def _oracle(x, q, k):
    scores = q @ x.T
    ids = np.argsort(-scores, axis=1)[:, :k]
    return np.take_along_axis(scores, ids, axis=1), ids


def test_flat_int8_rescore_matches_f32_oracle_exactly(mesh8, rng):
    n, d, k = 3000, 64, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[:16] + 0.02 * rng.standard_normal((16, d)).astype(np.float32)
    idx = FlatIndex(d, metric="ip", dtype="int8", mesh=mesh8)
    idx.add(x)
    assert idx.device_rescore_active
    s, ids = idx.search(q, k=k)
    ref_s, ref_ids = _oracle(x, q, k)
    np.testing.assert_array_equal(ids, ref_ids)
    np.testing.assert_allclose(s, ref_s, rtol=2e-6)


def test_ivf_exact_mode_int8_rescore_matches_oracle(mesh8, rng):
    n, d, k = 4000, 64, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[rng.choice(n, 16, replace=False)] + 0.02 * rng.standard_normal(
        (16, d)
    ).astype(np.float32)
    idx = IVFIndex(d, nlist=32, nprobe=8, metric="ip", dtype="int8", mesh=mesh8)
    idx.add(x)
    assert idx.device_rescore_active
    s, ids = idx.search(q, k=k, mode="exact")
    ref_s, ref_ids = _oracle(x, q, k)
    np.testing.assert_array_equal(ids, ref_ids)
    np.testing.assert_allclose(s, ref_s, rtol=2e-6)


def test_ivf_mirror_tracks_streaming_adds_and_removes(mesh8, rng):
    d, k = 32, 5
    x1 = rng.standard_normal((1500, d)).astype(np.float32)
    idx = IVFIndex(d, nlist=16, nprobe=16, metric="ip", dtype="int8", mesh=mesh8)
    idx.add(x1)
    _ = idx.search(x1[:1], k=1)  # materialize
    x2 = rng.standard_normal((300, d)).astype(np.float32)
    idx.add(x2)  # streaming scatter must also update the flat mirror
    allx = np.concatenate([x1, x2])
    q = x2[:8] + 0.01
    _, ids = idx.search(q, k=k, mode="exact")
    _, ref_ids = _oracle(allx, q, k)
    np.testing.assert_array_equal(np.sort(ids, 1), np.sort(ref_ids, 1))
    # removal clears the mirror too
    victim = int(ref_ids[0, 0])
    idx.remove(np.array([victim]))
    _, ids = idx.search(q[:1], k=k, mode="exact")
    assert victim not in ids[0].tolist()


def test_flat_f32_has_no_mirror(mesh8, rng):
    idx = FlatIndex(16, metric="ip", dtype="float32", mesh=mesh8)
    idx.add(rng.standard_normal((200, 16)).astype(np.float32))
    assert not idx.device_rescore_active  # storage already exact


def test_rescore_budget_guard(mesh8):
    # forcing the flag wins over the auto budget
    a = FlatIndex(64, dtype="int8", mesh=mesh8, device_rescore=False)
    assert not a.device_rescore_active
    b = FlatIndex(64, dtype="int8", mesh=mesh8, device_rescore=True)
    assert b.device_rescore_active


def test_l2_int8_rescore(mesh8, rng):
    n, d, k = 2000, 32, 5
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = x[:8] + 0.05 * rng.standard_normal((8, d)).astype(np.float32)
    idx = FlatIndex(d, metric="l2", dtype="int8", mesh=mesh8)
    idx.add(x)
    _, ids = idx.search(q, k=k)
    d2 = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    ref = np.argsort(d2, axis=1)[:, :k]
    np.testing.assert_array_equal(ids, ref)


def test_flat_batched_dispatch_matches_per_batch(mesh8, rng):
    """exact_scan_batched folds B batches into one dispatch; results must be
    bit-identical to B separate search_device calls (same math, different
    launch economics)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n, d, k, b, qn = 2048, 64, 5, 3, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    qs = rng.standard_normal((b, qn, d)).astype(np.float32)
    idx = FlatIndex(d, metric="ip", dtype="int8", mesh=mesh8)
    idx.add(x)
    rep = NamedSharding(mesh8, P(None, None))
    s_b, i_b = idx.search_device_batched(
        jax.device_put(jnp.asarray(qs), NamedSharding(mesh8, P(None, None, None))),
        k,
    )
    s_b, i_b = np.asarray(s_b), np.asarray(i_b)
    assert s_b.shape == (b, qn, k) and i_b.shape == (b, qn, k)
    for bi in range(b):
        s1, i1 = idx.search_device(jax.device_put(jnp.asarray(qs[bi]), rep), k)
        np.testing.assert_array_equal(i_b[bi], np.asarray(i1))
        np.testing.assert_allclose(s_b[bi], np.asarray(s1), rtol=1e-6)


def test_ivf_batched_dispatch_matches_exact_mode(mesh8, rng):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n, d, k, b, qn = 3000, 64, 10, 2, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    qs = x[: b * qn].reshape(b, qn, d) + 0.01 * rng.standard_normal(
        (b, qn, d)
    ).astype(np.float32)
    idx = IVFIndex(d, nlist=16, nprobe=4, metric="ip", dtype="int8", mesh=mesh8)
    idx.add(x)
    s_b, i_b = idx.search_device_batched(
        jax.device_put(
            jnp.asarray(qs), NamedSharding(mesh8, P(None, None, None))
        ),
        k,
    )
    s_b, i_b = np.asarray(s_b), np.asarray(i_b)
    rep = NamedSharding(mesh8, P(None, None))
    for bi in range(b):
        s1, i1 = idx.search_device(
            jax.device_put(jnp.asarray(qs[bi]), rep), k, mode="exact"
        )
        np.testing.assert_array_equal(i_b[bi], np.asarray(i1))
        np.testing.assert_allclose(s_b[bi], np.asarray(s1), rtol=1e-6)


def test_ivf_batched_probe_matches_per_batch(mesh8, rng):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n, d, k, b, qn = 3000, 64, 10, 2, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    qs = x[: b * qn].reshape(b, qn, d) + 0.01 * rng.standard_normal(
        (b, qn, d)
    ).astype(np.float32)
    idx = IVFIndex(d, nlist=16, nprobe=8, metric="ip", dtype="int8", mesh=mesh8)
    idx.add(x)
    s_b, i_b = idx.search_device_batched(
        jax.device_put(
            jnp.asarray(qs), NamedSharding(mesh8, P(None, None, None))
        ),
        k,
        mode="probe",
    )
    s_b, i_b = np.asarray(s_b), np.asarray(i_b)
    rep = NamedSharding(mesh8, P(None, None))
    for bi in range(b):
        s1, i1 = idx.search_device(
            jax.device_put(jnp.asarray(qs[bi]), rep), k, mode="ivf"
        )
        np.testing.assert_array_equal(i_b[bi], np.asarray(i1))
        np.testing.assert_allclose(s_b[bi], np.asarray(s1), rtol=1e-6)
