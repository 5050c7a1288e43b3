"""IVFIndex recall and streaming behavior vs brute-force oracle (8-shard mesh)."""

import numpy as np
import pytest

from semcode_tpu.index.ivf import IVFIndex


def _clustered(rng, n, d, n_centers=40, spread=0.15):
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    assign = rng.integers(0, n_centers, size=n)
    return (
        centers[assign] + spread * rng.standard_normal((n, d)).astype(np.float32)
    ).astype(np.float32)


def _recall(ids, ref_ids):
    k = ref_ids.shape[1]
    return np.mean(
        [len(set(a) & set(b)) / k for a, b in zip(ids.tolist(), ref_ids.tolist())]
    )


def _oracle_ids(x, q, k):
    scores = q @ x.T
    return np.argsort(-scores, axis=1)[:, :k]


def test_ivf_recall_vs_oracle(mesh8, rng):
    n, d, k = 5000, 64, 10
    x = _clustered(rng, n, d)
    q = _clustered(rng, 32, d)
    idx = IVFIndex(d, nlist=64, nprobe=16, metric="ip", dtype="float32", mesh=mesh8)
    idx.add(x)
    _, ids = idx.search(q, k=k, mode="ivf")  # force the probing path
    ref = _oracle_ids(x, q, k)
    rec = _recall(ids, ref)
    assert rec >= 0.95, f"recall@10 too low: {rec}"


def test_ivf_exact_scan_mode_is_exact(mesh8, rng):
    n, d, k = 4000, 64, 10
    x = _clustered(rng, n, d)
    q = _clustered(rng, 32, d)
    idx = IVFIndex(d, nlist=64, nprobe=4, metric="ip", dtype="float32", mesh=mesh8)
    idx.add(x)
    _, ids = idx.search(q, k=k, mode="exact")
    ref = _oracle_ids(x, q, k)
    assert _recall(ids, ref) == 1.0
    # auto mode on a large batch must also pick the exact path
    assert idx._pick_mode(32, 16, k) == "exact" or idx.nlist > 32 * 16


def test_ivf_full_probe_is_exact(mesh8, rng):
    # nprobe == nlist must reproduce the exact scan
    n, d, k = 2000, 32, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((8, d)).astype(np.float32)
    idx = IVFIndex(d, nlist=16, nprobe=16, metric="ip", dtype="float32", mesh=mesh8)
    idx.add(x)
    _, ids = idx.search(q, k=k)
    ref = _oracle_ids(x, q, k)
    np.testing.assert_array_equal(np.sort(ids, axis=1), np.sort(ref, axis=1))


@pytest.mark.parametrize("metric", ["cosine", "l2"])
def test_ivf_metrics(mesh8, rng, metric):
    n, d, k = 3000, 48, 10
    x = _clustered(rng, n, d)
    q = x[rng.choice(n, 8, replace=False)] + 0.01  # near-duplicates of corpus rows
    idx = IVFIndex(d, nlist=32, nprobe=32, metric=metric, dtype="float32", mesh=mesh8)
    idx.add(x)
    scores, ids = idx.search(q, k=k)
    if metric == "cosine":
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        ref = _oracle_ids(xn, qn, k)
    else:
        d2 = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        ref = np.argsort(d2, axis=1)[:, :k]
    assert _recall(ids, ref) == 1.0  # full probe -> exact


def test_ivf_streaming_adds(mesh8, rng):
    d, k = 32, 10
    x1 = _clustered(rng, 2000, d)
    idx = IVFIndex(d, nlist=32, nprobe=32, metric="ip", dtype="float32", mesh=mesh8)
    rows1 = idx.add(x1)
    _ = idx.search(x1[:1], k=1)  # materialize device layout
    x2 = _clustered(rng, 500, d)
    rows2 = idx.add(x2)  # scatter path (unless a cluster overflowed)
    assert rows2[0] == 2000 and idx.size == 2500
    allx = np.concatenate([x1, x2])
    q = _clustered(rng, 8, d)
    _, ids = idx.search(q, k=k)
    ref = _oracle_ids(allx, q, k)
    assert _recall(ids, ref) == 1.0


def test_ivf_tombstone_and_compact(mesh8, rng):
    d = 16
    x = rng.standard_normal((800, d)).astype(np.float32)
    idx = IVFIndex(d, nlist=16, nprobe=16, metric="ip", dtype="float32", mesh=mesh8)
    idx.add(x)
    _ = idx.search(x[:1], k=1)
    # top hit for x[5] is row 5; remove it and it must vanish from results
    idx.remove(np.array([5]))
    _, ids = idx.search(x[5:6], k=5)
    assert 5 not in ids[0].tolist()
    assert idx.size == 799
    remap = idx.compact()
    assert idx._n_rows == 799
    assert remap.shape == (800,) and remap[5] == -1
    # compaction renumbers rows AND must refresh the device arrays eagerly:
    # post-compact search ids must match an exact-scan oracle on the
    # compacted corpus (round-1 regression: stale device state served
    # pre-compaction row numbers).
    compacted = np.delete(x, 5, axis=0)
    q = x[6:14]
    _, ids = idx.search(q, k=5)
    ref = _oracle_ids(compacted, q, 5)
    np.testing.assert_array_equal(np.sort(ids, axis=1), np.sort(ref, axis=1))


def test_ivf_retrain(mesh8, rng):
    d = 24
    idx = IVFIndex(d, nlist=16, nprobe=16, metric="ip", dtype="float32", mesh=mesh8)
    idx.add(rng.standard_normal((500, d)).astype(np.float32))
    drifted = 5 + rng.standard_normal((500, d)).astype(np.float32)
    idx.add(drifted)
    idx.retrain()
    q = drifted[:4]
    _, ids = idx.search(q, k=5)
    allx = idx._host
    ref = _oracle_ids(allx, q, 5)
    assert _recall(ids, ref) == 1.0


def test_ivf_state_roundtrip(mesh8, rng):
    d = 32
    x = _clustered(rng, 1500, d)
    idx = IVFIndex(d, nlist=32, nprobe=8, metric="ip", dtype="float32", mesh=mesh8)
    idx.add(x)
    state = idx.state_dict()
    idx2 = IVFIndex.from_state(state, dtype="float32", mesh=mesh8)
    q = _clustered(rng, 8, d)
    s1, i1 = idx.search(q, k=10)
    s2, i2 = idx2.search(q, k=10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_ivf_pallas_kernel_matches_xla_path(mesh8, rng):
    # pallas scan (interpret mode on the CPU mesh) must agree with the XLA scan
    n, d, k = 3000, 128, 10
    x = _clustered(rng, n, d)
    q = _clustered(rng, 16, d)
    kw = dict(nlist=32, nprobe=8, metric="ip", dtype="float32", mesh=mesh8)
    a = IVFIndex(d, use_pallas="always", **kw)
    b = IVFIndex(d, use_pallas="never", **kw)
    a.add(x)
    b.add(x)
    assert a._pallas_mode() == "interpret" and b._pallas_mode() == "off"
    assert a.cmax % 128 == 0
    sa, ia = a.search(q, k=k, mode="ivf")
    sb, ib = b.search(q, k=k, mode="ivf")
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(sa, sb, rtol=1e-5)


def test_ivf_pallas_cluster_row_split_matches_xla(mesh8, rng, monkeypatch):
    """Force the kernel's cmax row-split path (the 10M-scale layout packs
    cmax ~21.5k, where no dim slab alone fits VMEM): per-row-block top-k
    folds must agree exactly with the XLA scan."""
    from semcode_tpu.ops import kernels

    n, d, k = 3000, 128, 10
    x = _clustered(rng, n, d)
    q = _clustered(rng, 16, d)
    kw = dict(nlist=32, nprobe=8, metric="ip", dtype="float32", mesh=mesh8)
    a = IVFIndex(d, use_pallas="always", **kw)
    b = IVFIndex(d, use_pallas="never", **kw)
    a.add(x)
    b.add(x)
    assert a.cmax % 256 == 0, "need >= 2 row tiles for this test"
    forced = (a.cmax // 2, d)
    real_pick = kernels._pick_tiles
    monkeypatch.setattr(
        kernels, "_pick_tiles", lambda *args: forced
    )
    try:
        sa, ia = a.search(q, k=k, mode="ivf")
    finally:
        monkeypatch.setattr(kernels, "_pick_tiles", real_pick)
    sb, ib = b.search(q, k=k, mode="ivf")
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(sa, sb, rtol=1e-5)


def test_kernel_tile_policy():
    """Tile picking: shipped operating points keep full-cmax blocks with
    the historical dim-halving chain; oversized layouts row-split; the
    fit check is what routes to the XLA path."""
    from semcode_tpu.ops.kernels import (
        VMEM_BUDGET, _pick_tiles, _vmem_estimate, kernel_fits,
    )

    # 1M x 384 flagship layout: full cmax, no dim slab needed
    ct, dt = _pick_tiles(8, 2176, 384, True)
    assert (ct, dt) == (2176, 384)
    # 1M x 3072: full cmax, dim-slabbed (the round-3 fix)
    ct, dt = _pick_tiles(256, 2176, 3072, True)
    assert ct == 2176 and dt < 3072 and 3072 % dt == 0
    assert _vmem_estimate(256, ct, dt, True) <= VMEM_BUDGET
    # 10M x 384 layout (cmax 21504): must row-split, and must fit
    for n_q in (8, 512):
        ct, dt = _pick_tiles(n_q, 21504, 384, True)
        assert 0 < ct < 21504 and 21504 % ct == 0 and ct % 128 == 0
        assert _vmem_estimate(n_q, ct, dt, True) <= VMEM_BUDGET
        assert kernel_fits(n_q, 21504, 384, True)


def test_kernel_q_chunk_policy():
    """Large query batches must chunk to keep full-cmax blocks instead of
    row-splitting clusters (the round-4 probing regression: batch 512 at
    1M x 384 / cmax 2176 tripped ctile=128 = 17 top-k folds per cluster,
    2.3x per-query slowdown vs BENCH_r03)."""
    from semcode_tpu.ops.kernels import _pick_tiles, preferred_q_chunk

    # flagship regression shape: 512 queries chunk to 256 (full cmax)
    assert preferred_q_chunk(512, 2176, 384, True) == 256
    assert _pick_tiles(256, 2176, 384, True) == (2176, 384)
    # shapes that already fit keep the whole batch in one launch
    assert preferred_q_chunk(256, 2176, 384, True) == 256
    assert preferred_q_chunk(8, 2176, 384, True) == 8
    assert preferred_q_chunk(256, 2176, 3072, True) == 256
    # 10M layout: no chunk keeps full cmax -> row-split at the given batch
    assert preferred_q_chunk(512, 21504, 384, True) == 512


def test_ivf_pallas_q_chunked_matches_xla(mesh8, rng, monkeypatch):
    """Forced query-chunked kernel dispatch (the large-batch path) must
    agree exactly with the XLA scan."""
    from semcode_tpu.ops import kernels

    n, d, k = 2500, 256, 10
    x = _clustered(rng, n, d)
    q = _clustered(rng, 32, d)
    kw = dict(nlist=32, nprobe=8, metric="ip", dtype="float32", mesh=mesh8)
    a = IVFIndex(d, use_pallas="always", **kw)
    b = IVFIndex(d, use_pallas="never", **kw)
    a.add(x)
    b.add(x)
    real = kernels.preferred_q_chunk
    monkeypatch.setattr(
        kernels, "preferred_q_chunk", lambda n_q, *args: max(n_q // 4, 8)
    )
    try:
        sa, ia = a.search(q, k=k, mode="ivf")
    finally:
        monkeypatch.setattr(kernels, "preferred_q_chunk", real)
    sb, ib = b.search(q, k=k, mode="ivf")
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(sa, sb, rtol=1e-5)


def test_ivf_empty(mesh8, rng):
    idx = IVFIndex(16, nlist=16, metric="ip", dtype="float32", mesh=mesh8)
    s, ids = idx.search(rng.standard_normal((2, 16)).astype(np.float32), k=5)
    assert (ids == -1).all()


def test_ivf_int8_recall(mesh8, rng):
    n, d, k = 3000, 64, 10
    x = _clustered(rng, n, d)
    q = _clustered(rng, 16, d)
    idx = IVFIndex(d, nlist=32, nprobe=16, metric="ip", dtype="int8", mesh=mesh8)
    idx.add(x)
    assert idx._pallas_mode() == "off"  # int8 stays on the XLA paths
    ref = _oracle_ids(x, q, k)
    # probing compounds quantization noise with coarse-probe misses; the
    # relative int8 error shrinks at realistic dims (here d=64 is the floor)
    for mode, floor in (("ivf", 0.85), ("exact", 0.9)):
        _, ids = idx.search(q, k=k, mode=mode)
        rec = _recall(ids, ref)
        assert rec >= floor, f"int8 {mode} recall too low: {rec}"
    # streaming adds through the quantized scatter path
    _ = idx.search(q[:1], k=1)
    idx.add(_clustered(rng, 200, d))
    _, ids = idx.search(q, k=k)
    assert (ids[:, 0] >= 0).all()


def test_ivf_int8_pallas_matches_xla(mesh8, rng):
    n, d, k = 3000, 128, 10
    x = _clustered(rng, n, d)
    q = _clustered(rng, 16, d)
    kw = dict(nlist=32, nprobe=8, metric="ip", dtype="int8", mesh=mesh8)
    a = IVFIndex(d, use_pallas="always", **kw)
    b = IVFIndex(d, use_pallas="never", **kw)
    a.add(x)
    b.add(x)
    assert a._pallas_mode() == "interpret"
    sa, ia = a.search(q, k=k, mode="ivf")
    sb, ib = b.search(q, k=k, mode="ivf")
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(sa, sb, rtol=1e-4)


def test_ivf_f16_scores_with_rescore_match_f32(mesh8, rng):
    """Forced fp16 exact-path score matrix (experimental knob): final top-1
    must agree with the default f32 score matrix (the fused f32 rescore
    re-orders the fetch either way)."""
    n, d, k = 3000, 64, 10
    x = _clustered(rng, n, d)
    q = _clustered(rng, 16, d)
    idx = IVFIndex(
        d, nlist=32, nprobe=16, metric="ip", dtype="int8", mesh=mesh8,
        device_rescore=True, score_dtype="float16",
    )
    idx.add(x)
    dev = idx._ensure_device()
    assert dev.frescore is not None
    assert idx._score_dtype(dev.frescore) == "float16"
    _, ids = idx.search(q, k=k, mode="exact")
    assert _recall(ids, _oracle_ids(x, q, k)) >= 0.9
    idx32 = IVFIndex(
        d, nlist=32, nprobe=16, metric="ip", dtype="int8", mesh=mesh8,
        device_rescore=True, score_dtype="float32",
    )
    idx32.add(x)  # exact mode scans the flat mirror; coarse layout is moot
    _, ids32 = idx32.search(q, k=k, mode="exact")
    np.testing.assert_array_equal(ids[:, 0], ids32[:, 0])


def test_ivf_allow_tags_filters_exact_path(mesh8, rng):
    n, d, k = 3000, 64, 5
    x = _clustered(rng, n, d)
    tags = (np.arange(n) % 4).astype(np.int32)
    idx = IVFIndex(
        d, nlist=32, nprobe=8, metric="ip", dtype="int8", mesh=mesh8,
        device_rescore=True,
    )
    idx.add(x, tags=tags)
    q = _clustered(rng, 16, d)
    # allow_tags forces the exact path regardless of requested mode
    _, ids = idx.search(q, k=k, mode="ivf", allow_tags=[2])
    assert (ids >= 0).all()
    assert (tags[ids.ravel()] == 2).all()
    masked = np.where((tags == 2)[None, :], q @ x.T, -np.inf)
    top1 = np.argmax(masked, axis=1)
    np.testing.assert_array_equal(ids[:, 0], top1)


def test_device_quantize_matches_host(mesh8, rng):
    """On-device _prep_rows_q must agree bit-for-bit with the host
    quantize_rows (same scale formula, same round-half-even)."""
    from semcode_tpu.index.flat import quantize_rows
    from semcode_tpu.index.ivf import _prep_rows_q

    x = rng.standard_normal((64, 48)).astype(np.float32)
    q_host, s_host = quantize_rows(x)
    import jax.numpy as jnp

    q_dev, s_dev, n_dev = _prep_rows_q(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(q_dev), q_host)
    np.testing.assert_allclose(np.asarray(s_dev), s_host, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(n_dev), np.sum(x.astype(np.float64) ** 2, axis=1), rtol=1e-5
    )


def test_ivf_add_device_array(mesh8, rng):
    """add() accepts an already-on-device corpus (the bench path) and the
    results match a numpy-input build exactly."""
    import jax.numpy as jnp

    n, d, k = 2000, 64, 10
    x = _clustered(rng, n, d)
    q = _clustered(rng, 8, d)
    a = IVFIndex(d, nlist=32, nprobe=32, metric="ip", dtype="int8", mesh=mesh8)
    b = IVFIndex(d, nlist=32, nprobe=32, metric="ip", dtype="int8", mesh=mesh8)
    a.add(jnp.asarray(x))
    b.add(x)
    sa, ia = a.search(q, k=k)
    sb, ib = b.search(q, k=k)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(sa, sb, rtol=1e-5)


def test_ivf_hydrate_host_roundtrip(mesh8, rng):
    """hydrate_host returns the exact f32 rows when the rescore mirror is on
    (persistence path for the device-authoritative storage)."""
    n, d = 500, 32
    x = _clustered(rng, n, d)
    idx = IVFIndex(
        d, nlist=16, nprobe=16, metric="ip", dtype="int8", mesh=mesh8,
        device_rescore=True,
    )
    idx.add(x)
    np.testing.assert_allclose(idx._host, x, rtol=1e-6)
    state = idx.state_dict()
    np.testing.assert_allclose(state["vectors"], x, rtol=1e-6)


def test_ivf_compacted_leaves_original_servable(mesh8, rng):
    """compacted() must not touch the original index: readers keep serving
    the pre-compaction snapshot (store swaps atomically)."""
    d = 16
    x = rng.standard_normal((600, d)).astype(np.float32)
    idx = IVFIndex(d, nlist=16, nprobe=16, metric="ip", dtype="float32", mesh=mesh8)
    idx.add(x)
    idx.remove(np.arange(100))
    s_before, i_before = idx.search(x[200:204], k=5)
    new, remap = idx.compacted()
    # original still serves identical results with original row numbering
    s_after, i_after = idx.search(x[200:204], k=5)
    np.testing.assert_array_equal(i_before, i_after)
    assert idx._n_rows == 600 and new._n_rows == 500
    # new index serves the compacted numbering
    _, i_new = new.search(x[200:204], k=5)
    assert (remap[i_after[i_after >= 0]] >= 0).all()
    np.testing.assert_array_equal(
        np.sort(remap[i_after], axis=1), np.sort(i_new, axis=1)
    )


def test_ivf_bulk_ingest_matches_single_add(mesh8, rng):
    """bulk(): chunked deferred ingest == one-shot add (exact path).

    The benchmark's streamed 1M x 3072 build feeds the index in device
    chunks inside a bulk() block; layout + materialization must be
    equivalent to adding the whole corpus at once.
    """
    n, d, k = 3000, 64, 10
    x = _clustered(rng, n, d)
    q = _clustered(rng, 16, d)
    ref = IVFIndex(d, nlist=32, nprobe=8, metric="ip", dtype="int8", mesh=mesh8)
    ref.add(x)
    idx = IVFIndex(d, nlist=32, nprobe=8, metric="ip", dtype="int8", mesh=mesh8)
    with idx.bulk(expected_rows=n):
        for lo in range(0, n, 700):
            idx.add(x[lo : lo + 700])
        # no intermediate layout was built inside the block
        assert idx._dirty and idx.cmax == 0
    assert idx.size == n and idx.is_trained and not idx._dirty
    _, ids = idx.search(q, k=k, mode="exact")
    assert _recall(ids, _oracle_ids(x, q, k)) == 1.0
    # tags survive a bulk ingest (device filtered search)
    idx2 = IVFIndex(d, nlist=32, nprobe=8, metric="ip", dtype="int8", mesh=mesh8)
    tags = (np.arange(n) % 7 == 0).astype(np.int32)
    with idx2.bulk(expected_rows=n):
        for lo in range(0, n, 700):
            idx2.add(x[lo : lo + 700], tags=tags[lo : lo + 700])
    _, ids2 = idx2.search(q, k=k, mode="exact", allow_tags=[1])
    assert (ids2 >= 0).any()
    assert all(tags[i] == 1 for i in ids2.ravel() if i >= 0)


def test_ivf_bulk_search_guard(mesh8, rng):
    d = 32
    x = _clustered(rng, 500, d)
    idx = IVFIndex(d, nlist=16, nprobe=4, metric="ip", dtype="float32", mesh=mesh8)
    with idx.bulk() as b:
        b.add(x)
        with pytest.raises(RuntimeError, match="bulk"):
            idx.search(x[:2], k=3, mode="exact")
        with pytest.raises(RuntimeError, match="nest"):
            with idx.bulk():
                pass
    # after the block the index serves normally (exact path == oracle)
    _, ids = idx.search(x[:2], k=3, mode="exact")
    np.testing.assert_array_equal(
        np.sort(ids, axis=1), np.sort(_oracle_ids(x, x[:2], 3), axis=1)
    )


def test_ivf_bulk_device_ingest_donated_matches_host(mesh8, rng):
    """Device-array chunks inside bulk() (the benchmark's streamed build)
    take the DONATED scatter path — in-place mirror updates with no reader
    snapshot alive. Results must match the host-fed non-bulk build, and the
    index must stay consistent for follow-up streaming adds and searches.
    """
    import jax.numpy as jnp

    n, d, k = 2400, 64, 10
    x = _clustered(rng, n, d)
    q = _clustered(rng, 16, d)
    ref = IVFIndex(d, nlist=32, nprobe=8, metric="ip", dtype="int8", mesh=mesh8)
    ref.add(x)
    idx = IVFIndex(d, nlist=32, nprobe=8, metric="ip", dtype="int8", mesh=mesh8)
    with idx.bulk(expected_rows=n):
        for lo in range(0, n, 500):
            idx.add(jnp.asarray(x[lo : lo + 500]))  # device chunks -> donate
    assert idx.size == n and not idx._dirty
    _, ids = idx.search(q, k=k, mode="exact")
    assert _recall(ids, _oracle_ids(x, q, k)) == 1.0
    # post-bulk streaming add (non-donated path) still works on the same
    # index: the donated build must leave a valid mirror behind
    extra = _clustered(rng, 64, d)
    idx.add(extra)
    _, ids2 = idx.search(extra[:4], k=1, mode="exact")
    assert all(i >= n for i in ids2.ravel())


def test_ivf_pallas_dim_tiled_matches_xla(mesh8, rng, monkeypatch):
    """High dims split the kernel's cluster blocks into dim slabs to bound
    VMEM (the 1M x 3072 batch-256 compile overflowed scoped vmem). Force
    multi-slab execution by shrinking the budget and check exact agreement
    with the XLA path."""
    from semcode_tpu.ops import kernels

    monkeypatch.setattr(kernels, "VMEM_BUDGET", 1)  # force dtile = 128
    n, d, k = 2000, 256, 10
    x = _clustered(rng, n, d)
    q = _clustered(rng, 16, d)
    kw = dict(nlist=32, nprobe=8, metric="ip", mesh=mesh8)
    for dtype, rtol in (("float32", 1e-5), ("int8", 1e-4)):
        a = IVFIndex(d, use_pallas="always", dtype=dtype, **kw)
        b = IVFIndex(d, use_pallas="never", dtype=dtype, **kw)
        a.add(x)
        b.add(x)
        assert a._pallas_mode() == "interpret"
        sa, ia = a.search(q, k=k, mode="ivf")
        sb, ib = b.search(q, k=k, mode="ivf")
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_allclose(sa, sb, rtol=rtol)


def test_pick_mode_regimes(mesh8):
    """Cost model (calibrated on v5e, see _PROBE_ROW_OVERHEAD): probing wins
    wide rows at small batch; the exact mirror scan wins everywhere else."""
    def mk(dim):
        idx = IVFIndex(dim, nlist=1024, nprobe=32, metric="ip", mesh=mesh8)
        idx.cmax = 2176  # the measured 1M-row layout
        idx._mirror_cap = 1_000_000
        return idx

    narrow, wide = mk(384), mk(3072)
    # measured: 1M x 384 batch 8 -> exact 2288 vs probing 818 QPS
    assert narrow._pick_mode(8, 32, 10) == "exact"
    # measured: 1M x 3072 batch 8 -> probing16 3615 vs exact 1444 QPS
    assert wide._pick_mode(8, 16, 10) == "ivf"
    assert wide._pick_mode(8, 32, 10) == "ivf"
    # large batches saturate the probed-cluster union -> exact at any dim
    assert narrow._pick_mode(256, 32, 10) == "exact"
    assert wide._pick_mode(256, 32, 10) == "exact"


def test_bulk_expected_rows_sizes_mirror_exactly(mesh8, rng):
    """bulk(expected_rows=N) must allocate the flat mirror at exactly the
    lane-rounded row count — the exact scan pays for ALLOCATED rows, so a
    declared-size build must not carry the +12.5% growth pad."""
    d, n = 32, 2048
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = IVFIndex(d, nlist=8, nprobe=8, metric="ip", dtype="int8",
                   mesh=mesh8)
    with idx.bulk(expected_rows=n):
        idx.add(x[: n // 2])
        idx.add(x[n // 2:])
    assert idx._mir.fvecs.shape[0] == n  # n is already lane-aligned
    # plain add() keeps its growth headroom (streaming amortization)
    idx2 = IVFIndex(d, nlist=8, nprobe=8, metric="ip", dtype="int8",
                    mesh=mesh8)
    idx2.add(x)
    assert idx2._mir.fvecs.shape[0] > n
    s1, i1 = idx.search(x[:8], k=5, mode="exact")
    s2, i2 = idx2.search(x[:8], k=5, mode="exact")
    np.testing.assert_array_equal(i1, i2)


# -- pending tail: full-HBM streaming inserts (VERDICT r5) -------------------


def _pending_index(rng, mesh8, n=3000, d=64, **kw):
    base = dict(nlist=16, nprobe=16, metric="ip", dtype="int8", mesh=mesh8)
    base.update(kw)
    idx = IVFIndex(d, **base)
    x = _clustered(rng, n, d)
    idx.add(x)
    idx.PENDING_THRESHOLD_BYTES = 0  # force the side-buffer route
    return idx, x


def test_pending_rows_searchable_all_paths(mesh8, rng):
    """Streamed rows past the threshold land in the pending tail and must
    appear in exact, probing AND batched searches, exactly ranked."""
    import jax.numpy as jnp

    idx, x = _pending_index(rng, mesh8)
    # large-norm rows: under IP they dominate any base-corpus hit, so a
    # miss here can only mean the pending merge is not applied
    extra = _clustered(rng, 64, 64) + 3.0
    extra = 20.0 * extra / np.linalg.norm(extra, axis=1, keepdims=True)
    rows = idx.add(extra.astype(np.float32))
    assert idx._pend is not None and idx._pend[3] == 64
    assert (idx._loc[rows, 0] == -1).all()  # never placed in the layout

    q = extra[:4] + 0.001 * rng.standard_normal((4, 64)).astype(np.float32)
    for mode in ("exact", "ivf"):
        _, ids = idx.search(q, k=3, mode=mode)
        assert (ids[:, 0] == rows[:4]).all(), (mode, ids[:, 0], rows[:4])
    qs = jnp.asarray(np.stack([q, q]))
    _, bids = idx.search_device_batched(qs, 3)
    assert (np.asarray(bids)[0, :, 0] == rows[:4]).all()


def test_pending_filtered_and_removed(mesh8, rng):
    idx, x = _pending_index(rng, mesh8)
    extra = _clustered(rng, 16, 64) + 3.0
    extra = 20.0 * extra / np.linalg.norm(extra, axis=1, keepdims=True)
    tags = np.asarray([7] * 8 + [9] * 8, dtype=np.int32)
    rows = idx.add(extra.astype(np.float32), tags=tags)
    q = extra[:2].astype(np.float32)
    _, ids = idx.search(q, k=2, allow_tags=[9])
    got = ids.ravel()
    got = got[got >= 0]
    assert set(got) <= set(rows[8:].tolist()), got
    # tombstoned pending rows disappear
    idx.remove(rows[:2])
    _, ids2 = idx.search(q, k=1)
    assert not set(ids2.ravel()) & set(rows[:2].tolist())


def test_pending_fold_on_overflow_and_compact(mesh8, rng):
    idx, x = _pending_index(rng, mesh8)
    idx.PENDING_CAP = 32
    first = idx.add(_clustered(rng, 24, 64))
    assert idx._pend is not None and idx._pend[3] == 24
    second = idx.add(_clustered(rng, 24, 64))  # overflow -> fold + restart
    assert idx._pend[3] == 24
    # folded rows stay searchable through the main layout
    host = idx.hydrate_host()  # also folds the second batch
    assert idx._pend is None
    q = host[first[0] : first[0] + 1]
    _, ids = idx.search(q, k=1, mode="exact")
    assert ids[0, 0] == first[0]
    # compaction folds + renumbers densely
    idx.remove(second[:4])
    remap = idx.compact()
    assert idx._pend is None
    assert idx.size == 3000 + 48 - 4
