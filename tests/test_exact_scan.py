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


def test_pallas_scan_impl_matches_oracle(mesh8, rng):
    """scan_impl="pallas" (interpreted on the CPU mesh) routes selection
    through the fused top-2-per-128-row-block kernel. On a tiny test corpus
    each shard offers only ~2*rows/128 candidates, so lower ranks may
    legally differ from the oracle (at production scale the loss is
    ~1e-5/query); the guarantees tested: the true top-1 always survives,
    scores of returned rows are the exact f32 scores (fused rescore), and
    recall@10 stays high."""
    n, d, k = 8192, 128, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[:12] + 0.02 * rng.standard_normal((12, d)).astype(np.float32)
    idx = FlatIndex(d, metric="ip", dtype="int8", mesh=mesh8,
                    scan_impl="pallas")
    idx.add(x)
    assert idx._scan_impl() == "pallas-interpret"
    s, ids = idx.search(q, k=k)
    ref_s, ref_ids = _oracle(x, q, k)
    np.testing.assert_array_equal(ids[:, 0], ref_ids[:, 0])
    rec = np.mean([len(set(a) & set(b)) / k for a, b in zip(ids, ref_ids)])
    assert rec >= 0.9, rec
    # returned scores are the exact f32 scores of the returned rows
    true = np.take_along_axis(q @ x.T, ids, axis=1)
    np.testing.assert_allclose(s, true, rtol=2e-6)


def test_pallas_scan_impl_l2_and_filters(mesh8, rng):
    n, d, k = 4096, 128, 5
    x = rng.standard_normal((n, d)).astype(np.float32)
    tags = (np.arange(n) % 7).astype(np.int32)
    q = x[:8] + 0.01 * rng.standard_normal((8, d)).astype(np.float32)
    for metric in ("l2", "ip"):
        idx = FlatIndex(d, metric=metric, dtype="int8", mesh=mesh8,
                        scan_impl="pallas")
        ref = FlatIndex(d, metric=metric, dtype="int8", mesh=mesh8)
        idx.add(x, tags=tags)
        ref.add(x, tags=tags)
        s1, i1 = idx.search(q, k=k, allow_tags=[3])
        s2, i2 = ref.search(q, k=k, allow_tags=[3])
        assert (tags[i1.ravel()] == 3).all()
        # top-1 agrees with the XLA path; overlap high on the rest
        np.testing.assert_array_equal(i1[:, 0], i2[:, 0])
        ov = np.mean([len(set(a) & set(b)) / k for a, b in zip(i1, i2)])
        assert ov >= 0.8, ov


def test_pallas_kernel_dim_tiling_accumulates(monkeypatch, rng):
    """Force n_dtiles > 1 (the wide-row path: partial dots accumulate in
    scratch across dim tiles) and check against a dense reference."""
    import jax.numpy as jnp
    from semcode_tpu.ops import scan_kernel2 as sk

    monkeypatch.setattr(sk, "VMEM_BUDGET", 2 * 1024 * 1024)
    rs, d, n_q = 2048, 1024, 16
    t, dtile = sk.pick_tiles(rs, d, n_q, 1)
    assert d // dtile > 1, (t, dtile)
    v = rng.standard_normal((rs, d)).astype(np.float32)
    scl = np.maximum(np.abs(v).max(axis=1), 1e-9) / 127.0
    vi = np.clip(np.round(v / scl[:, None]), -127, 127).astype(np.int8)
    qf = rng.standard_normal((n_q, d)).astype(np.float32)
    qscl = np.maximum(np.abs(qf).max(axis=1), 1e-9) / 127.0
    qi = np.clip(np.round(qf / qscl[:, None]), -127, 127)
    bm, br = sk.top2_scan_shard(
        jnp.asarray(vi), jnp.asarray(scl[None, :].astype(np.float32)),
        jnp.asarray(np.zeros((1, rs), np.float32)),
        jnp.asarray(qi, dtype=jnp.bfloat16),
        jnp.asarray(qscl[:, None].astype(np.float32)),
        interpret=True,
    )
    bm, br = np.asarray(bm), np.asarray(br)
    # dense reference in the same integer-exact arithmetic
    scores = (qi.astype(np.float64) @ vi.astype(np.float64).T)
    scores = scores * qscl[:, None] * scl[None, :]
    nb = rs // 128
    s3 = scores.reshape(n_q, nb, 128)
    ref_m1 = s3.max(axis=2)
    np.testing.assert_allclose(bm[:, :nb], ref_m1.astype(np.float32),
                               rtol=1e-4, atol=1e-4)
    o1 = s3.argmax(axis=2) + (np.arange(nb) * 128)[None, :]
    np.testing.assert_array_equal(br[:, :nb], o1.astype(np.int32))


def test_pick_tiles_clamps_to_shard_rows():
    """The row tile must never exceed the shard (lane-rounded): a 2k-row
    shard scanned with a 4096-row tile DMAs 50% padding every batch."""
    from semcode_tpu.ops import scan_kernel2 as sk

    t, _ = sk.pick_tiles(2048, 384, 256, 1)
    assert t <= 2048
    t, _ = sk.pick_tiles(100, 384, 8, 1)
    assert t == 128  # lane-rounded up, not the 4096 default
    t, _ = sk.pick_tiles(1_000_000 // 8, 384, 16, 1)
    assert t == 4096  # large shards keep the full tile (VMEM permitting)


# -- two-level int8 residual rescore (round 4) -------------------------------


def test_flat_residual_rescore_matches_f32_oracle(mesh8, rng):
    n, d, k = 3000, 64, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[:16] + 0.02 * rng.standard_normal((16, d)).astype(np.float32)
    idx = FlatIndex(d, metric="ip", dtype="int8", mesh=mesh8,
                    rescore_mode="residual")
    idx.add(x)
    assert idx.device_rescore_active
    assert isinstance(idx._dev[4], tuple)  # residual payload, no f32 mirror
    s, ids = idx.search(q, k=k)
    ref_s, ref_ids = _oracle(x, q, k)
    np.testing.assert_array_equal(ids, ref_ids)
    # two-level reconstruction carries ~16 bits: scores agree to ~1e-5
    np.testing.assert_allclose(s, ref_s, rtol=0, atol=5e-5)


def test_flat_residual_streaming_scatter_keeps_lockstep(mesh8, rng):
    d, k = 32, 5
    idx = FlatIndex(d, metric="ip", dtype="int8", mesh=mesh8,
                    rescore_mode="residual")
    x1 = rng.standard_normal((1024, d)).astype(np.float32)
    idx.add(x1)
    _ = idx.search(x1[:1], k=1)  # materialize
    x2 = rng.standard_normal((256, d)).astype(np.float32)
    idx.add(x2)  # streaming scatter must update BOTH residual arrays
    allx = np.concatenate([x1, x2])
    q = x2[:8] + 0.01 * rng.standard_normal((8, d)).astype(np.float32)
    s, ids = idx.search(q, k=k)
    ref_s, ref_ids = _oracle(allx, q, k)
    np.testing.assert_array_equal(ids, ref_ids)
    # rows here are NOT unit-norm (norms ~ 5.6): tolerance is relative
    np.testing.assert_allclose(s, ref_s, rtol=1e-4, atol=1e-4)


def test_ivf_residual_exact_and_probing_match_oracle(mesh8, rng):
    n, d, k = 4000, 64, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[rng.choice(n, 16, replace=False)] + 0.02 * rng.standard_normal(
        (16, d)
    ).astype(np.float32)
    idx = IVFIndex(d, nlist=32, nprobe=32, metric="ip", dtype="int8",
                   mesh=mesh8, rescore_mode="residual")
    idx.add(x)
    assert idx.device_rescore_active
    assert isinstance(idx._mir.frescore, tuple)
    ref_s, ref_ids = _oracle(x, q, k)
    s, ids = idx.search(q, k=k, mode="exact")
    np.testing.assert_array_equal(ids, ref_ids)
    np.testing.assert_allclose(s, ref_s, rtol=0, atol=5e-5)
    # probing at nprobe=nlist covers every cluster: the post-merge residual
    # rescore (rescore_global_residual) must deliver oracle order too
    s, ids = idx.search(q, k=k, mode="ivf")
    np.testing.assert_array_equal(ids, ref_ids)
    np.testing.assert_allclose(s, ref_s, rtol=0, atol=5e-5)


def test_ivf_residual_hydrate_and_compact_roundtrip(mesh8, rng):
    d = 32
    x = rng.standard_normal((900, d)).astype(np.float32)
    idx = IVFIndex(d, nlist=8, nprobe=8, metric="ip", dtype="int8",
                   mesh=mesh8, rescore_mode="residual")
    idx.add(x)
    # hydrate reconstructs through the residual: ~16-bit agreement
    # (rows are not unit-norm here, so the tolerance is scaled by |x|)
    np.testing.assert_allclose(idx.hydrate_host(), x, rtol=0, atol=3e-4)
    idx.remove(np.arange(0, 900, 3))
    new, remap = idx.compacted()
    assert isinstance(new._mir.frescore, tuple)
    live = np.flatnonzero(remap >= 0)
    q = x[live[:8]]
    s, ids = new.search(q, k=1)
    got = remap[live[:8]]
    np.testing.assert_array_equal(ids[:, 0], got)


def test_flat_residual_batched_matches_single(mesh8, rng):
    import jax.numpy as jnp

    n, d, k = 2048, 64, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    idx = FlatIndex(d, metric="ip", dtype="int8", mesh=mesh8,
                    rescore_mode="residual")
    idx.add(x)
    q = rng.standard_normal((3, 8, d)).astype(np.float32)
    qs = jnp.asarray(q)
    sb, ib = idx.search_device_batched(qs, k)
    for b in range(3):
        s1, i1 = idx.search_device(qs[b], k)
        np.testing.assert_array_equal(np.asarray(ib[b]), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(sb[b]), np.asarray(s1),
                                   rtol=1e-6)


def test_rescore_width_slice_matches_full_fetch(mesh8, rng):
    """The top-W gather slice must not change results when W covers the
    candidates exact re-ranking can promote (here: every int8-top rank
    up to W=2k on an easy corpus), and W=-1 must mean 'full fetch'."""
    n, d, k = 4096, 64, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[rng.choice(n, 16, replace=False)] + 0.02 * rng.standard_normal(
        (16, d)
    ).astype(np.float32)
    full = FlatIndex(d, metric="ip", dtype="int8", mesh=mesh8,
                     rescore_mode="f32", rescore_width=-1)
    full.add(x)
    ref_s, ref_ids = full.search(q, k=k)
    for w in (2 * k, 64):
        sliced = FlatIndex(d, metric="ip", dtype="int8", mesh=mesh8,
                           rescore_mode="f32", rescore_width=w)
        sliced.add(x)
        s, ids = sliced.search(q, k=k)
        np.testing.assert_array_equal(ids, ref_ids)
        np.testing.assert_allclose(s, ref_s, rtol=0, atol=1e-6)
    # W below k is clamped to k, W above fetch is a no-op slice
    tiny = FlatIndex(d, metric="ip", dtype="int8", mesh=mesh8,
                     rescore_mode="f32", rescore_width=1)
    tiny.add(x)
    s, ids = tiny.search(q, k=k)
    assert ids.shape == (16, k)
    huge = FlatIndex(d, metric="ip", dtype="int8", mesh=mesh8,
                     rescore_mode="f32", rescore_width=10_000)
    huge.add(x)
    s, ids = huge.search(q, k=k)
    np.testing.assert_array_equal(ids, ref_ids)


def test_rescore_width_roundtrips_through_compaction(mesh8, rng):
    x = rng.standard_normal((600, 32)).astype(np.float32)
    idx = FlatIndex(32, metric="ip", dtype="int8", mesh=mesh8,
                    rescore_mode="f32", rescore_width=48)
    idx.add(x)
    idx.remove(np.arange(0, 600, 3))
    new, _ = idx.compacted()
    assert new.rescore_width == 48


def test_pallas_scan_impl_rescore_width_slice(mesh8, rng):
    """The top-W gather slice composes with the Pallas selection path:
    explicit small W and full-fetch (-1) agree on the top-1 and keep high
    overlap, and returned scores stay the exact f32 scores."""
    n, d, k = 8192, 128, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[:8] + 0.02 * rng.standard_normal((8, d)).astype(np.float32)
    full = FlatIndex(d, metric="ip", dtype="int8", mesh=mesh8,
                     scan_impl="pallas", rescore_width=-1)
    sliced = FlatIndex(d, metric="ip", dtype="int8", mesh=mesh8,
                       scan_impl="pallas", rescore_width=2 * k)
    full.add(x)
    sliced.add(x)
    s1, i1 = full.search(q, k=k)
    s2, i2 = sliced.search(q, k=k)
    np.testing.assert_array_equal(i1[:, 0], i2[:, 0])
    ov = np.mean([len(set(a) & set(b)) / k for a, b in zip(i1, i2)])
    assert ov >= 0.9, ov
    true = np.take_along_axis(q @ x.T, i2, axis=1)
    np.testing.assert_allclose(s2, true, rtol=2e-6)


def test_auto_rescore_width_defers_to_explicit_fetch_width(mesh8):
    """fetch_width is documented as THE recall lever (a wider pool recovers
    more int8-ranking misses); auto rescore_width must not silently cap a
    pool the user explicitly widened. Both knobs set = deliberate combo."""
    from semcode_tpu.index.scan import resolve_rescore_width

    mirror = object()
    # default config: auto slice
    assert resolve_rescore_width(0, 0, 10, mirror) == 32
    assert resolve_rescore_width(0, 0, 20, mirror) == 60
    # explicit fetch_width: auto defers to the full-fetch gather
    assert resolve_rescore_width(0, 256, 10, mirror) == 0
    # both explicit: caller combined them deliberately
    assert resolve_rescore_width(48, 256, 10, mirror) == 48
    # explicit W below k clamps to k; -1 = full; no tier = no slice
    assert resolve_rescore_width(4, 0, 10, mirror) == 10
    assert resolve_rescore_width(-1, 0, 10, mirror) == 0
    assert resolve_rescore_width(0, 0, 10, None) == 0
    # index-level wiring: FlatIndex with explicit fetch_width gathers full
    idx = FlatIndex(64, metric="ip", dtype="int8", mesh=mesh8,
                    rescore_mode="f32", fetch_width=256)
    assert idx._rescore_width(10, mirror) == 0
