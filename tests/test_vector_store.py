"""VectorStore facade: upsert idempotence, filters, promotion, snapshots."""

import numpy as np

from semcode_tpu.embeddings.providers import EmbeddingPayload
from semcode_tpu.index.store import VectorStore
from semcode_tpu.settings import AppSettings


def _cfg(tmp_path, **kw):
    base = dict(
        workspace_root=tmp_path,
        embedding_dimension=32,
        index_kind="flat",
        index_dtype="float32",
        index_metric="ip",
    )
    base.update(kw)
    return AppSettings(**base)


def _payloads(rng, n, prefix="c", repo="r1", dim=32):
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    return [
        EmbeddingPayload(
            id=f"{prefix}{i}",
            text=f"text {i}",
            vector=vecs[i],
            metadata={"repo": repo, "path": f"f{i}.py", "language": "python"},
        )
        for i in range(n)
    ], vecs


def test_upsert_and_search(tmp_path, mesh8, rng):
    store = VectorStore(_cfg(tmp_path), mesh=mesh8)
    payloads, vecs = _payloads(rng, 50)
    n = store.upsert_embeddings(payloads)
    assert n == 50 and store.count() == 50
    hits = store.search(vecs[7], top_k=3)
    assert hits[0].id == "c7" and hits[0].repo == "r1" and hits[0].text == "text 7"


def test_upsert_idempotent(tmp_path, mesh8, rng):
    store = VectorStore(_cfg(tmp_path), mesh=mesh8)
    payloads, vecs = _payloads(rng, 20)
    store.upsert_embeddings(payloads)
    store.upsert_embeddings(payloads)  # same ids -> overwrite, not duplicate
    assert store.count() == 20
    hits = store.search(vecs[3], top_k=5)
    assert len({h.id for h in hits}) == 5  # no duplicate ids in results


def test_filters_and_delete_repo(tmp_path, mesh8, rng):
    store = VectorStore(_cfg(tmp_path), mesh=mesh8)
    p1, v1 = _payloads(rng, 30, prefix="a", repo="repo_a")
    p2, _ = _payloads(rng, 30, prefix="b", repo="repo_b")
    store.upsert_embeddings(p1 + p2)
    hits = store.search(v1[0], top_k=10, filters={"repo": "repo_a"})
    assert hits and all(h.repo == "repo_a" for h in hits)
    deleted = store.delete_repo("repo_a")
    assert deleted == 30 and store.count() == 30
    hits = store.search(v1[0], top_k=10)
    assert all(h.repo == "repo_b" for h in hits)


def test_auto_promotion_to_ivf(tmp_path, mesh8, rng):
    cfg = _cfg(
        tmp_path,
        index_kind="auto",
        index_ivf_min_size=256,
        index_nlist=16,
        index_nprobe=16,
    )
    store = VectorStore(cfg, mesh=mesh8)
    payloads, vecs = _payloads(rng, 300)
    store.upsert_embeddings(payloads)
    assert store.stats()["kind"] == "ivf"
    hits = store.search(vecs[123], top_k=1)
    assert hits[0].id == "c123"


def test_snapshot_roundtrip(tmp_path, mesh8, rng):
    store = VectorStore(_cfg(tmp_path), mesh=mesh8)
    payloads, vecs = _payloads(rng, 40)
    store.upsert_embeddings(payloads)
    snap = store.save()
    store2 = VectorStore(_cfg(tmp_path), mesh=mesh8)
    store2.connect()  # loads snapshot
    assert store2.count() == 40
    h1 = store.search(vecs[11], top_k=3)
    h2 = store2.search(vecs[11], top_k=3)
    assert [h.id for h in h1] == [h.id for h in h2]
    assert snap.joinpath("store.json").exists()


def test_empty_store_search(tmp_path, mesh8):
    store = VectorStore(_cfg(tmp_path), mesh=mesh8)
    assert store.search(np.zeros(32, dtype=np.float32), top_k=5) == []


def test_f32_rescore_recovers_bf16_precision(tmp_path, mesh8, rng):
    # near-tie corpus: bf16 scoring flips orderings that f32 rescoring fixes
    dim, n, k = 64, 1024, 10
    base = rng.standard_normal(dim).astype(np.float32)
    x = base[None, :] + 1e-2 * rng.standard_normal((n, dim)).astype(np.float32)
    q = base + 1e-2 * rng.standard_normal(dim).astype(np.float32)
    oracle = np.argsort(-(x @ q))[:k]

    def build(rescore):
        cfg = _cfg(
            tmp_path,
            index_dtype="bfloat16",
            index_rescore=rescore,
            embedding_dimension=dim,
        )
        store = VectorStore(cfg, mesh=mesh8)
        payloads = [
            EmbeddingPayload(id=f"c{i}", text="", vector=x[i], metadata={})
            for i in range(n)
        ]
        store.upsert_embeddings(payloads)
        hits = store.search(q, top_k=k)
        got = [int(h.id[1:]) for h in hits]
        return len(set(got) & set(oracle.tolist())) / k

    rec_plain = build(0)
    rec_rescored = build(8)
    assert rec_rescored >= rec_plain
    assert rec_rescored >= 0.9, f"rescored recall too low: {rec_rescored}"


def test_promotion_after_deletes_keeps_ids_consistent(tmp_path, mesh8, rng):
    # round-1 advisor finding: promotion renumbers rows when earlier deletes
    # made the remap non-identity; hits must still resolve to the RIGHT
    # payloads afterwards (view tuple swapped atomically with the new maps).
    cfg = _cfg(
        tmp_path,
        index_kind="auto",
        index_ivf_min_size=256,
        index_nlist=16,
        index_nprobe=16,
    )
    store = VectorStore(cfg, mesh=mesh8)
    p1, v1 = _payloads(rng, 200)
    store.upsert_embeddings(p1)
    store.delete([f"c{i}" for i in range(0, 50)])  # non-identity remap
    p2, v2 = _payloads(rng, 200, prefix="d", repo="r2")
    store.upsert_embeddings(p2)  # crosses ivf_min_size -> promotion
    assert store.stats()["kind"] == "ivf"
    # every live payload must resolve to itself as its own top hit
    for i in (50, 123, 199):
        hits = store.search(v1[i], top_k=1)
        assert hits[0].id == f"c{i}" and hits[0].repo == "r1"
    for i in (0, 150):
        hits = store.search(v2[i], top_k=1)
        assert hits[0].id == f"d{i}" and hits[0].repo == "r2"
    # deleted payloads stay gone
    hits = store.search(v1[3], top_k=5)
    assert "c3" not in [h.id for h in hits]


def test_top_k_validation(tmp_path, mesh8, rng):
    store = VectorStore(_cfg(tmp_path, search_top_k_max=64), mesh=mesh8)
    payloads, vecs = _payloads(rng, 20)
    store.upsert_embeddings(payloads)
    import pytest

    for bad in (None, 0, -3, 2.5, "ten", [10]):
        with pytest.raises(ValueError):
            store.search(vecs[0], top_k=bad)
    # integer-valued strings coerce (API bodies arrive as JSON scalars)
    assert len(store.search(vecs[0], top_k="3")) == 3
    # huge top_k is capped, not an error (and must not crash per-shard top_k)
    hits = store.search(vecs[0], top_k=10**9)
    assert len(hits) == 20


def test_device_filter_selective_repo_returns_full_topk(tmp_path, mesh8, rng):
    """A 3%-selectivity repo filter must still fill top_k — host post-filter
    with bounded over-fetch cannot; the device tag mask can."""
    store = VectorStore(_cfg(tmp_path), mesh=mesh8)
    big, _ = _payloads(rng, 300, prefix="big", repo="haystack")
    rare, rare_vecs = _payloads(rng, 10, prefix="rare", repo="needle")
    store.upsert_embeddings(big + rare)
    # query with a vector close to a *haystack* chunk: unfiltered top-k is
    # all haystack, so any filtered hits must come from device masking
    q = np.asarray(big[5].vector, dtype=np.float32)
    hits = store.search(q, top_k=8, filters={"repo": "needle"})
    assert len(hits) == 8
    assert all(h.repo == "needle" for h in hits)
    # impossible filter short-circuits to empty (no device dispatch)
    assert store.search(q, top_k=5, filters={"repo": "nope"}) == []


def test_device_filter_residual_keys_still_host_filtered(tmp_path, mesh8, rng):
    store = VectorStore(_cfg(tmp_path), mesh=mesh8)
    pays, vecs = _payloads(rng, 40, repo="r1")
    store.upsert_embeddings(pays)
    hits = store.search(
        vecs[4], top_k=5, filters={"repo": "r1", "path": "f4.py"}
    )
    assert [h.id for h in hits] == ["c4"]  # path filtering stays host-side


def test_device_filter_survives_promotion_and_snapshot(tmp_path, mesh8, rng):
    cfg = _cfg(
        tmp_path, index_kind="auto", index_ivf_min_size=64,
        index_nlist=8, index_nprobe=8,
    )
    store = VectorStore(cfg, mesh=mesh8)
    p1, v1 = _payloads(rng, 60, prefix="a", repo="alpha")
    p2, _ = _payloads(rng, 60, prefix="b", repo="beta")
    store.upsert_embeddings(p1 + p2)  # crosses the IVF promotion threshold
    from semcode_tpu.index.ivf import IVFIndex

    assert isinstance(store._index, IVFIndex)
    hits = store.search(v1[0], top_k=6, filters={"repo": "beta"})
    assert len(hits) == 6 and all(h.repo == "beta" for h in hits)
    store.save()
    store2 = VectorStore(cfg, mesh=mesh8)
    store2.connect()
    hits2 = store2.search(v1[0], top_k=6, filters={"repo": "beta"})
    assert len(hits2) == 6 and all(h.repo == "beta" for h in hits2)


def test_ivf_snapshot_after_delete_keeps_ids_aligned(tmp_path, mesh8, rng):
    """Regression: IVFIndex.from_state renumbers live rows densely; load()
    must remap id_to_row/row_meta or post-delete snapshots dereference the
    wrong vectors."""
    cfg = _cfg(
        tmp_path, index_kind="ivf", index_nlist=8, index_nprobe=8,
    )
    store = VectorStore(cfg, mesh=mesh8)
    pays, vecs = _payloads(rng, 64)
    store.upsert_embeddings(pays)
    store.delete([f"c{i}" for i in range(10)])
    store.save()
    store2 = VectorStore(cfg, mesh=mesh8)
    store2.connect()
    assert store2.count() == 54
    hits = store2.search(vecs[33], top_k=1)
    assert hits[0].id == "c33"
    assert store2.search(vecs[3], top_k=5)[0].id != "c3"  # deleted stays gone


def test_device_filter_list_values(tmp_path, mesh8, rng):
    """Multi-select filters ({"repo": [a, b]}) compile to a multi-tag allow
    list on device; host residual filtering also honors list membership."""
    store = VectorStore(_cfg(tmp_path), mesh=mesh8)
    pa, va = _payloads(rng, 30, prefix="a", repo="ra")
    pb, _ = _payloads(rng, 30, prefix="b", repo="rb")
    pc, _ = _payloads(rng, 30, prefix="c", repo="rc")
    store.upsert_embeddings(pa + pb + pc)
    hits = store.search(va[0], top_k=12, filters={"repo": ["ra", "rb"]})
    assert len(hits) == 12
    assert {h.repo for h in hits} <= {"ra", "rb"}
    # host-side residual list filter (non-device key)
    hits2 = store.search(
        va[0], top_k=5, filters={"path": ["f0.py", "f1.py"]}
    )
    assert hits2 and all(h.path in ("f0.py", "f1.py") for h in hits2)


def test_store_compact_flat_and_ivf(tmp_path, mesh8, rng):
    """compact() reclaims tombstones on both index kinds, keeps ids aligned,
    and filtered search still works afterward (tags move with the rows)."""
    for kind, extra in (
        ("flat", {}),
        ("ivf", {"index_nlist": 8, "index_nprobe": 8}),
    ):
        store = VectorStore(
            _cfg(tmp_path / kind, index_kind=kind, **extra), mesh=mesh8
        )
        p1, v1 = _payloads(rng, 40, prefix="a", repo="keep")
        p2, _ = _payloads(rng, 24, prefix="b", repo="drop")
        store.upsert_embeddings(p1 + p2)
        assert store.delete_repo("drop") == 24
        assert store.stats()["tombstones"] == 24
        assert store.compact() == 24
        assert store.stats()["tombstones"] == 0
        assert store.count() == 40
        hits = store.search(v1[7], top_k=3)
        assert hits[0].id == "a7"
        hits_f = store.search(v1[7], top_k=3, filters={"repo": "keep"})
        assert hits_f[0].id == "a7" and all(h.repo == "keep" for h in hits_f)
        assert store.compact() == 0  # idempotent


def test_auto_compaction_policy(tmp_path, mesh8, rng):
    """Tombstones above (ratio x live, min) trigger an inline compact on the
    write path; below the floor nothing happens."""
    store = VectorStore(
        _cfg(
            tmp_path,
            index_auto_compact_ratio=0.3,
            index_auto_compact_min=10,
        ),
        mesh=mesh8,
    )
    pays, vecs = _payloads(rng, 60)
    store.upsert_embeddings(pays)
    store.delete([f"c{i}" for i in range(8)])  # below the absolute floor
    assert store.stats()["tombstones"] == 8
    store.delete([f"c{i}" for i in range(8, 20)])  # 20 > max(10, .3*40)
    assert store.stats()["tombstones"] == 0  # auto-compacted
    assert store.count() == 40
    assert store.search(vecs[33], top_k=1)[0].id == "c33"


def test_concurrent_readers_during_compaction(tmp_path, mesh8, rng):
    """Lock-free readers racing an explicit compact must never crash or
    return a hit whose id/metadata disagree (torn view)."""
    import threading

    store = VectorStore(_cfg(tmp_path), mesh=mesh8)
    pays, vecs = _payloads(rng, 120)
    store.upsert_embeddings(pays)
    store.delete([f"c{i}" for i in range(40)])

    errors = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                hits = store.search(vecs[77], top_k=5)
                for h in hits:
                    # id must agree with the metadata the view returned
                    if h.path is not None and h.id != f"c{h.path[1:-3]}":
                        errors.append(f"torn hit: {h.id} vs {h.path}")
            except Exception as exc:  # noqa: BLE001
                errors.append(repr(exc))

    threads = [threading.Thread(target=reader) for _ in range(3)]
    for t in threads:
        t.start()
    for _ in range(3):
        store.compact()
        store.upsert_embeddings(pays[:40])  # re-add, then re-delete
        store.delete([f"c{i}" for i in range(40)])
    stop.set()
    for t in threads:
        t.join(timeout=30)
    assert not errors, errors[:3]
    assert store.search(vecs[77], top_k=1)[0].id == "c77"


def test_legacy_snapshot_without_tags_still_filters(tmp_path, mesh8, rng):
    """Snapshots written before the filtered-search feature (no pair table,
    no tags array) must re-derive tags from row metadata on load — device
    filters must not silently exclude legacy rows."""
    import json

    store = VectorStore(_cfg(tmp_path), mesh=mesh8)
    p1, v1 = _payloads(rng, 20, prefix="a", repo="old_a")
    p2, _ = _payloads(rng, 20, prefix="b", repo="old_b")
    store.upsert_embeddings(p1 + p2)
    snap = store.save()

    # strip the filter bookkeeping, as a pre-feature snapshot would lack it
    meta = json.loads((snap / "store.json").read_text())
    meta.pop("pair_ids", None)
    (snap / "store.json").write_text(json.dumps(meta))
    arrays = dict(np.load(snap / "index.npz"))
    arrays.pop("tags", None)
    np.savez_compressed(snap / "index.npz", **arrays)

    store2 = VectorStore(_cfg(tmp_path), mesh=mesh8)
    store2.connect()
    hits = store2.search(v1[3], top_k=5, filters={"repo": "old_a"})
    assert len(hits) == 5 and all(h.repo == "old_a" for h in hits)
    assert hits[0].id == "a3"
    # and new upserts assign consistent (non-colliding) tags
    p3, v3 = _payloads(rng, 5, prefix="c", repo="new_c")
    store2.upsert_embeddings(p3)
    hits3 = store2.search(v3[0], top_k=3, filters={"repo": "new_c"})
    assert hits3 and all(h.repo == "new_c" for h in hits3)


def test_delete_where_and_list_chunks(tmp_path, mesh8, rng):
    store = VectorStore(_cfg(tmp_path), mesh=mesh8)
    pa, _ = _payloads(rng, 10, prefix="a", repo="ra")
    pb, _ = _payloads(rng, 10, prefix="b", repo="rb")
    store.upsert_embeddings(pa + pb)

    listing = store.list_chunks({"repo": "ra"}, limit=5)
    assert len(listing) == 5 and all(e["repo"] == "ra" for e in listing)
    assert "text" not in listing[0]
    page2 = store.list_chunks({"repo": "ra"}, offset=5, limit=10)
    assert len(page2) == 5
    assert {e["id"] for e in listing}.isdisjoint({e["id"] for e in page2})
    with_text = store.list_chunks({"repo": "rb"}, limit=1, include_text=True)
    assert with_text[0]["text"].startswith("text ")

    import pytest

    with pytest.raises(ValueError):
        store.delete_where({})
    assert store.delete_where({"repo": "ra", "path": ["f1.py", "f2.py"]}) == 2
    assert store.count() == 18
    assert store.delete_where({"repo": "ra"}) == 8
    assert store.count() == 10


def test_search_bulk_matches_search_batch(tmp_path, mesh8, rng):
    """search_bulk (chunked dispatch) returns the same hits as the
    per-batch path, including under filters and with a padded tail."""
    store = VectorStore(_cfg(tmp_path), mesh=mesh8)
    p1, v1 = _payloads(rng, 60, prefix="a", repo="r1")
    p2, v2 = _payloads(rng, 40, prefix="b", repo="r2")
    store.upsert_embeddings(p1)
    store.upsert_embeddings(p2)
    q = np.concatenate([v1[:7], v2[:6]])  # 13 queries: exercises 8-padding
    bulk = store.search_bulk(q, top_k=3, batch_q=8, chunk_batches=2)
    ref = store.search_batch(q, top_k=3)
    assert len(bulk) == len(ref) == 13
    for hb, hr in zip(bulk, ref):
        assert [h.id for h in hb] == [h.id for h in hr]
        np.testing.assert_allclose(
            [h.score for h in hb], [h.score for h in hr], rtol=1e-5
        )
    # filtered: only r2 rows may appear
    fb = store.search_bulk(q, top_k=3, filters={"repo": "r2"}, batch_q=8)
    fr = store.search_batch(q, top_k=3, filters={"repo": "r2"})
    for hb, hr in zip(fb, fr):
        assert [h.id for h in hb] == [h.id for h in hr]
        assert all(h.repo == "r2" for h in hb)


def test_device_paths_survive_deletions_on_ivf(tmp_path, mesh8, rng):
    """Regression: IVFIndex.size counts LIVE rows (shrinks on delete) while
    row ids range over all allocated rows — the device-path scrub must bound
    ids by rows_allocated, not size, or live rows with id >= size are
    silently dropped and wrong neighbors returned."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    store = VectorStore(
        _cfg(tmp_path, index_kind="ivf", index_nlist=16, index_nprobe=16),
        mesh=mesh8,
    )
    p1, v1 = _payloads(rng, 150, prefix="a", repo="r1")
    p2, v2 = _payloads(rng, 250, prefix="b", repo="r2")
    store.upsert_embeddings(p1)
    store.upsert_embeddings(p2)
    store.delete_repo("r1")  # live rows now all carry ids >= size? no:
    # ids 150..399 remain live while size drops to 250
    assert store.count() == 250
    idx = store._view[0]
    assert idx.rows_allocated > idx.size
    # query rows whose ids (300..312) exceed the shrunken size (250): the
    # buggy `ids >= size` scrub dropped exactly these
    q = v2[150:163]
    ref = store.search_batch(q, top_k=3)
    assert all(h and h[0].id == f"b{150 + i}" for i, h in enumerate(ref))
    bulk = store.search_bulk(q, top_k=3, batch_q=8, chunk_batches=2)
    for hb, hr in zip(bulk, ref):
        assert [h.id for h in hb] == [h.id for h in hr]
    qd = jax.device_put(
        jnp.asarray(np.pad(q, ((0, 3), (0, 0)))),
        NamedSharding(mesh8, P(None, None)),
    )
    dev = store.search_batch_device(qd, top_k=3)
    for hb, hr in zip(dev[:13], ref):
        assert [h.id for h in hb] == [h.id for h in hr]


def test_compacted_preserves_scan_impl(mesh8, rng):
    from semcode_tpu.index.flat import FlatIndex
    from semcode_tpu.index.ivf import IVFIndex

    x = rng.standard_normal((600, 128)).astype(np.float32)
    f = FlatIndex(128, metric="ip", dtype="int8", mesh=mesh8,
                  scan_impl="pallas")
    f.add(x)
    f.remove(np.arange(100))
    f2, _ = f.compacted()
    assert f2.scan_impl == "pallas"
    iv = IVFIndex(128, nlist=16, metric="ip", dtype="int8", mesh=mesh8,
                  scan_impl="pallas")
    iv.add(x)
    iv.remove(np.arange(100))
    iv2, _ = iv.compacted()
    assert iv2.scan_impl == "pallas"
