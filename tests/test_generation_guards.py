"""Vector-generation guards: store dim adoption on first write, loud dim
mismatches afterwards, the per-chunk embedding-signature gate on incremental
re-ingest, candidate-only f32 gathers for the host rescore, and the
compaction no-op fast path.

These close the round-3 review findings: tpu-hybrid's concat width differs
from the configured hash dimension (the store must adopt it, not fail), and
changing the featurizer/checkpoint must force a re-embed rather than mixing
incomparable vector generations in one index.
"""

import numpy as np
import pytest

from semcode_tpu.embeddings.providers import EmbeddingPayload, provider_signature
from semcode_tpu.index.flat import FlatIndex
from semcode_tpu.index.ivf import IVFIndex
from semcode_tpu.index.store import VectorStore
from semcode_tpu.services.indexer import IndexerService
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


def _payloads(rng, n, dim, prefix="c"):
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    return [
        EmbeddingPayload(
            id=f"{prefix}{i}",
            text=f"text {i}",
            vector=vecs[i],
            metadata={"repo": "r1", "path": f"f{i}.py", "language": "python"},
        )
        for i in range(n)
    ], vecs


# -- store dim adoption ------------------------------------------------------


def test_empty_store_adopts_provider_dim(tmp_path, mesh8, rng):
    """A hybrid provider emits hash_dim + encoder_dim wide vectors; the
    empty store adopts that width on first write instead of raising."""
    store = VectorStore(_cfg(tmp_path), mesh=mesh8)  # configured dim = 32
    payloads, vecs = _payloads(rng, 20, dim=48)
    assert store.upsert_embeddings(payloads) == 20
    assert store.dim == 48 and store.count() == 20
    hits = store.search(vecs[3], top_k=3)
    assert hits[0].id == "c3"


def test_dim_mismatch_after_data_is_loud(tmp_path, mesh8, rng):
    store = VectorStore(_cfg(tmp_path), mesh=mesh8)
    payloads, vecs = _payloads(rng, 10, dim=32)
    store.upsert_embeddings(payloads)
    bad, _ = _payloads(rng, 4, dim=48, prefix="d")
    with pytest.raises(ValueError, match="dim mismatch"):
        store.upsert_embeddings(bad)
    with pytest.raises(ValueError, match="dim mismatch"):
        store.search(np.zeros(48, dtype=np.float32), top_k=3)
    # the original data still serves
    assert store.search(vecs[0], top_k=1)[0].id == "c0"


# -- embedding signature gate --------------------------------------------------


class SigEmbedder:
    def __init__(self, sig, dim=32):
        self.signature = sig
        self.dim = dim
        self.embedded = []

    def _vec(self, text):
        rng = np.random.default_rng(abs(hash((self.signature, text))) % 2**32)
        v = rng.standard_normal(self.dim).astype(np.float32)
        return (v / np.linalg.norm(v)).tolist()

    def embed_documents(self, texts):
        self.embedded.extend(texts)
        return [self._vec(t) for t in texts]

    def embed_query(self, text):
        return self._vec(text)


@pytest.fixture
def project(tmp_path):
    src = tmp_path / "proj"
    src.mkdir()
    (src / "alpha.py").write_text("def alpha():\n    return 1\n")
    (src / "beta.py").write_text("def beta():\n    return 2\n")
    return src


def _service(tmp_path, embedder):
    cfg = AppSettings(
        workspace_root=str(tmp_path / "ws"),
        embedding_dimension=32,
        index_kind="flat",
        index_dtype="float32",
    )
    store = VectorStore(cfg)
    return IndexerService(
        config=cfg, vector_store=store, embeddings=embedder, auto_connect=False
    )


def test_signature_change_forces_reembed(tmp_path, mesh8, project):
    svc = _service(tmp_path, SigEmbedder("gen-A"))
    r1 = svc.index_repository([project], "proj")
    assert r1.embedded_count == 2 and r1.reused_count == 0

    # same signature -> everything reused
    svc2 = IndexerService(
        config=svc.config,
        vector_store=svc.vector_store,
        embeddings=SigEmbedder("gen-A"),
        auto_connect=False,
    )
    r2 = svc2.index_repository([project], "proj")
    assert r2.embedded_count == 0 and r2.reused_count == 2

    # new signature (retrained checkpoint / featurizer bump) -> full re-embed
    svc3 = IndexerService(
        config=svc.config,
        vector_store=svc.vector_store,
        embeddings=SigEmbedder("gen-B"),
        auto_connect=False,
    )
    r3 = svc3.index_repository([project], "proj")
    assert r3.embedded_count == 2 and r3.reused_count == 0


def test_provider_signatures_are_distinct_and_stable():
    from semcode_tpu.embeddings.hash_embedder import HashEmbeddings

    a = HashEmbeddings(dim=32)
    b = HashEmbeddings(dim=32)
    c = HashEmbeddings(dim=64)
    assert provider_signature(a) == provider_signature(b)
    assert provider_signature(a) != provider_signature(c)
    # fallback for providers without an explicit signature
    class NoSig:
        dim = 8

    assert "NoSig" in provider_signature(NoSig())
    # explicit signatures pass through
    assert provider_signature(SigEmbedder("x")).startswith("x|")


def test_hybrid_provider_end_to_end_ingest_and_query(tmp_path, mesh8, project):
    """The REAL tpu-hybrid provider through the standard serving path:
    its concat width (hash 32 + encoder 384) differs from the configured
    dimension, which used to fail the first upsert. Loads the shipped
    encoder checkpoint."""
    cfg = AppSettings(
        workspace_root=str(tmp_path / "ws"),
        embedding_provider="tpu-hybrid",
        embedding_dimension=32,
        encoder_preset="mini",
        embedding_max_tokens=32,
        index_kind="flat",
        index_dtype="float32",
    )
    store = VectorStore(cfg)
    svc = IndexerService(config=cfg, vector_store=store, auto_connect=False)
    r = svc.index_repository([project], "proj")
    assert r.embedded_count == 2
    assert store.dim == 32 + svc.embeddings.encoder.dim
    q = np.asarray(svc.embeddings.embed_query("where is alpha defined"),
                   dtype=np.float32)
    hits = store.search(q, top_k=2, query_text="where is alpha defined")
    assert hits and hits[0].path.endswith("alpha.py")


# -- candidate-only f32 gather -------------------------------------------------


def test_gather_f32_flat_and_ivf(mesh8, rng):
    x = rng.standard_normal((500, 32)).astype(np.float32)
    flat = FlatIndex(32, metric="ip", dtype="float32", mesh=mesh8)
    flat.add(x)
    rows = np.asarray([3, 499, 500_000, -1])
    vals, ok = flat.gather_f32(rows)
    assert ok.tolist() == [True, True, False, False]
    np.testing.assert_allclose(vals[0], x[3], rtol=1e-6)
    np.testing.assert_allclose(vals[1], x[499], rtol=1e-6)

    ivf = IVFIndex(32, nlist=8, nprobe=4, metric="ip", dtype="float32",
                   mesh=mesh8)
    ivf.add(x)
    vals, ok = ivf.gather_f32(rows)
    assert ok.tolist() == [True, True, False, False]
    np.testing.assert_allclose(vals[0], x[3], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(vals[1], x[499], rtol=1e-5, atol=1e-6)


def test_f32_ivf_search_never_hydrates_full_corpus(tmp_path, mesh8, rng):
    """The host rescore must gather ONLY candidate rows — a full-corpus
    hydration per search is the exact regression the round-3 review
    flagged (minutes per query at 1M x 3072 on throttled hosts)."""
    cfg = _cfg(tmp_path, index_kind="ivf", index_dtype="float32",
               index_nlist=8, index_device_rescore=False)
    store = VectorStore(cfg, mesh=mesh8)
    payloads, vecs = _payloads(rng, 300, dim=32)
    store.upsert_embeddings(payloads)
    idx = store._index
    if hasattr(idx, "hydrate_host"):
        def boom():  # pragma: no cover - failure path
            raise AssertionError("search hydrated the full corpus")

        idx.hydrate_host = boom
    hits = store.search(vecs[11], top_k=5)
    assert hits[0].id == "c11"


# -- compaction no-op fast path --------------------------------------------------


def test_compact_noop_skips_rebuild(tmp_path, mesh8, rng):
    store = VectorStore(_cfg(tmp_path), mesh=mesh8)
    payloads, _ = _payloads(rng, 40, dim=32)
    store.upsert_embeddings(payloads)
    idx = store._index

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("compacted() ran with nothing to reclaim")

    idx.compacted = boom
    assert store.compact() == 0  # no tombstones: no device re-pack


def test_dim_mismatch_guard_on_bulk_and_device_paths(tmp_path, mesh8, rng):
    import jax

    store = VectorStore(_cfg(tmp_path), mesh=mesh8)
    payloads, vecs = _payloads(rng, 32, dim=32)
    store.upsert_embeddings(payloads)
    bad = np.zeros((8, 48), dtype=np.float32)
    with pytest.raises(ValueError, match="dim mismatch"):
        store.search_bulk(bad, top_k=3)
    with pytest.raises(ValueError, match="dim mismatch"):
        store.search_batch_device(jax.device_put(bad), top_k=3)
