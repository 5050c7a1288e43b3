"""Incremental re-indexing end-to-end: unchanged chunks skip embedding,
changed files re-embed only their chunks, vanished files are pruned from the
store (the reference re-embeds everything and leaks deleted chunks)."""

import numpy as np
import pytest

from semcode_tpu.index.store import VectorStore
from semcode_tpu.services.indexer import IndexerService
from semcode_tpu.settings import AppSettings


class CountingEmbedder:
    """Deterministic embedder that counts how many texts it embeds."""

    def __init__(self, dim=32):
        self.dim = dim
        self.embedded = []

    def _vec(self, text):
        rng = np.random.default_rng(abs(hash(text)) % (2**32))
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
    (src / "gamma.py").write_text("def gamma():\n    return 3\n")
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


def test_unchanged_reingest_embeds_nothing(tmp_path, mesh8, project):
    emb = CountingEmbedder()
    svc = _service(tmp_path, emb)
    r1 = svc.index_repository([project], "proj")
    assert r1.embedded_count == 3 and r1.reused_count == 0
    first_embeds = len(emb.embedded)

    r2 = svc.index_repository([project], "proj")
    assert len(emb.embedded) == first_embeds  # zero re-embedding
    assert r2.embedded_count == 0
    assert r2.reused_count == 3
    assert r2.upserted  # the store still holds the repo
    assert svc.vector_store.count() == 3


def test_touching_one_file_reembeds_only_it(tmp_path, mesh8, project):
    emb = CountingEmbedder()
    svc = _service(tmp_path, emb)
    svc.index_repository([project], "proj")
    (project / "beta.py").write_text("def beta():\n    return 42\n")
    r = svc.index_repository([project], "proj")
    assert r.embedded_count == 1 and r.reused_count == 2
    assert "return 42" in emb.embedded[-1]
    # the updated content is what searches now return (query with the exact
    # chunk text the embedder saw — chunking may normalize trailing newlines)
    store = svc.vector_store
    hits = store.search(np.asarray(emb._vec(emb.embedded[-1])), top_k=1)
    assert "42" in hits[0].text


def test_deleted_file_is_pruned_from_the_store(tmp_path, mesh8, project):
    emb = CountingEmbedder()
    svc = _service(tmp_path, emb)
    svc.index_repository([project], "proj")
    assert svc.vector_store.count() == 3
    (project / "gamma.py").unlink()
    r = svc.index_repository([project], "proj")
    assert r.pruned_count == 1
    assert svc.vector_store.count() == 2
    paths = {m.get("path") for _, m in svc.vector_store.iter_payload_meta()}
    assert not any("gamma" in (p or "") for p in paths)


def test_incremental_disabled_reembeds_everything(tmp_path, mesh8, project):
    emb = CountingEmbedder()
    svc = _service(tmp_path, emb)
    svc.config.incremental_reindex = False
    svc.index_repository([project], "proj")
    n1 = len(emb.embedded)
    r = svc.index_repository([project], "proj")
    assert len(emb.embedded) == 2 * n1
    assert r.reused_count == 0 and r.embedded_count == 3
