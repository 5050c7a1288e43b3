"""End-to-end indexer pipeline with fake embedding/store seams.

Mirrors the reference's hermetic integration pattern
(reference tests/integration/test_indexer_service.py): real ingestion manager,
real chunker, real JSON registry over tmp_path; embedding + vector store are
injected fakes so no TPU or network is needed.
"""

from pathlib import Path

import pytest

from semcode_tpu.ingestion import RepositoryIngestionManager
from semcode_tpu.services import IndexerService, IndexingCallbacks
from semcode_tpu.settings import AppSettings
from semcode_tpu.storage import RepositoryRegistry


class DummyEmbeddings:
    def embed_documents(self, texts):
        return [[float(len(t)), 0.0] for t in texts]

    def embed_query(self, text):
        return [float(len(text)), 0.0]


class DummyVectorStore:
    def __init__(self):
        self.payloads = []
        self.connected = False
        self.saved = 0

    def connect(self):
        self.connected = True

    def upsert_embeddings(self, payloads, batch_size=None, progress=None):
        self.payloads.extend(payloads)
        if progress:
            progress(len(payloads), len(payloads))
        return len(payloads)

    def save(self):
        self.saved += 1

    def delete_repo(self, repo):
        n = len([p for p in self.payloads if p.metadata.get("repo") == repo])
        self.payloads = [p for p in self.payloads if p.metadata.get("repo") != repo]
        return n


@pytest.fixture()
def sample_repo(tmp_path):
    src = tmp_path / "myrepo"
    (src / "pkg").mkdir(parents=True)
    (src / "pkg" / "mod.py").write_text(
        "def hello(name):\n    return f'hello {name}'\n"
    )
    (src / "main.cpp").write_text("int main() { return 0; }\n")
    (src / "node_modules").mkdir()
    (src / "node_modules" / "junk.py").write_text("ignored = True\n")
    (src / ".git").mkdir()
    (src / ".git" / "config").write_text("x")
    return src


def _service(tmp_path, sample_repo):
    cfg = AppSettings(workspace_root=tmp_path / "ws", embedding_dimension=2)
    manager = RepositoryIngestionManager(config=cfg)
    registry = RepositoryRegistry(config=cfg)
    store = DummyVectorStore()
    return (
        IndexerService(
            config=cfg,
            ingestion_manager=manager,
            registry=registry,
            vector_store=store,
            embeddings=DummyEmbeddings(),
        ),
        store,
        registry,
    )


def test_index_repository_end_to_end(tmp_path, sample_repo):
    service, store, registry = _service(tmp_path, sample_repo)
    stages = []
    copied = []
    chunked = []
    embeds = []
    cb = IndexingCallbacks(
        copy=copied.append,
        chunk=chunked.append,
        stage=stages.append,
        embed_progress=lambda done, total: embeds.append((done, total)),
    )
    result = service.index_repository([sample_repo], "myrepo", callbacks=cb)

    assert result.chunk_count >= 2
    assert result.embedded_count == result.chunk_count
    assert result.upserted
    assert sorted(result.languages) == ["cpp", "python"]
    # ignore patterns respected: nothing from node_modules/.git copied
    ws = tmp_path / "ws" / "myrepo"
    assert not (ws / "myrepo" / "node_modules").exists()
    assert not (ws / "myrepo" / ".git").exists()
    # payloads carry full metadata
    assert len(store.payloads) == result.chunk_count
    meta = store.payloads[0].metadata
    assert meta["repo"] == "myrepo"
    assert meta["language"] in ("python", "cpp")
    assert meta["start_line"] >= 1
    # registry updated + persisted
    rec = registry.get("myrepo")
    assert rec is not None and rec.chunk_count == result.chunk_count
    assert (tmp_path / "ws" / "registry.json").exists()
    # callbacks fired
    assert "copy_started" in stages and "done" in stages
    assert copied and chunked and embeds
    # snapshot saved after upsert
    assert store.saved == 1


def test_reindex_is_idempotent_ids(tmp_path, sample_repo):
    service, store, _ = _service(tmp_path, sample_repo)
    service.index_repository([sample_repo], "myrepo")
    first_ids = sorted(p.id for p in store.payloads)
    service.index_repository([sample_repo], "myrepo", force=True)
    second_ids = sorted(p.id for p in store.payloads[len(first_ids):])
    assert first_ids == second_ids  # deterministic md5 ids -> idempotent upsert


def test_store_failure_degrades_gracefully(tmp_path, sample_repo):
    service, store, registry = _service(tmp_path, sample_repo)

    def boom(*a, **k):
        raise ConnectionError("engine down")

    store.upsert_embeddings = boom
    result = service.index_repository([sample_repo], "myrepo")
    assert not result.upserted
    assert registry.get("myrepo") is not None  # still registered (reference :116-127)


def test_remove_repository(tmp_path, sample_repo):
    service, store, registry = _service(tmp_path, sample_repo)
    service.index_repository([sample_repo], "myrepo")
    assert service.remove_repository("myrepo")
    assert registry.get("myrepo") is None
    assert store.payloads == []


def test_missing_source_raises(tmp_path, sample_repo):
    service, _, _ = _service(tmp_path, sample_repo)
    with pytest.raises(FileNotFoundError):
        service.index_repository([Path("/nonexistent/dir")], "bad")
