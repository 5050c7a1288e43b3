"""API endpoint contract tests (stubbed pipeline/indexer, real aiohttp app).

Mirrors the reference API tests (reference tests/integration/
test_api_endpoints.py): auth via X-API-Key, /repos, /ingest, /query contracts
— extended with jobs + telemetry coverage.
"""

import asyncio

from aiohttp.test_utils import TestClient, TestServer

from semcode_tpu.api.main import create_app
from semcode_tpu.settings import AppSettings


class StubRegistry:
    def __init__(self):
        from semcode_tpu.storage import RepositoryRecord

        self._recs = [
            RepositoryRecord(name="demo", languages=["python"], chunk_count=12)
        ]

    def list(self):
        return self._recs


class StubIngestion:
    from pathlib import Path

    workspace = Path("/tmp/ws")


class StubIndexer:
    def __init__(self, tmp_path):
        self.registry = StubRegistry()
        self.ingestion_manager = StubIngestion()
        self.vector_store = None
        self._tmp = tmp_path

    def index_repository(self, paths, name, force=False, ignore_dirs=None,
                         callbacks=None):
        from semcode_tpu.ingestion import RepositoryMetadata
        from semcode_tpu.services.indexer import IndexingResult

        if callbacks and callbacks.stage:
            callbacks.stage("chunking")
            callbacks.stage("done")
        repo = RepositoryMetadata(
            name=name, path=self._tmp / name, languages=["python"]
        )
        return IndexingResult(
            repository=repo,
            chunk_count=3,
            embedded_count=3,
            upserted=True,
            languages=["python"],
        )


class StubPipeline:
    def query(self, question, top_k=None, filters=None):
        if question == "boom":
            raise RuntimeError("engine exploded")
        return {
            "answer": f"answer to: {question}",
            "sources": [
                {
                    "path": "a.py",
                    "repo": "demo",
                    "language": "python",
                    "score": 0.9,
                    "snippet": "def a(): pass",
                }
            ],
            "meta": {"fallback_used": True, "reason": "no_llm_configured"},
        }


def _client_app(tmp_path, **cfg_kw):
    cfg = AppSettings(workspace_root=tmp_path, api_key="secret", **cfg_kw)
    app = create_app(
        config=cfg,
        indexer=StubIndexer(tmp_path),
        pipeline=StubPipeline(),
    )
    return app


def _run(tmp_path, scenario, **cfg_kw):
    async def go():
        app = _client_app(tmp_path, **cfg_kw)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            return await scenario(client)
        finally:
            await client.close()

    return asyncio.run(go())


AUTH = {"X-API-Key": "secret"}


def test_healthz_open(tmp_path):
    async def scenario(client):
        resp = await client.get("/healthz")
        assert resp.status == 200
        assert await resp.json() == {"status": "ok"}

    _run(tmp_path, scenario)


def test_auth_required(tmp_path):
    async def scenario(client):
        resp = await client.get("/repos")
        assert resp.status == 401
        resp = await client.get("/repos", headers={"X-API-Key": "wrong"})
        assert resp.status == 401
        resp = await client.get("/repos", headers=AUTH)
        assert resp.status == 200

    _run(tmp_path, scenario)


def test_repos_contract(tmp_path):
    async def scenario(client):
        resp = await client.get("/repos", headers=AUTH)
        body = await resp.json()
        assert body[0]["name"] == "demo"
        assert body[0]["languages"] == ["python"]
        assert body[0]["chunk_count"] == 12

    _run(tmp_path, scenario)


def test_ingest_sync(tmp_path):
    (tmp_path / "src").mkdir()

    async def scenario(client):
        resp = await client.post(
            "/ingest",
            json={"name": "demo", "root": str(tmp_path), "include": ["src"]},
            headers=AUTH,
        )
        assert resp.status == 200
        body = await resp.json()
        assert body["name"] == "demo" and body["chunk_count"] == 3
        # empty include -> 400
        resp = await client.post(
            "/ingest",
            json={"name": "demo", "root": str(tmp_path), "include": []},
            headers=AUTH,
        )
        assert resp.status == 400
        # missing folder -> 400
        resp = await client.post(
            "/ingest",
            json={"name": "demo", "root": str(tmp_path), "include": ["nope"]},
            headers=AUTH,
        )
        assert resp.status == 400

    _run(tmp_path, scenario)


def test_async_ingest_job(tmp_path):
    (tmp_path / "src").mkdir()

    async def scenario(client):
        resp = await client.post(
            "/jobs/ingest",
            json={"name": "demo", "root": str(tmp_path), "include": ["src"]},
            headers=AUTH,
        )
        assert resp.status == 200
        job = await resp.json()
        assert job["status"] == "queued" and job["type"] == "ingest"
        for _ in range(100):
            resp = await client.get(f"/jobs/{job['id']}", headers=AUTH)
            body = await resp.json()
            if body["status"] in ("completed", "failed"):
                break
            await asyncio.sleep(0.05)
        assert body["status"] == "completed"
        assert body["result"]["chunk_count"] == 3
        resp = await client.get("/jobs", headers=AUTH)
        assert len(await resp.json()) == 1
        resp = await client.get("/jobs/nonexistent", headers=AUTH)
        assert resp.status == 404

    _run(tmp_path, scenario)


def test_query_contract(tmp_path):
    async def scenario(client):
        resp = await client.post(
            "/query", json={"question": "what is a?"}, headers=AUTH
        )
        assert resp.status == 200
        body = await resp.json()
        assert body["answer"].startswith("answer to")
        assert body["sources"][0]["path"] == "a.py"
        assert body["meta"]["fallback_used"] is True
        # empty question -> 400
        resp = await client.post("/query", json={"question": " "}, headers=AUTH)
        assert resp.status == 400
        # engine failure -> 502
        resp = await client.post("/query", json={"question": "boom"}, headers=AUTH)
        assert resp.status == 502
        # invalid top_k values -> 400, not a 502 from deep jit errors
        for bad in (0, -1, "ten", 2.5, [3]):
            resp = await client.post(
                "/query", json={"question": "q", "top_k": bad}, headers=AUTH
            )
            assert resp.status == 400, f"top_k={bad!r} -> {resp.status}"
        # non-object filters -> 400
        resp = await client.post(
            "/query", json={"question": "q", "filters": "repo"}, headers=AUTH
        )
        assert resp.status == 400

    _run(tmp_path, scenario)


def test_telemetry(tmp_path):
    async def scenario(client):
        await client.post("/query", json={"question": "q1"}, headers=AUTH)
        resp = await client.get("/telemetry", headers=AUTH)
        assert resp.status == 200
        body = await resp.json()
        assert body["query"]["count"] == 1
        assert body["query"]["fallbacks"] == 1
        assert len(body["recent_events"]) == 1

    _run(tmp_path, scenario)


def test_telemetry_disabled(tmp_path):
    async def scenario(client):
        resp = await client.get("/telemetry", headers=AUTH)
        assert resp.status == 404

    _run(tmp_path, scenario, telemetry_enabled=False)


def test_webui_served(tmp_path):
    async def scenario(client):
        resp = await client.get("/")
        assert resp.status == 200
        text = await resp.text()
        assert "semcode-tpu" in text and "/query" in text

    _run(tmp_path, scenario)


def test_delete_repo(tmp_path):
    class DeletableIndexer(StubIndexer):
        def __init__(self, tmp):
            super().__init__(tmp)
            self.removed = []

        def remove_repository(self, name):
            self.removed.append(name)
            return name == "demo"

    indexer = DeletableIndexer(tmp_path)

    async def go():
        cfg = AppSettings(workspace_root=tmp_path, api_key="secret")
        app = create_app(config=cfg, indexer=indexer, pipeline=StubPipeline())
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            resp = await client.delete("/repos/demo", headers=AUTH)
            assert resp.status == 200
            assert (await resp.json()) == {"removed": "demo"}
            resp = await client.delete("/repos/nope", headers=AUTH)
            assert resp.status == 404
        finally:
            await client.close()

    asyncio.run(go())
    assert indexer.removed == ["demo", "nope"]


def test_compact_endpoint(tmp_path, monkeypatch):
    """POST /compact reclaims tombstones through the live app."""
    import asyncio

    import numpy as np
    from aiohttp.test_utils import TestClient, TestServer

    from semcode_tpu.api import main as api_main
    from semcode_tpu.embeddings.providers import EmbeddingPayload
    from semcode_tpu.index.store import VectorStore
    from semcode_tpu.services.indexer import IndexerService
    from semcode_tpu.settings import AppSettings

    cfg = AppSettings(
        workspace_root=tmp_path, embedding_dimension=16,
        index_kind="flat", index_dtype="float32",
    )
    store = VectorStore(cfg)
    rng = np.random.default_rng(0)
    pays = [
        EmbeddingPayload(
            id=f"p{i}", text=f"t{i}",
            vector=rng.standard_normal(16).astype(np.float32),
            metadata={"repo": "r", "path": f"f{i}", "language": "python"},
        )
        for i in range(24)
    ]
    store.upsert_embeddings(pays)
    store.delete([f"p{i}" for i in range(6)])
    indexer = IndexerService(config=cfg, vector_store=store)

    async def go():
        app = api_main.create_app(config=cfg, indexer=indexer)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post("/compact")
            assert r.status == 200
            body = await r.json()
            assert body == {"reclaimed": 6, "rows": 18}
            r2 = await client.post("/compact")
            assert (await r2.json())["reclaimed"] == 0
        finally:
            await client.close()

    asyncio.run(go())


def test_chunks_listing_and_delete_endpoints(tmp_path):
    import asyncio

    import numpy as np
    from aiohttp.test_utils import TestClient, TestServer

    from semcode_tpu.api import main as api_main
    from semcode_tpu.embeddings.providers import EmbeddingPayload
    from semcode_tpu.index.store import VectorStore
    from semcode_tpu.services.indexer import IndexerService
    from semcode_tpu.settings import AppSettings

    cfg = AppSettings(
        workspace_root=tmp_path, embedding_dimension=16,
        index_kind="flat", index_dtype="float32",
    )
    store = VectorStore(cfg)
    rng = np.random.default_rng(0)
    pays = [
        EmbeddingPayload(
            id=f"p{i}", text=f"t{i}",
            vector=rng.standard_normal(16).astype(np.float32),
            metadata={"repo": "ra" if i < 8 else "rb", "path": f"f{i}",
                      "language": "python"},
        )
        for i in range(16)
    ]
    store.upsert_embeddings(pays)
    indexer = IndexerService(config=cfg, vector_store=store)

    async def go():
        app = api_main.create_app(config=cfg, indexer=indexer)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.get("/chunks?repo=ra&limit=3&include_text=1")
            body = await r.json()
            assert r.status == 200 and len(body) == 3
            assert all(e["repo"] == "ra" for e in body)
            assert body[0]["text"].startswith("t")

            r = await client.post("/chunks/delete", json={"filters": {"repo": "ra"}})
            body = await r.json()
            assert r.status == 200 and body["deleted"] == 8 and body["rows"] == 8

            r = await client.post("/chunks/delete", json={"filters": {}})
            assert r.status == 400
        finally:
            await client.close()

    asyncio.run(go())


def test_create_app_ephemeral_workspace(tmp_path):
    """workspace_root=None is the documented ephemeral in-memory mode: the
    app must start (jobs stay in memory) instead of crashing on the
    journal path."""
    cfg = AppSettings(workspace_root=None, api_key="secret")
    app = create_app(
        config=cfg, indexer=StubIndexer(tmp_path), pipeline=StubPipeline()
    )

    async def go():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.get("/healthz")
            assert r.status == 200
            r = await client.post(
                "/query",
                json={"question": "hi"},
                headers={"X-API-Key": "secret"},
            )
            assert r.status == 200
        finally:
            await client.close()

    asyncio.run(go())


def test_startup_warmup_fires_once_on_populated_store(tmp_path):
    """create_app warms the serving path at startup (background) so a
    restarted server doesn't charge the first user query with the full
    compile stack; empty stores and api_warmup=false skip it."""
    import asyncio
    import time as _time

    from aiohttp.test_utils import TestClient, TestServer

    from semcode_tpu.api.main import create_app
    from semcode_tpu.settings import AppSettings

    class Pipe:
        def __init__(self):
            self.calls = []

        def query(self, q, top_k=None, filters=None):
            self.calls.append(q)
            return {"answer": "", "sources": [], "meta": {}}

    class Store:
        def __init__(self, n):
            self._n = n
            self.connected = False

        def connect(self):
            # warmup must connect FIRST: count() on a never-connected
            # store reads the init-empty view and reports 0
            self.connected = True

        def count(self):
            return self._n if self.connected else 0

    class Idx:
        # full IndexerLike protocol surface (typeguard checks the stub)
        registry = None
        ingestion_manager = None

        def __init__(self, n):
            self.vector_store = Store(n)

        def index_repository(self, *args, **kwargs):
            raise AssertionError("warmup must not ingest")

    async def scenario(n_rows, warmup, expect_called):
        cfg = AppSettings(workspace_root=None, api_warmup=warmup)
        pipe = Pipe()
        app = create_app(config=cfg, indexer=Idx(n_rows), pipeline=pipe)
        client = TestClient(TestServer(app))
        await client.start_server()
        t = app.get("warmup_thread")
        if t is not None:
            await asyncio.get_event_loop().run_in_executor(
                None, lambda: t.join(timeout=5)
            )
        deadline = _time.time() + 5
        while expect_called and not pipe.calls and _time.time() < deadline:
            await asyncio.sleep(0.02)
        assert bool(pipe.calls) == expect_called
        assert (t is None) == (not warmup)  # thread only when enabled
        await client.close()

    asyncio.run(scenario(100, True, True))
    asyncio.run(scenario(0, True, False))
    asyncio.run(scenario(100, False, False))
