"""Dynamic micro-batching of concurrent /query requests."""

import asyncio

from aiohttp.test_utils import TestClient, TestServer

from semcode_tpu.api.main import create_app
from semcode_tpu.settings import AppSettings


class BatchTrackingPipeline:
    def __init__(self):
        self.single_calls = 0
        self.batch_calls = []

    def query(self, question, top_k=None, filters=None):
        self.single_calls += 1
        return {"answer": f"single:{question}", "sources": [], "meta": {}}

    def query_batch(self, questions, top_k=None, filters=None):
        self.batch_calls.append(len(questions))
        return [
            {"answer": f"batched:{q}", "sources": [], "meta": {}}
            for q in questions
        ]


def test_concurrent_queries_get_batched(tmp_path):
    pipeline = BatchTrackingPipeline()
    cfg = AppSettings(
        workspace_root=tmp_path, api_batch_window_ms=25.0, api_batch_max=16
    )

    async def go():
        app = create_app(config=cfg, pipeline=pipeline)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            responses = await asyncio.gather(
                *[
                    client.post("/query", json={"question": f"q{i}"})
                    for i in range(8)
                ]
            )
            bodies = [await r.json() for r in responses]
            return [r.status for r in responses], bodies
        finally:
            await client.close()

    statuses, bodies = asyncio.run(go())
    assert all(s == 200 for s in statuses)
    # every question answered with ITS result, not a neighbor's
    answers = {b["answer"] for b in bodies}
    for i in range(8):
        assert any(a.endswith(f"q{i}") for a in answers)
    # at least one multi-request batch formed
    assert pipeline.batch_calls and max(pipeline.batch_calls) >= 2


def test_real_pipeline_batch_consistency(tmp_path, mesh8, rng):
    """query_batch must produce the same hits as per-question query."""
    from semcode_tpu.embeddings.hash_embedder import HashEmbeddings
    from semcode_tpu.embeddings.providers import EmbeddingPayload
    from semcode_tpu.index.store import VectorStore
    from semcode_tpu.rag import SemanticSearchPipeline

    cfg = AppSettings(
        workspace_root=tmp_path, embedding_dimension=64, index_dtype="float32"
    )
    emb = HashEmbeddings(dim=64)
    texts = [
        f"def function_{i}(arg):\n    return compute_{i}(arg)" for i in range(40)
    ]
    vecs = emb.embed_documents(texts)
    store = VectorStore(cfg, mesh=mesh8)
    store.upsert_embeddings(
        [
            EmbeddingPayload(
                id=f"c{i}", text=texts[i], vector=v,
                metadata={"repo": "r", "path": f"f{i}.py", "language": "python"},
            )
            for i, v in enumerate(vecs)
        ]
    )
    pipeline = SemanticSearchPipeline(config=cfg, vector_store=store, embeddings=emb)
    questions = ["compute_7 function", "function_12 arg", "compute_33"]
    batch_results = pipeline.query_batch(questions, top_k=3)
    for q, br in zip(questions, batch_results):
        single = pipeline.query(q, top_k=3)
        assert [s["path"] for s in br["sources"]] == [
            s["path"] for s in single["sources"]
        ]


def test_list_valued_filters_do_not_strand_requests(tmp_path):
    """Regression: list filter values ({"repo": ["a","b"]}) made the frozen
    filter key unhashable, which killed the batcher worker task outside its
    try block — callers then awaited forever. The request must resolve."""
    pipeline = BatchTrackingPipeline()
    cfg = AppSettings(workspace_root=tmp_path)

    async def go():
        app = create_app(config=cfg, pipeline=pipeline)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await asyncio.wait_for(
                client.post(
                    "/query",
                    json={
                        "question": "q",
                        "filters": {"repo": ["a", "b"], "language": "python"},
                    },
                ),
                timeout=10,
            )
            assert r.status == 200
            body = await r.json()
            assert body["answer"] == "single:q"
        finally:
            await client.close()

    asyncio.run(go())


def test_overloaded_queue_sheds_load_with_503(tmp_path):
    """Beyond api.queue_max pending queries the server answers 503
    immediately instead of queueing unboundedly."""
    import threading

    block = threading.Event()

    class SlowPipeline(BatchTrackingPipeline):
        def query(self, question, top_k=None, filters=None):
            block.wait(5)
            return super().query(question, top_k=top_k, filters=filters)

        def query_batch(self, questions, top_k=None, filters=None):
            block.wait(5)
            return super().query_batch(questions, top_k=top_k, filters=filters)

    cfg = AppSettings(
        workspace_root=tmp_path, api_queue_max=2, api_max_workers=1,
        api_batch_window_ms=1.0, api_query_timeout_s=30.0,
    )

    async def go():
        app = create_app(config=cfg, pipeline=SlowPipeline())
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            tasks = [
                asyncio.create_task(
                    client.post("/query", json={"question": f"q{i}"})
                )
                for i in range(12)
            ]
            await asyncio.sleep(0.5)  # let the queue fill while blocked
            block.set()
            statuses = sorted(r.status for r in await asyncio.gather(*tasks))
            assert 503 in statuses, statuses
            assert 200 in statuses, statuses
        finally:
            block.set()
            await client.close()

    asyncio.run(go())


def test_query_timeout_returns_504(tmp_path):
    import time as _time

    class HangingPipeline(BatchTrackingPipeline):
        def query(self, question, top_k=None, filters=None):
            _time.sleep(3)
            return super().query(question, top_k=top_k, filters=filters)

        def query_batch(self, questions, top_k=None, filters=None):
            _time.sleep(3)
            return super().query_batch(questions, top_k=top_k, filters=filters)

    cfg = AppSettings(
        workspace_root=tmp_path, api_query_timeout_s=0.5,
    )

    async def go():
        app = create_app(config=cfg, pipeline=HangingPipeline())
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post("/query", json={"question": "slow"})
            assert r.status == 504, await r.text()
        finally:
            await client.close()

    asyncio.run(go())
