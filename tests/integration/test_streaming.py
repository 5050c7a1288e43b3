"""Streaming inserts under concurrent query load (BASELINE config 4).

The store serializes writes behind its host lock while searches run against
the immutable device arrays of the last committed version — queries must
never crash or return corrupt hits mid-ingest.
"""

import threading

import numpy as np

from semcode_tpu.embeddings.providers import EmbeddingPayload
from semcode_tpu.index.store import VectorStore
from semcode_tpu.settings import AppSettings


def test_queries_during_streaming_ingest(tmp_path, mesh8, rng):
    dim = 32
    cfg = AppSettings(
        workspace_root=tmp_path,
        embedding_dimension=dim,
        index_kind="auto",
        index_ivf_min_size=400,
        index_nlist=16,
        index_nprobe=16,
        index_dtype="float32",
    )
    store = VectorStore(cfg, mesh=mesh8)
    all_vecs = rng.standard_normal((1200, dim)).astype(np.float32)

    def payloads(lo, hi):
        return [
            EmbeddingPayload(
                id=f"c{i}",
                text=f"t{i}",
                vector=all_vecs[i],
                metadata={"repo": "r", "path": f"f{i}.py", "language": "python"},
            )
            for i in range(lo, hi)
        ]

    store.upsert_embeddings(payloads(0, 200))  # seed corpus

    errors = []
    done = threading.Event()

    def writer():
        try:
            for lo in range(200, 1200, 100):
                store.upsert_embeddings(payloads(lo, lo + 100))
        except Exception as exc:  # pragma: no cover
            errors.append(exc)
        finally:
            done.set()

    results = []

    def reader():
        try:
            while not done.is_set():
                q = all_vecs[int(rng.integers(0, 200))]
                hits = store.search(q, top_k=5)
                assert hits, "seeded corpus must always be searchable"
                assert all(h.id.startswith("c") for h in hits)
                results.append(len(hits))
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    t_w = threading.Thread(target=writer)
    readers = [threading.Thread(target=reader) for _ in range(2)]
    t_w.start()
    for t in readers:
        t.start()
    t_w.join()
    for t in readers:
        t.join()

    assert not errors, errors
    assert results, "readers never ran"
    assert store.count() == 1200
    assert store.stats()["kind"] == "ivf"  # crossed the promotion threshold
    # every seeded vector still retrievable post-ingest
    hits = store.search(all_vecs[7], top_k=1)
    assert hits[0].id == "c7"
