"""Quality harness: self-labelled query generation + MRR/recall scoring."""

import numpy as np

from semcode_tpu.embeddings.hash_embedder import HashEmbeddings
from semcode_tpu.embeddings.providers import EmbeddingPayload
from semcode_tpu.eval import evaluate_store, generate_queries
from semcode_tpu.index.store import VectorStore
from semcode_tpu.settings import AppSettings

FUNCS = [
    ("parse_config_file", "Parse the TOML configuration file and return a settings mapping for the application."),
    ("connect_database", "Open a pooled connection to the postgres database with retry and exponential backoff."),
    ("render_markdown", "Render a markdown document into sanitized HTML with syntax highlighted code blocks."),
    ("compute_checksum", "Compute the crc32 checksum of a byte stream in fixed size blocks for integrity checks."),
    ("schedule_backup", "Schedule the nightly backup job and prune snapshots older than the retention window."),
    ("tokenize_source", "Split source code into identifier tokens handling camel case and snake case boundaries."),
    ("merge_intervals", "Merge overlapping numeric intervals and return the sorted disjoint union of ranges."),
    ("fetch_remote_page", "Download a web page over http with timeout handling and content type validation."),
]


def _chunk(name, doc, body_salt):
    return (
        f'def {name}(arg):\n    """{doc}"""\n'
        + "".join(f"    step_{body_salt}_{i} = arg + {i}\n" for i in range(6))
    )


def _store(mesh8):
    cfg = AppSettings(
        workspace_root=None,
        embedding_dimension=384,
        index_kind="flat",
        index_dtype="float32",
    )
    return VectorStore(cfg, mesh=mesh8, dim=384)


def _populate(store, emb):
    payloads = []
    for i, (name, doc) in enumerate(FUNCS):
        text = _chunk(name, doc, i)
        vec = emb.embed_documents([text])[0]
        payloads.append(
            EmbeddingPayload(
                f"id{i}",
                text,
                vec,
                {
                    "repo": "demo",
                    "path": f"src/mod{i}.py",
                    "language": "python",
                    "symbol": name,
                },
            )
        )
    store.upsert_embeddings(payloads)


def test_generate_queries_kinds(mesh8):
    emb = HashEmbeddings(dim=384)
    store = _store(mesh8)
    _populate(store, emb)
    queries = generate_queries(store.iter_payload_meta(), seed=1)
    kinds = {q.kind for q in queries}
    assert kinds == {"docstring", "symbol", "paraphrase"}
    assert all(q.relevant for q in queries)
    sym = next(q for q in queries if q.kind == "symbol")
    assert sym.text.startswith("where is ") and sym.text.endswith(" defined")
    par = next(q for q in queries if q.kind == "paraphrase")
    assert "_" not in par.text  # paraphrase must not leak the raw identifier


def test_evaluate_store_scores_hash_provider(mesh8):
    emb = HashEmbeddings(dim=384)
    store = _store(mesh8)
    _populate(store, emb)
    report = evaluate_store(store, emb, provider_name="tpu-hash", k=10)
    d = report.as_dict()
    assert d["n_queries"] > 10
    assert set(d["by_kind"]) == {"docstring", "symbol", "paraphrase"}
    # lexical hash embeddings must at least nail docstring and symbol lookup
    # on this tiny distinctive corpus
    assert d["by_kind"]["docstring"]["recall@5"] >= 0.8
    assert d["by_kind"]["symbol"]["recall@5"] >= 0.8
    assert 0.0 <= d["mrr@10"] <= 1.0


def test_perfect_provider_gets_perfect_score(mesh8):
    # an oracle embedder that maps each text to a one-hot of its index must
    # score mrr == recall == 1.0: pins the metric arithmetic
    class OracleEmb:
        def __init__(self):
            self.known = {}

        def embed_documents(self, texts):
            out = []
            for t in texts:
                key = t.split("step_")[1].split("_")[0] if "step_" in t else None
                if key is None:  # a query: find which func it references
                    for i, (name, doc) in enumerate(FUNCS):
                        words = doc.lower().split()[:4]
                        if name in t or all(w in t.lower() for w in words[:2]):
                            key = str(i)
                            break
                v = np.zeros(384, dtype=np.float32)
                v[int(key)] = 1.0
                out.append(v.tolist())
            return out

    emb = OracleEmb()
    store = _store(mesh8)
    _populate(store, emb)
    queries = [
        q
        for q in generate_queries(store.iter_payload_meta(), seed=0)
        if q.kind == "symbol"
    ]
    report = evaluate_store(store, emb, queries=queries, provider_name="oracle")
    assert report.mrr_at_10 == 1.0 and report.recall_at_1 == 1.0


def test_frozen_fixture_schema_and_paths():
    # every labelled path must point at a real file in this repo — a rename
    # that invalidates a label should fail loudly here, not silently zero
    # the frozen MRR
    import json
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    fixture = root / "tests" / "fixtures" / "frozen_queries.json"
    data = json.loads(fixture.read_text())
    assert len(data["queries"]) >= 100
    texts = [e["query"] for e in data["queries"]]
    assert len(set(texts)) == len(texts), "duplicate frozen queries"
    for entry in data["queries"]:
        assert entry["query"].strip()
        assert entry["relevant_paths"], entry["query"]
        for p in entry["relevant_paths"]:
            assert (root / p).is_file(), f"missing labelled path: {p}"


def test_frozen_aiohttp_fixture_schema_and_paths():
    """The EXTERNAL frozen set: every labelled path must exist in the
    installed aiohttp package (version pinned in the fixture description)
    and both fixtures must carry the edit-protocol policy header."""
    import json
    from pathlib import Path

    import aiohttp

    root = Path(__file__).resolve().parents[1]
    pkg_parent = Path(aiohttp.__file__).parent.parent
    fixture = root / "tests" / "fixtures" / "frozen_queries_aiohttp.json"
    data = json.loads(fixture.read_text())
    assert len(data["queries"]) >= 75
    assert data["corpus"] == "aiohttp"
    assert "edit_protocol" in data
    texts = [e["query"] for e in data["queries"]]
    assert len(set(texts)) == len(texts), "duplicate frozen queries"
    for entry in data["queries"]:
        assert entry["relevant_paths"], entry["query"]
        for p in entry["relevant_paths"]:
            assert (pkg_parent / p).is_file(), f"missing labelled path: {p}"
    self_data = json.loads(
        (root / "tests" / "fixtures" / "frozen_queries.json").read_text()
    )
    assert "edit_protocol" in self_data


def test_load_frozen_queries_and_path_matching(mesh8):
    from pathlib import Path

    from semcode_tpu.eval import load_frozen_queries
    from semcode_tpu.index.store import SearchHit

    root = Path(__file__).resolve().parents[1]
    queries = load_frozen_queries(
        root / "tests" / "fixtures" / "frozen_queries.json"
    )
    assert all(q.kind == "frozen" and q.relevant_paths for q in queries)
    q = next(
        x for x in queries
        if "semcode_tpu/index/rerank.py" in x.relevant_paths
    )
    # suffix matching: ingested paths may carry a workspace prefix
    assert q.matches(SearchHit(id="x", score=0.0,
                               path="semcode_tpu/index/rerank.py"))
    assert q.matches(SearchHit(id="x", score=0.0,
                               path="/ws/repo/semcode_tpu/index/rerank.py"))
    # but never a mere basename collision from another tree
    assert not q.matches(SearchHit(id="x", score=0.0,
                                   path="other/index/rerank.py"))
    assert not q.matches(SearchHit(id="x", score=0.0, path=None))


def test_frozen_queries_scored_by_path(mesh8):
    # a frozen-style query whose relevance is path-labelled must score
    # through evaluate_store without any payload-id overlap
    from semcode_tpu.eval import QualityQuery

    emb = HashEmbeddings(dim=384)
    store = _store(mesh8)
    _populate(store, emb)
    queries = [
        QualityQuery(
            text="parse the toml configuration file",
            relevant=set(),
            kind="frozen",
            relevant_paths={"src/mod0.py"},
        )
    ]
    report = evaluate_store(store, emb, queries=queries, provider_name="hash")
    assert report.by_kind["frozen"]["recall@10"] == 1.0
