"""Learned term-embedding MaxSim rerank channel (models/term_reranker.py +
index/lexical.bm25_blend's table path)."""

import numpy as np

from semcode_tpu.models.term_reranker import (
    bucketize,
    build_pairs,
    featurize_pairs,
    load_table,
    save_table,
    train_term_table,
)


def test_bucketize_preserves_padding():
    ids = np.asarray([[-1, 5, 131072 + 7], [3, -1, -1]])
    out = bucketize(ids, 131072)
    assert out.tolist() == [[-1, 5, 7], [3, -1, -1]]


def test_save_load_roundtrip_normalizes(tmp_path):
    rng = np.random.default_rng(0)
    table = rng.standard_normal((64, 8)).astype(np.float32) * 3.0
    p = tmp_path / "t.npz"
    save_table(table, p)
    loaded = load_table(p)
    assert loaded.shape == (64, 8)
    np.testing.assert_allclose(
        np.linalg.norm(loaded, axis=1), 1.0, atol=1e-2
    )
    assert load_table(tmp_path / "absent.npz") is None


def test_build_and_featurize_pairs():
    metas = [
        (
            f"c{i}",
            {
                "text": (
                    f'"""Parse the {w} file and return its sections as a '
                    f'mapping from name to value."""\n'
                    f"def parse_{w}_file(path, strict=False):\n"
                    f"    data = read_{w}(path)\n"
                    f"    return dict(section_items(data, strict=strict))\n"
                ),
                "symbol": f"parse_{w}_file",
                "path": f"src/{w}.py",
                "language": "python",
            },
        )
        for i, w in enumerate(["config", "manifest", "lock", "index"])
    ]
    pairs = build_pairs(metas, max_per_kind=10)
    assert len(pairs) >= 8  # docstring + symbol + paraphrase kinds
    feats = featurize_pairs(pairs, n_buckets=4096, doc_terms=32)
    assert feats["q_ids"].shape[0] == len(pairs)
    assert feats["d_ids"].shape == (len(pairs), 32)
    assert (feats["q_ids"] < 4096).all() and (feats["d_ids"] < 4096).all()


def test_training_separates_synonyms(mesh8):
    """Terms that co-occur as (query, positive-doc) must embed closer than
    unrelated terms: train on pairs where query term A always points at
    docs holding term B, and A' at B'."""
    rng = np.random.default_rng(1)
    n, buckets = 400, 512
    A, B_, A2, B2 = 1, 2, 3, 4
    q_ids = np.full((n, 4), -1, np.int32)
    d_ids = np.full((n, 8), -1, np.int32)
    for i in range(n):
        if i % 2 == 0:
            q_ids[i, 0] = A
            d_ids[i, 0] = B_
        else:
            q_ids[i, 0] = A2
            d_ids[i, 0] = B2
        d_ids[i, 1:] = rng.integers(5, buckets, 7)
    table = train_term_table(
        {"q_ids": q_ids, "d_ids": d_ids},
        n_buckets=buckets, dim=8, steps=120, batch_size=64, log_every=0,
    )
    t = table / np.maximum(np.linalg.norm(table, axis=1, keepdims=True), 1e-9)
    assert t[A] @ t[B_] > t[A] @ t[B2] + 0.2
    assert t[A2] @ t[B2] > t[A2] @ t[B_] + 0.2


def test_blend_learned_channel_reorders(mesh8):
    """A table aligning a query term with one candidate's fingerprint term
    must lift that candidate once learned_weight is high, and must be a
    no-op at weight 0 / table None."""
    import jax.numpy as jnp

    from semcode_tpu.index.lexical import bm25_blend

    buckets = 256
    table = np.zeros((buckets, 4), np.float32)
    table[10] = [1, 0, 0, 0]   # query term "alpha"
    table[20] = [0.9, 0.1, 0, 0]  # doc term related to alpha
    table[30] = [0, 0, 1, 0]   # unrelated doc term
    table /= np.maximum(np.linalg.norm(table, axis=1, keepdims=True), 1e-9)

    Q, W, K, T = 1, 2, 3, 2
    # candidate 0 carries the unrelated term; candidate 1 the related one.
    # No EXACT term matches anywhere -> BM25 is flat, dense prefers cand 0.
    g_ids = np.asarray([[[30, -1, -1], [20, -1, -1]]], np.int32)
    g_w = np.ones((Q, W, K), np.float32)
    g_len = np.ones((Q, W), np.float32)
    g_sym = np.full((Q, W), -1, np.int32)
    dense = np.asarray([[1.0, 0.9]], np.float32)
    q_ids = np.asarray([[10, -1]], np.int32)
    q_sym = np.full((Q, 2), -1, np.int32)

    _, order0 = bm25_blend(
        g_ids, g_w, g_len, g_sym, dense, q_ids,
        np.float32(0.5), np.float32(0.0), q_sym,
    )
    assert np.asarray(order0)[0, 0] == 0  # dense order holds without table

    _, order1 = bm25_blend(
        g_ids, g_w, g_len, g_sym, dense, q_ids,
        np.float32(0.5), np.float32(0.0), q_sym,
        jnp.asarray(table), np.float32(2.0),
    )
    assert np.asarray(order1)[0, 0] == 1  # learned channel lifts cand 1


def test_store_learned_table_off_and_missing(tmp_path, mesh8):
    from semcode_tpu.index.store import VectorStore
    from semcode_tpu.settings import AppSettings

    cfg = AppSettings(
        workspace_root=tmp_path, embedding_dimension=8,
        index_kind="flat", index_dtype="float32",
        search_rerank_learned="off",
    )
    store = VectorStore(cfg, mesh=mesh8)
    assert store._learned_table() is None

    cfg2 = cfg.model_copy(
        update={"search_rerank_learned": str(tmp_path / "nope.npz")}
    )
    store2 = VectorStore(cfg2, mesh=mesh8)
    assert store2._learned_table() is None


def test_store_learned_table_loads_and_serves(tmp_path, mesh8, rng):
    """End-to-end: a trained-table path on the device rerank route must
    serve without error and keep recall (hits still come back)."""
    from semcode_tpu.index.store import VectorStore
    from semcode_tpu.settings import AppSettings

    table = rng.standard_normal((512, 8)).astype(np.float32)
    path = tmp_path / "table.npz"
    save_table(table, path)
    cfg = AppSettings(
        workspace_root=tmp_path, embedding_dimension=16,
        index_kind="flat", index_dtype="float32", index_rescore=0,
        search_rerank_weight=0.8,
        search_rerank_learned=str(path),
        search_rerank_learned_weight=0.3,
    )
    store = VectorStore(cfg, mesh=mesh8)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)

    class _P:
        def __init__(self, i):
            self.id = f"c{i}"
            self.text = f"def parse_config_{i}(path):\n    return load(path)\n"
            self.vector = vecs[i]
            self.metadata = {
                "repo": "r", "path": f"m{i}.py", "language": "python",
                "symbol": f"parse_config_{i}",
            }

    store.upsert_embeddings([_P(i) for i in range(40)])
    assert store._learned_table() is not None
    assert store._use_device_rerank(store._index, ["parse the config"], None)
    hits = store.search(vecs[7], top_k=5, query_text="parse the config file")
    assert len(hits) == 5
    assert any(h.id == "c7" for h in hits)
