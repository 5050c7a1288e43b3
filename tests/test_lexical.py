"""Device lexical rerank (index/lexical.py): featurization, sharded gather,
BM25 blend parity with the host reranker."""

import numpy as np
import pytest

from semcode_tpu.index import rerank as rr
from semcode_tpu.index.lexical import (
    DEFAULT_KTERMS,
    LexicalFingerprints,
    bm25_blend,
    featurize_doc,
    featurize_queries,
    featurize_query_symbols,
    gather_fingerprints,
    rerank_device,
    symbol_hash,
    term_hash,
)


class Hit:
    def __init__(self, id, score, text, symbol=None, path=None):
        self.id = id
        self.score = score
        self.text = text
        self.metadata = {"symbol": symbol} if symbol else {}
        self.path = path


def test_featurize_doc_boosted_fields_survive():
    ids, w, length = featurize_doc(
        "def parse_config(path):\n    return read_toml(path)",
        symbol="parse_config",
        path="semcode/settings.py",
    )
    assert ids.shape == (DEFAULT_KTERMS,)
    assert w.dtype == np.float16
    # the symbol's subtokens are boosted 3x (plus body occurrences), so they
    # must hold top fingerprint slots
    sym = term_hash("parse_config")
    assert sym in ids.tolist()
    idx = ids.tolist().index(sym)
    assert float(w[idx]) >= 3.0
    # file stem boosted 2x
    assert term_hash("settings") in ids.tolist()
    assert length >= float(np.asarray(w, np.float32).sum()) - 1e-3


def test_featurize_doc_empty():
    ids, w, length = featurize_doc(None)
    assert (ids == -1).all() and (np.asarray(w) == 0).all()
    assert length == 1.0


def test_featurize_queries_padding():
    q = featurize_queries(["where is parse_config defined", None, ""])
    assert q.shape[0] == 3
    assert (q[1] == -1).all() and (q[2] == -1).all()
    assert term_hash("parse_config") in q[0].tolist()


def test_normalize_symbol_join_space():
    assert rr.normalize_symbol("parse_config_file") == "parseconfigfile"
    assert rr.normalize_symbol("ParseConfigFile") == "parseconfigfile"
    assert rr.normalize_symbol("Foo.bar") == "foobar"
    assert rr.normalize_symbol("") == ""


def test_query_symbol_candidates_literal_and_joins():
    # literal identifier: still a candidate after normalization
    c = set(rr.query_symbol_candidates("where is parse_config_file defined"))
    assert "parseconfigfile" in c
    # paraphrase: consecutive words join into the symbol
    c = set(rr.query_symbol_candidates("code that implements parse config file"))
    assert "parseconfigfile" in c
    assert "parseconfig" in c and "configfile" in c
    # glue words inside the phrase: the content-member join covers them
    c = set(rr.query_symbol_candidates("parse the config"))
    assert "parseconfig" in c       # content members joined
    assert "parsetheconfig" in c    # full join (load_from_file-style symbols)
    # stop-prefixed symbols (get_/set_) still match via the full join
    c = set(rr.query_symbol_candidates("get event loop"))
    assert "geteventloop" in c
    # all-stop grams generate nothing
    assert "thethe" not in set(rr.query_symbol_candidates("the the the"))


def test_query_symbol_candidates_capped():
    long_q = " ".join(f"word{i} filler{i}" for i in range(80))
    c = rr.query_symbol_candidates(long_q)
    assert len(c) <= rr.MAX_SYM_CANDIDATES
    assert len(c) == len(set(c))


def test_symbol_hash_normalized_space():
    assert symbol_hash("parse_config_file") == term_hash("parseconfigfile")
    assert symbol_hash(None) == -1
    assert symbol_hash("__") == -1  # normalizes to empty


def test_featurize_query_symbols_includes_joins():
    q = featurize_query_symbols(["code that implements parse config file"])
    assert term_hash("parseconfigfile") in q[0].tolist()
    q2 = featurize_query_symbols([None, ""])
    assert (q2 == -1).all()


def test_host_rerank_paraphrase_symbol_bonus():
    """A paraphrase query that names a symbol as words must rank that
    symbol's chunk first once the bonus applies."""
    hits = [
        Hit("other", 0.9, "unrelated text about servers and sockets",
            "open_connection", "net.py"),
        Hit("target", 0.85, "def parse_config_file(p): ...",
            "parse_config_file", "settings.py"),
    ]
    out = rr.rerank_hits(
        "code that implements parse config file", hits, 2, weight=0.8
    )
    assert out[0].id == "target"


def test_gather_fingerprints_by_global_row(mesh8):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)
    R, K = 64, 8
    fp_ids = rng.integers(0, 1 << 30, (R, K)).astype(np.int32)
    fp_ids[5, 3:] = -1  # padding must survive the psum
    fp_w = rng.random((R, K)).astype(np.float16)
    fp_len = rng.random(R).astype(np.float32) + 1.0
    fp_sym = rng.integers(-1, 1 << 30, R).astype(np.int32)
    ids = np.array([[0, 5, 63, -1], [17, 17, 2, 40]], dtype=np.int32)
    s2 = NamedSharding(mesh8, P("data", None))
    s1 = NamedSharding(mesh8, P("data"))
    g_ids, g_w, g_len, g_sym = gather_fingerprints(
        mesh8,
        jax.device_put(fp_ids, s2),
        jax.device_put(fp_w, s2),
        jax.device_put(fp_len, s1),
        jax.device_put(fp_sym, s1),
        np.asarray(ids),
    )
    g_ids, g_w, g_len, g_sym = map(np.asarray, (g_ids, g_w, g_len, g_sym))
    for qi in range(2):
        for wi in range(4):
            r = ids[qi, wi]
            if r < 0:
                assert (g_ids[qi, wi] == -1).all()
                assert (g_w[qi, wi] == 0).all()
                assert g_sym[qi, wi] == -1
            else:
                np.testing.assert_array_equal(g_ids[qi, wi], fp_ids[r])
                np.testing.assert_allclose(
                    g_w[qi, wi], fp_w[r].astype(np.float32), rtol=1e-3
                )
                assert g_len[qi, wi] == pytest.approx(float(fp_len[r]))
                assert g_sym[qi, wi] == fp_sym[r]


def _np_bm25_blend(
    g_ids, g_w, g_len, g_sym, dense, q_ids, weight,
    sym_bonus=0.0, k1=1.2, b=0.75, q_sym=None,
):
    """Independent numpy reference of the device math."""
    Q, W, K = g_ids.shape
    if q_sym is None:
        q_sym = np.full((Q, 1), -1, dtype=np.int32)
    live = dense > -1.5e38
    out_final = np.zeros((Q, W))
    out_order = np.zeros((Q, W), dtype=np.int64)
    for qi in range(Q):
        qid = q_ids[qi][q_ids[qi] >= 0]
        tf = np.zeros((W, qid.size))
        for wi in range(W):
            for t, ti in enumerate(qid.tolist()):
                tf[wi, t] = g_w[qi, wi][g_ids[qi, wi] == ti].sum()
        n = live[qi].sum()
        df = ((tf > 0) & live[qi][:, None]).sum(axis=0)
        idf = np.log1p((n - df + 0.5) / (df + 0.5))
        lens = np.maximum(g_len[qi], 1.0)
        avg = lens[live[qi]].mean() if n else 1.0
        denom = tf + k1 * (1 - b + b * lens[:, None] / max(avg, 1e-9))
        lex = (idf[None, :] * tf * (k1 + 1) / np.maximum(denom, 1e-9)).sum(1)
        if sym_bonus > 0.0 and qid.size:
            max_idf = idf.max()
            qsym = set(q_sym[qi][q_sym[qi] >= 0].tolist())
            for wi in range(W):
                if g_sym[qi, wi] >= 0 and g_sym[qi, wi] in qsym:
                    lex[wi] += sym_bonus * max_idf
        lex = np.where(live[qi], lex, 0.0)

        def mm(x):
            xl = x[live[qi]]
            if xl.size == 0 or xl.max() - xl.min() <= 1e-12:
                return np.zeros_like(x)
            out = np.zeros_like(x)
            out[live[qi]] = (xl - xl.min()) / (xl.max() - xl.min())
            return out

        final = (1 - weight) * mm(dense[qi]) + weight * mm(lex)
        final = np.where(live[qi], final, -np.inf)
        out_final[qi] = final
        out_order[qi] = np.lexsort((-lex, -final))
    return out_final, out_order


def test_bm25_blend_matches_numpy_reference():
    rng = np.random.default_rng(1)
    Q, W, K, T = 3, 12, 6, 5
    vocab = np.arange(100, 130, dtype=np.int32)
    g_ids = rng.choice(vocab, (Q, W, K)).astype(np.int32)
    g_w = (rng.random((Q, W, K)) * 5).astype(np.float32)
    g_len = (rng.random((Q, W)) * 50 + 10).astype(np.float32)
    dense = rng.random((Q, W)).astype(np.float32)
    dense[0, -2:] = -3.0e38  # dead slots
    q_ids = rng.choice(vocab, (Q, T)).astype(np.int32)
    q_ids[1, 3:] = -1
    g_sym = np.full((Q, W), -1, dtype=np.int32)
    g_sym[0, 3] = q_ids[0, 0]  # symbol named by a query candidate
    g_sym[2, 5] = 999  # symbol not among the candidates: no bonus
    # the symbol channel compares against q_sym (candidate hashes), which
    # may differ from the BM25 term ids — include a join-style candidate
    q_sym = np.full((Q, 4), -1, dtype=np.int32)
    q_sym[0, 0] = q_ids[0, 0]
    q_sym[1, 0] = 777  # join candidate that names no window symbol
    g_sym[1, 2] = 778
    for sym_bonus in (0.0, 0.75):
        final, order = bm25_blend(
            g_ids, g_w, g_len, g_sym, dense, q_ids,
            np.float32(0.8), np.float32(sym_bonus), q_sym,
        )
        ref_final, ref_order = _np_bm25_blend(
            g_ids, g_w, g_len, g_sym, dense, q_ids, 0.8,
            sym_bonus=sym_bonus, q_sym=q_sym,
        )
        live = dense > -1.5e38
        np.testing.assert_allclose(
            np.asarray(final)[live], ref_final[live], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(order), ref_order)


def test_rerank_device_matches_host_rerank(mesh8):
    """End-to-end parity: small docs (every term fits the fingerprint), so
    the device blend must reproduce rerank_hits' ordering exactly."""
    rng = np.random.default_rng(2)
    docs = [
        ("connect to the server", "open_connection", "net/client.py"),
        ("parse the config file", "parse_config", "settings.py"),
        ("read toml settings", "read_toml", "settings.py"),
        ("send an http request", "do_request", "net/http.py"),
        ("retry failed requests", "retry_request", "net/retry.py"),
        ("close the connection", "close", "net/client.py"),
        ("hash a password", "hash_pw", "auth.py"),
        ("validate the session token", "check_token", "auth.py"),
    ]
    hits = [
        Hit(f"id{i}", float(s), t, sym, p)
        for i, ((t, sym, p), s) in enumerate(
            zip(docs, rng.random(len(docs)))
        )
    ]
    hits.sort(key=lambda h: -h.score)

    fps = LexicalFingerprints(mesh8, row_multiple=64, kterms=32)
    metas = [
        {"text": h.text, "symbol": h.metadata.get("symbol"), "path": h.path}
        for h in hits
    ]
    fps.set_rows(np.arange(len(hits)), metas)

    query = "how do I parse the config settings"
    for weight in (0.8, 0.5):
        expected = rr.rerank_hits(query, hits, 5, weight=weight)
        dense = np.asarray(
            [[h.score for h in hits]], dtype=np.float32
        )
        ids = np.arange(len(hits), dtype=np.int32)[None, :]
        q_ids = featurize_queries([query])
        q_sym = featurize_query_symbols([query])
        _, new_ids = rerank_device(
            mesh8,
            fps.device_arrays(len(hits)),
            dense,
            ids,
            q_ids,
            q_sym=q_sym,
            weight=weight,
        )
        got = [hits[r] for r in np.asarray(new_ids)[0][:5]]
        assert [h.id for h in got] == [h.id for h in expected], (
            f"weight={weight}"
        )


def test_fingerprints_remap_and_growth(mesh8):
    fps = LexicalFingerprints(mesh8, row_multiple=16, kterms=8)
    metas = [
        {"text": f"term{i} unique{i}", "symbol": f"sym{i}", "path": "a.py"}
        for i in range(10)
    ]
    fps.set_rows(np.arange(10), metas)
    before = fps._ids[:10].copy()
    # drop even rows, renumber odds densely
    remap = np.full(10, -1, dtype=np.int64)
    remap[1::2] = np.arange(5)
    fps.remap(remap)
    np.testing.assert_array_equal(fps._ids[:5], before[1::2])
    # growth keeps existing rows
    fps.set_rows(np.asarray([100]), [metas[0]])
    np.testing.assert_array_equal(fps._ids[100], before[0])
    np.testing.assert_array_equal(fps._ids[:5], before[1::2])


def test_fingerprints_state_roundtrip(mesh8):
    fps = LexicalFingerprints(mesh8, row_multiple=16, kterms=8)
    fps.set_rows(
        np.arange(3),
        [{"text": "alpha beta", "symbol": "s", "path": "p.py"}] * 3,
    )
    state = fps.state_dict()
    back = LexicalFingerprints.from_state(state, mesh8, 16)
    np.testing.assert_array_equal(back._ids[:3], fps._ids[:3])
    np.testing.assert_array_equal(back._w[:3], fps._w[:3])
    np.testing.assert_array_equal(back._len[:3], fps._len[:3])


# -- store integration ------------------------------------------------------


def _store_cfg(tmp_path, **kw):
    from semcode_tpu.settings import AppSettings

    base = dict(
        workspace_root=tmp_path,
        embedding_dimension=32,
        index_kind="flat",
        index_dtype="float32",
        index_metric="ip",
        index_rescore=0,  # f32 storage: dense scores final on device
        search_rerank_weight=0.8,
        # host/device parity tests compare the BM25 blend; the learned
        # MaxSim channel is device-only by design (settings.py) and would
        # make the impls diverge once the shipped table asset exists
        search_rerank_learned="off",
    )
    base.update(kw)
    return AppSettings(**base)


def _code_payloads(rng, dim=32):
    from semcode_tpu.embeddings.providers import EmbeddingPayload

    docs = [
        ("open a tcp connection", "open_connection", "net/client.py"),
        ("parse the toml config file", "parse_config", "settings.py"),
        ("retry an http request", "retry_request", "net/retry.py"),
        ("close the connection pool", "close_pool", "net/client.py"),
        ("hash the user password", "hash_password", "auth.py"),
        ("validate a session token", "check_token", "auth.py"),
        ("serialize rows to msgpack", "pack_rows", "storage/pack.py"),
        ("stream chunks from disk", "stream_chunks", "storage/io.py"),
    ] * 4  # 32 rows
    vecs = rng.standard_normal((len(docs), dim)).astype(np.float32)
    return [
        EmbeddingPayload(
            id=f"d{i}",
            text=t,
            vector=vecs[i],
            metadata={
                "repo": "r1",
                "path": p,
                "language": "python",
                "symbol": s,
            },
        )
        for i, (t, s, p) in enumerate(docs)
    ], vecs


def test_store_device_rerank_matches_host(tmp_path, mesh8, rng):
    """Same corpus + query through impl=device and impl=host must produce
    the same ordering (fingerprints untruncated at these text sizes)."""
    from semcode_tpu.index.store import VectorStore

    payloads, vecs = _code_payloads(rng)
    query = "how do I parse the config file"
    results = {}
    for impl in ("device", "host"):
        store = VectorStore(
            _store_cfg(tmp_path / impl, search_rerank_impl=impl), mesh=mesh8
        )
        store.upsert_embeddings(payloads)
        if impl == "device":
            assert store._lex is not None
            assert store._use_device_rerank(store._index, [query], None)
        hits = store.search(vecs[10], top_k=5, query_text=query)
        results[impl] = [h.id for h in hits]
    assert results["device"] == results["host"]


def test_store_device_rerank_with_device_filters(tmp_path, mesh8, rng):
    """repo/language equality filters ride device tags and COMPOSE with the
    device rerank; every hit matches and the blend still applies."""
    from semcode_tpu.index.store import VectorStore

    payloads, vecs = _code_payloads(rng)
    for p in payloads[16:]:
        p.metadata["repo"] = "r2"
    store = VectorStore(
        _store_cfg(tmp_path, search_rerank_impl="device"), mesh=mesh8
    )
    store.upsert_embeddings(payloads)
    hits = store.search(
        vecs[1],
        top_k=4,
        filters={"repo": "r1"},
        query_text="parse the toml config",
    )
    assert hits and all(h.repo == "r1" for h in hits)
    assert hits[0].metadata.get("symbol") == "parse_config"


def test_store_residual_filters_fall_back_to_host(tmp_path, mesh8, rng):
    from semcode_tpu.index.store import VectorStore

    payloads, vecs = _code_payloads(rng)
    store = VectorStore(
        _store_cfg(tmp_path, search_rerank_impl="device"), mesh=mesh8
    )
    store.upsert_embeddings(payloads)
    # path is not a device-filterable key -> residual filter -> host path
    assert not store._use_device_rerank(
        store._index, ["q"], {"path": "settings.py"}
    )
    hits = store.search(
        vecs[1],
        top_k=2,
        filters={"path": "settings.py"},
        query_text="parse config",
    )
    assert hits and all(h.path == "settings.py" for h in hits)


def test_store_lex_survives_compaction(tmp_path, mesh8, rng):
    from semcode_tpu.index.store import VectorStore

    payloads, vecs = _code_payloads(rng)
    store = VectorStore(
        _store_cfg(
            tmp_path,
            search_rerank_impl="device",
            index_auto_compact_ratio=0.0,
        ),
        mesh=mesh8,
    )
    store.upsert_embeddings(payloads)
    store.delete([f"d{i}" for i in range(0, 32, 2)])  # halve the corpus
    store.compact()
    q = "how do I parse the config file"
    hits = store.search(vecs[1], top_k=3, query_text=q)
    assert hits[0].id == "d1"  # the surviving parse_config row leads
    # fingerprints were remapped, not rebuilt stale: compare against host
    store2 = VectorStore(
        _store_cfg(tmp_path / "h", search_rerank_impl="host"), mesh=mesh8
    )
    store2.upsert_embeddings([p for i, p in enumerate(payloads) if i % 2])
    hits2 = store2.search(vecs[1], top_k=3, query_text=q)
    assert [h.id for h in hits] == [h.id for h in hits2]


def test_store_lex_rebuilds_after_load(tmp_path, mesh8, rng):
    from semcode_tpu.index.store import VectorStore

    payloads, vecs = _code_payloads(rng)
    cfg = _store_cfg(tmp_path, search_rerank_impl="device")
    store = VectorStore(cfg, mesh=mesh8)
    store.upsert_embeddings(payloads)
    store.save()
    fresh = VectorStore(cfg, mesh=mesh8)
    fresh.connect()
    # loaded store has no fingerprints yet -> host fallback, same results
    assert fresh._lex is None
    q = "how do I parse the config file"
    a = [h.id for h in fresh.search(vecs[1], top_k=5, query_text=q)]
    b = [h.id for h in store.search(vecs[1], top_k=5, query_text=q)]
    assert a == b
    # the next mutation back-fills the whole table from row_meta
    more, _ = _code_payloads(rng)
    more = [more[0]]
    more[0].id = "extra"
    fresh.upsert_embeddings(more)
    assert fresh._lex is not None
    assert fresh._use_device_rerank(fresh._index, [q], None)
    c = [h.id for h in fresh.search(vecs[1], top_k=5, query_text=q)]
    assert c[0] == a[0]
