"""Device-side lexical rerank: BM25 over per-row term fingerprints, on TPU.

Round 3 proved two-stage retrieval is where held-out quality comes from
(docs/BENCHMARKS.md: hybrid 0.545 -> 0.703 MRR@10 on aiohttp with the host
BM25 rerank) — but that scorer ran on the single serving core, off-device.
This module moves the second stage into the scan's jit family:

- **Ingest side** (host, once per chunk): the same identifier-aware,
  field-boosted term statistics the host reranker computes
  (index/rerank.py `_doc_tf`: camelCase/snake_case subtokens, symbol x3,
  file-stem x2, 800-token body cap) are reduced to a fixed-width
  fingerprint — the top ``kterms`` terms by selection weight, each hashed
  to an int32 (crc32) with its tf weight in f16 — plus the doc's total
  term mass and its whole-symbol hash. At the default 256 terms/row that
  is ~1.5 GB per 1M rows in HBM, gathered only for candidate windows.

- **Query side** (device, per batch): gather the candidate window's
  fingerprints by GLOBAL row id (row-sharded + psum, the
  scan.rescore_global ownership pattern — works identically for the flat
  and IVF indexes), compute window-level BM25 (df/idf within the candidate
  window, k1/b saturation, window-mean length norm) against the query's
  hashed terms, min-max blend with the dense scores, and re-sort — all
  inside one jit. The math mirrors index/rerank.rerank_hits exactly except
  the fingerprint's top-K truncation (a query term that is NOT among a
  doc's top-K terms by weight contributes 0; boosted symbol/stem terms
  always survive the cut).

Replaces: the reference has no second retrieval stage at all (Milvus ANN
scores only, reference src/semcode/storage/milvus_store.py:135-148); this
is the TPU-native upgrade of round 3's host BM25 (VERDICT round-3 item 4).
"""

from __future__ import annotations

import zlib
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..embeddings.hash_embedder import STOP_TOKENS as _STOP_TOKENS
from ..parallel.mesh import linear_rank, row_axes
from .rerank import (
    DEFAULT_SYM_BONUS,
    MAX_SYM_CANDIDATES,
    _doc_tf_uncached,
    normalize_symbol,
    query_symbol_candidates,
    tokenize,
)

_K1 = np.float32(1.2)
_B = np.float32(0.75)
_NEG_INF = np.float32(-3.0e38)

# fingerprint width: top-K terms by selection weight. Lab measurement
# (tools/rerank_lab.py, held-out corpora, saturated+stop-factor
# selection): K=320 matches the untruncated host BM25 EXACTLY on both
# corpora; K=256 is within 0.005 MRR (aiohttp 0.7306 vs host 0.7352 at
# depth 10; reference exact parity) at 1.5 GB HBM per 1M rows (int32 id +
# f16 weight), gathered only for the candidate window. K=192 -> -0.023 on
# aiohttp, K=64 -> -0.10: a 6000-char code chunk carries 200+ unique
# subtokens and docstring queries hit the tail.
DEFAULT_KTERMS = 256
QUERY_TERMS = 64
# learned-channel doc-term head (keep equal to term_reranker.DOC_TERMS)
_LEARNED_DOC_TERMS = 96
# exact-symbol bonus (defined next to the host scorer so both impls share
# one default): +0.03-0.05 held-out MRR, see rerank.DEFAULT_SYM_BONUS


def term_hash(tok: str) -> int:
    """Stable 31-bit term id (crc32; python hash() is salted per process)."""
    return zlib.crc32(tok.encode("utf-8")) & 0x7FFFFFFF


class _HitShim:
    """Adapter so rerank._doc_tf_uncached's hit interface works on raw
    payload fields (text/symbol/path) at ingest time."""

    __slots__ = ("text", "metadata", "path", "id")

    def __init__(self, text, symbol, path):
        self.text = text
        self.metadata = {"symbol": symbol} if symbol else {}
        self.path = path
        self.id = None


def _selection_weight(tok: str, tf: float) -> float:
    """Which terms deserve a fingerprint slot? NOT raw tf — BM25 saturates
    tf at (k1+1), so a rare tf=1 term contributes nearly as much as a
    tf=20 one when a query asks for it, and rare terms are exactly what
    queries discriminate on. Selection key = saturated tf, downweighted
    for the stop list (keywords/english glue: `self`/`return`/`the` have
    huge tf in code chunks but near-zero query idf) and for very short
    tokens (generic). Measured on the held-out lab (tools/rerank_lab.py):
    raw-tf selection at K=64 loses 0.08 MRR vs the untruncated host
    scorer on docstring queries; this selection closes most of that."""
    sat = tf * (float(_K1) + 1.0) / (tf + float(_K1))
    if tok in _STOP_TOKENS or tok.isdigit():
        sat *= 0.3
    if len(tok) <= 2:
        sat *= 0.6
    return sat


def featurize_doc(
    text: Optional[str],
    symbol: Optional[str] = None,
    path: Optional[str] = None,
    *,
    kterms: int = DEFAULT_KTERMS,
) -> Tuple[np.ndarray, np.ndarray, np.float32]:
    """-> (term ids int32 (kterms,), weights f16 (kterms,), total length).

    Padding slots carry id -1 / weight 0. ``length`` is the doc's FULL
    weighted term mass (not truncated) — BM25's length normalization must
    see the real document size. Stored weights are RAW field-boosted tf
    (the scoring math is identical to the host scorer); only the CHOICE of
    surviving terms uses ``_selection_weight``."""
    tf = _doc_tf_uncached(_HitShim(text or "", symbol, path))
    items = sorted(
        tf.items(), key=lambda kv: -_selection_weight(kv[0], kv[1])
    )[:kterms]
    ids = np.full((kterms,), -1, dtype=np.int32)
    w = np.zeros((kterms,), dtype=np.float16)
    for i, (t, v) in enumerate(items):
        ids[i] = term_hash(t)
        w[i] = v
    return ids, w, np.float32(max(sum(tf.values()), 1.0))


def symbol_hash(symbol) -> int:
    """Whole-symbol term id for the symbol-bonus channel (-1 = none).

    Hashed in normalize_symbol space (lowercase, separators stripped) so a
    query can name the symbol literally OR as its word sequence — the query
    side (featurize_query_symbols) hashes both token and word-join
    candidates in the same space. Fingerprints are rebuilt from row_meta on
    snapshot load (store.load nulls the table), so no migration is needed."""
    if not symbol:
        return -1
    norm = normalize_symbol(symbol)
    if not norm:
        return -1
    return term_hash(norm)


def featurize_docs(
    metas: Sequence[dict], *, kterms: int = DEFAULT_KTERMS
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Batch ``featurize_doc`` over payload metadata dicts; the extra
    (n,) int32 channel is the whole-symbol hash for the exact-match bonus."""
    n = len(metas)
    ids = np.full((n, kterms), -1, dtype=np.int32)
    w = np.zeros((n, kterms), dtype=np.float16)
    ln = np.ones((n,), dtype=np.float32)
    sym = np.full((n,), -1, dtype=np.int32)
    for i, m in enumerate(metas):
        ids[i], w[i], ln[i] = featurize_doc(
            m.get("text"), m.get("symbol"), m.get("path"), kterms=kterms
        )
        sym[i] = symbol_hash(m.get("symbol"))
    return ids, w, ln, sym


def featurize_queries(
    texts: Sequence[Optional[str]], *, tmax: int = QUERY_TERMS
) -> np.ndarray:
    """-> (Q, tmax) int32 query term ids, -1-padded; textless rows all -1
    (their lexical score is 0 everywhere, so the blend preserves the dense
    order)."""
    out = np.full((len(texts), tmax), -1, dtype=np.int32)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = sorted(set(tokenize(t, limit=tmax)))[:tmax]
        for j, tok in enumerate(toks):
            out[i, j] = term_hash(tok)
    return out


def featurize_query_symbols(
    texts: Sequence[Optional[str]], *, smax: int = MAX_SYM_CANDIDATES
) -> np.ndarray:
    """-> (Q, smax) int32 symbol-candidate hashes, -1-padded.

    Hashes rerank.query_symbol_candidates (token + word-join candidates,
    normalize_symbol space) for the bm25_blend symbol-bonus channel; the
    host scorer compares the identical candidate list as strings, so the
    two impls agree on which candidates exist."""
    out = np.full((len(texts), smax), -1, dtype=np.int32)
    for i, t in enumerate(texts):
        if not t:
            continue
        for j, cand in enumerate(query_symbol_candidates(t)[:smax]):
            out[i, j] = term_hash(cand)
    return out


@partial(jax.jit, static_argnums=(0,))
def gather_fingerprints(mesh, fp_ids, fp_w, fp_len, fp_sym, ids):
    """Gather candidate fingerprint rows by GLOBAL row id from row-sharded
    arrays (scan.rescore_global's ownership pattern): each shard contributes
    the rows in its range, a psum assembles the replicated result. Traffic
    is Q x W fingerprint rows — a few hundred KB."""
    axes = row_axes(mesh)
    n_shards = int(
        np.prod(
            [dict(zip(mesh.axis_names, mesh.devices.shape))[a] for a in axes]
        )
    )
    shard_rows = fp_ids.shape[0] // n_shards

    def shard_fn(fids, fw, fln, fsym, ids_rep):
        base = linear_rank(mesh, axes) * shard_rows
        local = ids_rep.astype(jnp.int32) - base
        mine = (ids_rep >= 0) & (local >= 0) & (local < shard_rows)
        li = jnp.clip(local, 0, shard_rows - 1)
        g_ids = jnp.where(mine[..., None], fids[li], -1)
        # non-owners contribute 0 so the psum reconstructs the owner's row;
        # ids use (x + 1) so the -1 padding survives the sum exactly
        part_ids = jnp.where(mine[..., None], g_ids + 1, 0)
        part_w = jnp.where(
            mine[..., None], fw[li].astype(jnp.float32), 0.0
        )
        part_len = jnp.where(mine, fln[li], 0.0)
        part_sym = jnp.where(mine, fsym[li] + 1, 0)
        return (
            jax.lax.psum(part_ids, axes),
            jax.lax.psum(part_w, axes),
            jax.lax.psum(part_len, axes),
            jax.lax.psum(part_sym, axes),
        )

    g_ids, g_w, g_len, g_sym = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(axes, None), P(axes, None), P(axes), P(axes), P(None, None),
        ),
        out_specs=(
            P(None, None, None), P(None, None, None), P(None, None),
            P(None, None),
        ),
        check_vma=False,
    )(fp_ids, fp_w, fp_len, fp_sym, ids)
    return g_ids - 1, g_w, g_len, g_sym - 1


def _minmax(x, live, axis=-1):
    big = jnp.where(live, x, -jnp.inf)
    small = jnp.where(live, x, jnp.inf)
    hi = jnp.max(big, axis=axis, keepdims=True)
    lo = jnp.min(small, axis=axis, keepdims=True)
    span = hi - lo
    safe = jnp.where(jnp.isfinite(span) & (span > 1e-12), span, 1.0)
    normed = jnp.where(
        jnp.isfinite(span) & (span > 1e-12), (x - lo) / safe, 0.0
    )
    return jnp.where(live, normed, 0.0)


@jax.jit
def bm25_blend(
    g_ids, g_w, g_len, g_sym, dense, q_ids, weight, sym_bonus, q_sym,
    table=None, learned_weight=None,
):
    """Window BM25 + dense blend, replicated math (post-gather).

    g_ids (Q, W, K) int32 (-1 pad), g_w (Q, W, K) f32, g_len (Q, W) f32,
    g_sym (Q, W) int32 whole-symbol hashes (-1 = none), dense (Q, W) f32
    (sentinel -3e38 for dead slots), q_ids (Q, T) int32 (-1 pad),
    q_sym (Q, S) int32 symbol-candidate hashes (-1 pad,
    featurize_query_symbols — token AND word-join candidates). Returns
    (final_dense_scores (Q, W), order (Q, W) int32): the caller applies
    ``order`` to its ids/scores. Mirrors index/rerank.rerank_hits: window
    df/idf, k1/b saturation, exact-symbol bonus, min-max blend,
    final-then-lexical sort with stable dense tie-break.

    ``table`` (B, D) unit-row f32 enables the LEARNED MaxSim channel
    (models/term_reranker.py): per query term, the best cosine against
    the candidate's fingerprint-term embeddings, idf-weighted — exact
    matches BM25 already counts, this rewards RELATED terms ("deleted"
    ~ "prune"). Rides the same gathered g_ids; zero extra row storage."""
    live = dense > _NEG_INF / 2  # (Q, W)
    q_valid = q_ids >= 0  # (Q, T)
    match = (g_ids[:, :, :, None] == q_ids[:, None, None, :]) & q_valid[
        :, None, None, :
    ]
    tf = jnp.sum(
        jnp.where(match, g_w[:, :, :, None], 0.0), axis=2
    )  # (Q, W, T)
    n = jnp.sum(live, axis=1, keepdims=True).astype(jnp.float32)  # (Q, 1)
    df = jnp.sum((tf > 0) & live[:, :, None], axis=1).astype(
        jnp.float32
    )  # (Q, T)
    idf = jnp.log1p((n - df + 0.5) / (df + 0.5))
    lens = jnp.maximum(g_len, 1.0)
    avg_len = jnp.sum(jnp.where(live, lens, 0.0), axis=1, keepdims=True) / (
        jnp.maximum(n, 1.0)
    )
    denom = tf + _K1 * (
        1.0 - _B + _B * lens[:, :, None] / jnp.maximum(avg_len[:, :, None], 1e-9)
    )
    lex = jnp.sum(
        idf[:, None, :] * tf * (_K1 + 1.0) / jnp.maximum(denom, 1e-9), axis=2
    )  # (Q, W)
    # symbol bonus: the query names this candidate's defining symbol —
    # literally or as a joined word sequence (q_sym carries both candidate
    # kinds) -> add sym_bonus * (the query's max idf). Sized by idf so the
    # bonus tracks the window's score scale.
    max_idf = jnp.max(
        jnp.where(q_valid, idf, -jnp.inf), axis=1, keepdims=True
    )  # (Q, 1)
    max_idf = jnp.where(jnp.isfinite(max_idf), max_idf, 0.0)
    sym_match = (
        (g_sym[:, :, None] == q_sym[:, None, :])
        & (q_sym >= 0)[:, None, :]
        & (g_sym >= 0)[:, :, None]
    ).any(axis=2)
    lex = lex + jnp.where(sym_match, sym_bonus * max_idf, 0.0)
    lex = jnp.where(live, lex, 0.0)
    final = (1.0 - weight) * _minmax(dense, live) + weight * _minmax(
        lex, live
    )
    if table is not None:
        n_buckets = table.shape[0]
        qe = table[jnp.where(q_valid, q_ids % n_buckets, 0)]  # (Q, T, D)
        # fingerprint slots are stored in selection-weight order; the
        # learned channel reads only the head the table was TRAINED on
        # (term_reranker.DOC_TERMS) — tail terms are untrained bucket
        # collisions that add noise to the max
        g_ids_l = g_ids[:, :, :_LEARNED_DOC_TERMS]
        d_valid = g_ids_l >= 0  # (Q, W, K')
        de = table[jnp.where(d_valid, g_ids_l % n_buckets, 0)]
        sims = jnp.einsum(
            "qtd,qwkd->qwtk", qe, de, preferred_element_type=jnp.float32
        )
        sims = jnp.where(d_valid[:, :, None, :], sims, -1.0)
        best = jnp.max(sims, axis=3)  # (Q, W, T)
        t_w = jnp.where(q_valid, idf, 0.0)  # idf-weight, same as BM25
        learned = jnp.einsum("qwt,qt->qw", best, t_w) / jnp.maximum(
            jnp.sum(t_w, axis=1, keepdims=True), 1e-9
        )
        # headroom-gated boost: scale by (1 - base) so the channel can
        # only PROMOTE candidates with room below the current best — a
        # correct rank-1 (base_n = 1 after min-max) is mathematically
        # undisplaceable (boosted scores stay < 1). Measured on the frozen
        # set: the additive form traded rank-3..9 promotions for rank-1
        # demotions and was an MRR wash; this form keeps only the gains.
        # Coverage gate: engage the channel in proportion to how many
        # query terms BM25 could NOT match anywhere in the window (df=0)
        # — lexically well-covered queries are BM25's home turf and the
        # learned signal is pure noise there; the synonymy-gap queries
        # ("deleted"~prune) are exactly the low-coverage ones.
        cover = jnp.sum(
            jnp.where(q_valid & (df > 0), idf, 0.0), axis=1, keepdims=True
        ) / jnp.maximum(jnp.sum(t_w, axis=1, keepdims=True), 1e-9)
        lw_eff = learned_weight * (1.0 - cover)  # (Q, 1)
        base_n = _minmax(final, live)
        final = base_n + lw_eff * _minmax(
            jnp.where(live, learned, 0.0), live
        ) * (1.0 - base_n)
    final = jnp.where(live, final, -jnp.inf)
    # stable two-key sort (numpy-lexsort semantics: final desc, lexical
    # desc, dense order for full ties): sort by the secondary key first
    # (stable), then by the primary — both jnp sorts are stable
    sec = jnp.argsort(-lex, axis=-1, stable=True)  # (Q, W)
    primary = jnp.take_along_axis(final, sec, axis=-1)
    prim = jnp.argsort(-primary, axis=-1, stable=True)
    order = jnp.take_along_axis(sec, prim, axis=-1)
    return final, order.astype(jnp.int32)


def rerank_device(
    mesh,
    fingerprints,  # (fp_ids (R,K), fp_w (R,K) f16, fp_len (R,), fp_sym (R,))
    scores,  # (Q, W) f32 device or host
    ids,  # (Q, W) int row ids device or host
    q_ids,  # (Q, T) int32 host (featurize_queries)
    *,
    q_sym,  # (Q, S) int32 host (featurize_query_symbols)
    weight: float,
    sym_bonus: float = DEFAULT_SYM_BONUS,
    table=None,  # (B, D) unit-row f32 device: learned MaxSim channel
    learned_weight: float = 0.0,
):
    """Full device rerank step: gather + BM25 + blend + reorder.

    Returns (scores, ids) reordered by the blended ranking, as device
    arrays. Scores returned are the ORIGINAL dense scores in the new order
    (hit contracts expose dense similarity; the blend only decides order —
    same convention as the host rerank_hits, which re-sorts hits without
    rewriting their .score)."""
    fp_ids, fp_w, fp_len, fp_sym = fingerprints
    ids_dev = jnp.asarray(ids, dtype=jnp.int32)
    scores_dev = jnp.asarray(scores, dtype=jnp.float32)
    g_ids, g_w, g_len, g_sym = gather_fingerprints(
        mesh, fp_ids, fp_w, fp_len, fp_sym, ids_dev
    )
    _, order = bm25_blend(
        g_ids, g_w, g_len, g_sym, scores_dev, jnp.asarray(q_ids),
        np.float32(weight), np.float32(sym_bonus), jnp.asarray(q_sym),
        table,
        np.float32(learned_weight) if table is not None else None,
    )
    return (
        jnp.take_along_axis(scores_dev, order, axis=1),
        jnp.take_along_axis(ids_dev, order, axis=1),
    )


class LexicalFingerprints:
    """Host + device lifecycle for the per-row fingerprint arrays.

    Owned by the VectorStore (row ids are store-scoped: they survive flat
    appends, are remapped by promotion/compaction, and are rebuilt on
    load). Mutations follow the store's writer lock; the device mirror is
    an atomically-swapped tuple like the index's own device state."""

    def __init__(self, mesh, row_multiple: int, kterms: int = DEFAULT_KTERMS):
        self.mesh = mesh
        self.kterms = int(kterms)
        self._row_multiple = int(row_multiple)
        cap = self._row_multiple
        self._ids = np.full((cap, self.kterms), -1, dtype=np.int32)
        self._w = np.zeros((cap, self.kterms), dtype=np.float16)
        self._len = np.ones((cap,), dtype=np.float32)
        self._sym = np.full((cap,), -1, dtype=np.int32)
        self._dev: Optional[tuple] = None

    # -- host mutation (store writer lock held) ---------------------------

    def _grow(self, min_rows: int) -> None:
        cap = self._ids.shape[0]
        new_cap = cap
        while new_cap < min_rows:
            new_cap = max(new_cap * 2, self._row_multiple)
        new_cap = -(-new_cap // self._row_multiple) * self._row_multiple
        if new_cap == cap:
            return
        ids = np.full((new_cap, self.kterms), -1, dtype=np.int32)
        w = np.zeros((new_cap, self.kterms), dtype=np.float16)
        ln = np.ones((new_cap,), dtype=np.float32)
        sym = np.full((new_cap,), -1, dtype=np.int32)
        ids[:cap], w[:cap], ln[:cap] = self._ids, self._w, self._len
        sym[:cap] = self._sym
        self._ids, self._w, self._len, self._sym = ids, w, ln, sym
        self._dev = None

    def set_rows(self, rows: np.ndarray, metas: Sequence[dict]) -> None:
        rows = np.asarray(rows, dtype=np.int64)
        if rows.size == 0:
            return
        self._grow(int(rows.max()) + 1)
        ids, w, ln, sym = featurize_docs(metas, kterms=self.kterms)
        self._ids[rows] = ids
        self._w[rows] = w
        self._len[rows] = ln
        self._sym[rows] = sym
        dev = self._dev
        if dev is not None:
            rows_d = jnp.asarray(rows, dtype=jnp.int32)
            self._dev = (
                _scatter_fp(dev[0], rows_d, jnp.asarray(ids)),
                _scatter_fp(dev[1], rows_d, jnp.asarray(w)),
                _scatter_fp(dev[2], rows_d, jnp.asarray(ln)),
                _scatter_fp(dev[3], rows_d, jnp.asarray(sym)),
            )

    def remap(self, remap: np.ndarray) -> None:
        """Renumber rows after promotion/compaction (old row -> new row,
        -1 = dropped)."""
        remap = np.asarray(remap, dtype=np.int64)
        old_n = min(remap.shape[0], self._ids.shape[0])
        keep = np.flatnonzero(remap[:old_n] >= 0)
        new_rows = remap[keep]
        n_new = int(new_rows.max()) + 1 if new_rows.size else 0
        cap = max(
            -(-max(n_new, 1) // self._row_multiple) * self._row_multiple,
            self._row_multiple,
        )
        ids = np.full((cap, self.kterms), -1, dtype=np.int32)
        w = np.zeros((cap, self.kterms), dtype=np.float16)
        ln = np.ones((cap,), dtype=np.float32)
        sym = np.full((cap,), -1, dtype=np.int32)
        ids[new_rows] = self._ids[keep]
        w[new_rows] = self._w[keep]
        ln[new_rows] = self._len[keep]
        sym[new_rows] = self._sym[keep]
        self._ids, self._w, self._len, self._sym = ids, w, ln, sym
        self._dev = None

    def rebuild(self, row_meta: dict) -> None:
        """Re-featurize everything from the store's row metadata (load)."""
        if not row_meta:
            return
        rows = np.asarray(sorted(row_meta.keys()), dtype=np.int64)
        self._grow(int(rows.max()) + 1)
        self.set_rows(rows, [row_meta[int(r)] for r in rows])

    # -- device snapshot ----------------------------------------------------

    def device_arrays(self, min_rows: int) -> tuple:
        """Row-sharded device mirror, padded to cover ``min_rows`` (the
        index's allocated rows) and the mesh row multiple."""
        from jax.sharding import NamedSharding

        axes = row_axes(self.mesh)
        self._grow(max(min_rows, 1))
        dev = self._dev
        if dev is not None and dev[0].shape[0] >= self._ids.shape[0]:
            return dev
        shard = NamedSharding(self.mesh, P(axes, None))
        shard1 = NamedSharding(self.mesh, P(axes))
        dev = (
            jax.device_put(self._ids, shard),
            jax.device_put(self._w, shard),
            jax.device_put(self._len, shard1),
            jax.device_put(self._sym, shard1),
        )
        self._dev = dev
        return dev

    # -- persistence ----------------------------------------------------------

    def state_dict(self) -> dict:
        return {
            "kterms": self.kterms,
            "ids": self._ids,
            "w": self._w,
            "len": self._len,
            "sym": self._sym,
        }

    @classmethod
    def from_state(cls, state, mesh, row_multiple: int):
        obj = cls(mesh, row_multiple, kterms=int(state["kterms"]))
        ids = np.asarray(state["ids"], dtype=np.int32)
        obj._grow(ids.shape[0])
        obj._ids[: ids.shape[0]] = ids
        obj._w[: ids.shape[0]] = np.asarray(state["w"], dtype=np.float16)
        obj._len[: ids.shape[0]] = np.asarray(state["len"], dtype=np.float32)
        if "sym" in state:
            obj._sym[: ids.shape[0]] = np.asarray(
                state["sym"], dtype=np.int32
            )
        return obj


@jax.jit
def _scatter_fp(arr, rows, vals):
    return arr.at[rows].set(vals.astype(arr.dtype))
