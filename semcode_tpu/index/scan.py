"""Shared exact-scan step for the flat index and the IVF exact path.

TPU-first scoring design (round-2 engine core):

- **int8 exact-integer arithmetic.** For ``int8`` storage the QUERIES are
  also quantized (symmetric per-row, on device) and the scan dot runs on
  the MXU's NATIVE int8 x int8 -> int32 path (measured 253-261 TOPS on a
  v5e — 1.3x the bf16 peak, not the 2x the spec sheet quotes, see
  tools/dot_rate.py — at HALF the HBM bytes; +18.7% chained scan QPS and
  ~3x faster XLA compiles vs the earlier bf16-upcast dot, which was
  equally exact — ints ≤ 127 are exactly representable in bf16). |raw| ≤
  d x 127^2 fits int32 at any real dim; the int32 result is rescaled by
  (query scale x row scale) in f32. Score error is just the original
  quantization noise (std ≈ scale/sqrt(12) ~ 5e-4 for unit-norm
  embeddings) — ~5x tighter than bf16 scoring, whose 2^-8 epsilon ties
  hundreds of clustered near-duplicates, at HALF the HBM traffic.
  (Measured on chip: bf16 scoring caps recall@10 vs an f32 oracle at 0.986
  no matter how deep the rescore fetch; see docs/BENCHMARKS.md.)

- **Fused f32 device rescore.** Each shard over-fetches ``fetch``
  candidates, gathers their rows from an f32 mirror resident in HBM, and
  re-scores them exactly — inside the same jit step. The gather reads
  Q x fetch rows (~1/8 of one corpus pass at fetch=128), so exact final
  ordering costs ~12% extra HBM instead of a 1M-row f32 scan (4x the
  bytes) or a host-side rescore (which single-threads the serving path).

- **Per-shard approx selection.** ``lax.approx_max_k`` picks the ``fetch``
  candidates (plain top_k over millions of columns dominates the step
  otherwise); misses concentrate at the BOTTOM of the fetched set, so the
  true top-k survive the fetch with margin once scores are tie-free.
  The recall_target knob sets approx_max_k's internal reduction size and is
  the main speed lever (measured 1M x 384 int8, fetch=128, one v5e chip:
  rt=0.99 -> 67k QPS @ 0.9996, rt=0.95 -> 91k @ 0.9982, rt=0.90 -> 94k
  @ 0.9967 recall@10 after the fused rescore). Default 0.95.

Replaces: the per-query work Milvus IVF_FLAT does server-side for the
reference (reference src/semcode/storage/milvus_store.py:135-148).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..parallel.mesh import (
    hierarchical_topk_merge,
    linear_rank,
    row_axes,
)

_NEG_INF = np.float32(-3.0e38)


def resolve_rescore_width(rescore_width: int, fetch_width: int, k: int,
                          rescore) -> int:
    """Shared auto policy for the top-W gather slice (one implementation
    for FlatIndex and IVFIndex — the parallel ``_fetch_width`` pair has
    already drifted once, so this one is a module function).

    - explicit ``rescore_width`` > 0: clamp to >= k and use it;
    - ``rescore_width`` < 0 (or no rescore tier): full fetch, no slice;
    - auto (0): max(3k, 32) — measured recall-IDENTICAL to the full pool
      at 1M x 384 and 400k x 3072 (docs/BENCHMARKS.md round 4) — UNLESS
      the caller explicitly widened ``fetch_width``: that knob is
      documented as the recall lever ("a wider pool recovers more
      int8-ranking misses"), and a silent 32-wide gather slice would cap
      exactly the candidates the user paid to fetch. Explicit fetch =
      full-fetch gather; set both knobs to combine them deliberately.
    """
    if rescore is None or rescore_width < 0:
        return 0
    if rescore_width > 0:
        return max(rescore_width, k)
    if fetch_width > 0:
        return 0
    return max(3 * k, 32)


def quantize_queries_device(q):
    """Symmetric per-row int8 quantization of a query batch, on device.

    Returns (q_int as bf16 — exact for values ≤ 127 — and f32 scales).
    Matches flat.quantize_rows semantics (host path).
    """
    scale = jnp.maximum(jnp.max(jnp.abs(q), axis=1), 1e-12) / 127.0
    qq = jnp.clip(jnp.round(q / scale[:, None]), -127, 127)
    return qq.astype(jnp.bfloat16), scale.astype(jnp.float32)


def _score_block(qq, vecs, scales_rows, storage, q_scales=None):
    """(Q, d) x (R, d) -> (Q, R) f32 scores for a storage-dtype block."""
    if storage == "int8":
        # native int8 x int8 -> int32 MXU dot (measured 1.3x bf16-peak
        # TOPS at half the HBM bytes — tools/dot_rate.py;
        # measured ~9% faster per dispatch at 1M x 384 and ~10x faster to
        # COMPILE than the bf16-upcast dot it replaces). The int32
        # accumulation is exact (|raw| ≤ d * 127^2 fits int32 at any real
        # dim), but the f32 rescale below rounds integer magnitudes above
        # 2^24 (reachable only for adversarially correlated rows at d >
        # ~1000) — same f32-accumulation limit the bf16-upcast dot had.
        # Final ordering is guaranteed by the fused f32 rescore, not here.
        raw = jax.lax.dot_general(
            qq.astype(jnp.int8),
            vecs,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        return raw * q_scales[:, None] * scales_rows[None, :]
    raw = jax.lax.dot_general(
        qq,
        vecs,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return raw


_NEG_F16 = np.float16(-6.0e4)


def _exact_scan_impl(
    mesh,
    vecs,        # (R, d) row-sharded, storage dtype
    norms,       # (R,) f32 row sqnorms (l2)
    valid,       # (R,) bool liveness
    scales,      # (R,) f32 int8 row scales (or placeholder)
    rescore,     # (R, d) f32 mirror for fused rescore, or None
    q,           # (Q, d) f32, replicated, metric-normalized
    k,           # per-shard result width
    fetch,       # per-shard candidate width before rescore (>= k)
    metric,      # ip | cosine | l2
    storage,     # int8 | bfloat16 | float32
    approx,      # use lax.approx_max_k for the candidate selection
    recall_target=0.99,
    k_out=None,  # final merged width (default k)
    score_dtype="float32",  # float32 | float16 for the (Q, R) score matrix
    tags=None,   # (R,) int32 row tags for device-side filtering, or None
    allow=None,  # (A,) int32 allowed tag values (pad with -1), with tags
    scan_impl="xla",  # xla | pallas | pallas-interpret (kernel selection)
    resid=None,    # (R, d) int8 second-level residual mirror, or None
    rscales=None,  # (R,) f32 residual row scales, with resid
    rescore_width=0,  # gather/rescore only the top-W of fetch (0 = all)
):
    """Fused: scan + select + (rescore) per shard, all-gather, global merge.

    ``scan_impl="pallas"`` routes the per-shard score+select through
    ``ops/scan_kernel2.top2_scan_shard``: the (Q, shard_rows) score matrix
    never leaves VMEM and each 128-row block emits its top-2 (score, row);
    the usual approx/exact top-k then runs on the 2*R/128-wide reduced
    matrix and the fused f32 rescore re-orders exactly as in the XLA path.
    Selection differs from approx_max_k only when >= 3 of the true top-k
    share one 128-row block (P ~ 1e-5 per query at 1M rows).
    "pallas-interpret" is the same math through the Pallas interpreter
    (CPU test meshes).

    ``score_dtype="float16"`` is an experimental knob that emits the (Q, R)
    score matrix as fp16. Measured on a v5e chip (1M x 384, int8 + fused
    rescore) it is QPS-neutral: XLA fuses the selection into the matmul
    epilogue without materializing the score matrix in HBM, so there is no
    round trip to halve. Kept because the fusion is a compiler behavior, not
    a contract — if a future XLA materializes the matrix, fp16 halves that
    traffic, and correctness is already guaranteed (fp16's 11 mantissa bits
    + the fused f32 rescore restoring exact order of the fetched
    candidates). Scores must be O(1)-scaled before the cast (int8 raw
    integer dots are rescaled first, so they are).

    ``tags``/``allow`` implement filtered search on device (the feature
    Milvus exposes as boolean expressions, reference milvus_store.py:135-148):
    rows whose tag is not in ``allow`` are masked out with the tombstones
    BEFORE selection, so a selective filter still returns k true matches —
    unlike host post-filtering, which can exhaust its over-fetched candidates
    on a 1%-selectivity filter. Cost: one (R,) int32 read + an (R, A)
    broadcast compare — negligible next to the (Q, R) matmul.

    ``resid``/``rscales`` (int8 storage only, mutually exclusive with
    ``rescore``) enable the TWO-LEVEL int8 rescore: the rescore stage
    gathers candidate rows from the int8 corpus AND an int8 residual
    mirror (r = x - dequant(int8(x)), quantized per-row at ~1/254 of the
    first-level scale) and re-scores the ~16-bit reconstruction at HIGHEST
    precision. Per-element reconstruction error ≤ scale/508 — ~1e-6
    relative for unit-norm rows, far below the tie spacing the f32 rescore
    exists to separate — at HALF the gather bytes of the f32 mirror (2
    int8 rows vs one f32 row) and 1/2 the HBM residency.

    ``rescore_width`` decouples the SELECTION pool from the GATHER pool.
    ``fetch`` must stay wide so ``approx_max_k``'s reduction misses land
    below the keep line — but the rescore gather is row-transaction-bound
    (two int8 gathers cost ~2x one f32 gather at HALF the bytes; see
    docs/BENCHMARKS.md round-4 decomposition), so gathering all ``fetch``
    candidates pays for rows the exact re-ranking can never promote into
    the top-k. Both selection primitives return candidates SORTED by
    prefilter score descending (``top_k`` always; ``approx_max_k``
    aggregates its partial reduction through an exact final top-k), so
    the top-W slice is free — no extra pass. A true top-k row is lost
    only if int8 quantization noise (~5e-4 relative for unit-norm rows)
    displaces it below prefilter rank W among the fetched candidates —
    measured on chip (1M x 384, batch 512): recall@10 is IDENTICAL from
    W=32 to the full fetch=128 pool while chained QPS rises 153k -> 199k
    (docs/BENCHMARKS.md round-4 table).
    """
    if k_out is None:
        k_out = k
    axes = row_axes(mesh)
    n_shards = int(np.prod([dict(zip(mesh.axis_names, mesh.devices.shape))[a]
                            for a in axes]))
    shard_rows = vecs.shape[0] // n_shards
    fetch = min(fetch, shard_rows)
    k = min(k, fetch)
    w = int(rescore_width)
    w = max(w, k) if 0 < w < fetch else 0  # 0 = gather the whole fetch
    k_out = min(k_out, k * n_shards)
    f16 = score_dtype == "float16" and scan_impl == "xla"
    neg = _NEG_F16 if f16 else _NEG_INF
    has_resc = rescore is not None
    has_resid = resid is not None
    if has_resid and (has_resc or storage != "int8"):
        raise ValueError(
            "residual rescore requires int8 storage and excludes the f32 "
            "mirror"
        )
    has_tags = tags is not None
    use_pallas = scan_impl in ("pallas", "pallas-interpret")

    if storage == "int8":
        qq, q_scales = quantize_queries_device(q)
    else:
        qq, q_scales = q, None

    def shard_fn(*ops):
        it = iter(ops)
        v, nrm, vld, scl = next(it), next(it), next(it), next(it)
        resc = next(it) if has_resc else None
        rsd = next(it) if has_resid else None
        rscl = next(it) if has_resid else None
        if has_tags:
            t, alw = next(it), next(it)
            vld = vld & (t[:, None] == alw[None, :]).any(axis=1)
        qq_s, q_f32 = next(it), next(it)
        base = linear_rank(mesh, axes) * shard_rows
        if use_pallas:
            from ..ops.scan_kernel2 import top2_scan_shard

            # fold metric/scale/mask terms into per-row mult/add vectors:
            # kernel score = raw * q_scale * mult + add (see scan_kernel2)
            mult = scl if storage == "int8" else jnp.ones_like(nrm)
            if metric == "l2":
                mult = 2.0 * mult
            addv = jnp.where(vld, 0.0, _NEG_INF)
            if metric == "l2":
                addv = addv - nrm
            qk = (qq_s if storage == "int8"
                  else qq_s.astype(jnp.bfloat16))
            qsc = (q_scales if storage == "int8"
                   else jnp.ones((qq_s.shape[0],), jnp.float32))
            bm, br = top2_scan_shard(
                v, mult[None, :], addv[None, :], qk, qsc[:, None],
                interpret=(scan_impl == "pallas-interpret"),
            )
            fetch_p = min(fetch, bm.shape[1])
            # approx selection only pays on wide reduced matrices; exact
            # top_k over a few thousand columns is already cheap
            if approx and bm.shape[1] > 4 * fetch_p:
                s, sel = jax.lax.approx_max_k(
                    bm, fetch_p, recall_target=recall_target
                )
            else:
                s, sel = jax.lax.top_k(bm, fetch_p)
            pos = jnp.take_along_axis(br, sel, axis=1)
            if s.shape[1] < k:  # tiny shards: keep downstream widths legal
                pad = k - s.shape[1]
                s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=_NEG_INF)
                pos = jnp.pad(pos, ((0, 0), (0, pad)))
        else:
            scores = _score_block(qq_s, v, scl, storage, q_scales)
            if metric == "l2":
                scores = 2.0 * scores - nrm[None, :]
            if f16:
                # fused into the matmul epilogue: the big matrix hits HBM as
                # fp16. clip first so un-normalized corpora can't overflow to
                # inf (the clipped extremes tie, and the f32 rescore re-orders
                # the fetch). the clip range stays strictly INSIDE the -6e4
                # mask sentinel so a legitimately-extreme negative score can
                # never collide with the sentinel and be dropped by the
                # `s > neg/2` validity test below
                scores = jnp.clip(scores, -2.9e4, 6.0e4).astype(jnp.float16)
            scores = jnp.where(vld[None, :], scores, neg)
            if approx:
                s, pos = jax.lax.approx_max_k(
                    scores, fetch, recall_target=recall_target
                )
            else:
                s, pos = jax.lax.top_k(scores, fetch)  # (Q, fetch) local rows
        s = s.astype(jnp.float32)
        if (resc is not None or rsd is not None) and w:
            # top-W gather slice: selection output is sorted by prefilter
            # score, so this is a static slice, not another top_k
            s = s[:, :w]
            pos = pos[:, :w]
        if resc is not None or rsd is not None:
            # fused exact rescore: gather candidate rows from the f32 mirror
            # (or reconstruct them from corpus + residual int8 at ~16-bit
            # precision — half the gather bytes, see module docstring).
            # precision=HIGHEST is load-bearing: the TPU MXU's DEFAULT f32
            # matmul rounds INPUTS to bf16, which re-ties the tie-dense
            # candidates this rescore exists to separate (measured 1M x 384:
            # default-precision rescore caps recall@10 at ~0.986 vs a host
            # f32 oracle; HIGHEST matches it 1.0000). Cost is confined to the
            # tiny (Q, fetch, d) gather, not the corpus scan.
            if resc is not None:
                cand = resc[pos]  # (Q, fetch, d)
            else:
                cand = (
                    v[pos].astype(jnp.float32) * scl[pos][:, :, None]
                    + rsd[pos].astype(jnp.float32) * rscl[pos][:, :, None]
                )
            exact = jnp.einsum(
                "qfd,qd->qf", cand, q_f32, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            if metric == "l2":
                exact = 2.0 * exact - nrm[pos]
            s = jnp.where(s > float(neg) / 2, exact, _NEG_INF)
        else:
            s = jnp.where(s > float(neg) / 2, s, _NEG_INF)
        if k < s.shape[1]:
            s, sel = jax.lax.top_k(s, k)
            pos = jnp.take_along_axis(pos, sel, axis=1)
        # hierarchical merge: innermost (ICI) axis first, so only (Q, k_out)
        # crosses the slower outer fabric (DCN on a ("dcn","data") mesh)
        return hierarchical_topk_merge(s, pos + base, k_out, axes)

    in_specs = [P(axes, None), P(axes), P(axes), P(axes)]
    operands = [vecs, norms, valid, scales]
    if has_resc:
        in_specs.append(P(axes, None))
        operands.append(rescore)
    if has_resid:
        in_specs += [P(axes, None), P(axes)]
        operands += [resid, rscales]
    if has_tags:
        in_specs += [P(axes), P(None)]
        operands += [tags, allow]
    in_specs += [P(None, None), P(None, None)]
    operands += [qq, q]
    top_s, top_ids = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(None, None), P(None, None)),
        # the hierarchical all_gather+top_k merge returns values that ARE
        # replicated, but the static vma checker can't infer it
        check_vma=False,
    )(*operands)
    if metric == "l2":
        qnorm = jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        top_s = top_s - qnorm  # score = -||q - x||^2 (higher = closer)
    return top_s, top_ids


exact_scan = partial(
    jax.jit, static_argnums=(0, 7, 8, 9, 10, 11, 12, 13, 14, 17, 20)
)(_exact_scan_impl)


@partial(jax.jit, static_argnums=(0, 7, 8, 9, 10, 11, 12, 13, 14, 17, 20))
def exact_scan_batched(
    mesh,
    vecs,
    norms,
    valid,
    scales,
    rescore,
    qs,          # (B, Q, d) f32, replicated, metric-normalized
    k,
    fetch,
    metric,
    storage,
    approx,
    recall_target=0.99,
    k_out=None,
    score_dtype="float32",
    tags=None,
    allow=None,
    scan_impl="xla",
    resid=None,
    rscales=None,
    rescore_width=0,
):
    """``exact_scan`` over B query batches in ONE dispatch (lax.scan).

    Math is identical to B separate ``exact_scan`` calls; what changes is
    the launch economics: every device dispatch pays a fixed host/runtime
    cost (measured ~2-3 ms through a TPU service tunnel — larger than the
    entire 1M x 384 scan's device time of ~1.3 ms), so batch-at-a-time
    serving is dispatch-bound. Folding B batches into one jit recovers the
    device roofline: measured 1M x 384 int8, batch 256, one v5e chip —
    3.0 ms/batch dispatched singly vs 1.3 ms/batch with B=16 chained
    (~195k QPS device-side). Returns (scores (B, Q, k), ids (B, Q, k)).
    """

    def body(carry, q):
        s, i = _exact_scan_impl(
            mesh, vecs, norms, valid, scales, rescore, q, k, fetch,
            metric, storage, approx, recall_target, k_out, score_dtype,
            tags, allow, scan_impl, resid, rscales, rescore_width,
        )
        return carry, (s, i)

    _, (ss, ii) = jax.lax.scan(body, 0, qs)
    return ss, ii


@partial(jax.jit, static_argnums=(0, 5))
def rescore_global(mesh, frescore, fnorms, q, ids, metric):
    """Exact f32 re-scoring of MERGED candidates identified by global row id.

    The probing path's candidates are owned by CLUSTER, not by mirror row
    range, so its per-shard results cannot gather from the row-sharded f32
    mirror locally. This second tiny step re-scores after the global merge:
    every shard gathers the candidate rows that live in its mirror range,
    scores them against the (replicated) queries, and a psum assembles the
    full (Q, k) exact score matrix. Traffic: Q x k rows — negligible.
    Returns f32 scores aligned with ``ids`` (NOT re-sorted; -inf where
    ids < 0). For l2, scores follow the -||q-x||^2 convention.
    """
    axes = row_axes(mesh)
    n_shards = int(np.prod([dict(zip(mesh.axis_names, mesh.devices.shape))[a]
                            for a in axes]))
    shard_rows = frescore.shape[0] // n_shards

    def shard_fn(resc, nrm, qq, ids_rep):
        base = linear_rank(mesh, axes) * shard_rows
        local = ids_rep.astype(jnp.int32) - base
        mine = (ids_rep >= 0) & (local >= 0) & (local < shard_rows)
        li = jnp.clip(local, 0, shard_rows - 1)
        cand = resc[li]  # (Q, k, d)
        # HIGHEST: true f32 scoring (see exact_scan's rescore comment)
        exact = jnp.einsum(
            "qkd,qd->qk", cand, qq, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if metric == "l2":
            exact = 2.0 * exact - nrm[li]
        part = jnp.where(mine, exact, 0.0)
        return jax.lax.psum(part, axes)

    exact = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(axes, None),
            P(axes),
            P(None, None),
            P(None, None),
        ),
        out_specs=P(None, None),
    )(frescore, fnorms, q, ids)
    if metric == "l2":
        qnorm = jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        exact = exact - qnorm
    return jnp.where(ids >= 0, exact, _NEG_INF)


@partial(jax.jit, static_argnums=(0, 8))
def rescore_global_residual(
    mesh, fvecs, fscales, fresid, frscales, fnorms, q, ids, metric
):
    """``rescore_global`` for the two-level int8 mirror (no f32 mirror in
    HBM): candidate rows are reconstructed from the int8 corpus + int8
    residual (~16-bit precision, see exact_scan's resid docs) and re-scored
    at HIGHEST precision after the global merge. Same traffic shape as
    rescore_global — Q x k rows — at half the bytes."""
    axes = row_axes(mesh)
    n_shards = int(np.prod([dict(zip(mesh.axis_names, mesh.devices.shape))[a]
                            for a in axes]))
    shard_rows = fvecs.shape[0] // n_shards

    def shard_fn(v, scl, rsd, rscl, nrm, qq, ids_rep):
        base = linear_rank(mesh, axes) * shard_rows
        local = ids_rep.astype(jnp.int32) - base
        mine = (ids_rep >= 0) & (local >= 0) & (local < shard_rows)
        li = jnp.clip(local, 0, shard_rows - 1)
        cand = (
            v[li].astype(jnp.float32) * scl[li][:, :, None]
            + rsd[li].astype(jnp.float32) * rscl[li][:, :, None]
        )  # (Q, k, d)
        exact = jnp.einsum(
            "qkd,qd->qk", cand, qq, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if metric == "l2":
            exact = 2.0 * exact - nrm[li]
        part = jnp.where(mine, exact, 0.0)
        return jax.lax.psum(part, axes)

    exact = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(axes, None),
            P(axes),
            P(axes, None),
            P(axes),
            P(axes),
            P(None, None),
            P(None, None),
        ),
        out_specs=P(None, None),
    )(fvecs, fscales, fresid, frscales, fnorms, q, ids)
    if metric == "l2":
        qnorm = jnp.sum(q.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        exact = exact - qnorm
    return jnp.where(ids >= 0, exact, _NEG_INF)
