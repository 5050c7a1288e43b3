"""Headline benchmark: query throughput at matched recall on TPU.

Builds a 1M x 384 clustered synthetic corpus (code embeddings cluster by
repo/module, so a Gaussian mixture is the realistic shape), builds the IVF
index on TPU (nlist=1024, int8 storage + fused f32 device rescore), measures
recall@10 against an exact f32 oracle, then measures:

- amortized batch throughput for the exact-scan and probing modes,
- per-query serving latency (micro-batches of 8, pipelined dispatch),
- reader latency while a writer streams inserts (lock-free serving).

Baseline: the reference delegates ANN to Milvus IVF_FLAT on CPU
(/root/reference/docker-compose.yml); Milvus itself cannot run in this image,
so the CPU baseline is a numpy IVF-equivalent scan with the same
nlist/nprobe (same FLOPs Milvus's IVF_FLAT performs per query, favourable to
the baseline since it skips Milvus's RPC + scheduling overhead).

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ratio,
   "extras": {recall, probing qps, serving p50/p99, under-ingest p50/p99}}

NOTE on methodology: on this platform jax.block_until_ready() does NOT
synchronize — only data fetches do. Throughput is measured by enqueueing a
chunk of batches and fetching only the last result (the TPU executes
in order); latency is dispatch + full result fetch.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

# keep the benchmark reproducible and the corpus size overridable for smoke runs
N = int(os.environ.get("BENCH_N", 1_000_000))
DIM = int(os.environ.get("BENCH_DIM", 384))
NLIST = int(os.environ.get("BENCH_NLIST", 1024))
NPROBE = int(os.environ.get("BENCH_NPROBE", 32))
K = 10
N_QUERIES = int(os.environ.get("BENCH_QUERIES", 512))
BATCH = min(int(os.environ.get("BENCH_BATCH", 256)), N_QUERIES)
SERVE_BATCH = int(os.environ.get("BENCH_SERVE_BATCH", 8))
TIMED_SECS = float(os.environ.get("BENCH_SECS", 20))
DTYPE = os.environ.get("BENCH_DTYPE", "int8")  # int8 | bfloat16 | float32


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_corpus(rng: np.random.Generator):
    """Gaussian-mixture corpus: ~N/1000 clusters, unit-normalized."""
    n_centers = max(64, N // 1000)
    centers = rng.standard_normal((n_centers, DIM)).astype(np.float32)
    out = np.empty((N, DIM), dtype=np.float32)
    step = 100_000
    for i in range(0, N, step):
        m = min(step, N - i)
        assign = rng.integers(0, n_centers, size=m)
        out[i : i + m] = centers[assign] + 0.35 * rng.standard_normal(
            (m, DIM)
        ).astype(np.float32)
    out /= np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-9)
    return out, centers


def host_oracle(x: np.ndarray, queries: np.ndarray, k: int) -> np.ndarray:
    """Exact f32 top-k on the host (keeps HBM free for the index build)."""
    out = np.zeros((queries.shape[0], k), dtype=np.int64)
    for i in range(0, queries.shape[0], 64):
        scores = queries[i : i + 64] @ x.T
        out[i : i + 64] = np.argpartition(-scores, k, axis=1)[:, :k]
    return out


def recall_of(got: np.ndarray, oracle: np.ndarray) -> float:
    return float(
        np.mean(
            [
                len(set(a.tolist()) & set(b.tolist())) / oracle.shape[1]
                for a, b in zip(got, oracle)
            ]
        )
    )


def cpu_ivf_baseline_qps(x, queries, centroids, counts_order, rounds=3):
    """numpy IVF-equivalent: probe NPROBE of NLIST clusters, exact scan inside.

    Uses the same trained centroids and cluster layout as the TPU index so the
    work per query matches Milvus IVF_FLAT (nlist/nprobe identical).
    """
    order, starts, packed = counts_order
    q_small = queries[: min(32, len(queries))]
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < 5.0 and reps < rounds * len(q_small):
        for q in q_small:
            cq = centroids @ q
            probes = np.argpartition(-cq, NPROBE)[:NPROBE]
            cand = np.concatenate(
                [packed[starts[p] : starts[p + 1]] for p in probes]
            )
            scores = x[cand] @ q
            k = min(K, len(scores))
            np.argpartition(-scores, k - 1)[:k]
            reps += 1
        if reps >= 32:
            break
    dt = time.perf_counter() - t0
    return reps / dt


def main() -> None:
    rng = np.random.default_rng(42)
    log(f"[bench] corpus N={N} dim={DIM} nlist={NLIST} nprobe={NPROBE} {DTYPE}")
    t0 = time.perf_counter()
    x, _ = make_corpus(rng)
    queries = x[rng.choice(N, N_QUERIES, replace=False)] + 0.05 * rng.standard_normal(
        (N_QUERIES, DIM)
    ).astype(np.float32)
    queries /= np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-9)
    log(f"[bench] corpus built in {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    oracle_ids = host_oracle(x, queries, K)
    log(f"[bench] exact f32 host oracle in {time.perf_counter()-t0:.1f}s")

    import jax

    from semcode_tpu.index.ivf import IVFIndex

    # ---- IVF build ----------------------------------------------------------
    t0 = time.perf_counter()
    ivf = IVFIndex(
        DIM, nlist=NLIST, nprobe=NPROBE, metric="ip", dtype=DTYPE,
        kmeans_iters=10,
    )
    # tag 1% of rows (simulating a small repo among many) so the filtered-
    # search section below can measure device tag masking at low selectivity
    row_tags = (np.arange(N) % 100 == 0).astype(np.int32)
    ivf.add(x, tags=row_tags)
    build_s = time.perf_counter() - t0
    log(
        f"[bench] IVF build: {build_s:.1f}s (nlist={ivf.nlist}, cmax={ivf.cmax},"
        f" device_rescore={ivf.device_rescore_active})"
    )

    # snapshot the built layout now: the streaming-ingest section below adds
    # rows past N, which the baseline's corpus array doesn't contain
    base_live = np.flatnonzero(ivf._alive).copy()
    base_assign = ivf._assign[base_live].copy()

    q_batches = [
        jax.device_put(queries[i : i + BATCH])
        for i in range(0, N_QUERIES, BATCH)
        if queries[i : i + BATCH].shape[0] == BATCH
    ]

    # ---- recall (both scan modes, production path: fused device rescore) ----
    def measure_recall(mode):
        got = np.zeros((N_QUERIES, K), dtype=np.int64)
        for bi, i in enumerate(range(0, N_QUERIES, BATCH)):
            _, ids = ivf.search_device(q_batches[bi], K, mode=mode)
            got[i : i + BATCH] = np.asarray(ids)
        return recall_of(got, oracle_ids)

    auto_mode = ivf._pick_mode(BATCH, NPROBE, K)
    recall = measure_recall("exact")
    recall_ivf = measure_recall("ivf")
    log(
        f"[bench] recall@10: exact={recall:.4f} probing(nprobe={NPROBE})="
        f"{recall_ivf:.4f}; auto mode at batch {BATCH} = {auto_mode}"
    )

    # ---- timed QPS ------------------------------------------------------------
    def timed_qps(mode, batches, secs=TIMED_SECS):
        np.asarray(ivf.search_device(batches[0], K, mode=mode)[0])  # warm
        lat = []
        for _ in range(8):  # single-call sync latency (incl. host transfer)
            t0 = time.perf_counter()
            np.asarray(ivf.search_device(batches[0], K, mode=mode)[0])
            lat.append(time.perf_counter() - t0)
        bsz = batches[0].shape[0]
        chunk = 32
        t_start = time.perf_counter()
        n_done = 0
        while time.perf_counter() - t_start < secs:
            outs = []
            for i in range(chunk):
                outs.append(
                    ivf.search_device(batches[i % len(batches)], K, mode=mode)
                )
                n_done += bsz
            np.asarray(outs[-1][0])
        total_s = time.perf_counter() - t_start
        return (
            n_done / total_s,
            float(np.percentile(lat, 50) * 1000),
            float(np.percentile(lat, 99) * 1000),
        )

    qps, p50, p99 = timed_qps("exact", q_batches)
    log(
        f"[bench] TPU exact scan: {qps:.0f} QPS amortized (batch={BATCH}),"
        f" single-call latency p50={p50:.1f}ms p99={p99:.1f}ms per batch"
    )
    qps_ivf, p50_ivf, p99_ivf = timed_qps("ivf", q_batches, secs=TIMED_SECS / 2)
    log(
        f"[bench] TPU probing (pallas={ivf._pallas_mode()}): {qps_ivf:.0f} QPS,"
        f" p50={p50_ivf:.1f}ms p99={p99_ivf:.1f}ms per batch"
    )

    # ---- serving-path per-query latency (micro-batches, pipelined) ----------
    serve_batches = [
        jax.device_put(queries[i : i + SERVE_BATCH])
        for i in range(0, min(N_QUERIES, 32 * SERVE_BATCH), SERVE_BATCH)
    ]
    lat = []
    np.asarray(ivf.search_device(serve_batches[0], K)[0])  # warm the shape
    for i in range(64):
        t0 = time.perf_counter()
        np.asarray(ivf.search_device(serve_batches[i % len(serve_batches)], K)[0])
        lat.append((time.perf_counter() - t0) * 1000)
    serve_p50 = float(np.percentile(lat, 50))
    serve_p99 = float(np.percentile(lat, 99))
    serve_auto_mode = ivf._pick_mode(SERVE_BATCH, NPROBE, K)
    log(
        f"[bench] serving path (batch={SERVE_BATCH}, auto mode="
        f"{serve_auto_mode}): per-request p50={serve_p50:.1f}ms "
        f"p99={serve_p99:.1f}ms (incl. host transfer)"
    )

    # ---- small-batch regime: probing vs exact at the serving batch size -----
    small_secs = max(2.0, TIMED_SECS / 4)
    small_qps = {}
    for mode in ("exact", "ivf"):
        small_qps[mode], _, _ = timed_qps(mode, serve_batches, secs=small_secs)
    log(
        f"[bench] small-batch (batch={SERVE_BATCH}) regime: "
        f"exact={small_qps['exact']:.0f} QPS, probing={small_qps['ivf']:.0f} "
        f"QPS -> {'probing' if small_qps['ivf'] > small_qps['exact'] else 'exact'}"
        f" wins; auto picks {serve_auto_mode}"
    )

    # ---- filtered search: 1%-selectivity repo filter, device tag mask -------
    allow = np.asarray([1], dtype=np.int32)
    _, f_ids = ivf.search_device(q_batches[0], K, allow_tags=allow)
    f_ids = np.asarray(f_ids)
    filt_ok = bool(
        (f_ids >= 0).all() and (row_tags[f_ids.ravel()] == 1).all()
    )
    t_start = time.perf_counter()
    n_done = 0
    while time.perf_counter() - t_start < max(2.0, TIMED_SECS / 4):
        outs = []
        for i in range(32):
            outs.append(
                ivf.search_device(
                    q_batches[i % len(q_batches)], K, allow_tags=allow
                )
            )
            n_done += BATCH
        np.asarray(outs[-1][0])
    filt_qps = n_done / (time.perf_counter() - t_start)
    log(
        f"[bench] filtered search (1% selectivity, device tag mask): "
        f"{filt_qps:.0f} QPS, all-hits-match={filt_ok} "
        f"(host post-filter would return ~{K // 100} of {K} hits)"
    )

    # ---- queries during streaming ingest (lock-free serving) ----------------
    stop = threading.Event()
    write_count = {"n": 0}

    def writer():
        # bounded: stays inside the layout/mirror headroom so the stream
        # exercises the scatter path, not a (slow-compile) full rebuild
        wrng = np.random.default_rng(7)
        for _ in range(20):
            if stop.is_set():
                return
            ivf.add(
                (wrng.standard_normal((256, DIM)) * 0.3).astype(np.float32)
            )
            write_count["n"] += 256

    ingest_lat = []
    wt = threading.Thread(target=writer, daemon=True)
    wt.start()
    t_start = time.perf_counter()
    while time.perf_counter() - t_start < min(TIMED_SECS, 15):
        t0 = time.perf_counter()
        np.asarray(ivf.search_device(serve_batches[0], K)[0])
        ingest_lat.append((time.perf_counter() - t0) * 1000)
    stop.set()
    wt.join(timeout=30)
    under_p50 = float(np.percentile(ingest_lat, 50))
    under_p99 = float(np.percentile(ingest_lat, 99))
    log(
        f"[bench] under ingest ({write_count['n']} rows streamed): reader "
        f"p50={under_p50:.1f}ms p99={under_p99:.1f}ms ({len(ingest_lat)} reads)"
    )

    # ---- CPU baseline ----------------------------------------------------------
    live, assign = base_live, base_assign
    order = np.argsort(assign, kind="stable")
    packed = live[order]
    counts = np.bincount(assign, minlength=ivf.nlist)
    starts = np.zeros(ivf.nlist + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    base_qps = cpu_ivf_baseline_qps(
        x, queries, ivf.centroids, (order, starts, packed)
    )
    log(f"[bench] CPU IVF-equivalent baseline: {base_qps:.1f} QPS")

    result = {
        "metric": (
            f"query throughput at recall@10={recall:.4f} "
            f"(N={N}, dim={DIM}, {DTYPE} + fused f32 device rescore, exact "
            f"scan mode, nlist={NLIST}, 1 chip; CPU baseline = numpy "
            f"IVF-equivalent nprobe={NPROBE})"
        ),
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / base_qps, 2) if base_qps > 0 else None,
        "extras": {
            "recall_at_10_exact": round(recall, 4),
            "recall_at_10_probing": round(recall_ivf, 4),
            "probing_qps": round(qps_ivf, 1),
            "batch_p50_ms": round(p50, 1),
            "batch_p99_ms": round(p99, 1),
            "serving_batch": SERVE_BATCH,
            "serving_p50_ms": round(serve_p50, 1),
            "serving_p99_ms": round(serve_p99, 1),
            "small_batch_exact_qps": round(small_qps["exact"], 1),
            "small_batch_probing_qps": round(small_qps["ivf"], 1),
            "small_batch_auto_mode": serve_auto_mode,
            "filtered_qps_1pct": round(filt_qps, 1),
            "filtered_hits_all_match": filt_ok,
            "under_ingest_p50_ms": round(under_p50, 1),
            "under_ingest_p99_ms": round(under_p99, 1),
            "build_s": round(build_s, 1),
            "cpu_baseline_qps": round(base_qps, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
