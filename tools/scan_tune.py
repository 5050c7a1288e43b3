"""Joint (rescore_mode, fetch, recall_target) sweep of the chained exact
scan at benchmark scale — the tuning data behind the flagship defaults
(VERDICT round-3 item 1: attack the measured roofline gap).

For each config: build one FlatIndex over the same 1M x 384 Gaussian-mixture
corpus (int8 storage), measure chained-dispatch QPS (B batches/launch, the
flagship methodology) AND recall@10 against an exact HIGHEST-precision f32
oracle computed on device.

Usage: python tools/scan_tune.py [config ...]
  config = mode:fetch:rt[:W], e.g. f32:128:0.95 f32:128:0.95:64
  (W = rescore_width top-W gather slice; omitted = 0 = the PRODUCTION
  auto policy — note the sweep always sets fetch_width explicitly, and
  auto defers to an explicit fetch, so omitted here means full-fetch
  gather via that deference; -1 = full fetch explicitly)
Env: N, DIM, BATCH, CHUNK_B, SECS override defaults.
Prints one JSON line per config.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N = int(os.environ.get("N", 1_000_000))
DIM = int(os.environ.get("DIM", 384))
BATCH = int(os.environ.get("BATCH", 256))
CHUNK_B = int(os.environ.get("CHUNK_B", 16))
SECS = float(os.environ.get("SECS", 8.0))
K = 10
N_Q = max(int(os.environ.get("N_Q", 512)), BATCH)


def main() -> None:
    configs = sys.argv[1:] or [
        "f32:128:0.95",
        "residual:128:0.95",
        "residual:64:0.95",
        "residual:128:0.90",
    ]

    import jax
    import jax.numpy as jnp

    from semcode_tpu.index.flat import FlatIndex

    # deterministic on-device corpus (same shape of difficulty as bench.py)
    n_centers = max(64, N // 1000)

    @jax.jit
    def gen_centers(key):
        return jax.random.normal(key, (n_centers, DIM), dtype=jnp.float32)

    @jax.jit
    def gen_corpus(key, centers):
        ka, kn = jax.random.split(key)
        assign = jax.random.randint(ka, (N,), 0, n_centers)
        x = centers[assign] + 0.35 * jax.random.normal(
            kn, (N, DIM), dtype=jnp.float32
        )
        return x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-9)

    @jax.jit
    def gen_queries(key, x0):
        ki, kn = jax.random.split(key)
        idx = jax.random.choice(ki, x0.shape[0], (N_Q,), replace=False)
        q = x0[idx] + 0.05 * jax.random.normal(kn, (N_Q, DIM), jnp.float32)
        return q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-9)

    @jax.jit
    def oracle_chunk(xc, qd):
        s = jax.lax.dot_general(
            qd, xc, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jax.lax.top_k(s, K)

    centers = gen_centers(jax.random.PRNGKey(41))
    x_dev = gen_corpus(jax.random.PRNGKey(42), centers)
    q_dev = gen_queries(jax.random.PRNGKey(7), x_dev)
    queries = np.asarray(q_dev)

    parts_s, parts_i = [], []
    sub = 131072
    for lo in range(0, N, sub):
        hi = min(lo + sub, N)
        s, i = oracle_chunk(x_dev[lo:hi], q_dev)
        parts_s.append(np.asarray(s))
        parts_i.append(np.asarray(i) + lo)
    all_s = np.concatenate(parts_s, axis=1)
    all_i = np.concatenate(parts_i, axis=1)
    sel = np.argsort(-all_s, axis=1)[:, :K]
    oracle_ids = np.take_along_axis(all_i, sel, axis=1)
    print(json.dumps({"stage": "oracle_done"}), flush=True)

    qs_chunk = jnp.stack(
        [q_dev[(i * BATCH) % N_Q : (i * BATCH) % N_Q + BATCH]
         for i in range(CHUNK_B)]
    )
    q_batches = [queries[i : i + BATCH] for i in range(0, N_Q, BATCH)]

    for cfg in configs:
        parts = cfg.split(":")
        mode, fetch_s, rt_s = parts[:3]
        w = int(parts[3]) if len(parts) > 3 else 0
        fetch, rt = int(fetch_s), float(rt_s)
        idx = FlatIndex(
            DIM, metric="ip", dtype="int8", capacity=N, rescore_mode=mode,
            fetch_width=fetch, approx_recall_target=rt, rescore_width=w,
        )
        t0 = time.perf_counter()
        idx.add(x_dev)
        build_s = time.perf_counter() - t0

        got = np.zeros((N_Q, K), dtype=np.int64)
        for bi, qb in enumerate(q_batches):
            _, ids = idx.search(qb, k=K)
            got[bi * BATCH : (bi + 1) * BATCH] = ids
        rec = float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / K
            for a, b in zip(got, oracle_ids)
        ]))

        t0 = time.perf_counter()
        np.asarray(idx.search_device_batched(qs_chunk, K)[0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_done = 0
        while time.perf_counter() - t0 < SECS:
            outs = [idx.search_device_batched(qs_chunk, K) for _ in range(4)]
            n_done += 4 * CHUNK_B * BATCH
            np.asarray(outs[-1][0])
        qps = n_done / (time.perf_counter() - t0)
        print(json.dumps({
            "mode": mode, "fetch": fetch, "rt": rt, "w": w, "batch": BATCH,
            "recall_at_10": round(rec, 4), "qps": round(qps, 1),
            "ms_per_batch": round(1000.0 * BATCH / qps, 3),
            "build_s": round(build_s, 1), "compile_s": round(compile_s, 1),
        }), flush=True)
        del idx


if __name__ == "__main__":
    main()
