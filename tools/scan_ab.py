"""Chained-dispatch A/B of the exact-scan kernels: XLA vs Pallas top-2.

Measures, on the current backend, the production chained path
(FlatIndex.search_device_batched — B batches folded into one launch) with
`scan_impl` flipped between "xla" (dot + approx_max_k; the loop-invariant
int8->bf16 corpus convert is hoisted, so every iteration re-reads a bf16
copy) and "pallas" (ops/scan_kernel2: int8 read directly in VMEM, top-2 per
128-row block — 2x fewer HBM bytes at the cost of in-kernel selection).

The flagship bench (bench.py) measures the same scan through the IVF exact
mode; this tool isolates the kernel question so a routing decision
(`FlatIndex._scan_impl` 'auto') can be made from one cheap run.

Usage: python tools/scan_ab.py [N] [DIM] [BATCH] [CHUNK_B] [SECS]
Prints one JSON line: QPS for both impls + top-10 agreement.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    chunk_b = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    secs = float(sys.argv[5]) if len(sys.argv) > 5 else 10.0
    k = 10

    import jax.numpy as jnp

    from semcode_tpu.index.flat import FlatIndex

    rng = np.random.default_rng(0)
    # Gaussian-mixture corpus (same shape of difficulty as bench.py)
    n_centers = max(64, n // 1000)
    centers = rng.standard_normal((n_centers, dim), dtype=np.float32)
    idx = FlatIndex(dim, metric="cosine", dtype="int8", capacity=n)
    step = 250_000
    for i in range(0, n, step):
        m = min(step, n - i)
        x = centers[rng.integers(0, n_centers, m)] + 0.35 * rng.standard_normal(
            (m, dim), dtype=np.float32
        )
        idx.add(x)
    q = centers[rng.integers(0, n_centers, batch)] + 0.35 * rng.standard_normal(
        (batch, dim), dtype=np.float32
    )
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    qs = jnp.stack([jnp.asarray(q)] * chunk_b)

    # warm the device state BEFORE the impl loop: staging/quantizing the
    # corpus and building the f32 mirror is one-time work that would
    # otherwise inflate the first impl's compile_s (advisor round-3 finding)
    idx._ensure_device()

    out = {"n": n, "dim": dim, "batch": batch, "chunk_b": chunk_b}
    ids_by_impl = {}
    for impl in ("xla", "pallas"):
        idx.scan_impl = impl
        t0 = time.perf_counter()
        s, ids = idx.search_device_batched(qs, k)
        ids_by_impl[impl] = np.asarray(ids[0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_done = 0
        while time.perf_counter() - t0 < secs:
            outs = [idx.search_device_batched(qs, k) for _ in range(4)]
            n_done += 4 * chunk_b * batch
            np.asarray(outs[-1][0])
        qps = n_done / (time.perf_counter() - t0)
        out[f"{impl}_qps"] = round(qps, 1)
        out[f"{impl}_ms_per_batch"] = round(1000.0 * chunk_b * batch / qps / chunk_b, 3)
        out[f"{impl}_compile_s"] = round(compile_s, 1)
    a, b = ids_by_impl["xla"], ids_by_impl["pallas"]
    agree = np.mean(
        [len(set(r1.tolist()) & set(r2.tolist())) / k for r1, r2 in zip(a, b)]
    )
    out["top10_agreement"] = round(float(agree), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
