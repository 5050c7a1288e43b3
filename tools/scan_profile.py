"""Stage decomposition of the chained exact scan (VERDICT round-3 item 1).

The round-3 artifact ships 120k QPS chained (2.1 ms/batch at 1M x 384 int8)
while the bare scan op was measured at 1.31 ms/batch and the native-int8
read should halve even that byte bound — this tool attributes the gap by
timing progressively larger slices of the production step, all through the
same chained (lax.scan, B batches/launch) dispatch the flagship uses:

  dot            int8 corpus dot + rescale, consumed by a per-query max
                 (the pure read+MXU floor; selection/rescore excluded)
  dotsel         + approx_max_k(fetch, recall_target)
  dotseltop      + final top_k(k) (production minus rescore, minus merge)
  norescore      production exact_scan_batched with the f32 mirror OFF
  full           production exact_scan_batched (fused f32 rescore active)
  gather         ONLY the rescore stage: gather (Q, fetch) f32 mirror rows
                 + HIGHEST einsum, against fixed random candidate ids
  gather_vpu     same gather, scored with a VPU multiply+sum instead of the
                 HIGHEST einsum (formulation A/B for the rescore stage)

Usage: python tools/scan_profile.py [mode ...] (default: all)
Env: N, DIM, BATCH, CHUNK_B, SECS, FETCH, RT override the defaults.
Prints one JSON line per mode: {mode, ms_per_batch, qps, compile_s}.

Big arrays are always jit ARGUMENTS (closing over them bakes them into the
HLO and the remote-compile endpoint 413s).
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
FETCH = int(os.environ.get("FETCH", 128))
RT = float(os.environ.get("RT", 0.95))
K = 10


def main() -> None:
    modes = sys.argv[1:] or [
        "dot", "dotsel", "dotseltop", "norescore", "full",
        "gather", "gather_vpu",
    ]

    import jax
    import jax.numpy as jnp
    from functools import partial

    from semcode_tpu.index.flat import FlatIndex
    from semcode_tpu.index.scan import quantize_queries_device

    rng = np.random.default_rng(0)
    n_centers = max(64, N // 1000)
    centers = rng.standard_normal((n_centers, DIM), dtype=np.float32)
    # rescore tier resolves by HBM budget exactly as production auto does:
    # f32 mirror at 1M x 384, two-level int8 residual at 1M x 3072
    idx = FlatIndex(DIM, metric="cosine", dtype="int8", capacity=N,
                    rescore_mode="auto", approx_recall_target=RT)
    step = 250_000
    for i in range(0, N, step):
        m = min(step, N - i)
        x = centers[rng.integers(0, n_centers, m)] + 0.35 * rng.standard_normal(
            (m, DIM), dtype=np.float32
        )
        idx.add(x)
    q = centers[rng.integers(0, n_centers, BATCH)] + 0.35 * rng.standard_normal(
        (BATCH, DIM), dtype=np.float32
    )
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    qs = jnp.stack([jnp.asarray(q)] * CHUNK_B)  # (B, Q, d)

    vecs, norms, valid, scales, rescore, tags = idx._ensure_device()
    rows = vecs.shape[0]

    # fixed random candidate ids for the isolated gather stages
    pos_np = rng.integers(0, rows, (CHUNK_B, BATCH, FETCH)).astype(np.int32)
    pos_dev = jnp.asarray(pos_np)

    @partial(jax.jit, static_argnums=())
    def run_dot(v, scl, qsb):
        def body(c, qb):
            qq, qsc = quantize_queries_device(qb)
            raw = jax.lax.dot_general(
                qq.astype(jnp.int8), v,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            s = raw * qsc[:, None] * scl[None, :]
            return c, jnp.max(s, axis=1)
        return jax.lax.scan(body, 0, qsb)[1]

    def make_sel(with_topk):
        @jax.jit
        def run(v, scl, vld, qsb):
            def body(c, qb):
                qq, qsc = quantize_queries_device(qb)
                raw = jax.lax.dot_general(
                    qq.astype(jnp.int8), v,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                s = raw * qsc[:, None] * scl[None, :]
                s = jnp.where(vld[None, :], s, -3.0e38)
                sv, pp = jax.lax.approx_max_k(s, FETCH, recall_target=RT)
                if with_topk:
                    sv, sel = jax.lax.top_k(sv, K)
                    pp = jnp.take_along_axis(pp, sel, axis=1)
                return c, (sv, pp)
            return jax.lax.scan(body, 0, qsb)[1]
        return run

    @jax.jit
    def run_gather(resc, qsb, posb):
        def body(c, op):
            qb, pp = op
            cand = resc[pp]  # (Q, fetch, d)
            exact = jnp.einsum(
                "qfd,qd->qf", cand, qb,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return c, jnp.max(exact, axis=1)
        return jax.lax.scan(body, 0, (qsb, posb))[1]

    @jax.jit
    def run_gather_residual(v, scl, rsd, rscl, qsb, posb):
        """Isolated two-level reconstruction gather (the residual tier's
        rescore stage): TWO int8 gathers + reconstruction + HIGHEST einsum."""
        def body(c, op):
            qb, pp = op
            cand = (
                v[pp].astype(jnp.float32) * scl[pp][:, :, None]
                + rsd[pp].astype(jnp.float32) * rscl[pp][:, :, None]
            )
            exact = jnp.einsum(
                "qfd,qd->qf", cand, qb,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return c, jnp.max(exact, axis=1)
        return jax.lax.scan(body, 0, (qsb, posb))[1]

    @jax.jit
    def run_gather_resid_only(rsd, rscl, qsb, posb):
        """ONE int8 gather (residual rows only) + einsum — the floor for a
        query-side-exact residual correction scheme."""
        def body(c, op):
            qb, pp = op
            cand = rsd[pp].astype(jnp.float32) * rscl[pp][:, :, None]
            exact = jnp.einsum(
                "qfd,qd->qf", cand, qb,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return c, jnp.max(exact, axis=1)
        return jax.lax.scan(body, 0, (qsb, posb))[1]

    @jax.jit
    def run_gather_vpu(resc, qsb, posb):
        def body(c, op):
            qb, pp = op
            cand = resc[pp]  # (Q, fetch, d) f32
            exact = jnp.sum(cand * qb[:, None, :], axis=2)
            return c, jnp.max(exact, axis=1)
        return jax.lax.scan(body, 0, (qsb, posb))[1]

    def timed(fn, label):
        t0 = time.perf_counter()
        np.asarray(fn())
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_done = 0
        while time.perf_counter() - t0 < SECS:
            outs = [fn() for _ in range(4)]
            n_done += 4 * CHUNK_B * BATCH
            np.asarray(outs[-1])
        dt = time.perf_counter() - t0
        qps = n_done / dt
        print(json.dumps({
            "mode": label, "n": N, "dim": DIM, "batch": BATCH,
            "chunk_b": CHUNK_B, "fetch": FETCH, "rt": RT,
            "ms_per_batch": round(1000.0 / (qps / BATCH), 3),
            "qps": round(qps, 1), "compile_s": round(compile_s, 1),
        }), flush=True)

    for mode in modes:
        if mode == "dot":
            timed(lambda: run_dot(vecs, scales, qs), "dot")
        elif mode == "dotsel":
            f = make_sel(False)
            timed(lambda: f(vecs, scales, valid, qs)[0], "dotsel")
        elif mode == "dotseltop":
            f = make_sel(True)
            timed(lambda: f(vecs, scales, valid, qs)[0], "dotseltop")
        elif mode == "norescore":
            idx._dev = (vecs, norms, valid, scales, None, tags)
            idx.fetch_width = FETCH
            # fetch_width is ignored when rescore is None (fetch=k); emulate
            # the production selection width by asking for k=FETCH then
            # slicing — no: measure the real no-rescore path as shipped.
            timed(lambda: idx.search_device_batched(qs, K)[0], "norescore")
            idx._dev = (vecs, norms, valid, scales, rescore, tags)
        elif mode == "full":
            idx.fetch_width = FETCH
            timed(lambda: idx.search_device_batched(qs, K)[0], "full")
        elif mode == "gather":
            if isinstance(rescore, tuple):
                timed(
                    lambda: run_gather_residual(
                        vecs, scales, rescore[0], rescore[1], qs, pos_dev
                    ),
                    "gather_residual",
                )
                timed(
                    lambda: run_gather_resid_only(
                        rescore[0], rescore[1], qs, pos_dev
                    ),
                    "gather_resid_only",
                )
            else:
                timed(lambda: run_gather(rescore, qs, pos_dev), "gather")
        elif mode == "gather_vpu":
            if not isinstance(rescore, tuple):
                timed(
                    lambda: run_gather_vpu(rescore, qs, pos_dev), "gather_vpu"
                )
        else:
            print(json.dumps({"mode": mode, "error": "unknown"}), flush=True)


if __name__ == "__main__":
    main()
