"""MXU dot-rate microbench: which formulation unlocks double-rate int8?

The chained-scan decomposition (docs/BENCHMARKS.md, round 4) measured the
production s8 x s8 -> s32 corpus dot at ~199 TOPS — exactly the v5e bf16
peak (197 TFLOP/s), NOT the 394 TOPS the spec quotes for int8. This tool
times PURE dot formulations (no selection, no rescore, no index machinery)
through the same chained (lax.scan) dispatch to find whether any layout or
dtype actually reaches the double rate on this chip:

  s8s8      production formulation: dot_general((Q,d) s8, (R,d) s8,
            contract (1,1)) -> s32, f32 rescale epilogue, max consumer
  s8s8_raw  same without the rescale epilogue (isolates epilogue cost)
  s8s8_t    corpus stored TRANSPOSED (d, R), contract ((1,),(0,))
  bf16      bf16-resident corpus dot (the pre-round-3 path; 2x HBM bytes)
  s4s4      int4 x int4 -> s32 (if the platform lowers it; 4x fewer HBM
            bytes than bf16, possibly >2x MACs/s)
  s8s8_big  s8s8 with the (Q,d) operand tiled 2x along Q inside the body
            (tests whether more rows per pass raises MXU occupancy)
  s4s4_cast int8 args cast to int4 INSIDE the jit body (avoids the int4
            transfer path the plugin rejects) -> s32 dot; tests whether
            the platform has a faster int4 MXU pass

Prints one JSON line per mode: {mode, ms_per_batch, tops, gbps, compile_s}.
Env: N, DIM, BATCH, CHUNK_B, SECS override defaults. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/dot_rate.py [mode ...]
"""

from __future__ import annotations

import faulthandler
import json
import os
import sys
import time

import numpy as np

faulthandler.dump_traceback_later(300, repeat=True)

N = int(os.environ.get("N", 1_000_000))
DIM = int(os.environ.get("DIM", 384))
BATCH = int(os.environ.get("BATCH", 512))
CHUNK_B = int(os.environ.get("CHUNK_B", 16))
SECS = float(os.environ.get("SECS", 6.0))


def main() -> None:
    modes = sys.argv[1:] or ["s8s8", "s8s8_raw", "s8s8_t", "bf16", "s4s4"]

    import jax
    import jax.numpy as jnp

    from semcode_tpu.parallel import mesh as _mesh  # enables compile cache
    assert _mesh is not None

    rng = np.random.default_rng(0)
    corpus_i8 = rng.integers(-127, 128, (N, DIM), dtype=np.int8)
    scales = (rng.random(N, dtype=np.float32) + 0.5) / 127.0
    q_i8 = rng.integers(-127, 128, (BATCH, DIM), dtype=np.int8)
    qs8 = jnp.asarray(np.stack([q_i8] * CHUNK_B))       # (B, Q, d) int8
    q_scales = jnp.asarray((rng.random(BATCH, dtype=np.float32) + 0.5) / 127.0)

    v8 = jnp.asarray(corpus_i8)
    scl = jnp.asarray(scales)

    macs_per_batch = float(N) * DIM * BATCH
    bytes_per_batch = float(N) * DIM  # int8 corpus read

    def body_dot(a, b, dn, pet, rescale):
        raw = jax.lax.dot_general(
            a, b, dimension_numbers=(dn, ((), ())),
            preferred_element_type=pet,
        )
        if rescale:
            s = raw.astype(jnp.float32) * q_scales[:, None] * scl[None, :]
        else:
            s = raw
        return jnp.max(s, axis=1)

    def chained(fn):
        @jax.jit
        def run(v, qsb):
            def body(c, qb):
                return c, fn(qb, v)
            return jax.lax.scan(body, 0, qsb)[1]
        return run

    def timed(fn, args, label, corpus_bytes=bytes_per_batch, macs_mult=1):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_launch = 0
        while time.perf_counter() - t0 < SECS:
            outs = [fn(*args) for _ in range(4)]
            n_launch += 4
            np.asarray(outs[-1])
        dt = time.perf_counter() - t0
        ms_per_batch = 1000.0 * dt / (n_launch * CHUNK_B)
        tops = 2.0 * macs_mult * macs_per_batch / (ms_per_batch * 1e-3) / 1e12
        gbps = corpus_bytes / (ms_per_batch * 1e-3) / 1e9
        print(json.dumps({
            "mode": label, "n": N, "dim": DIM,
            "batch": macs_mult * BATCH, "chunk_b": CHUNK_B,
            "ms_per_batch": round(ms_per_batch, 3),
            "tops": round(tops, 1), "corpus_gbps": round(gbps, 1),
            "compile_s": round(compile_s, 1),
        }), flush=True)

    for mode in modes:
        try:
            if mode == "s8s8":
                f = chained(lambda qb, v: body_dot(
                    qb, v, ((1,), (1,)), jnp.int32, True))
                timed(f, (v8, qs8), mode)
            elif mode == "s8s8_raw":
                f = chained(lambda qb, v: body_dot(
                    qb, v, ((1,), (1,)), jnp.int32, False))
                timed(f, (v8, qs8), mode)
            elif mode == "s8s8_t":
                v8t = jnp.asarray(corpus_i8.T.copy())  # (d, R)
                f = chained(lambda qb, v: body_dot(
                    qb, v, ((1,), (0,)), jnp.int32, True))
                timed(f, (v8t, qs8), mode)
            elif mode == "bf16":
                vbf = (jnp.asarray(corpus_i8, jnp.float32)
                       * scl[:, None]).astype(jnp.bfloat16)
                qbf = qs8.astype(jnp.bfloat16)
                f = chained(lambda qb, v: body_dot(
                    qb, v, ((1,), (1,)), jnp.float32, False))
                timed(f, (vbf, qbf), mode, corpus_bytes=2 * bytes_per_batch)
            elif mode == "s4s4":
                v4 = jnp.asarray(
                    np.clip(corpus_i8 // 16, -8, 7)).astype(jnp.int4)
                q4 = jnp.asarray(
                    np.clip(np.stack([q_i8] * CHUNK_B) // 16, -8, 7)
                ).astype(jnp.int4)
                f = chained(lambda qb, v: body_dot(
                    qb, v, ((1,), (1,)), jnp.int32, True))
                timed(f, (v4, q4), mode, corpus_bytes=bytes_per_batch / 2)
            elif mode == "s4s4_cast":
                def body4(qb, v):
                    raw = jax.lax.dot_general(
                        (qb // 16).astype(jnp.int4),
                        (v // 16).astype(jnp.int4),
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    return jnp.max(raw, axis=1)
                f = chained(body4)
                timed(f, (v8, qs8), mode, corpus_bytes=bytes_per_batch)
            elif mode == "s8s8_big":
                qs2 = jnp.concatenate([qs8, qs8], axis=1)  # (B, 2Q, d)
                f = chained(lambda qb, v: body_dot(
                    qb, v, ((1,), (1,)), jnp.int32, False))
                timed(f, (v8, qs2), mode, macs_mult=2)
        except Exception as e:  # noqa: BLE001 — report per-mode, keep going
            print(json.dumps({"mode": mode, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
