"""Pallas s8 x s8 -> s32 tiled matmul vs the XLA dot (VERDICT r4 item 7).

The XLA production dot measures 253-261 TOPS on one v5e chip — 1.3x the
bf16 peak, not the 2x the spec sheet quotes for int8 (tools/dot_rate.py,
docs/BENCHMARKS.md "MXU dot-rate ceiling"). This tool hand-schedules the
same contraction as a Pallas kernel — corpus streamed HBM->VMEM in
double-buffered row tiles, q resident, s32 accumulation, max-reduce
consumer (same as dot_rate's s8s8 mode so rates are comparable) — to test
whether Mosaic reaches the native int8 MXU rate XLA doesn't.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/dot_pallas.py [rtile ...]

Prints one JSON line per config: {mode, rtile, ms_per_batch, tops,
compile_s} or {mode, error} when Mosaic rejects the lowering (the null-
result evidence the verdict asked to commit).
"""

from __future__ import annotations


import json
import os
import sys
import time

import numpy as np

N = int(os.environ.get("N", 1_000_000))
DIM = int(os.environ.get("DIM", 384))
BATCH = int(os.environ.get("BATCH", 512))
CHUNK_B = int(os.environ.get("CHUNK_B", 16))
SECS = float(os.environ.get("SECS", 6.0))


def main() -> None:
    rtiles = [int(a) for a in sys.argv[1:]] or [512, 1024, 2048]

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from semcode_tpu.parallel import mesh as _mesh  # enables compile cache
    assert _mesh is not None

    rng = np.random.default_rng(0)
    corpus = jnp.asarray(
        rng.integers(-127, 128, (N, DIM), dtype=np.int8)
    )
    q = jnp.asarray(rng.integers(-127, 128, (BATCH, DIM), dtype=np.int8))

    def make_kernel(rtile: int, acc_dtype):
        n_steps = N // rtile

        def kernel(q_ref, d_ref, out_ref, acc):
            t = pl.program_id(0)

            @pl.when(t == 0)
            def _init():
                acc[...] = jnp.full(
                    acc.shape, jnp.iinfo(jnp.int32).min, jnp.int32
                )

            if acc_dtype == "bf16cast":
                # the ivf cluster kernel's formulation: int8 operands cast
                # to bf16 before the MXU pass (exact for |x| <= 127)
                s = jax.lax.dot_general(
                    q_ref[...].astype(jnp.bfloat16),
                    d_ref[...].astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)
            else:
                s = jax.lax.dot_general(
                    q_ref[...],
                    d_ref[...],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=acc_dtype,
                )  # (Q, rtile)
            # lane-reduce consumer (same as dot_rate's jnp.max(s, axis=1)):
            # a (Q, rtile//128, 128) reshape-max forces Mosaic relayouts
            part = jnp.max(s.astype(jnp.int32), axis=1, keepdims=True)
            acc[...] = jnp.maximum(acc[...], jnp.broadcast_to(part, acc.shape))

            @pl.when(t == n_steps - 1)
            def _emit():
                out_ref[...] = acc[...]

        return pl.pallas_call(
            kernel,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((BATCH, DIM), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rtile, DIM), lambda t: (t, 0)),
            ],
            out_specs=pl.BlockSpec((BATCH, 128), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BATCH, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((BATCH, 128), jnp.int32)],
        )

    flops = 2.0 * BATCH * N * DIM
    qs = jnp.asarray(np.stack([np.asarray(q)] * CHUNK_B))  # (B, Q, d)

    def chained(per_batch):
        """CHUNK_B batches per device launch (dot_rate's protocol: the
        ~ms tunnel launch fee must amortize or it IS the measurement)."""

        @jax.jit
        def run(qsb, data):
            def body(c, qb):
                return c, per_batch(qb, data)

            return jax.lax.scan(body, 0, qsb)[1]

        return run

    def bench(fn, label, extra):
        t0 = time.perf_counter()
        try:
            np.asarray(fn(qs, corpus))
        except Exception as exc:  # noqa: BLE001 - Mosaic reject IS the result
            print(json.dumps({
                "mode": label, **extra,
                "error": type(exc).__name__ + ": " + str(exc)[:500],
            }), flush=True)
            return
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_done = 0
        while time.perf_counter() - t0 < SECS:
            outs = [fn(qs, corpus) for _ in range(4)]
            n_done += 4 * CHUNK_B
            np.asarray(outs[-1])
        ms = (time.perf_counter() - t0) / n_done * 1000
        print(json.dumps({
            "mode": label, **extra,
            "ms_per_batch": round(ms, 3),
            "tops": round(flops / (ms / 1000) / 1e12, 1),
            "compile_s": round(compile_s, 1),
        }), flush=True)

    # XLA reference, identical protocol/consumer to dot_rate s8s8_raw
    bench(
        chained(
            lambda qb, data: jnp.max(
                jax.lax.dot_general(
                    qb, data, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ),
                axis=1,
            )
        ),
        "xla_s8s8",
        {},
    )

    for rtile in rtiles:
        for acc_name, acc_dtype in (
            ("s32", jnp.int32),
            ("bf16cast", "bf16cast"),
        ):
            call = make_kernel(rtile, acc_dtype)
            bench(
                chained(lambda qb, data, call=call: call(qb, data)),
                f"pallas_s8s8_{acc_name}",
                {"rtile": rtile},
            )


if __name__ == "__main__":
    main()
