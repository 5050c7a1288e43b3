"""Fused exact-scan Pallas kernel: matmul + block-max selection in VMEM.

Why this kernel exists (measured on a v5e chip, 1M x 384 int8, batch 256):
XLA always materializes a dot's output, so the exact scan's (Q, R) f32
score matrix makes a full HBM round trip — ~2 GB per batch — even though
its only consumer is a top-k selection. The matmul alone measures
2.81 ms/batch while its operand traffic is 0.4 GB (~0.5 ms) and its MXU
time ~1.0 ms: the score-matrix round trip IS the serving bottleneck, and
neither approx_max_k (2.99 ms) nor a native s8xs8->s32 dot (2.97 ms) nor
bf16-resident storage (3.32 ms) changes it.

This kernel never lets the score matrix leave VMEM. Per grid step it

1. DMAs a ``(T, dtile)`` corpus tile (int8/bf16/f32 storage) into VMEM,
2. converts to bf16 in-register (int8 values <= 127 are exact in bf16 --
   the engine's exact-integer-scoring contract, see index/scan.py),
3. MXU-dots it against the resident quantized queries into a ``(T, Q)``
   f32 tile (f32 accumulation), accumulating over dim tiles for wide rows,
4. folds the per-row scale/validity/norm terms (pre-combined by the caller
   into ``mult``/``add`` vectors, so l2 and filtered search fuse for free),
5. block-reduces SUBLANE-wise: each block of ``L`` consecutive rows emits
   its max score and the global row id of its argmax.

Output is ``(nblocks, Q)`` — R/L times smaller than the score matrix
(64 MB instead of 1 GB at L=32, 1M rows, batch 256). The caller transposes
and runs the usual approx/exact top-k + fused f32 rescore on the reduced
matrix. Selection quality: a true top-i candidate is lost only when a
higher-scoring row shares its L-row block (expected recall@10 loss
sum_{i<10} i/nblocks ~ 0.14% at L=32, 1M rows — the same order as the
approx_max_k misses the fused rescore already absorbs; see
docs/BENCHMARKS.md for the measured end-to-end recall).

The scores are computed TRANSPOSED relative to index/scan.py — corpus rows
on sublanes, queries on lanes — because Mosaic reshapes can split leading
(sublane) dims freely while lane-dim reshapes are restricted: the
``(T, Q) -> (T//L, L, Q) -> max over axis 1`` reduction is layout-free.

Replaces (when routed): the XLA `_score_block` + approx_max_k selection in
``semcode_tpu/index/scan.exact_scan`` (the per-query scan Milvus IVF_FLAT
runs server-side for the reference, reference milvus_store.py:135-148).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = np.float32(-3.0e38)

# scoped VMEM budget (bytes) — v5e has ~16 MB/core; leave headroom for the
# pipeline's double buffering and the compiler's own temporaries
VMEM_BUDGET = 12 * 1024 * 1024


def _vmem_estimate(t: int, dtile: int, n_q: int, l: int, in_bytes: int,
                   n_dtiles: int) -> int:
    tile_in = t * dtile * in_bytes * 2      # double-buffered HBM input
    tile_bf16 = t * dtile * 2               # in-register convert copy
    q_res = n_q * dtile * 2
    part = t * n_q * 4                      # the dot's (T, Q) f32 result
    acc = t * n_q * 4 if n_dtiles > 1 else 0   # accumulator scratch
    # mult/add (T,1) blocks are LANE-PADDED to 128 in VMEM (min f32 tile is
    # (8,128)) and double-buffered: 2 arrays x 2 buffers x t*128*4 bytes.
    # HBM traffic is still the compact 4*t bytes — only VMEM pays.
    vec_side = t * 128 * 4 * 2 * 2
    outs = (t // l) * n_q * 8 * 2
    return tile_in + tile_bf16 + q_res + part + acc + vec_side + outs


def pick_tiles(rs: int, d: int, n_q: int, l: int, in_bytes: int):
    """Largest (T, dtile) fitting the VMEM budget. T is a multiple of L
    (block reduction) and 256 (sublane/pipeline alignment); dtile divides d
    in 128-multiples."""
    t = 4096
    dtile = d
    while _vmem_estimate(t, dtile, n_q, l, in_bytes, d // dtile) > VMEM_BUDGET:
        if dtile % 2 == 0 and (dtile // 2) % 128 == 0 and dtile > 512:
            dtile //= 2
        elif t > 256:
            t //= 2
        else:
            break
    return t, dtile


def _kernel(
    v_ref,      # (T, dtile) storage dtype
    mult_ref,   # (T, 1) f32 per-row scale factor (incl. metric terms)
    add_ref,    # (T, 1) f32 per-row additive term (-inf = masked)
    q_ref,      # (Q, dtile) bf16 quantized/normalized queries
    qsc_ref,    # (1, Q) f32 per-query scale factor
    bmax_ref,   # (T//L, Q) f32 out: block max scores
    brow_ref,   # (T//L, Q) i32 out: global (shard-local) argmax row ids
    acc_ref,    # (T, Q) f32 scratch: partial dots across dim tiles (or (1,1))
    *,
    l: int,
    rs: int,
    t: int,
    n_dtiles: int,
):
    step = pl.program_id(0)
    dt = pl.program_id(1)

    # MXU: (T, dtile) x (Q, dtile)^T -> (T, Q), f32 accumulation.
    part = jax.lax.dot_general(
        v_ref[:].astype(jnp.bfloat16),
        q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    if n_dtiles > 1:
        @pl.when(dt == 0)
        def _init():
            acc_ref[:] = part

        @pl.when(dt > 0)
        def _acc():
            acc_ref[:] = acc_ref[:] + part

    @pl.when(dt == n_dtiles - 1)
    def _finalize():
        raw = acc_ref[:] if n_dtiles > 1 else part
        scores = raw * mult_ref[:] * qsc_ref[:] + add_ref[:]
        # rows past the shard end read undefined data — mask them
        row = step * t + jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
        scores = jnp.where(row < rs, scores, _NEG)
        n_q = scores.shape[1]
        s3 = scores.reshape(t // l, l, n_q)
        bmax = jnp.max(s3, axis=1)
        # argmax via iota/min (ties -> lowest offset, deterministic)
        off3 = jax.lax.broadcasted_iota(jnp.int32, (t // l, l, n_q), 1)
        off = jnp.min(
            jnp.where(s3 == bmax[:, None, :], off3, l), axis=1
        )
        blk = jax.lax.broadcasted_iota(jnp.int32, (t // l, n_q), 0)
        bmax_ref[:] = bmax
        brow_ref[:] = step * t + blk * l + jnp.minimum(off, l - 1)


def blockmax_scan_shard(
    vecs,        # (Rs, d) int8 | bf16 | f32, shard-local corpus rows
    mult,        # (Rs, 1) f32
    add,         # (Rs, 1) f32  (-3e38 where the row is dead/filtered)
    qq,          # (Q, d) bf16
    q_scales,    # (1, Q) f32
    *,
    block_l: int = 32,
    interpret: bool = False,
):
    """Returns (bmax (nblocks, Q) f32, brow (nblocks, Q) int32) where
    nblocks = ceil(Rs / T) * (T // block_l); tail blocks score -inf.
    Row ids in ``brow`` are shard-local (caller adds the shard base)."""
    rs, d = vecs.shape
    n_q = qq.shape[0]
    assert d % 128 == 0, "pallas scan needs dim % 128 == 0"
    in_bytes = np.dtype(vecs.dtype).itemsize
    t, dtile = pick_tiles(rs, d, n_q, block_l, in_bytes)
    n_steps = pl.cdiv(rs, t)
    n_dtiles = d // dtile
    nb_tile = t // block_l

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps, n_dtiles),
        in_specs=[
            pl.BlockSpec(
                (t, dtile), lambda s, dt: (s, dt), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (t, 1), lambda s, dt: (s, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (t, 1), lambda s, dt: (s, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_q, dtile), lambda s, dt: (0, dt), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n_q), lambda s, dt: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (nb_tile, n_q), lambda s, dt: (s, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (nb_tile, n_q), lambda s, dt: (s, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((t, n_q) if n_dtiles > 1 else (8, 128), jnp.float32)
        ],
    )
    kernel = functools.partial(
        _kernel, l=block_l, rs=rs, t=t, n_dtiles=n_dtiles
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_steps * nb_tile, n_q), jnp.float32),
            jax.ShapeDtypeStruct((n_steps * nb_tile, n_q), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * rs * d * n_q,
            bytes_accessed=rs * d * in_bytes + 2 * n_steps * nb_tile * n_q * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(vecs, mult, add, qq, q_scales)
