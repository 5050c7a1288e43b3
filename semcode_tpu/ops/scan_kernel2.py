"""Fused exact-scan kernel, lane-oriented: top-2-per-128-row-block in VMEM.

Second-generation layout of the fused-scan kernel (the first, a
sublane-block design with per-row vectors as (T, 1) VMEM blocks, was
dropped after losing on-chip - docs/BENCHMARKS.md dispatch-economics
section records it), designed from two chained-dispatch measurements (1M x 384 int8, batch 256, v5e,
lax.scan x16 inside one jit so the ~2-3 ms per-dispatch tunnel fee is
amortized):

- XLA ``dot + approx_max_k`` runs at ~1.5 ms/batch: the loop-invariant
  int8 -> bf16 corpus convert is hoisted out of the scan loop, so every
  iteration re-reads the 768 MB bf16 copy — the scan is bf16-read-bound.
- The v1 (sublane-block) kernel runs at ~2.8 ms/batch: its per-row
  ``(T, 1)`` scale/mask vectors lane-pad to 128 in VMEM and their blocked
  DMAs dominate (kernel without them: ~0.8 ms/batch device time).

This version keeps rows on LANES so the per-row vectors are cheap:

- scores are ``(Q, T)`` — corpus rows on lanes, queries on sublanes;
- ``mult``/``add`` are ``(1, R)`` arrays with ``(1, T)`` lane-oriented
  blocks (tiny VMEM, no padding blowup); ``q_scales`` is ``(Q, 1)``;
- the block reduction is per 128-lane group: ``(Q, T) -> (Q, T/128, 128)``
  keeps the minor-most dim exactly one lane tile, so the reshape is
  layout-free, and reductions over the last axis are native;
- each 128-row block emits its TOP-2 (score, global row id) — with two
  survivors per block a true top-i candidate is lost only when THREE of
  the true top-i share one block (P ~ 1e-5 at 1M rows), so selection
  quality matches fetch-128 approx_max_k while reading 2x fewer bytes
  than the hoisted-bf16 XLA loop.

Measured verdict (tools/scan_ab.py, chained, on chip): XLA keeps the
throughput crown at every dim — 7.5x at 384 dims batch 256 (the in-VMEM
top-2 selection serializes against the matmul; XLA overlaps selection
with the next block's reads) and a 2% tie at 3072 dims (XLA fuses the
int8->bf16 convert into the dot, erasing the bytes advantage). What this
kernel wins is COMPILE time: 3 s vs 200+ s for the chained XLA scan at
wide dims, so it ships as the opt-in fast-warmup path
(`[index].scan_impl = "pallas"`), not the default.

Outputs are already query-major ``(Q, 2 * R/128)`` — no transpose before
the final ``approx_max_k`` over the reduced matrix.

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
_LANE = 128  # block size = one lane tile

VMEM_BUDGET = 12 * 1024 * 1024


def _vmem_estimate(t: int, dtile: int, n_q: int, in_bytes: int,
                   n_dtiles: int) -> int:
    tile_in = t * dtile * in_bytes * 2        # double-buffered corpus tile
    tile_bf16 = t * dtile * 2                 # in-register convert copy
    q_res = n_q * dtile * 2
    part = n_q * t * 4                        # the dot's (Q, T) f32 result
    acc = n_q * t * 4 if n_dtiles > 1 else 0
    red_tmp = 2 * n_q * t * 4                 # iota/compare temporaries
    vec_side = 8 * t * 4 * 2 * 2              # (1, T) sublane-padded x2 x2
    outs = 4 * n_q * (t // _LANE) * 4 * 2
    return tile_in + tile_bf16 + q_res + part + acc + red_tmp + vec_side + outs


def pick_tiles(rs: int, d: int, n_q: int, in_bytes: int):
    # never tile wider than the shard itself (lane-rounded): a 2k-row shard
    # scanned with a 4096-row tile would DMA + matmul 50% padding per batch
    t = min(4096, max(_LANE, -(-rs // _LANE) * _LANE))
    dtile = d
    while _vmem_estimate(t, dtile, n_q, in_bytes, d // dtile) > VMEM_BUDGET:
        if dtile % 2 == 0 and (dtile // 2) % 128 == 0 and dtile > 512:
            dtile //= 2
        elif t > 256:
            t //= 2
        else:
            break
    return t, dtile


def _top2_lanes(scores, t, n_q):
    """(Q, T) -> per-128-lane-block top-2: four (Q, T/128) arrays."""
    nb = t // _LANE
    s3 = scores.reshape(n_q, nb, _LANE)
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_q, nb, _LANE), 2)
    m1k = jnp.max(s3, axis=2, keepdims=True)            # (Q, nb, 1)
    o1k = jnp.min(jnp.where(s3 == m1k, lane, _LANE), axis=2, keepdims=True)
    s3b = jnp.where(lane == o1k, _NEG, s3)
    m1 = jnp.max(s3, axis=2)                            # (Q, nb)
    o1 = jnp.min(jnp.where(s3 == m1k, lane, _LANE), axis=2)
    m2k = jnp.max(s3b, axis=2, keepdims=True)
    m2 = jnp.max(s3b, axis=2)
    o2 = jnp.min(jnp.where(s3b == m2k, lane, _LANE), axis=2)
    return m1, jnp.minimum(o1, _LANE - 1), m2, jnp.minimum(o2, _LANE - 1)


def _kernel(
    v_ref,      # (T, dtile) storage dtype
    mult_ref,   # (1, T) f32 per-row scale (incl. metric factor)
    add_ref,    # (1, T) f32 per-row additive (-3e38 = dead row)
    q_ref,      # (Q, dtile) bf16
    qsc_ref,    # (Q, 1) f32 per-query scale
    m1_ref,     # (1, Q, T//128) f32 out (leading axis = grid step)
    r1_ref,     # (1, Q, T//128) i32 out (global shard-local row ids)
    m2_ref,     # (1, Q, T//128) f32 out
    r2_ref,     # (1, Q, T//128) i32 out
    acc_ref,    # (Q, T) f32 scratch (or (8,128) dummy)
    *,
    rs: int,
    t: int,
    n_dtiles: int,
):
    step = pl.program_id(0)
    dt = pl.program_id(1)
    n_q = q_ref.shape[0]

    part = jax.lax.dot_general(
        q_ref[:],
        v_ref[:].astype(jnp.bfloat16),
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
        scores = raw * qsc_ref[:] * mult_ref[:] + add_ref[:]
        # mask rows past the shard end (their blocks read undefined data)
        col = step * t + jax.lax.broadcasted_iota(jnp.int32, (n_q, t), 1)
        scores = jnp.where(col < rs, scores, _NEG)
        m1, o1, m2, o2 = _top2_lanes(scores, t, n_q)
        nb = t // _LANE
        blk = jax.lax.broadcasted_iota(jnp.int32, (n_q, nb), 1)
        base = step * t + blk * _LANE
        m1_ref[0, :, :] = m1
        r1_ref[0, :, :] = base + o1
        m2_ref[0, :, :] = m2
        r2_ref[0, :, :] = base + o2


def top2_scan_shard(
    vecs,        # (Rs, d) int8 | bf16 | f32
    mult,        # (1, Rs) f32
    add,         # (1, Rs) f32
    qq,          # (Q, d) bf16
    q_scales,    # (Q, 1) f32
    *,
    interpret: bool = False,
):
    """Returns (bmax (Q, 2*nb), brow (Q, 2*nb) int32) where
    nb = ceil(Rs / T) * (T // 128); tail blocks score -inf. Row ids are
    shard-local. The two per-block survivors are concatenated along the
    candidate axis (top-1 blocks first, then runner-ups)."""
    rs, d = vecs.shape
    n_q = qq.shape[0]
    assert d % 128 == 0, "pallas scan needs dim % 128 == 0"
    in_bytes = np.dtype(vecs.dtype).itemsize
    t, dtile = pick_tiles(rs, d, n_q, in_bytes)
    n_steps = pl.cdiv(rs, t)
    n_dtiles = d // dtile
    nb_tile = t // _LANE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps, n_dtiles),
        in_specs=[
            pl.BlockSpec(
                (t, dtile), lambda s, dt: (s, dt), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, t), lambda s, dt: (0, s), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, t), lambda s, dt: (0, s), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_q, dtile), lambda s, dt: (0, dt), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_q, 1), lambda s, dt: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            # leading grid-step axis: the block's last dim equals the array
            # dim (nb_tile may be < 128, which Mosaic rejects as a *blocked*
            # minor dim but accepts when un-blocked)
            pl.BlockSpec(
                (1, n_q, nb_tile),
                lambda s, dt: (s, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for _ in range(4)
        ],
        scratch_shapes=[
            pltpu.VMEM((n_q, t) if n_dtiles > 1 else (8, 128), jnp.float32)
        ],
    )
    kernel = functools.partial(_kernel, rs=rs, t=t, n_dtiles=n_dtiles)
    nb_total = n_steps * nb_tile
    m1, r1, m2, r2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_steps, n_q, nb_tile), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, n_q, nb_tile), jnp.int32),
            jax.ShapeDtypeStruct((n_steps, n_q, nb_tile), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, n_q, nb_tile), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * rs * d * n_q,
            bytes_accessed=rs * d * in_bytes + 4 * n_q * nb_total * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(vecs, mult, add, qq, q_scales)

    def fold(a):
        # (n_steps, Q, nb_tile) -> (Q, n_steps * nb_tile)
        return a.transpose(1, 0, 2).reshape(n_q, nb_total)

    return (
        jnp.concatenate([fold(m1), fold(m2)], axis=1),
        jnp.concatenate([fold(r1), fold(r2)], axis=1),
    )
