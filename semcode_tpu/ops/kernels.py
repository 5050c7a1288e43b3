"""Pallas TPU kernels for the IVF scan hot path.

The XLA fallback path (lax.scan over probes in index/ivf.py) gathers each
probed cluster block into a fresh buffer before scoring — the gathered copies
triple HBM traffic and the per-step `top_k(concat(...))` sorts far more than
k elements. This kernel streams each probed cluster block HBM->VMEM exactly
once with double-buffered async DMA, scores it against the query on-chip, and
maintains the running top-k in VMEM scratch with k cheap max+mask passes
(k is small and static). Layout requirements: cmax and dim multiples of 128
(the IVF layout rounds up when the kernel is enabled).

Grid: (Q, nprobe), probe index innermost so the per-query scratch carries the
running top-k across probe steps; outputs are written on the last probe step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.0e38  # python float: jnp scalars become captured consts in pallas
K_PAD = 128  # output row padding (top-k slots, lane-aligned)


def _ivf_scan_kernel(
    # scalar prefetch
    probes_ref,  # (Q, nprobe) int32 local cluster ids (clipped)
    owned_ref,  # (Q, nprobe) int32 1 = this shard owns the probe
    # inputs
    q_ref,  # (Q, d) f32, VMEM
    data_ref,  # (nlist_s, cmax, d) storage dtype, HBM
    ids_ref,  # (nlist_s, 1, cmax) int32, HBM
    scl_ref,  # (nlist_s, 1, cmax) f32, HBM (int8 per-row scales)
    # outputs
    out_s_ref,  # (Q, K_PAD) f32, VMEM
    out_i_ref,  # (Q, K_PAD) int32, VMEM
    # scratch
    blocks,  # (2, cmax, d) storage dtype, VMEM (double buffer)
    idblocks,  # (2, 1, cmax) int32
    sclblocks,  # (2, 1, cmax) f32
    sems,  # DMA semaphores (2, 3)
    *,
    k: int,
    nprobe: int,
    quantized: bool,
):
    qi = pl.program_id(0)
    qv = q_ref[pl.ds(qi, 1), :]  # (1, d)

    def data_dma(buf_slot, probe_j):
        c = probes_ref[qi, probe_j]
        return pltpu.make_async_copy(
            data_ref.at[c], blocks.at[buf_slot], sems.at[buf_slot, 0]
        )

    def ids_dma(buf_slot, probe_j):
        c = probes_ref[qi, probe_j]
        return pltpu.make_async_copy(
            ids_ref.at[c], idblocks.at[buf_slot], sems.at[buf_slot, 1]
        )

    def scl_dma(buf_slot, probe_j):
        c = probes_ref[qi, probe_j]
        return pltpu.make_async_copy(
            scl_ref.at[c], sclblocks.at[buf_slot], sems.at[buf_slot, 2]
        )

    def start_all(buf_slot, probe_j):
        data_dma(buf_slot, probe_j).start()
        ids_dma(buf_slot, probe_j).start()
        if quantized:
            scl_dma(buf_slot, probe_j).start()

    def wait_all(buf_slot, probe_j):
        data_dma(buf_slot, probe_j).wait()
        ids_dma(buf_slot, probe_j).wait()
        if quantized:
            scl_dma(buf_slot, probe_j).wait()

    # one grid step per query: the probe loop lives inside the kernel so the
    # (formerly dominant) per-grid-step overhead is paid once per query, not
    # once per (query, probe) pair. Double-buffered DMA hides block loads.
    start_all(0, 0)
    cmax = blocks.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, cmax), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (1, K_PAD), 1)

    def probe_body(j, carry):
        bs, bi = carry
        slot = jax.lax.rem(j, 2)
        next_slot = jax.lax.rem(j + 1, 2)

        @pl.when(j + 1 < nprobe)
        def _():
            start_all(next_slot, j + 1)

        wait_all(slot, j)
        block = blocks[slot]  # (cmax, d)
        if quantized:
            block = block.astype(jnp.bfloat16)
        scores = jax.lax.dot_general(
            qv,
            block,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, cmax)
        if quantized:
            scores = scores * sclblocks[slot]
        ids_row = idblocks[slot]  # (1, cmax)
        own = owned_ref[qi, j]
        valid = (ids_row >= 0) & (own > 0)
        scores = jnp.where(valid, scores, NEG_INF)

        # fold the block's top-k into the running best: k passes of max+mask,
        # each replacing the current worst best-slot if it improves on it.
        def fold(t, fold_carry):
            scores, bs, bi = fold_carry
            m = jnp.max(scores, axis=1, keepdims=True)  # (1,1)
            arg = jnp.argmax(scores, axis=1).reshape(1, 1)
            cand_id = jnp.sum(
                jnp.where(col == arg, ids_row, 0), axis=1, keepdims=True
            )
            wmin = jnp.min(bs, axis=1, keepdims=True)
            warg = jnp.argmin(bs, axis=1).reshape(1, 1)
            better = m > wmin
            bs = jnp.where(better & (kcol == warg), m, bs)
            bi = jnp.where(better & (kcol == warg), cand_id, bi)
            scores = jnp.where(col == arg, NEG_INF, scores)
            return scores, bs, bi

        _, bs, bi = jax.lax.fori_loop(0, k, fold, (scores, bs, bi))
        return bs, bi

    init = (
        jnp.full((1, K_PAD), NEG_INF, dtype=jnp.float32),
        jnp.full((1, K_PAD), -1, dtype=jnp.int32),
    )
    bs, bi = jax.lax.fori_loop(0, nprobe, probe_body, init)
    out_s_ref[pl.ds(qi, 1), :] = bs
    out_i_ref[pl.ds(qi, 1), :] = bi


def ivf_scan_shard(
    data_s: jax.Array,  # (nlist_s, cmax, d)
    ids_s: jax.Array,  # (nlist_s, cmax)
    q: jax.Array,  # (Q, d) f32
    probes_local: jax.Array,  # (Q, nprobe) int32, clipped to [0, nlist_s)
    owned: jax.Array,  # (Q, nprobe) int32
    *,
    k: int,
    interpret: bool = False,
    vma=None,  # varying mesh axes when called inside shard_map
    scales_s: jax.Array = None,  # (nlist_s, cmax) f32 when int8-quantized
):
    """Per-shard fused IVF scan. Returns (scores (Q, k), ids (Q, k))."""
    n_q, d = q.shape
    nprobe = probes_local.shape[1]
    cmax = data_s.shape[1]
    assert cmax % 128 == 0 and d % 128 == 0, "pallas layout needs 128-multiples"
    quantized = data_s.dtype == jnp.int8
    # ids/scales get a leading singleton so VMEM blocks are 2-D (1, cmax)
    ids3 = ids_s.reshape(data_s.shape[0], 1, cmax)
    if scales_s is None or not quantized:
        scl3 = jnp.zeros((data_s.shape[0], 1, cmax), jnp.float32)
    else:
        scl3 = scales_s.reshape(data_s.shape[0], 1, cmax).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_q,),
        in_specs=[
            pl.BlockSpec((n_q, d), lambda qi, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (n_q, K_PAD), lambda qi, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_q, K_PAD), lambda qi, *_: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, cmax, d), data_s.dtype),
            pltpu.VMEM((2, 1, cmax), jnp.int32),
            pltpu.VMEM((2, 1, cmax), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    kernel = functools.partial(
        _ivf_scan_kernel, k=k, nprobe=nprobe, quantized=quantized
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_q, K_PAD), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((n_q, K_PAD), jnp.int32, vma=vma),
        ],
        interpret=interpret,
    )(
        probes_local.astype(jnp.int32),
        owned.astype(jnp.int32),
        q,
        data_s,
        ids3,
        scl3,
    )
    # top-k slots are unsorted; order them
    top_s, pos = jax.lax.top_k(out_s[:, :K_PAD], k)
    top_i = jnp.take_along_axis(out_i, pos, axis=1)
    return top_s, top_i
