"""Pallas DMA-pipelined packed-line gather (embedding lookup).

The engine's lookup hot spot (BASELINE.md roofline: 213k random packed
lines, 1.55 ms at the bench shape vs a 0.32 ms stream floor) is XLA's
``jnp.take`` of whole 128-lane physical lines followed by a one-hot
lane select (sharded.py:_fetch_rows) — the (N, 128) intermediate makes
a full HBM round trip before the select reduces it to (N, D).

This kernel instead DMAs each packed line HBM->VMEM with the physical
row index scalar-prefetched (SMEM), performs the lane select in VMEM,
and writes only the (N, D) result: HBM traffic drops from
read 512B + write 512B + read 512B + write 64B per id to
read 512B + write 64B — a 2.7x byte cut when XLA does not fuse the
select into the gather.

Per-row DMA issue runs on the scalar core; CHUNK rows are issued
back-to-back (all DMAs in flight together, one semaphore slot per
row), overlapping issue with transfer; the Pallas grid pipeline
overlaps each chunk's output write-back with the next chunk's gather.

Measured verdict on the v5e rig lives in BASELINE.md (round 5): adopt
only where it beats ``jnp.take`` by the VERDICT bar.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(pr_smem, off_ref, table_hbm, out_ref, scratch, sems,
                   *, chunk: int, pack: int, dim: int):
    """One grid step: gather ``chunk`` packed lines, select lanes.

    Args:
        pr_smem: (N,) physical row per id (scalar-prefetched, SMEM).
        off_ref: (chunk,) lane-slot offset per id (VMEM block).
        table_hbm: (VP, pack*dim) table, resident in HBM.
        out_ref: (chunk, dim) output block (VMEM, auto-written back).
        scratch: (chunk, pack*dim) VMEM line buffer.
        sems: (chunk,) DMA semaphores.
    """
    i = pl.program_id(0)
    base = i * chunk
    nsem = sems.shape[0]                 # bounded in-flight DMA ring

    def line_dma(j):
        return pltpu.make_async_copy(
            table_hbm.at[pr_smem[base + j]],
            scratch.at[j],
            sems.at[jax.lax.rem(j, nsem)])

    def issue(j, c):
        # keep at most nsem outstanding: the DMA that used this sem
        # slot nsem rows ago must have landed before reuse
        @pl.when(j >= nsem)
        def _wait_prior():
            line_dma(j - nsem).wait()
        line_dma(j).start()
        return c

    jax.lax.fori_loop(0, chunk, issue, 0)

    def drain(j, c):
        line_dma(j).wait()
        return c

    jax.lax.fori_loop(chunk - nsem, chunk, drain, 0)

    # lane select WITHOUT a lane-splitting reshape (Mosaic cannot shape
    # -cast (C, P*D) -> (C, P, D)): zero the non-selected slots with a
    # lane mask, then contract the strided lanes down to D columns with
    # a constant (P*D, D) selection matrix on the MXU.
    width = pack * dim
    lines = scratch[:]                                  # (C, P*D)
    lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, width), 1)
    sel = (lane // dim == off_ref[:][:, None]).astype(lines.dtype)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (width, dim), 0)
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (width, dim), 1)
    collapse = (l_iota % dim == d_iota).astype(lines.dtype)
    # HIGHEST precision: the default bf16 MXU pass would round the
    # gathered values (~4e-3 relative); with an exact 0/1 selection
    # matrix the bf16x3 decomposition reproduces f32 exactly
    out_ref[:] = jnp.dot(lines * sel, collapse,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST
                         ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("pack", "dim", "chunk"))
def packed_gather(table: jnp.ndarray, local_rows: jnp.ndarray,
                  *, pack: int, dim: int,
                  chunk: int = 1024) -> jnp.ndarray:
    """(VP, pack*dim) packed table, (N,) logical local rows -> (N, dim).

    Drop-in for the take+select in ``ShardedEmbeddingTable._fetch_rows``
    (fwd only — the engine passes gathered-row grads explicitly, so the
    lookup itself is never differentiated).  ``local_rows`` beyond the
    table clamp to the last physical row (matching jnp.take's TPU
    clamp; callers mask such rows out).  NOTE: measured SLOWER than the
    native gather on v5e (BASELINE.md r5 refutation — per-row DMA issue
    rate dominates); kept as the measured artifact, not wired into the
    engine.
    """
    n = local_rows.shape[0]
    n_pad = -n % chunk
    if n_pad:
        local_rows = jnp.concatenate(
            [local_rows, jnp.zeros((n_pad,), local_rows.dtype)])
    total = local_rows.shape[0]
    vp = table.shape[0]
    pr = jnp.clip(local_rows // pack, 0, vp - 1).astype(jnp.int32)
    off = (local_rows % pack).astype(jnp.int32)
    if chunk % 1024:
        # XLA lays out 1-D s32 with T(1024) tiling; smaller 1-D blocks
        # fail Mosaic's layout verify
        raise ValueError("chunk must be a multiple of 1024")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(total // chunk,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i, pr: (i,)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((chunk, dim), lambda i, pr: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((chunk, pack * dim), table.dtype),
            # sflag space holds only ~512 DMA semaphores; ring-reuse
            pltpu.SemaphoreType.DMA((min(chunk, 256),)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, chunk=chunk, pack=pack,
                          dim=dim),
        out_shape=jax.ShapeDtypeStruct((total, dim), table.dtype),
        grid_spec=grid_spec,
        interpret=jax.default_backend() != "tpu",
    )(pr, off, table)
    return out[:n] if n_pad else out
