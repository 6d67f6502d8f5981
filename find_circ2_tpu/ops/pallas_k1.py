"""Pallas K1 gather prototype: the bucket-row fetch of K1 as a Mosaic
kernel (SURVEY.md §7 step 4; VERDICT r1 task 8).

K1's hot op is `jnp.take(table, h, axis=0)` — ~1M independent 32 B
bucket-row reads per 4096-read batch (2 anchors x 61 canonical variants x
2 cuckoo probes), pure random access over a table far larger than VMEM
(31M buckets / 1 GB at chr20 scale). This kernel re-implements exactly
that op with explicit double-buffered row DMAs (depth-`DEPTH` pipeline,
scalar-prefetched indices), so the question "can a hand-written kernel
beat XLA's gather emitter?" gets a measured answer instead of a guess.

Measured on TPU v5 lite (scripts/bench_k1_pallas.py): XLA's native gather
sustains ~10 ns/row on 1M-row batches; this kernel is DMA-descriptor-
bound — the scalar core issues one descriptor per row, costing two
orders of magnitude more than the gather unit. See docs/DESIGN.md
"Pallas K1 verdict" for the full numbers and the algorithmic levers that
remain (fewer/wider rows, not a different gather engine).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEPTH = 8       # outstanding row DMAs
CHUNK = 1024    # rows per grid step


def _gather_rows_kernel(idx_ref, table_ref, out_ref, sem):
    """Fetch table rows idx_ref[i] into out_ref[i] with a DEPTH-deep
    async-copy pipeline. idx_ref lives in SMEM (scalar reads drive DMA
    descriptors); table_ref stays in HBM; out_ref is this grid step's
    VMEM block."""
    n = out_ref.shape[0]

    def dma(i):
        h = idx_ref[i]
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(h, 1), :],
            out_ref.at[pl.ds(i, 1), :],
            sem.at[jax.lax.rem(i, DEPTH)],
        )

    for j in range(DEPTH):
        dma(j).start()

    def body(i, carry):
        dma(i).wait()

        @pl.when(i + DEPTH < n)
        def _():
            dma(i + DEPTH).start()

        return carry

    jax.lax.fori_loop(0, n, body, 0)


@partial(jax.jit, static_argnames=("interpret",))
def gather_rows_pallas(table: jnp.ndarray, idx: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """table[idx] via explicit row DMAs; bit-identical to
    jnp.take(table, idx, axis=0). idx must be 1-D with size a multiple
    of CHUNK (pad with 0 and slice, as the microbench does).

    On real TPUs Mosaic requires each DMA slice to be 128-lane aligned,
    so table.shape[1] must be a multiple of 128 there (view a (T, 8)
    bucket table as (T//16, 128) and fetch the containing tile — one
    512 B HBM transaction either way). Interpret mode takes any width.
    """
    (n,) = idx.shape
    assert n % CHUNK == 0, f"pad idx to a multiple of {CHUNK}"
    lanes = table.shape[1]
    if not interpret and jax.devices()[0].platform == "tpu":
        assert lanes % 128 == 0, (
            "Mosaic DMA slices must be 128-lane aligned; reshape the "
            f"table to (rows//k, 128) first (got {lanes} lanes)")
    grid = (n // CHUNK,)
    return pl.pallas_call(
        _gather_rows_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((CHUNK, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, lanes), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((DEPTH,))],
        interpret=interpret,
    )(idx.astype(jnp.int32), table)
