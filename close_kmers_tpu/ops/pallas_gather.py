"""Pallas row-gather kernel — the third (and closing) Pallas shot at
the probe's dominant op.

Round-5 measurements (scripts/gather_scale_exp.py) established that
XLA's gather on this chip costs ~5-7 ns per gathered ROW regardless of
row width (8 B or 448 B) and regardless of table size (400 KB or
1.4 GB): the cost is the index stream, not the data.  The only way a
custom kernel wins is issuing gathered rows faster than ~5 ns/row.

This kernel is the direct Pallas alternative: rows fetched HBM->VMEM
with `pltpu.make_async_copy`, N_SEM copies in flight (double-buffered
semaphore ring), indices scalar-prefetched to SMEM.  The DMA-issue
arithmetic predicts it loses badly — a TPU DMA costs ~0.5-1 us to
issue, so even 16 in flight gives ~50+ ns/row — but VERDICT r4 #8
asked for a built kernel and an honest measurement, not arithmetic.
scripts/pallas_gather_bench.py records the verdict; the kernel is kept
for documentation and is NOT wired into any tier.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_SEM = 8          # DMA copies in flight per grid step
CHUNK = 1024       # rows gathered per grid step (XLA i32 tiling unit)


def _gather_kernel(idx_ref, table_ref, out_ref, sems):
    """Grid step g gathers rows idx[g*CHUNK:(g+1)*CHUNK] (idx_ref is
    the per-step SMEM block) into out[g*CHUNK:(g+1)*CHUNK] with a ring
    of N_SEM in-flight DMAs."""

    def start(i):
        row = idx_ref[i]
        pltpu.make_async_copy(
            table_ref.at[row], out_ref.at[i], sems.at[i % N_SEM]).start()

    def wait(i):
        row = idx_ref[i]
        pltpu.make_async_copy(
            table_ref.at[row], out_ref.at[i], sems.at[i % N_SEM]).wait()

    # prime the ring
    for i in range(N_SEM):
        start(i)

    def body(i, _):
        wait(i)
        nxt = i + N_SEM

        @pl.when(nxt < CHUNK)
        def _():
            start(nxt)
        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_row_gather(table: jax.Array, idx: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """out[i] = table[idx[i]]; idx length must be a CHUNK multiple.
    ``interpret=True`` emulates on CPU backends (parity tests)."""
    n = idx.shape[0]
    assert n % CHUNK == 0, n
    w = table.shape[1]
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((n, w), table.dtype),
        grid=(n // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda g: (g,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((CHUNK, w), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((N_SEM,))],
        interpret=interpret,
    )(idx, table)
