"""Pallas TPU kernel for the payload-wide probe's match/selection pass.

The single-gather probe (core/engine.probe_windows, payload_wide layout)
gathers one [1 + 5W (+pad)] row per window and then selects the matched
payload with a lane compare + five masked sums.  Measured on v5e
(scripts/gather_exp.py), the raw 128-lane gather costs ~12 ms per 2.5M
windows but XLA's selection fusion adds another ~12 ms — it re-reads the
gathered buffer across several fusions.  This kernel does the whole
selection in ONE pass over the gathered rows (read 1.27 GB, write
~80 MB), with every op a lane-aligned VPU compare/masked-sum.

Layout: rows [N, row_w] int32 (N = B*W windows, row_w a multiple of
128), lo_q [N, 1] int32.  Output [N, 8] int32 columns:
  0 found (0/1)   1 fi   2 oi   3 avg_off   4 wt-bits   5 left+pos
(cols 6-7 pad).  Downstream masking (found=0 rows) stays in XLA — it is
cheap [B, W]-shaped arithmetic.

Exactness: DB keys are unique, so at most one lane matches; masked sums
reproduce the matched value bit-for-bit (or 0 on miss, masked later).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024  # rows per program (sublanes); VMEM use = TILE*row_w*4 bytes


def _select_kernel(rows_ref, lo_ref, out_ref, *, wd):
    rows = rows_ref[:]                       # [TILE, row_w]
    lo = lo_ref[:]                           # [TILE, 1]
    match = rows[:, 1:1 + wd] == lo          # [TILE, wd]
    m = match.astype(jnp.int32)
    found = m.sum(axis=1, keepdims=True)     # 0/1: keys are unique

    def pick(p):
        return (rows[:, 1 + p * wd:1 + (p + 1) * wd] * m).sum(
            axis=1, keepdims=True)

    pos = (m * jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)).sum(
        axis=1, keepdims=True)
    out = jnp.concatenate(
        [found, pick(1), pick(2), pick(3), pick(4), rows[:, 0:1] + pos,
         jnp.zeros_like(found), jnp.zeros_like(found)], axis=1)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("wd", "interpret"))
def select_wide_rows(rows, lo_q, wd: int, interpret: bool = False):
    """rows [N, row_w] i32, lo_q [N] i32 -> [N, 8] i32 selection table
    (see module docstring).  N is padded to a TILE multiple internally."""
    N, row_w = rows.shape
    n_pad = (-N) % TILE
    if n_pad:
        rows = jnp.concatenate(
            [rows, jnp.zeros((n_pad, row_w), jnp.int32)])
        lo_q = jnp.concatenate([lo_q, jnp.full((n_pad,), -2, jnp.int32)])
    Np = N + n_pad
    out = pl.pallas_call(
        functools.partial(_select_kernel, wd=wd),
        grid=(Np // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, row_w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, 8), jnp.int32),
        interpret=interpret,
    )(rows, lo_q[:, None])
    return out[:N]
