"""Pallas TPU kernel for the scoring state machine.

The run/gap/two-hit state machine (kguts.cc:734-877) is sequential per
sequence but vectorizes across the batch.  The XLA `lax.scan` version
(core/device_score._scan_score) dispatches hundreds of small fused
kernels — one or more per window position.  This Pallas kernel runs the
whole W-step loop inside a single kernel invocation: the per-sequence
state lives in vector registers ([1, TB] lanes), each step consumes one
row of the [W, TB]-transposed probe outputs with pure VPU selects, and
call emissions are written row-by-row to VMEM outputs.

Grid: one program per TB-wide batch tile.  No gathers, no DMA games —
exactly the access pattern the VPU likes (rows are lane-aligned).

Semantics are identical to _scan_score (same masked-select formulation);
parity is enforced by tests/test_pallas.py in interpret mode on CPU and
by the device_score parity suite when a TPU is attached.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import K

TB = 512  # batch-tile width (lanes); multiple of 128


def _scan_kernel(found_ref, fi_ref, av_ref, wt_ref,
                 emit_ref, cs_ref, ce_ref, cc_ref, cf_ref, cw_ref,
                 *, W, min_hits, min_weighted_hits, max_gap,
                 order_constraint):
    f32 = jnp.float32
    i32 = jnp.int32
    zero = jnp.zeros((1, TB), i32)
    zf = jnp.zeros((1, TB), f32)
    minw = jnp.float32(min_weighted_hits)

    def flush_fields(s):
        (num_hits, current, first_pos, prev_fi, prev_pos, prev_av, prev_wt,
         prev2_fi, prev2_pos, prev2_wt, cnt, wsum, last_match) = s
        emit = (num_hits > 0) & (cnt >= min_hits) & (wsum >= minw)
        return emit, (first_pos, last_match + (K - 1), cnt, current, wsum)

    def apply_flush(s, fire):
        (num_hits, current, first_pos, prev_fi, prev_pos, prev_av, prev_wt,
         prev2_fi, prev2_pos, prev2_wt, cnt, wsum, last_match) = s
        reseed = (fire & (num_hits >= 2) & (prev2_fi != current)
                  & (prev2_fi == prev_fi))
        clear = fire & ~reseed
        return (
            jnp.where(reseed, 2, jnp.where(clear, 0, num_hits)),
            jnp.where(reseed, prev_fi, current),
            jnp.where(reseed, prev2_pos, first_pos),
            prev_fi, prev_pos, prev_av, prev_wt,
            prev2_fi, prev2_pos, prev2_wt,
            jnp.where(reseed, 2, jnp.where(clear, 0, cnt)),
            jnp.where(reseed, prev2_wt + prev_wt, jnp.where(clear, zf, wsum)),
            jnp.where(reseed, prev_pos, last_match),
        )

    def write_call(t, emit, call):
        emit_ref[t, :] = emit[0].astype(jnp.int32)
        cs_ref[t, :] = call[0][0]
        ce_ref[t, :] = call[1][0]
        cc_ref[t, :] = call[2][0]
        cf_ref[t, :] = call[3][0]
        cw_ref[t, :] = call[4][0]

    def step(t, s):
        h = found_ref[t, :].reshape(1, TB) != 0
        fi = fi_ref[t, :].reshape(1, TB)
        av = av_ref[t, :].reshape(1, TB)
        wt = wt_ref[t, :].reshape(1, TB)
        posb = jnp.full((1, TB), t, i32)

        (num_hits, current, first_pos, prev_fi, prev_pos, prev_av, prev_wt,
         prev2_fi, prev2_pos, prev2_wt, cnt, wsum, last_match) = s

        # gap handling (kguts.cc:821-831)
        gap = h & (num_hits > 0) & (prev_pos + max_gap < posb)
        gf_flush = gap & (num_hits >= min_hits)
        gf_reset = gap & ~gf_flush
        emitA, callA = flush_fields(s)
        emitA = emitA & gf_flush
        s = apply_flush(s, gf_flush)
        (num_hits, current, first_pos, prev_fi, prev_pos, prev_av, prev_wt,
         prev2_fi, prev2_pos, prev2_wt, cnt, wsum, last_match) = s
        num_hits = jnp.where(gf_reset, 0, num_hits)
        cnt = jnp.where(gf_reset, 0, cnt)
        wsum = jnp.where(gf_reset, zf, wsum)

        was0 = num_hits == 0
        cur = jnp.where(h & was0, fi, current)
        if order_constraint:
            drift = (posb - prev_pos) - (prev_av - av)
            admit = h & (was0 | ((fi == prev_fi)
                                 & (drift >= 0) & (drift <= 20)))
        else:
            admit = h

        match = fi == cur
        nh1 = num_hits + 1
        new_num = jnp.where(admit, nh1, num_hits)
        new_first = jnp.where(admit & was0, posb, first_pos)
        new_cnt = jnp.where(admit & match, cnt + 1, cnt)
        new_wsum = jnp.where(admit & match, wsum + wt, wsum)
        new_last = jnp.where(admit & match, posb, last_match)
        n_prev2_fi = jnp.where(admit, prev_fi, prev2_fi)
        n_prev2_pos = jnp.where(admit, prev_pos, prev2_pos)
        n_prev2_wt = jnp.where(admit, prev_wt, prev2_wt)
        n_prev_fi = jnp.where(admit, fi, prev_fi)
        n_prev_pos = jnp.where(admit, posb, prev_pos)
        n_prev_av = jnp.where(admit, av, prev_av)
        n_prev_wt = jnp.where(admit, wt, prev_wt)
        s = (new_num, cur, new_first, n_prev_fi, n_prev_pos, n_prev_av,
             n_prev_wt, n_prev2_fi, n_prev2_pos, n_prev2_wt, new_cnt,
             new_wsum, new_last)

        tir = admit & (new_num > 1) & (cur != fi) & (n_prev2_fi == fi)
        emitB, callB = flush_fields(s)
        emitB = emitB & tir
        s = apply_flush(s, tir)

        emit = emitA | emitB
        call = tuple(jnp.where(emitA, a, b) for a, b in zip(callA, callB))
        write_call(t, emit, call)
        return s

    init = (zero, zero, zero, zero, zero, zero, zf,
            zero, zero, zf, zero, zf, zero)
    s = jax.lax.fori_loop(0, W, step, init)

    # end-of-sequence flush (kguts.cc:873-875)
    emitF, callF = flush_fields(s)
    num_hits = s[0]
    emitF = emitF & (num_hits >= min_hits)
    write_call(W, emitF, callF)


@functools.partial(
    jax.jit,
    static_argnames=("min_hits", "min_weighted_hits", "max_gap",
                     "order_constraint", "interpret"))
def scan_score_pallas(found, h_fi, h_av, h_wt, min_hits=5,
                      min_weighted_hits=0, max_gap=200, order_constraint=0,
                      interpret=False):
    """Pallas-backed equivalent of device_score._scan_score.

    Inputs [B, W]; B must be a multiple of TB (pad with found=False rows).
    Returns (emit [B, W+1] bool, fields list of [B, W+1]) like _scan_score.
    """
    B, W = found.shape
    if B % TB:
        raise ValueError(f"batch {B} must be a multiple of {TB}")
    grid = (B // TB,)

    in_spec = pl.BlockSpec((W, TB), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((W + 1, TB), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((W + 1, B), jnp.int32)
    shape_f = jax.ShapeDtypeStruct((W + 1, B), jnp.float32)

    kernel = functools.partial(
        _scan_kernel, W=W, min_hits=min_hits,
        min_weighted_hits=min_weighted_hits, max_gap=max_gap,
        order_constraint=order_constraint)

    emit, cs, ce, cc, cf, cw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec] * 4,
        out_specs=(out_spec,) * 6,
        out_shape=(shape, shape, shape, shape, shape, shape_f),
        interpret=interpret,
    )(found.T.astype(jnp.int32), h_fi.T, h_av.T, h_wt.T)

    emit = emit.T != 0
    return emit, [cs.T, ce.T, cc.T, cf.T, cw.T]
