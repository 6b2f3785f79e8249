"""Probe-gather experiments: can we beat XLA's per-row gather issue rate?

PERF.md finding: the payload-wide probe is ONE XLA gather of ~2.49M rows
(width 111 int32) costing ~37 ms/batch — ~12-15 ns/row issue-bound,
~10x below sequential HBM bandwidth.  This script measures candidate
replacements with the devperf methodology (chained scalar-dependence
calls, differenced run lengths, single scalar readback):

  xla111   — the current gather (payload_wide rows, width 111)
  xla128   — same rows zero-padded to width 128 (lane-aligned)
  xla32    — narrow rows (width 32) for the pure issue-rate floor
  xla8     — width 8
  pallas   — Pallas kernel: per-row async DMA HBM->VMEM, 16-deep pipeline
  pallasrow — Pallas kernel: dynamic-slice row loads from an HBM-resident
              table ref (Mosaic picks the access path)

Usage: python scripts/gather_exp.py [exp ...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

N_ROWS = int(os.environ.get("EXP_ROWS", 3_200_000))    # table rows
N_IDX = int(os.environ.get("EXP_IDX", 2_490_000))      # probes per batch
K_HI = 10
K_LO = 4


def measure(name, fn, *args):
    jfn = jax.jit(fn)

    def run(k):
        c = jnp.float32(0)
        t0 = time.time()
        for _ in range(k):
            c = jfn(c, *args)
        v = float(np.asarray(c))
        return time.time() - t0, v

    t0 = time.time()
    run(2)
    print(f"  [{name}: compile+warm {time.time()-t0:.1f}s]", flush=True)
    t_lo, _ = run(K_LO)
    t_hi, v = run(K_HI)
    per = (t_hi - t_lo) / (K_HI - K_LO)
    ns_row = per / N_IDX * 1e9
    print(f"{name:12s} {per*1000:8.2f} ms/call  {ns_row:6.2f} ns/row "
          f"(check {v:.3g})", flush=True)
    return per


def xla_gather(c, table, idx):
    rows = table[idx]                      # [N_IDX, Wd]
    return c + rows[:, :4].sum(axis=(0, 1)).astype(jnp.float32)


def probe_select(wd, c, table, idx, lo_q):
    """The full payload-wide probe selection (engine.probe_windows) on a
    [*, 1+5*wd(+pad)] row table: gather + match + 4 masked-sum picks."""
    row = table[idx]
    left = row[:, 0]
    match = row[:, 1:1 + wd] == lo_q[:, None]
    found = match.any(axis=-1)
    m = match.astype(jnp.int32)

    def pick(p):
        return (row[:, 1 + p * wd:1 + (p + 1) * wd] * m).sum(axis=-1)

    fi = jnp.where(found, pick(1), -1)
    oi = jnp.where(found, pick(2), -1)
    av = pick(3)
    wt = jax.lax.bitcast_convert_type(pick(4), jnp.float32)
    pos = jnp.argmax(match, axis=-1).astype(jnp.int32)
    idx2 = jnp.where(found, left + pos, 0)
    return (c + fi.sum().astype(jnp.float32) + oi.sum().astype(jnp.float32)
            + av.sum().astype(jnp.float32) + wt.sum()
            + idx2.sum().astype(jnp.float32))


def probe_two_gather(wd, c, lo_tab, pay_tab, idx, lo_q):
    """Two-gather probe: narrow [*, 1+wd(+pad)] lo rows locate the match,
    then a second narrow gather fetches the 4-int payload row."""
    row = lo_tab[idx]
    left = row[:, 0]
    match = row[:, 1:1 + wd] == lo_q[:, None]
    found = match.any(axis=-1)
    pos = jnp.argmax(match, axis=-1).astype(jnp.int32)
    ridx = jnp.where(found, left + pos, pay_tab.shape[0] - 1)
    pay = pay_tab[ridx]
    fi = jnp.where(found, pay[:, 0], -1)
    wt = jax.lax.bitcast_convert_type(pay[:, 3], jnp.float32)
    return (c + fi.sum().astype(jnp.float32) + wt.sum()
            + pay[:, 2].sum().astype(jnp.float32))


def pallas_dma_gather(table, idx, width, rows_out, depth=16):
    """Per-row DMA gather: grid over index tiles; each program issues
    TILE row copies through a depth-`depth` rotating semaphore pipeline."""
    TILE = 512

    def kernel(idx_ref, table_ref, out_ref, sems):
        i = pl.program_id(0)

        # software pipeline: issue `depth` ahead, wait in issue order
        def body(j, _):
            @pl.when(j >= depth)
            def _w():
                r = idx_ref[i, j - depth]
                pltpu.make_async_copy(
                    table_ref.at[r], out_ref.at[j - depth],
                    sems.at[j % depth]).wait()
            r = idx_ref[i, j]
            pltpu.make_async_copy(
                table_ref.at[r], out_ref.at[j], sems.at[j % depth]).start()
            return _

        jax.lax.fori_loop(0, TILE, body, 0)

        def tail(j, _):
            r = idx_ref[i, TILE - depth + j]
            pltpu.make_async_copy(
                table_ref.at[r], out_ref.at[TILE - depth + j],
                sems.at[j % depth]).wait()
            return _

        jax.lax.fori_loop(0, depth, tail, 0)

    n_tiles = N_IDX // TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],   # table in HBM
        out_specs=pl.BlockSpec(
            (TILE, width), lambda i, idx_sm: (i, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, width), jnp.int32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx.reshape(n_tiles, TILE), table)


def _interp() -> bool:
    return jax.default_backend() == "cpu"


def pallas_vgather(n_idx, tile_rows, width, chunk):
    """In-VMEM gather rate: a [tile_rows, width] table tile stays resident
    in VMEM; each grid step gathers `chunk` rows from it by index and
    reduces.  This is the linchpin of a radix-partition + tile-stream
    join probe: if Mosaic's VMEM gather runs at VPU-like rates, the join
    beats the HBM row gather; if it serializes, the design is dead."""

    assert chunk == tile_rows, "Mosaic dynamic_gather needs idx == rows"

    def kernel(idx_ref, tbl_ref, out_ref):
        idx2 = jnp.broadcast_to(idx_ref[:].reshape(-1, 1),
                                (tile_rows, width))
        rows = jnp.take_along_axis(tbl_ref[:], idx2, axis=0,
                                   mode="promise_in_bounds")
        out_ref[0, :, :] = jnp.full((8, 128), rows.sum(dtype=jnp.float32))

    n_chunks = n_idx // chunk
    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8, chunk // 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_chunks, 8, 128), jnp.float32),
        interpret=_interp(),
    )


def pallas_hbmstream(n_rows, width, blk):
    """Sequential HBM read bandwidth through the auto-pipelined grid."""

    def kernel(tbl_ref, out_ref):
        out_ref[0, :, :] = jnp.full((8, 128),
                                    tbl_ref[:].sum(dtype=jnp.float32))

    n_blk = n_rows // blk
    return pl.pallas_call(
        kernel,
        grid=(n_blk,),
        in_specs=[pl.BlockSpec((blk, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blk, 8, 128), jnp.float32),
        interpret=_interp(),
    )


def pallas_dmaflush(n_dmas, rows_per_dma, width):
    """Small-DMA issue rate: VMEM -> scattered HBM block writes through a
    4-deep semaphore ring (the buffered-radix-scatter flush pattern).
    Destination offsets come from a prefetched scalar array."""
    DEPTH = 4

    def kernel(dst_ref, buf_ref, out_hbm, sems):
        i = pl.program_id(0)

        def body(j, _):
            @pl.when(j >= DEPTH)
            def _w():
                pltpu.make_async_copy(
                    buf_ref.at[pl.ds((j - DEPTH) * rows_per_dma,
                                     rows_per_dma)],
                    out_hbm.at[pl.ds(dst_ref[i, j - DEPTH] * rows_per_dma,
                                     rows_per_dma)],
                    sems.at[j % DEPTH]).wait()

            pltpu.make_async_copy(
                buf_ref.at[pl.ds(j * rows_per_dma, rows_per_dma)],
                out_hbm.at[pl.ds(dst_ref[i, j] * rows_per_dma,
                                 rows_per_dma)],
                sems.at[j % DEPTH]).start()
            return 0

        PER_PROG = dst_ref.shape[1]
        jax.lax.fori_loop(0, PER_PROG, body, 0)

        def tail(j, _):
            pltpu.make_async_copy(
                buf_ref.at[pl.ds((PER_PROG - DEPTH + j) * rows_per_dma,
                                 rows_per_dma)],
                out_hbm.at[pl.ds(dst_ref[i, PER_PROG - DEPTH + j]
                                 * rows_per_dma, rows_per_dma)],
                sems.at[j % DEPTH]).wait()
            return 0

        jax.lax.fori_loop(0, DEPTH, tail, 0)

    PER_PROG = 256
    n_progs = n_dmas // PER_PROG
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_progs,),
        in_specs=[pl.BlockSpec((PER_PROG * rows_per_dma, width),
                               lambda i, d: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((DEPTH,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_dmas * rows_per_dma, width),
                                       jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interp(),
    )


def main():
    which = set(sys.argv[1:]) or {"xla111", "xla128", "xla32", "xla8",
                                  "pallas"}
    if os.environ.get("EXP_PLATFORM"):   # e.g. cpu (pallas -> interpret)
        jax.config.update("jax_platforms", os.environ["EXP_PLATFORM"])
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N_ROWS, size=N_IDX, dtype=np.int64)
                      .astype(np.int32))
    print(f"table {N_ROWS:,} rows, {N_IDX:,} probes", flush=True)

    for name, width in (("xla8", 8), ("xla32", 32), ("xla111", 111),
                        ("xla128", 128)):
        if name not in which:
            continue
        tbl = jnp.asarray(
            rng.integers(0, 100, size=(N_ROWS, width), dtype=np.int64)
            .astype(np.int32))
        measure(name, xla_gather, tbl, idx)
        del tbl

    WD = 22  # max bucket width of the bench DB

    if "width1" in which:
        # The VMEM-prefilter floor test: a presence lookup is a width-1
        # gather (1 int per probe from a small table).  If this costs as
        # much as the full 128-wide probe gather, a presence prefilter
        # cannot beat the per-row issue bound on ANY hit-rate regime —
        # the filter lookup itself already costs the whole probe.
        tbl1 = jnp.asarray(rng.integers(0, 2, size=N_ROWS, dtype=np.int64)
                           .astype(np.int32))

        def g1(c, table, ix):
            return c + table[ix].sum().astype(jnp.float32)

        measure("width1", g1, tbl1, idx)
        # packed-bitmap variant: 32 buckets per int32 (100 KB table),
        # index = hi >> 5, then a per-lane bit test
        tblb = jnp.asarray(rng.integers(0, 2 ** 31, size=N_ROWS // 32 + 1,
                                        dtype=np.int64).astype(np.int32))

        def gbit(c, table, ix):
            w = table[ix >> 5]
            return c + ((w >> (ix & 31)) & 1).sum().astype(jnp.float32)

        measure("width1_bitmap", gbit, tblb, idx)

    if "probe_planes192" in which:
        # Plane-ALIGNED payload-wide row: each of the 6 fields gets its
        # own 32-lane block ([start|pad][lo][fi][oi][avg][wt] = 192
        # lanes), so the five selection slices start on lane boundaries.
        # Tests whether the unaligned plane offsets (1, 23, 45, ...) of
        # the 128-lane row are what make selection cost ~2x the raw
        # gather (cf. the pallas_select lane-rotate finding).
        PW = 32
        tbl = np.full((N_ROWS, 192), -9, dtype=np.int32)
        tbl[:, 0] = rng.integers(0, 100, size=N_ROWS)
        for p in range(5):
            tbl[:, PW * (p + 1):PW * (p + 1) + WD] = rng.integers(
                0, 100, size=(N_ROWS, WD))
        tbl_j = jnp.asarray(tbl)
        lo_qa = jnp.asarray(rng.integers(0, 100, size=N_IDX,
                                         dtype=np.int64).astype(np.int32))

        def probe_aligned(c, table, ix, lo_q):
            row = table[ix]
            left = row[:, 0]
            match = row[:, PW:PW + WD] == lo_q[:, None]
            foundf = match.any(axis=-1)
            m = match.astype(jnp.int32)

            def pick(p):
                return (row[:, PW * (p + 1):PW * (p + 1) + WD]
                        * m).sum(axis=-1)

            fif, oif, avf, wtb = pick(1), pick(2), pick(3), pick(4)
            pos = jnp.argmax(match, axis=-1).astype(jnp.int32)
            wt = jax.lax.bitcast_convert_type(wtb, jnp.float32)
            return (c + jnp.where(foundf, fif, -1).sum().astype(jnp.float32)
                    + oif.sum().astype(jnp.float32)
                    + avf.sum().astype(jnp.float32) + wt.sum()
                    + (left + pos).sum().astype(jnp.float32))

        measure("probe_planes192", probe_aligned, tbl_j, idx, lo_qa)

    if "gsort15m" in which:
        # The family GLOBAL pack's flat compaction argsort at serving
        # shape: B*(W*D+1) with B=16384, W=304, D=3 -> 14.96M bools.
        B16 = 16384
        n15 = B16 * (304 * 3 + 1)
        emit15 = jnp.asarray(rng.random(n15) < 0.002)
        vals15 = jnp.asarray(rng.integers(0, 100, size=n15, dtype=np.int64)
                             .astype(np.int32))

        def gsort(c, emit, vals):
            order = jnp.argsort(~emit, stable=True)[:2 * B16]
            return c + vals[order].sum().astype(jnp.float32)

        measure("gsort15m", gsort, emit15, vals15)

    lo_q = jnp.asarray(rng.integers(0, 100, size=N_IDX, dtype=np.int64)
                       .astype(np.int32))
    for name, width in (("probe111", 1 + 5 * WD), ("probe128", 128)):
        if name not in which:
            continue
        tbl = jnp.asarray(
            rng.integers(0, 100, size=(N_ROWS, width), dtype=np.int64)
            .astype(np.int32))
        measure(name, functools.partial(probe_select, WD), tbl, idx, lo_q)
        del tbl

    if any(e in which for e in ("probe_fused64", "probe_fused128")):
        # fused packed rows at bench-DB depth (WD=22): [start |
        # (fi<<13|lo) x 22 | wt x 22] = 45 ints, padded to 64 or 128
        # lanes.  vs probe128 (payload-wide selection, 24.1 ms).
        for name, width in (("probe_fused64", 64), ("probe_fused128", 128)):
            if name not in which:
                continue
            tblf = np.full((N_ROWS, width), (1 << 30) | 0x1FFF,
                           dtype=np.int32)
            tblf[:, 0] = rng.integers(0, 100, size=N_ROWS)
            tblf[:, 1:1 + WD] = (
                rng.integers(0, 2000, size=(N_ROWS, WD)) << 13) \
                | rng.integers(0, 100, size=(N_ROWS, WD))
            tblf[:, 1 + WD:1 + 2 * WD] = rng.integers(
                0, 2 ** 20, size=(N_ROWS, WD))
            tblf_j = jnp.asarray(tblf)
            del tblf

            def fused_sel(c, table, idx, lo_q):
                row = table[idx]
                left = row[:, 0]
                packed = row[:, 1:1 + WD]
                match = (packed & 0x1FFF) == lo_q[:, None]
                found = match.any(axis=-1)
                m = match.astype(jnp.int32)
                fi = jnp.where(found, (packed * m).sum(axis=-1) >> 13, -1)
                wtb = (row[:, 1 + WD:1 + 2 * WD] * m).sum(axis=-1)
                wt = jax.lax.bitcast_convert_type(wtb, jnp.float32)
                pos = jnp.argmax(match, axis=-1).astype(jnp.int32)
                idx2 = jnp.where(found, left + pos, 0)
                return (c + fi.sum().astype(jnp.float32)
                        + jnp.where(found, wt, 0).sum()
                        + idx2.sum().astype(jnp.float32))

            measure(name, fused_sel, tblf_j, idx, lo_q)
            del tblf_j

    if "probe128b" in which:
        # reshape-based selection: one [N, 5, W] masked reduce instead of
        # five lane-sliced masked sums
        def probe_select_b(c, table, idx, lo_q):
            wd = WD
            row = table[idx]
            left = row[:, 0]
            planes = row[:, 1:1 + 5 * wd].reshape(-1, 5, wd)
            match = planes[:, 0, :] == lo_q[:, None]
            found = match.any(axis=-1)
            m = match.astype(jnp.int32)
            picks = (planes * m[:, None, :]).sum(axis=-1)   # [N, 5]
            fi = jnp.where(found, picks[:, 1], -1)
            oi = jnp.where(found, picks[:, 2], -1)
            av = picks[:, 3]
            wt = jax.lax.bitcast_convert_type(picks[:, 4], jnp.float32)
            pos = jnp.argmax(match, axis=-1).astype(jnp.int32)
            idx2 = jnp.where(found, left + pos, 0)
            return (c + fi.sum().astype(jnp.float32)
                    + oi.sum().astype(jnp.float32)
                    + av.sum().astype(jnp.float32) + wt.sum()
                    + idx2.sum().astype(jnp.float32))

        tbl = jnp.asarray(
            rng.integers(0, 100, size=(N_ROWS, 128), dtype=np.int64)
            .astype(np.int32))
        measure("probe128b", probe_select_b, tbl, idx, lo_q)
        del tbl

    if "probepal" in which:
        # gather + Pallas single-pass selection (128-padded rows)
        from close_kmers_tpu.ops.pallas_select import select_wide_rows

        def probe_pallas(c, table, idx, lo_q):
            rows = table[idx]
            sel = select_wide_rows(rows, lo_q, WD)
            found = sel[:, 0] > 0
            fi = jnp.where(found, sel[:, 1], -1)
            oi = jnp.where(found, sel[:, 2], -1)
            wt = jax.lax.bitcast_convert_type(sel[:, 4], jnp.float32)
            return (c + fi.sum().astype(jnp.float32)
                    + oi.sum().astype(jnp.float32)
                    + sel[:, 3].sum().astype(jnp.float32) + wt.sum()
                    + jnp.where(found, sel[:, 5], 0
                                ).sum().astype(jnp.float32))

        tbl = jnp.asarray(
            rng.integers(0, 100, size=(N_ROWS, 128), dtype=np.int64)
            .astype(np.int32))
        measure("probepal", probe_pallas, tbl, idx, lo_q)
        del tbl

    if "deepcmp" in which:
        # Deep-bucket DB (PATRIC density): sub-bucket 2-gather layout vs
        # the n_steps binary search, probing in-range (hi, lo) codes.
        from close_kmers_tpu.core.engine import DeviceDB, probe_windows
        from close_kmers_tpu.db.signature_db import SignatureDB
        from close_kmers_tpu.params import LO_CARD

        n = int(os.environ.get("EXP_DEEP_KEYS", 20_000_000))
        hi_span = int(os.environ.get("EXP_DEEP_SPAN", 64_000))
        his = rng.integers(0, hi_span, size=n, dtype=np.int64)
        los = rng.integers(0, LO_CARD, size=n, dtype=np.int64)
        keys = np.unique(his * LO_CARD + los)
        db = SignatureDB(
            keys,
            rng.integers(0, 4096, size=len(keys)).astype(np.int32),
            rng.integers(-1, 64, size=len(keys)).astype(np.int32),
            rng.integers(0, 300, size=len(keys)).astype(np.int32),
            rng.uniform(0.1, 4.0, size=len(keys)).astype(np.float32),
        )
        print(f"deep DB: {len(db):,} keys, max bucket {db.max_bucket}",
              flush=True)
        q_hi = jnp.asarray(rng.integers(0, hi_span, size=N_IDX,
                                        dtype=np.int64).astype(np.int32))
        q_lo = jnp.asarray(rng.integers(0, LO_CARD, size=N_IDX,
                                        dtype=np.int64).astype(np.int32))
        valid = jnp.ones((N_IDX,), bool)

        def probe_fn(c, bp, lo_t, pay, lw, pw, sh, sb, hi_q, lo_q, vq,
                     *, n_steps, nn, ww, sw):
            ddb = DeviceDB(bp, lo_t, pay, n_steps, nn, lw, pw, ww, sh, sb,
                           sw)
            found, fi, oi, av, wt, idx = probe_windows(
                ddb, hi_q[None, :], lo_q[None, :], vq[None, :])
            return (c + fi.sum().astype(jnp.float32) + wt.sum()
                    + found.sum().astype(jnp.float32))

        for name, kw in (("deep_sub", dict()), ("deep_bin", dict(sub=False))):
            d = DeviceDB.from_db(db, **kw)
            print(f"  [{name}: sub_blocks="
                  f"{None if d.sub_blocks is None else d.sub_blocks.shape}"
                  f" n_steps={d.n_steps}]", flush=True)
            measure(name, functools.partial(
                probe_fn, n_steps=d.n_steps, nn=d.n, ww=d.wide_w,
                sw=d.sub_w),
                d.bucket_pair, d.lo, d.payload, d.lo_wide, d.payload_wide,
                d.sub_header, d.sub_blocks, q_hi, q_lo, valid)
            del d

    if any(e in which for e in ("scale_bin", "scale_csr", "slice256",
                                "slice128", "scale_wide", "scale_pay")):
        # Single-chip 200M-key regime (the scale demo): buckets average
        # ~65 entries, so wide rows (7.7 GB) and sub blocks (25 GB) are
        # memory-gated off and the XLA fallback is the n_steps binary
        # search.  Candidate: "CSR slice probe" — bucket_pair row gather
        # + one vmapped dynamic_slice over the flat lo array (width Ws >=
        # max bucket) + one payload row gather.  3 gather-class ops, no
        # dense per-bucket padding.
        from close_kmers_tpu.params import LO_CARD

        n_keys = int(os.environ.get("EXP_SCALE_KEYS", 208_000_000))
        H = 3_200_000
        # synthesize sorted keys at uniform density without a giant unique:
        # draw per-bucket counts ~ multinomial via poisson, then lo values
        bucket_cnt = rng.poisson(n_keys / H, size=H).astype(np.int64)
        n = int(bucket_cnt.sum())
        max_b = int(bucket_cnt.max())
        print(f"scale DB: {n:,} keys, max bucket {max_b}", flush=True)
        bucket_start = np.zeros(H + 1, dtype=np.int64)
        np.cumsum(bucket_cnt, out=bucket_start[1:])
        los = rng.integers(0, LO_CARD, size=n, dtype=np.int64).astype(np.int32)
        # sort lo within buckets: segment sort via (bucket, lo) lexsort
        seg = np.repeat(np.arange(H, dtype=np.int64), bucket_cnt)
        order = np.lexsort((los, seg))
        los = los[order]
        del seg, order
        Ws = 256
        pair = jnp.asarray(np.stack([bucket_start[:-1], bucket_start[1:]],
                                    axis=1).astype(np.int32))
        lo_pad = jnp.asarray(np.concatenate(
            [los, np.full(Ws, -9, np.int32)]))
        payload = jnp.asarray(
            rng.integers(0, 100, size=(1, 4), dtype=np.int64)
            .astype(np.int32).repeat(1, axis=0))
        payload = jnp.zeros((n + 1, 4), dtype=jnp.int32) + 7
        q_hi = jnp.asarray(rng.integers(0, H, size=N_IDX, dtype=np.int64)
                           .astype(np.int32))
        q_lo = jnp.asarray(rng.integers(0, LO_CARD, size=N_IDX,
                                        dtype=np.int64).astype(np.int32))

        def csr_probe(ws, c, pair, lo_pad, payload, hi_q, lo_q):
            pr = pair[hi_q]
            start, end = pr[:, 0], pr[:, 1]
            sl = jax.vmap(
                lambda s: jax.lax.dynamic_slice(lo_pad, (s,), (ws,)))(start)
            j = jax.lax.broadcasted_iota(jnp.int32, sl.shape, 1)
            match = (sl == lo_q[:, None]) & (j < (end - start)[:, None])
            found = match.any(axis=-1)
            pos = jnp.argmax(match, axis=-1).astype(jnp.int32)
            ridx = jnp.where(found, start + pos, payload.shape[0] - 1)
            pay = payload[ridx]
            wt = jax.lax.bitcast_convert_type(pay[:, 3], jnp.float32)
            return (c + found.sum().astype(jnp.float32)
                    + pay[:, 0].sum().astype(jnp.float32) + wt.sum())

        def slice_only(ws, c, lo_pad, starts):
            sl = jax.vmap(
                lambda s: jax.lax.dynamic_slice(lo_pad, (s,), (ws,)))(starts)
            return c + sl[:, :4].sum().astype(jnp.float32)

        def bin_probe(c, pair, lo_pad, payload, hi_q, lo_q, *, n_steps):
            pr = pair[hi_q]
            left, end = pr[:, 0], pr[:, 1]
            right = end

            def step(_, lr):
                left, right = lr
                cont = left < right
                mid = (left + right) >> 1
                v = lo_pad[jnp.minimum(mid, n)]
                go_right = cont & (v < lo_q)
                return (jnp.where(go_right, mid + 1, left),
                        jnp.where(cont & ~go_right, mid, right))

            left, right = jax.lax.fori_loop(0, n_steps, step, (left, right))
            idxr = jnp.minimum(left, n)
            found = (left < end) & (lo_pad[idxr] == lo_q)
            pay = payload[jnp.where(found, idxr, n)]
            wt = jax.lax.bitcast_convert_type(pay[:, 3], jnp.float32)
            return (c + found.sum().astype(jnp.float32)
                    + pay[:, 0].sum().astype(jnp.float32) + wt.sum())

        starts = jnp.asarray(
            rng.integers(0, n - Ws, size=N_IDX, dtype=np.int64)
            .astype(np.int32))
        if "slice128" in which:
            measure("slice128", functools.partial(slice_only, 128),
                    lo_pad, starts)
        if "slice256" in which:
            measure("slice256", functools.partial(slice_only, 256),
                    lo_pad, starts)
        if "scale_csr" in which:
            measure("scale_csr", functools.partial(csr_probe, Ws),
                    pair, lo_pad, payload, q_hi, q_lo)
        if "scale_wide" in which:
            # lo_wide 2-gather at scale: dense [H, lane_pad(1+maxb)] rows
            # (1.64 GB at 208M keys) + the [n+1, 4] payload gather.
            from close_kmers_tpu.core.engine import _lane_pad
            row_w = _lane_pad(1 + max_b)
            lw = np.full((H, row_w), 2 ** 30, dtype=np.int32)
            lw[:, 0] = bucket_start[:-1]
            for j in range(max_b):
                mk = bucket_cnt > j
                lw[mk, 1 + j] = los[bucket_start[:-1][mk] + j]
            lw_j = jnp.asarray(lw)
            del lw

            def wide_probe(c, lw_t, payload, hi_q, lo_q):
                row = lw_t[hi_q]
                left = row[:, 0]
                match = row[:, 1:1 + max_b] == lo_q[:, None]
                found = match.any(axis=-1)
                pos = jnp.argmax(match, axis=-1).astype(jnp.int32)
                ridx = jnp.where(found, left + pos, payload.shape[0] - 1)
                pay = payload[ridx]
                wt = jax.lax.bitcast_convert_type(pay[:, 3], jnp.float32)
                return (c + found.sum().astype(jnp.float32)
                        + pay[:, 0].sum().astype(jnp.float32) + wt.sum())

            measure("scale_wide", wide_probe, lw_j, payload, q_hi, q_lo)
            del lw_j
        if "scale_fused" in which:
            # fused packed rows: [start | (fi<<13|lo) x max_b | wt x max_b]
            # padded to a 128 multiple — fi and wt come out of the SAME
            # gather, so the [n+1, 4] payload gather disappears whenever
            # oi/avg_off are unused (family//fq//best-call paths).
            from close_kmers_tpu.core.engine import _lane_pad
            row_w = _lane_pad(1 + 2 * max_b)
            # sentinel low 13 bits = 8191 >= LO_CARD: never matches a lo
            fw = np.full((H, row_w), (1 << 30) | 0x1FFF, dtype=np.int32)
            fw[:, 0] = bucket_start[:-1]
            fis = rng.integers(0, 2000, size=n, dtype=np.int64) \
                .astype(np.int32)
            wts = rng.uniform(0.1, 4.0, size=n).astype(np.float32) \
                .view(np.int32)
            rank = np.arange(n, dtype=np.int64) - np.repeat(
                bucket_start[:-1], bucket_cnt)
            rows_f = np.repeat(np.arange(H, dtype=np.int64), bucket_cnt)
            flat = fw.reshape(-1)
            flat[rows_f * row_w + 1 + rank] = (fis << 13) | los
            flat[rows_f * row_w + 1 + max_b + rank] = wts
            fw_j = jnp.asarray(flat.reshape(H, row_w))
            del fw, flat

            def fused_probe(c, fw_t, hi_q, lo_q):
                row = fw_t[hi_q]
                left = row[:, 0]
                packed = row[:, 1:1 + max_b]
                match = (packed & 0x1FFF) == lo_q[:, None]
                found = match.any(axis=-1)
                m = match.astype(jnp.int32)
                fi = jnp.where(found, (packed * m).sum(axis=-1) >> 13, -1)
                wtb = (row[:, 1 + max_b:1 + 2 * max_b] * m).sum(axis=-1)
                wt = jax.lax.bitcast_convert_type(wtb, jnp.float32)
                pos = jnp.argmax(match, axis=-1).astype(jnp.int32)
                idx2 = jnp.where(found, left + pos, n)
                return (c + found.sum().astype(jnp.float32)
                        + fi.sum().astype(jnp.float32)
                        + jnp.where(found, wt, 0).sum()
                        + idx2.sum().astype(jnp.float32))

            measure("scale_fused", fused_probe, fw_j, q_hi, q_lo)
            del fw_j
        if "scale_pay" in which:
            # isolated narrow payload gather from the 208M-row table
            ridx = jnp.asarray(rng.integers(0, n, size=N_IDX,
                                            dtype=np.int64).astype(np.int32))
            measure("scale_pay", xla_gather, payload, ridx)
        if "scale_bin" in which:
            import math as _math
            n_steps = max(1, _math.ceil(_math.log2(max_b + 1)))
            measure("scale_bin",
                    functools.partial(bin_probe, n_steps=n_steps),
                    pair, lo_pad, payload, q_hi, q_lo)

    if any(e in which for e in ("pf0", "pf1", "pf2", "pf3")):
        # Bisect the gap between the isolated selection (probe128, ~22ms)
        # and the in-program probe stage (devperf probe_raw, ~32ms) by
        # adding probe_windows' extras one at a time on [B, W] inputs:
        #   pf0 = flat gather+selection (probe128 replica, 2D in/out)
        #   pf1 = pf0 + input valid-masking wheres
        #   pf2 = pf1 + _finish_select (found mask, wheres, bitcast)
        #   pf3 = pf2 with outputs reshaped [B, W] before the sums
        B = 8192
        W = (N_IDX + B - 1) // B
        wd = WD
        tbl = jnp.asarray(
            rng.integers(0, 100, size=(N_ROWS, 128), dtype=np.int64)
            .astype(np.int32))
        hi2 = jnp.asarray(rng.integers(0, N_ROWS, size=(B, W),
                                       dtype=np.int64).astype(np.int32))
        lo2 = jnp.asarray(rng.integers(0, 100, size=(B, W),
                                       dtype=np.int64).astype(np.int32))
        val2 = jnp.asarray(rng.random(size=(B, W)) < 0.97)

        def pf(level, c, table, hi, lo, valid):
            if level >= 1:
                hi = jnp.where(valid, hi, 0)
                lo = jnp.where(valid, lo, -2)
            hif = hi.reshape(-1)
            lof = lo.reshape(-1)
            row = table[hif]
            left = row[:, 0]
            match = row[:, 1:1 + wd] == lof[:, None]
            foundf = match.any(axis=-1)
            m = match.astype(jnp.int32)

            def pick(p):
                return (row[:, 1 + p * wd:1 + (p + 1) * wd] * m).sum(axis=-1)

            fif, oif, avf, wtb = pick(1), pick(2), pick(3), pick(4)
            pos = jnp.argmax(match, axis=-1).astype(jnp.int32)
            idxf = left + pos
            if level >= 2:
                sh = hi.shape if level >= 3 else (-1,)
                found = (valid.reshape(sh) if level >= 3 else
                         valid.reshape(-1)) & foundf.reshape(sh)
                fi = jnp.where(found, fif.reshape(sh), -1)
                oi = jnp.where(found, oif.reshape(sh), -1)
                av = avf.reshape(sh)
                wt = jax.lax.bitcast_convert_type(wtb.reshape(sh),
                                                  jnp.float32)
                ix = jnp.where(found, idxf.reshape(sh), N_ROWS)
                return (c + fi.sum().astype(jnp.float32)
                        + oi.sum().astype(jnp.float32)
                        + av.sum().astype(jnp.float32) + wt.sum()
                        + ix.sum().astype(jnp.float32))
            wt = jax.lax.bitcast_convert_type(wtb, jnp.float32)
            return (c + jnp.where(foundf, fif, -1).sum().astype(jnp.float32)
                    + oif.sum().astype(jnp.float32)
                    + avf.sum().astype(jnp.float32) + wt.sum()
                    + idxf.sum().astype(jnp.float32))

        for name, lvl in (("pf0", 0), ("pf1", 1), ("pf2", 2), ("pf3", 3)):
            if name in which:
                measure(name, functools.partial(pf, lvl),
                        tbl, hi2, lo2, val2)

    if "pf0f" in which or "pf0p" in which:
        # pf0 follow-ups: is the 2D->flat reshape of the index operand
        # what separates pf0 (38ms) from probe128 (22ms)?
        #   pf0f = identical code, inputs pre-flattened on host
        #   pf0p = [B, W] inputs with W padded to a lane multiple (384)
        B = 8192
        wd = WD
        tbl = jnp.asarray(
            rng.integers(0, 100, size=(N_ROWS, 128), dtype=np.int64)
            .astype(np.int32))

        def pfx(c, table, hi, lo, valid):
            hif = hi.reshape(-1)
            lof = lo.reshape(-1)
            row = table[hif]
            left = row[:, 0]
            match = row[:, 1:1 + wd] == lof[:, None]
            foundf = match.any(axis=-1)
            m = match.astype(jnp.int32)

            def pick(p):
                return (row[:, 1 + p * wd:1 + (p + 1) * wd] * m).sum(axis=-1)

            fif, oif, avf, wtb = pick(1), pick(2), pick(3), pick(4)
            pos = jnp.argmax(match, axis=-1).astype(jnp.int32)
            idxf = left + pos
            wt = jax.lax.bitcast_convert_type(wtb, jnp.float32)
            return (c + jnp.where(foundf, fif, -1).sum().astype(jnp.float32)
                    + oif.sum().astype(jnp.float32)
                    + avf.sum().astype(jnp.float32) + wt.sum()
                    + idxf.sum().astype(jnp.float32))

        for name, W in (("pf0f", None), ("pf0p", 384)):
            if name not in which:
                continue
            shp = (B * 304,) if W is None else (B, W)
            hi2 = jnp.asarray(rng.integers(0, N_ROWS, size=shp,
                                           dtype=np.int64).astype(np.int32))
            lo2 = jnp.asarray(rng.integers(0, 100, size=shp,
                                           dtype=np.int64).astype(np.int32))
            val2 = jnp.asarray(rng.random(size=shp) < 0.97)
            measure(name, pfx, tbl, hi2, lo2, val2)

    if "pfcross" in which:
        # Cross test: probe_select's exact code on pf-style fresh arrays,
        # and pfx's code on probe128-style arrays — separates code-epilogue
        # effects from data/layout effects.
        B = 8192
        tbl = jnp.asarray(
            rng.integers(0, 100, size=(N_ROWS, 128), dtype=np.int64)
            .astype(np.int32))
        hi2 = jnp.asarray(rng.integers(0, N_ROWS, size=(B * 304,),
                                       dtype=np.int64).astype(np.int32))
        lo2 = jnp.asarray(rng.integers(0, 100, size=(B * 304,),
                                       dtype=np.int64).astype(np.int32))
        measure("sel_on_pfdata", functools.partial(probe_select, WD),
                tbl, hi2, lo2)

    if any(e in which for e in ("sortflat_bad", "sortflat_good",
                                "rowsort_bad", "rowsort_odd")):
        # Does the power-of-two-rich size cliff hit sorts too?
        #   sortflat_*: the call-compaction argsort over [B*(W+1)] bools
        #   rowsort_*:  the family rollup's 3-operand row-local sort
        B = 8192

        def argsort_fn(c, emit, vals):
            order = jnp.argsort(~emit, stable=True)[:B * 4]
            return c + vals[order].sum().astype(jnp.float32)

        for name, n in (("sortflat_bad", 2_498_560),
                        ("sortflat_good", 2_498_568)):
            if name not in which:
                continue
            emit = jnp.asarray(rng.random(n) < 0.01)
            vals = jnp.asarray(rng.integers(0, 100, size=n, dtype=np.int64)
                               .astype(np.int32))
            measure(name, argsort_fn, emit, vals)

        def rowsort_fn(c, key, wt, pos):
            sk, sw, sp = jax.lax.sort((key, wt, pos), dimension=1,
                                      num_keys=1, is_stable=True)
            return (c + sk[:, :4].sum().astype(jnp.float32) + sw[:, :4].sum()
                    + sp[:, :4].sum().astype(jnp.float32))

        for name, wd in (("rowsort_bad", 912), ("rowsort_odd", 917)):
            if name not in which:
                continue
            key = jnp.asarray(rng.integers(0, 2 ** 30, size=(B, wd),
                                           dtype=np.int64).astype(np.int32))
            wt = jnp.asarray(rng.random((B, wd), dtype=np.float32))
            pos = jnp.asarray(rng.integers(0, wd, size=(B, wd),
                                           dtype=np.int64).astype(np.int32))
            measure(name, rowsort_fn, key, wt, pos)

    if "probe2g" in which:
        lo_tab = jnp.asarray(
            rng.integers(0, 100, size=(N_ROWS, 32), dtype=np.int64)
            .astype(np.int32))
        pay_tab = jnp.asarray(
            rng.integers(0, 100, size=(N_ROWS, 8), dtype=np.int64)
            .astype(np.int32))
        measure("probe2g", functools.partial(probe_two_gather, WD),
                lo_tab, pay_tab, idx, lo_q)

    if "pallas" in which:
        width = 128
        tbl = jnp.asarray(
            rng.integers(0, 100, size=(N_ROWS, width), dtype=np.int64)
            .astype(np.int32))

        def pallas_fn(c, table, idx):
            rows = pallas_dma_gather(table, idx, width, N_IDX)
            return c + rows[:, :4].sum(axis=(0, 1)).astype(jnp.float32)

        measure("pallas", pallas_fn, tbl, idx)

    if any(e in which for e in ("xsort", "xargsort", "xsortpair")):
        vals = jnp.asarray(rng.integers(0, 256, size=N_IDX, dtype=np.int64)
                           .astype(np.int32))
        if "xsort" in which:
            measure("xsort", lambda c, v: c + jnp.sort(v)[::65536]
                    .sum().astype(jnp.float32), vals)
        if "xargsort" in which:
            measure("xargsort", lambda c, v: c + jnp.argsort(v)[::65536]
                    .sum().astype(jnp.float32), vals)
        if "xsortpair" in which:
            pay = jnp.asarray(rng.integers(0, 99, size=N_IDX, dtype=np.int64)
                              .astype(np.int32))

            def sortpair(c, k, v):
                ks, vs = jax.lax.sort((k, v), num_keys=1)
                return (c + ks[::65536].sum().astype(jnp.float32)
                        + vs[::65536].sum().astype(jnp.float32))

            measure("xsortpair", sortpair, vals, pay)

    if "xla128s" in which:
        # the raw width-128 gather with SORTED indices: does XLA/the HW
        # coalesce adjacent-row accesses?  Decides the sorted-probe design.
        tbl = jnp.asarray(
            rng.integers(0, 100, size=(N_ROWS, 128), dtype=np.int64)
            .astype(np.int32))
        sidx = jnp.sort(idx)
        measure("xla128s", xla_gather, tbl, sidx)
        measure("xla128u", xla_gather, tbl, idx)   # unsorted control
        del tbl

    if "xsort3" in which:
        # variadic sort (key + 2 payloads): the unsort step of a
        # sorted-probe pipeline restores all output planes in one op.
        a = jnp.asarray(rng.integers(0, N_ROWS, size=N_IDX, dtype=np.int64)
                        .astype(np.int32))
        b = jnp.asarray(rng.integers(0, 99, size=N_IDX, dtype=np.int64)
                        .astype(np.int32))
        d = jnp.asarray(rng.integers(0, 99, size=N_IDX, dtype=np.int64)
                        .astype(np.int32))

        def sort3(c, k, v1, v2):
            ks, v1s, v2s = jax.lax.sort((k, v1, v2), num_keys=1)
            return (c + ks[::65536].sum().astype(jnp.float32)
                    + v1s[::65536].sum().astype(jnp.float32)
                    + v2s[::65536].sum().astype(jnp.float32))

        measure("xsort3", sort3, a, b, d)

        def sort6(c, k, v1, v2):
            ops = (k, v1, v2, v2, v1, k)
            outs = jax.lax.sort(ops, num_keys=1)
            return c + sum(o[::65536].sum().astype(jnp.float32)
                           for o in outs)

        measure("xsort6", sort6, a, b, d)

    if "vgather" in which:
        TILE_R = CH = 2048   # rows buffer 2048*128*4 = 1 MB VMEM
        tile = jnp.asarray(rng.integers(0, 100, size=(TILE_R, 128),
                                        dtype=np.int64).astype(np.int32))
        vidx = jnp.asarray(
            rng.integers(0, TILE_R, size=N_IDX // CH * CH, dtype=np.int64)
            .astype(np.int32)).reshape(-1, 8, CH // 8)
        vg = pallas_vgather(vidx.size, TILE_R, 128, CH)

        def vg_fn(c, tile, vidx):
            return c + vg(vidx + (c > 1e18).astype(jnp.int32),
                          tile)[::16].sum()

        measure("vgather", vg_fn, tile, vidx)

    if "hbmstream" in which:
        BLK = 2048
        NR = N_ROWS // BLK * BLK
        tbl = jnp.asarray(rng.integers(0, 3, size=(NR, 128), dtype=np.int64)
                          .astype(np.int32))
        hs = pallas_hbmstream(NR, 128, BLK)
        gb = NR * 128 * 4 / 1e9
        per = measure("hbmstream", lambda c, t: c + hs(t).sum(), tbl)
        print(f"  -> {gb / per:.0f} GB/s sequential", flush=True)

    if "dmaflush" in which:
        N_DMAS, RPD = 32768, 8   # 8 rows x 128 lanes x 4 B = 4 KB per DMA
        perm = rng.permutation(N_DMAS).astype(np.int32)
        dst = jnp.asarray(perm.reshape(-1, 256))
        buf = jnp.asarray(rng.integers(0, 100, size=(256 * RPD, 128),
                                       dtype=np.int64).astype(np.int32))
        df = pallas_dmaflush(N_DMAS, RPD, 128)

        def df_fn(c, dst, buf):
            out = df(dst, buf)
            return c + out[::4096, :4].sum().astype(jnp.float32)

        per = measure("dmaflush", df_fn, dst, buf)
        print(f"  -> {per / N_DMAS * 1e9:.0f} ns/DMA "
              f"({N_DMAS * RPD * 128 * 4 / 1e9 / per:.0f} GB/s)",
              flush=True)


if __name__ == "__main__":
    main()
