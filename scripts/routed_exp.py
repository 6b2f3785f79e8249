"""Single-chip emulation of the ROUTED sharded probe (VERDICT r3 #1).

A replicated table group makes EVERY chip gather every window of its
data replica (parallel/sharding._merge_probe); the routed design
(_routed_probe_core) gives each chip 1/S of the windows: it computes
each window's owning shard, exchanges with one all_to_all per
direction, and probes ONLY what it owns.  One real chip cannot run the
S-chip exchange, so this script measures the routed design's per-chip
COMPONENTS separately on real silicon (devperf chained scalar-dependence
methodology — naive timing is invalid through the relay):

  full      probe of all Nw windows vs the FULL table
            (the replicated path's per-chip probe cost)
  shard s   probe of the windows owned by shard s (padded to the routing
            capacity) vs shard s's LOCAL table slice
            (the routed path's per-chip probe cost)
  route     the per-chip routing compute alone: owner searchsorted +
            stable 4-operand sort + capacity scatter + inverse result
            scatter, with an identity exchange (the all_to_all itself
            rides ICI on a pod, which this box cannot measure)

Routed per-chip cost = route + shard_mean; replicated per-chip = full.
Writes a summary row for PERF.md.

Usage: python scripts/routed_exp.py [--shards 8] [--batch 8192]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("BENCH_N_QUERY", "8192")
import bench  # noqa: E402  (corpus builder + cache)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from close_kmers_tpu.core.engine import (  # noqa: E402
    DeviceDB, encode_windows, probe_windows)
from close_kmers_tpu.db.signature_db import SignatureDB  # noqa: E402
from close_kmers_tpu.params import LO_CARD  # noqa: E402

K_HI = 12
K_LO = 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(name, fn, *args, k_hi=K_HI, k_lo=K_LO):
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
    log(f"  [{name}: compile+warm {time.time()-t0:.1f}s]")
    t_lo, _ = run(k_lo)
    t_hi, _ = run(k_hi)
    per = (t_hi - t_lo) / (k_hi - k_lo)
    log(f"  {name}: {per*1e3:.2f} ms/call")
    return per


def _ddb_args(ddb):
    return (ddb.bucket_pair, ddb.lo, ddb.payload, ddb.lo_wide,
            ddb.payload_wide, ddb.sub_header, ddb.sub_blocks,
            ddb.fused_wide)


def probe_stage(meta):
    n, n_steps, wide_w, sub_w, fused_w = meta

    def fn(c, bp, lo_a, pay, lw, pw, sh, sb, fw, hi, lo, valid):
        ddb = DeviceDB(bp, lo_a, pay, n_steps, n, lw, pw, wide_w,
                       sh, sb, sub_w, fw, fused_w)
        found, fi, oi, av, wt, idx = probe_windows(ddb, hi, lo, valid)
        return c + jnp.where(found, wt, 0.0).sum() \
            + found.sum(dtype=jnp.int32).astype(jnp.float32) * 1e-6
    return fn


def route_stage(S, cap):
    """The routing compute exactly as _routed_probe_core performs it
    (send/recv buffers = S contiguous memcpys of the sorted stream;
    unsort = argsort inverse + cliff-padded row gather), with an
    identity exchange."""
    def fn(c, hif, lof, vf, bounds):
        i32 = jnp.int32
        from close_kmers_tpu.core.engine import _probe_count_pad
        Nw = hif.shape[0]
        # compare-sum owner: searchsorted cliffs past ~64 bounds (r5)
        owner = (hif[:, None] >= bounds[None, 1:S]).sum(axis=1, dtype=i32)
        owner = jnp.where(vf, jnp.clip(owner, 0, S - 1), S)
        iota = jax.lax.iota(i32, Nw)
        s_owner, s_hi, s_lo, s_pos = jax.lax.sort(
            (owner, hif, lof, iota), num_keys=1, is_stable=True)
        start = jnp.searchsorted(s_owner, jnp.arange(S + 1, dtype=i32),
                                 side="left").astype(i32)
        sorted2 = jnp.concatenate(
            [jnp.stack([s_hi, s_lo], axis=-1),
             jnp.full((cap, 2), -1, i32)])
        r_col = jax.lax.broadcasted_iota(i32, (cap, 1), 0)
        send = jnp.stack([
            jnp.where(r_col < (start[s + 1] - start[s]),
                      jax.lax.dynamic_slice(sorted2, (start[s], 0),
                                            (cap, 2)),
                      -1)
            for s in range(S)])
        ret = jnp.concatenate([send, send], axis=-1)  # 4 result planes
        buf = jnp.zeros((Nw + cap, 4), i32)
        for s in range(S):
            buf = jax.lax.dynamic_update_slice(buf, ret[s], (start[s], 0))
        res_sorted = buf[:Nw]

        def row_gather(tab, idx):
            n = idx.shape[0]
            npad = _probe_count_pad(n)
            if npad != n:
                idx = jnp.concatenate([idx, jnp.zeros(npad - n, idx.dtype)])
            return tab[idx][:n]

        inv = jnp.argsort(s_pos)
        out = row_gather(res_sorted, inv)
        return c + (out[:, 0].sum() + send[0, :, 1].sum()) \
            .astype(jnp.float32) * 1e-9
    return fn


def route_decomp_stages(S, cap):
    """Per-op decomposition of the routing compute, to find where the
    150 ms went (XLA TPU scatter suspicion)."""
    i32 = jnp.int32

    def base(hif, lof, vf, bounds):
        Nw = hif.shape[0]
        # compare-sum owner: searchsorted cliffs past ~64 bounds (r5)
        owner = (hif[:, None] >= bounds[None, 1:S]).sum(axis=1, dtype=i32)
        owner = jnp.where(vf, jnp.clip(owner, 0, S - 1), S)
        iota = jax.lax.iota(i32, Nw)
        return owner, iota

    def s_owner_only(c, hif, lof, vf, bounds):
        owner, iota = base(hif, lof, vf, bounds)
        return c + owner.sum().astype(jnp.float32) * 1e-6

    def s_sort(c, hif, lof, vf, bounds):
        owner, iota = base(hif, lof, vf, bounds)
        so, sh, sl, sp = jax.lax.sort((owner, hif, lof, iota), num_keys=1,
                                      is_stable=True)
        return c + (so[0] + sh[-1] + sp[0]).astype(jnp.float32) * 1e-6

    def s_send_scatter(c, hif, lof, vf, bounds):
        owner, iota = base(hif, lof, vf, bounds)
        so, sh, sl, sp = jax.lax.sort((owner, hif, lof, iota), num_keys=1,
                                      is_stable=True)
        start = jnp.searchsorted(so, jnp.arange(S, dtype=i32),
                                 side="left").astype(i32)
        rank = iota - start[jnp.minimum(so, S - 1)]
        fits = (so < S) & (rank < cap)
        slot = jnp.where(fits, so * cap + rank, S * cap)
        send_hi = jnp.full(S * cap, -1, i32).at[slot].set(sh, mode="drop")
        send_lo = jnp.full(S * cap, -2, i32).at[slot].set(sl, mode="drop")
        return c + (send_hi.sum() + send_lo.sum()).astype(jnp.float32) \
            * 1e-9

    def s_send_gather(c, hif, lof, vf, bounds):
        owner, iota = base(hif, lof, vf, bounds)
        so, sh, sl, sp = jax.lax.sort((owner, hif, lof, iota), num_keys=1,
                                      is_stable=True)
        start = jnp.searchsorted(so, jnp.arange(S + 1, dtype=i32),
                                 side="left").astype(i32)
        # sorted stream is contiguous per destination: send[s, r] =
        # sorted[start[s] + r], masked r < count[s] — gathers, no scatter
        r = jax.lax.broadcasted_iota(i32, (S, cap), 1)
        idx = jnp.minimum(start[:-1, None] + r, hif.shape[0] - 1)
        msk = r < (start[1:, None] - start[:-1, None])
        send_hi = jnp.where(msk, sh[idx], -1)
        send_lo = jnp.where(msk, sl[idx], -2)
        return c + (send_hi.sum() + send_lo.sum()).astype(jnp.float32) \
            * 1e-9

    def s_unsort_scatter(c, hif, lof, vf, bounds):
        owner, iota = base(hif, lof, vf, bounds)
        so, sh, sl, sp = jax.lax.sort((owner, hif, lof, iota), num_keys=1,
                                      is_stable=True)
        vals = jnp.stack([sh, sl, sh, sl], -1)
        out = jnp.zeros((hif.shape[0], 4), i32).at[sp].set(vals)
        return c + out[:, 0].sum().astype(jnp.float32) * 1e-9

    def s_unsort_gather(c, hif, lof, vf, bounds):
        owner, iota = base(hif, lof, vf, bounds)
        so, sh, sl, sp = jax.lax.sort((owner, hif, lof, iota), num_keys=1,
                                      is_stable=True)
        inv = jnp.argsort(sp)          # one more sort, then a gather
        vals = jnp.stack([sh, sl, sh, sl], -1)
        out = vals[inv]
        return c + out[:, 0].sum().astype(jnp.float32) * 1e-9

    def _route_prefix(hif, lof, vf, bounds):
        owner, iota = base(hif, lof, vf, bounds)
        so, sh, sl, sp = jax.lax.sort((owner, hif, lof, iota), num_keys=1,
                                      is_stable=True)
        start = jnp.searchsorted(so, jnp.arange(S, dtype=i32),
                                 side="left").astype(i32)
        rank = iota - start[jnp.minimum(so, S - 1)]
        fits = (so < S) & (rank < cap)
        slot = jnp.where(fits, so * cap + rank, S * cap)
        send = jnp.full((S * cap, 2), -1, i32).at[slot].set(
            jnp.stack([sh, sl], axis=-1), mode="drop")
        return send, slot, fits, sp

    def _rg(tab, idx):
        from close_kmers_tpu.core.engine import _probe_count_pad
        n = idx.shape[0]
        npad = _probe_count_pad(n)
        if npad != n:
            idx = jnp.concatenate([idx, jnp.zeros(npad - n, idx.dtype)])
        return tab[idx][:n]

    def s_to_slotgather(c, hif, lof, vf, bounds):
        send, slot, fits, sp = _route_prefix(hif, lof, vf, bounds)
        ret = jnp.concatenate([send, send], axis=-1)
        res = jnp.where(fits[:, None],
                        _rg(ret, jnp.minimum(slot, S * cap - 1)), 0)
        return c + res[:, 0].sum().astype(jnp.float32) * 1e-9

    def s_to_argsort(c, hif, lof, vf, bounds):
        send, slot, fits, sp = _route_prefix(hif, lof, vf, bounds)
        ret = jnp.concatenate([send, send], axis=-1)
        res = jnp.where(fits[:, None],
                        _rg(ret, jnp.minimum(slot, S * cap - 1)), 0)
        inv = jnp.argsort(sp)
        return c + (res[:, 0].sum() + inv.sum()).astype(jnp.float32) * 1e-9

    def s_route_full(c, hif, lof, vf, bounds):
        send, slot, fits, sp = _route_prefix(hif, lof, vf, bounds)
        ret = jnp.concatenate([send, send], axis=-1)
        res = jnp.where(fits[:, None],
                        _rg(ret, jnp.minimum(slot, S * cap - 1)), 0)
        inv = jnp.argsort(sp)
        out = _rg(res, inv)
        return c + out[:, 0].sum().astype(jnp.float32) * 1e-9

    def s_slotgather_w8(c, hif, lof, vf, bounds):
        send, slot, fits, sp = _route_prefix(hif, lof, vf, bounds)
        ret = jnp.concatenate([send, send, send, send], axis=-1)  # w=8
        res = jnp.where(fits[:, None],
                        _rg(ret, jnp.minimum(slot, S * cap - 1)), 0)
        return c + res[:, 0].sum().astype(jnp.float32) * 1e-9

    def s_slotgather_barrier(c, hif, lof, vf, bounds):
        send, slot, fits, sp = _route_prefix(hif, lof, vf, bounds)
        ret = jax.lax.optimization_barrier(
            jnp.concatenate([send, send], axis=-1))
        res = jnp.where(fits[:, None],
                        _rg(ret, jnp.minimum(slot, S * cap - 1)), 0)
        return c + res[:, 0].sum().astype(jnp.float32) * 1e-9

    def s_slotgather_w8_barrier(c, hif, lof, vf, bounds):
        send, slot, fits, sp = _route_prefix(hif, lof, vf, bounds)
        ret = jax.lax.optimization_barrier(
            jnp.concatenate([send, send, send, send], axis=-1))
        res = jnp.where(fits[:, None],
                        _rg(ret, jnp.minimum(slot, S * cap - 1)), 0)
        return c + res[:, 0].sum().astype(jnp.float32) * 1e-9

    def s_sendbarrier_only(c, hif, lof, vf, bounds):
        send, slot, fits, sp = _route_prefix(hif, lof, vf, bounds)
        send = jax.lax.optimization_barrier(send)
        res = jnp.where(fits[:, None],
                        _rg(send, jnp.minimum(slot, S * cap - 1)), 0)
        return c + res[:, 0].sum().astype(jnp.float32) * 1e-9

    return [("owner", s_owner_only), ("sort", s_sort),
            ("send/scatter", s_send_scatter),
            ("send/gather", s_send_gather),
            ("unsort/scatter", s_unsort_scatter),
            ("unsort/gather", s_unsort_gather),
            ("prefix+slotgather", s_to_slotgather),
            ("slotgather/w8", s_slotgather_w8),
            ("slotgather/barrier", s_slotgather_barrier),
            ("slotgather/w8+barrier", s_slotgather_w8_barrier),
            ("slotgather/send-barrier-w2", s_sendbarrier_only),
            ("prefix+slotgather+argsort", s_to_argsort),
            ("route_full", s_route_full)]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--decomp", action="store_true")
    args = ap.parse_args()
    S = args.shards
    B = args.batch

    cache_dir = os.path.join(bench.CACHE, "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    db, offsets, lengths = bench.build_corpus(rng)
    offsets = offsets[:B]
    lengths = lengths[:B]

    if args.decomp:
        hi_d, lo_d, valid_d = jax.jit(encode_windows)(
            jnp.asarray(offsets), jnp.asarray(lengths))
        hif = np.where(np.asarray(valid_d), np.asarray(hi_d), 0).ravel()
        lof = np.where(np.asarray(valid_d), np.asarray(lo_d), -2).ravel()
        vf = np.asarray(valid_d).ravel()
        from close_kmers_tpu.parallel.sharding import _hi_range_bounds
        h_bounds = _hi_range_bounds(db, S)
        cap = max(8, int(len(hif) / S * 1.25) // 256 * 256)
        for name, fn in route_decomp_stages(S, cap):
            measure(name, fn, jnp.asarray(hif.astype(np.int32)),
                    jnp.asarray(lof.astype(np.int32)), jnp.asarray(vf),
                    jnp.asarray(h_bounds.astype(np.int32)),
                    k_hi=24, k_lo=8)
        return 0

    # host-side window encode (once): the encode stage is ~0.4 ms and
    # identical in both designs, so it is excluded from the comparison
    hi_d, lo_d, valid_d = jax.jit(encode_windows)(
        jnp.asarray(offsets), jnp.asarray(lengths))
    hi_h = np.asarray(hi_d)
    lo_h = np.asarray(lo_d)
    valid_h = np.asarray(valid_d)
    Bq, W = hi_h.shape
    Nw = Bq * W
    log(f"windows: {Bq} x {W} = {Nw:,}")

    # shard plan: bucket-aligned equal-key hi ranges (sharding bounds)
    from close_kmers_tpu.parallel.sharding import _hi_range_bounds
    h_bounds = _hi_range_bounds(db, S)
    bs = db.bucket_start

    # --- full-table probe (replicated per-chip cost)
    ddb = DeviceDB.from_db(db)
    meta = (ddb.n, ddb.n_steps, ddb.wide_w, ddb.sub_w, ddb.fused_w)
    t_full = measure(
        "full", probe_stage(meta), *_ddb_args(ddb), hi_d, lo_d, valid_d)

    # --- routed: host partition (shard owner per window)
    hif = np.where(valid_h, hi_h, 0).ravel()
    lof = np.where(valid_h, lo_h, -2).ravel()
    vf = valid_h.ravel()
    owner = np.searchsorted(h_bounds, hif, side="right") - 1
    owner[~vf] = -1
    counts = np.bincount(owner[owner >= 0], minlength=S)
    cap = int(counts.max())
    cap = -(-cap // 256) * 256          # uniform padded shape, one compile
    log(f"per-shard window counts: min {counts.min():,} "
        f"max {counts.max():,} (cap {cap:,})")

    per_shard = []
    for s in range(S):
        h0, h1 = int(h_bounds[s]), int(h_bounds[s + 1])
        a, b = int(bs[h0]), int(bs[h1])
        sub = SignatureDB(db.keys[a:b] - np.int64(h0) * LO_CARD,
                          db.fi[a:b], db.oi[a:b], db.avg_off[a:b],
                          db.wt[a:b], n_hi=h1 - h0)
        sddb = DeviceDB.from_db(sub)
        smeta = (sddb.n, sddb.n_steps, sddb.wide_w, sddb.sub_w,
                 sddb.fused_w)
        m = owner == s
        sh_hi = np.zeros((1, cap), np.int32)
        sh_lo = np.full((1, cap), -2, np.int32)
        k = int(m.sum())
        sh_hi[0, :k] = hif[m] - h0
        sh_lo[0, :k] = lof[m]
        sh_valid = sh_hi > -1
        sh_valid[0, :k] = True
        # ~1-3 ms calls need many more chained reps than the 16 ms full
        # probe for the same relative resolution
        t_s = measure(f"shard{s} ({k:,} wins, {b-a:,} keys)",
                      probe_stage(smeta), *_ddb_args(sddb),
                      jnp.asarray(sh_hi), jnp.asarray(sh_lo),
                      jnp.asarray(sh_valid), k_hi=96, k_lo=32)
        per_shard.append(max(t_s, 0.0))

    # --- routing compute overhead (identity exchange)
    cap_core = max(8, -(-int(Nw / S * 2.0) // 1))
    t_route = measure(
        "route", route_stage(S, min(cap_core, Nw)),
        jnp.asarray(hif.astype(np.int32)), jnp.asarray(lof.astype(np.int32)),
        jnp.asarray(vf), jnp.asarray(h_bounds.astype(np.int32)),
        k_hi=48, k_lo=16)

    mean_shard = float(np.mean(per_shard))
    # Per-chip accounting: a replicated-table chip probes its data
    # replica's FULL Nw windows; a routed chip holds 1/S of the batch,
    # so it routes Nw/S windows (the measured t_route is for all Nw)
    # and probes its received ~Nw/S share (= the measured shard-local
    # probe).  The all_to_all wire itself rides ICI and cannot be
    # measured on this one-chip box.
    routed = t_route / S + mean_shard
    log("")
    log(f"replicated per-chip probe: {t_full*1e3:8.1f} ms / {Nw:,} windows")
    log(f"routed     per-chip cost:  {routed*1e3:8.1f} ms "
        f"(route {t_route*1e3:.1f}/{S} + shard-local {mean_shard*1e3:.1f}; "
        f"shards {', '.join(f'{t*1e3:.1f}' for t in per_shard)})")
    log(f"per-chip speedup at S={S}: {t_full/routed:.2f}x "
        f"(ideal {S}x minus exchange+imbalance; all_to_all wire excluded)")
    print(f"ROUTED_EXP S={S} B={Bq} full_ms={t_full*1e3:.2f} "
          f"route_ms={t_route*1e3:.2f} shard_mean_ms={mean_shard*1e3:.2f} "
          f"speedup={t_full/routed:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
