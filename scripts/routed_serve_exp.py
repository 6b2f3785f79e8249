"""Single-chip emulation of the FULL routed serve step (VERDICT r4 #5).

routed_exp.py measured the PROBE phase only; the pod projection for the
1e9 DB multiplied its curve by the untested assumption that the rest of
the serve step (scoring scan, best-call pack, family rollup, route
constant) scales too.  This script measures the remaining components on
real silicon with the chained scalar-dependence methodology, then
assembles the per-chip serve-step cost at S = 8/16/32/64:

  replicated per-chip serve  = serve(B)          [fused probe + scan +
                                                  best + family at B]
  routed per-chip serve      = route(Nw)/S       [owner sort + exchange
                                                  compute, amortized]
                             + shard_probe(Nw/S) [owned windows vs the
                                                  local table slice]
                             + finish(B/S)       [serve(B/S) -
                                                  probe(B/S): the scan/
                                                  best/family tail for
                                                  the chip's own rows]

``finish`` is measured by program differencing: the fused serve program
minus the probe-only program at the same [B/S, W] shape — the scan and
reduction cost depends on the hit planes' shape, not on which table
produced them.  The all_to_all wire itself rides ICI on a pod and
cannot be measured on this box (same caveat as routed_exp).

Usage: python scripts/routed_serve_exp.py [--batch 8192]
       [--shards 8,16,32,64] [--sample 6]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("BENCH_N_QUERY", "8192")
import bench  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from close_kmers_tpu.core.engine import (  # noqa: E402
    DeviceDB, encode_windows, probe_windows)
from close_kmers_tpu.db.signature_db import SignatureDB  # noqa: E402
from close_kmers_tpu.params import LO_CARD, EngineParams  # noqa: E402

from routed_exp import (  # noqa: E402
    measure, probe_stage, route_stage, _ddb_args, log)

PARAMS = EngineParams()


def serve_stage(meta, fam_tab, fam_d, cap_seq=8):
    """Fused probe + scan + device best-call + family rollup — the
    single-chip serve program (the per-chip work of serve_step_sharded
    minus routing, parallel/sharding.py)."""
    from close_kmers_tpu.core.device_family import _score_family_jit
    n, n_steps, wide_w, sub_w, fused_w = meta

    def fn(c, bp, lo_a, pay, lw, pw, sh, sb, fw, off, ln):
        B = off.shape[0]
        calls_out, rows = _score_family_jit(
            bp, lo_a, pay, n, n_steps, fam_tab, off, ln,
            PARAMS.min_hits, PARAMS.min_weighted_hits, PARAMS.max_gap,
            PARAMS.order_constraint, B, -2 * B,
            lw, pw, wide_w, sh, sb, sub_w, None, 0, True, 0)
        return (c + calls_out[:B].sum().astype(jnp.float32)
                + rows.reshape(-1)[:B].sum().astype(jnp.float32))
    return fn


def probe_only_stage(meta):
    n, n_steps, wide_w, sub_w, fused_w = meta

    def fn(c, bp, lo_a, pay, lw, pw, sh, sb, fw, off, ln):
        ddb = DeviceDB(bp, lo_a, pay, n_steps, n, lw, pw, wide_w,
                       sh, sb, sub_w, fw, fused_w)
        hi, lo, valid = encode_windows(off, ln)
        found, fi, oi, av, wt, idx = probe_windows(ddb, hi, lo, valid)
        return c + (fi.sum() + found.sum()).astype(jnp.float32)
    return fn


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--shards", type=str, default="8,16,32,64")
    ap.add_argument("--sample", type=int, default=6)
    args = ap.parse_args()
    B = args.batch
    S_LIST = [int(s) for s in args.shards.split(",")]

    cache_dir = os.path.join(bench.CACHE, "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    db, offsets, lengths = bench.build_corpus(rng)
    offsets = offsets[:B]
    lengths = lengths[:B]

    # dense fam table (same construction as devperf): deg 1-3 CSR
    from close_kmers_tpu.core.device_family import DeviceFamilyDB
    from close_kmers_tpu.db.family_db import KmerFamilyMapping
    n = len(db)
    deg = rng.integers(1, 4, size=n)
    offs2 = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=offs2[1:])
    vals = np.repeat(db.fi * 3, deg) + (
        np.arange(offs2[-1]) % 3).astype(np.int32)
    mapping = KmerFamilyMapping()
    mapping._fam_csr = (db.keys, offs2, vals.astype(np.int32))
    fdb = DeviceFamilyDB.from_mapping(db, mapping)

    ddb = DeviceDB.from_db(db)
    meta = (ddb.n, ddb.n_steps, ddb.wide_w, ddb.sub_w, ddb.fused_w)
    dargs = _ddb_args(ddb)   # 8 args incl. fused_wide (routed_exp)

    hi_d, lo_d, valid_d = jax.jit(encode_windows)(
        jnp.asarray(offsets), jnp.asarray(lengths))
    hi_h, lo_h = np.asarray(hi_d), np.asarray(lo_d)
    valid_h = np.asarray(valid_d)
    Bq, W = hi_h.shape
    Nw = Bq * W
    log(f"B={Bq} W={W} windows={Nw:,}")

    # --- replicated per-chip serve + probe at B (and at each B/S)
    t_serve = {}
    t_probe = {}
    for bs in sorted({B} | {max(64, B // s) for s in S_LIST}):
        off_b = jnp.asarray(offsets[:bs])
        len_b = jnp.asarray(lengths[:bs])
        t_serve[bs] = measure(f"serve(B={bs})",
                              serve_stage(meta, fdb.fam, fdb.d),
                              *dargs, off_b, len_b,
                              k_hi=48 if bs < B else 12,
                              k_lo=16 if bs < B else 4)
        t_probe[bs] = measure(f"probe(B={bs})", probe_only_stage(meta),
                              *dargs, off_b, len_b,
                              k_hi=48 if bs < B else 12,
                              k_lo=16 if bs < B else 4)

    # --- routing compute (all windows; amortize by /S per chip)
    from close_kmers_tpu.parallel.sharding import _hi_range_bounds
    hif = np.where(valid_h, hi_h, 0).ravel()
    lof = np.where(valid_h, lo_h, -2).ravel()
    vf = valid_h.ravel()
    bs_arr = db.bucket_start

    rows = []
    for S in S_LIST:
        h_bounds = _hi_range_bounds(db, S)
        owner = np.searchsorted(h_bounds, hif, side="right") - 1
        owner[~vf] = -1
        counts = np.bincount(owner[owner >= 0], minlength=S)
        cap = -(-int(counts.max()) // 256) * 256

        cap_core = max(8, int(Nw / S * 2.0))
        t_route = measure(f"route(S={S})", route_stage(S, min(cap_core, Nw)),
                          jnp.asarray(hif.astype(np.int32)),
                          jnp.asarray(lof.astype(np.int32)),
                          jnp.asarray(vf),
                          jnp.asarray(h_bounds.astype(np.int32)),
                          k_hi=48, k_lo=16)

        # shard-local probe: sample shards evenly
        sample = list(range(0, S, max(1, S // args.sample)))[:args.sample]
        per_shard = []
        for s in sample:
            h0, h1 = int(h_bounds[s]), int(h_bounds[s + 1])
            a, b = int(bs_arr[h0]), int(bs_arr[h1])
            sub = SignatureDB(db.keys[a:b] - np.int64(h0) * LO_CARD,
                              db.fi[a:b], db.oi[a:b], db.avg_off[a:b],
                              db.wt[a:b], n_hi=h1 - h0)
            sddb = DeviceDB.from_db(sub)
            smeta = (sddb.n, sddb.n_steps, sddb.wide_w, sddb.sub_w,
                     sddb.fused_w)
            m = owner == s
            k = int(m.sum())
            sh_hi = np.zeros((1, cap), np.int32)
            sh_lo = np.full((1, cap), -2, np.int32)
            sh_hi[0, :k] = hif[m] - h0
            sh_lo[0, :k] = lof[m]
            sh_valid = np.zeros((1, cap), bool)
            sh_valid[0, :k] = True
            t_s = measure(f"  S={S} shard{s} ({k:,}w/{b-a:,}k)",
                          probe_stage(smeta), *_ddb_args(sddb),
                          jnp.asarray(sh_hi), jnp.asarray(sh_lo),
                          jnp.asarray(sh_valid), k_hi=96, k_lo=32)
            per_shard.append(max(t_s, 0.0))
        shard_mean = float(np.mean(per_shard))

        bs_chip = max(64, B // S)
        finish = max(t_serve[bs_chip] - t_probe[bs_chip], 0.0)
        routed_chip = t_route / S + shard_mean + finish
        repl_chip = t_serve[B]
        rows.append((S, t_route * 1e3, shard_mean * 1e3, finish * 1e3,
                     routed_chip * 1e3, repl_chip / routed_chip))
        log(f"S={S}: route {t_route*1e3:.1f}/S + shard {shard_mean*1e3:.1f}"
            f" + finish {finish*1e3:.1f} = {routed_chip*1e3:.1f} ms/chip; "
            f"replicated {repl_chip*1e3:.1f} -> speedup "
            f"{repl_chip/routed_chip:.2f}x")

    print("S  route_ms  shard_ms  finish_ms  chip_ms  speedup")
    for r in rows:
        print(f"{r[0]:<3d} {r[1]:8.2f} {r[2]:9.2f} {r[3]:9.2f} "
              f"{r[4]:8.2f} {r[5]:7.2f}")

    # --- weak scaling: each chip keeps a FULL B-row batch (pod batch =
    # B*S), so per-chip work is route(its own Nw windows) + probe of
    # its ~Nw received windows vs its n/S-key local slice + finish(B).
    # This is the pod serving model: chips add DB CAPACITY at ~flat
    # per-chip throughput; the strong-scaling table above shrinks the
    # per-chip batch instead and pays small-batch floors.
    log("")
    wrows = []
    for S in S_LIST:
        h_bounds = _hi_range_bounds(db, S)
        # a representative middle shard's table slice, loaded with a
        # full Nw windows (the expected received volume per chip)
        s = S // 2
        h0, h1 = int(h_bounds[s]), int(h_bounds[s + 1])
        a, b = int(bs_arr[h0]), int(bs_arr[h1])
        sub = SignatureDB(db.keys[a:b] - np.int64(h0) * LO_CARD,
                          db.fi[a:b], db.oi[a:b], db.avg_off[a:b],
                          db.wt[a:b], n_hi=h1 - h0)
        sddb = DeviceDB.from_db(sub)
        smeta = (sddb.n, sddb.n_steps, sddb.wide_w, sddb.sub_w,
                 sddb.fused_w)
        # windows that belong to this shard, tiled up to Nw
        owner = np.searchsorted(h_bounds, hif, side="right") - 1
        owner[~vf] = -1
        m = owner == s
        own_hi = hif[m] - h0
        own_lo = lof[m]
        reps = -(-Nw // max(1, len(own_hi)))
        full_hi = np.tile(own_hi, reps)[:Nw].astype(np.int32)
        full_lo = np.tile(own_lo, reps)[:Nw].astype(np.int32)
        t_probe_w = measure(
            f"weak S={S} probe ({Nw:,}w vs {b-a:,}k)",
            probe_stage(smeta), *_ddb_args(sddb),
            jnp.asarray(full_hi[None, :]), jnp.asarray(full_lo[None, :]),
            jnp.asarray(np.ones((1, Nw), bool)), k_hi=24, k_lo=8)
        cap_core = max(8, int(Nw * 2.0 / S))
        t_route_w = measure(
            f"weak S={S} route", route_stage(S, min(cap_core, Nw)),
            jnp.asarray(hif.astype(np.int32)),
            jnp.asarray(lof.astype(np.int32)), jnp.asarray(vf),
            jnp.asarray(h_bounds.astype(np.int32)), k_hi=24, k_lo=8)
        finish = max(t_serve[B] - t_probe[B], 0.0)
        chip = t_route_w + t_probe_w + finish
        wrows.append((S, t_route_w * 1e3, t_probe_w * 1e3, finish * 1e3,
                      chip * 1e3, B / chip))
        log(f"weak S={S}: route {t_route_w*1e3:.1f} + probe "
            f"{t_probe_w*1e3:.1f} + finish {finish*1e3:.1f} = "
            f"{chip*1e3:.1f} ms/chip -> {B/chip:.0f} proteins/s/chip "
            f"({B/chip*S:.0f} pod aggregate)")
    print("WEAK  S  route_ms  probe_ms  finish_ms  chip_ms  per_chip/s")
    for r in wrows:
        print(f"WEAK {r[0]:<3d} {r[1]:8.2f} {r[2]:9.2f} {r[3]:9.2f} "
              f"{r[4]:8.2f} {r[5]:9.0f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
