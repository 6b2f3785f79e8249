"""Wall-clock phase decomposition of the /lookup?find_best_match serving
path (the bench_family workload): pad -> dispatch (H2D + device) ->
grouped D2H -> host unpack/best-call/match-scan, timed per phase over
repeated passes.  Complements scripts/family_prof.py (cProfile) with
numbers that survive relay noise: each phase is bracketed directly in a
re-implementation of KmerEngine.best_family_matches_padded's loop.

Usage: python scripts/family_phase.py [B_chunk] [passes]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    cache_dir = os.path.join(bench.CACHE, "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from close_kmers_tpu.core.api import KmerEngine
    from close_kmers_tpu.core.device_score import DeviceScorer
    from close_kmers_tpu.core.device_family import DeviceFamilyScorer
    from close_kmers_tpu.core.family import (BestCallReduction,
                                             find_best_family_matches_batch)
    from close_kmers_tpu.db.family_db import FamilyData, KmerFamilyMapping
    from close_kmers_tpu.db.signature_db import SignatureDB
    from close_kmers_tpu.native import api as native
    from close_kmers_tpu.params import EngineParams

    CH = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    rng = np.random.default_rng(0)
    db, offsets, lengths = bench.build_corpus(rng)
    n_funcs = int(db.fi.max()) + 1
    dbf = SignatureDB(db.keys, db.fi, db.oi, db.avg_off, db.wt,
                      functions=[f"fn{i}" for i in range(n_funcs)])
    n = len(dbf)
    deg = rng.integers(1, 4, size=n)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=offs[1:])
    vals = np.repeat(dbf.fi * 3, deg) + (np.arange(offs[-1]) % 3) \
        .astype(np.int32)
    mapping = KmerFamilyMapping()
    mapping._fam_csr = (dbf.keys, offs, vals.astype(np.int32))
    mapping.families = [
        FamilyData(f"PGF_{f:08d}", f"PLF_{f % 5}_{f:08d}", f % 5,
                   f"fn{f // 3}", f, 10, 10) for f in range(3 * n_funcs)]

    eng = KmerEngine(dbf)
    params = EngineParams()
    dfs = eng._device_family_scorer(mapping)
    assert dfs is not None
    N = min(bench.N_QUERY, 32768)
    off_all = offsets[:N]
    len_all = lengths[:N]

    t0 = time.time()
    eng.best_family_matches_padded(off_all[:CH], len_all[:CH], mapping)
    print(f"warmup {time.time()-t0:.1f}s", flush=True)

    for p in range(PASSES):
        t_pass = time.time()
        t_disp = t_read = t_host = 0.0
        pending = []
        t0 = time.time()
        for a in range(0, N, CH):
            c_off = off_all[a:a + CH]
            c_len = len_all[a:a + CH]
            ccap = getattr(dfs, "_bm_ccap", 1)
            gcap = getattr(dfs, "_bm_gps", 2) * CH
            calls_dev, call_cap, rows_dev, _ = dfs.score_family_packed(
                c_off, c_len, params, ccap, -gcap, slim_calls=True)
            pending.append((calls_dev, call_cap, rows_dev, gcap, len(c_off)))
        t_disp = time.time() - t0

        t0 = time.time()
        flats = [x for pz in pending for x in (pz[0], pz[2])]
        joined = np.asarray(jnp.concatenate(flats)) if len(flats) > 1 \
            else np.asarray(flats[0])
        t_read = time.time() - t0

        t0 = time.time()
        sizes = [int(x.shape[0]) for x in flats]
        bounds = np.zeros(len(sizes) + 1, dtype=np.int64)
        np.cumsum(sizes, out=bounds[1:])
        host = [joined[bounds[i]:bounds[i + 1]] for i in range(len(sizes))]
        t_unpack = t_bc = 0.0
        reds, rolls = [], []
        fold_calls, fold_rows = dfs.pack_flags(off_all.shape[1])
        unpack_calls = DeviceScorer.unpack_dense2 if fold_calls \
            else DeviceScorer.unpack_dense3
        for ci, (calls_dev, call_cap, rows_dev, gcap, nn) in \
                enumerate(pending):
            tu = time.time()
            dense = unpack_calls(host[2 * ci], CH, call_cap)
            roll = DeviceFamilyScorer.finish_rollup_global(
                host[2 * ci + 1], CH, gcap, folded=fold_rows)
            assert dense is not None and roll is not None, "cap overflow"
            t_unpack += time.time() - tu
            n_calls, cc, cf, cw = dense
            tb = time.time()
            nf, ofi, ocnt, owt = native.best_call_batch(
                n_calls, None, None, cc, cf, cw)
            t_bc += time.time() - tb
            reds.append((nf[:nn], ofi[:nn], ocnt[:nn], owt[:nn]))
            n_per, fam, counts, weights, first = roll
            total = int(np.asarray(n_per[:nn]).sum())
            rolls.append((np.asarray(n_per[:nn]), fam[:total],
                          counts[:total], weights[:total], first[:total]))
        tm = time.time()
        reduction = BestCallReduction(
            np.concatenate([r[0] for r in reds]),
            np.concatenate([r[1] for r in reds]),
            np.concatenate([r[2] for r in reds]),
            np.concatenate([r[3] for r in reds]),
            dbf.functions)
        ms = find_best_family_matches_batch(
            reduction,
            np.concatenate([r[0] for r in rolls]),
            np.concatenate([r[1] for r in rolls]),
            np.concatenate([r[2] for r in rolls]),
            np.concatenate([r[3] for r in rolls]),
            np.concatenate([r[4] for r in rolls]),
            mapping)
        t_match = time.time() - tm
        t_host = time.time() - t0
        dt = time.time() - t_pass
        placed = sum(1 for m in ms if m.gfam_id)
        print(f"pass {p}: {N} in {dt:.2f}s ({N/dt:.0f}/s) | "
              f"dispatch {t_disp:.2f} read {t_read:.2f} host {t_host:.2f} "
              f"(unpack {t_unpack:.2f} bestcall {t_bc:.2f} "
              f"match {t_match:.2f}) | placed {placed}", flush=True)


if __name__ == "__main__":
    main()
