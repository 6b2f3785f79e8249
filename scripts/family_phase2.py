"""Family serving phase breakdown (round 5): where does the 65k-protein
best-match pass spend its ~1.0 s when the query pass finishes 65k in
~0.30 s?  Times each phase of best_family_matches_padded's structure
separately: dispatch enqueue, grouped D2H (includes device compute
wait), call-pack unpack + native best-call, rollup finish, and the
vectorized host best-match scan.

Usage: python scripts/family_phase2.py [passes]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(bench.CACHE, "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from close_kmers_tpu.core.api import KmerEngine
    from close_kmers_tpu.core.device_family import DeviceFamilyScorer
    from close_kmers_tpu.core.device_score import DeviceScorer
    from close_kmers_tpu.core.family import (BestCallReduction,
                                             find_best_family_matches_batch)
    from close_kmers_tpu.native import api as native
    from close_kmers_tpu.params import EngineParams

    rng = np.random.default_rng(0)
    db, offsets, lengths = bench.build_corpus(rng)
    dbf, mapping = bench.make_family_universe(db, rng)
    eng = KmerEngine(dbf)
    params = EngineParams()
    dfs = eng._device_family_scorer(mapping)
    assert dfs is not None
    B = KmerEngine.FAMILY_MATCH_CHUNK
    B0 = bench.N_QUERY
    GROUP = KmerEngine.FAMILY_MATCH_GROUP
    log(f"chunk {B}, group {GROUP}, total {B0}")
    lengths = np.asarray(lengths, dtype=np.int32)
    fold_calls, fold_rows = dfs.pack_flags(offsets.shape[1])
    unpack_calls = DeviceScorer.unpack_dense2 if fold_calls \
        else DeviceScorer.unpack_dense3

    # warm
    eng.best_family_matches_padded(offsets[:B], lengths[:B], mapping)

    def one_pass():
        t = {}
        t0 = time.time()
        packs = []
        for a in range(0, B0, B):
            ccap = getattr(dfs, "_bm_ccap", 1)
            gcap = getattr(dfs, "_bm_gps", 2) * B
            calls_dev, call_cap, rows_dev, _ = dfs.score_family_packed(
                offsets[a:a + B], lengths[a:a + B], params, ccap, -gcap,
                slim_calls=True)
            packs.append((calls_dev, call_cap, rows_dev, gcap))
        t["enqueue"] = time.time() - t0

        t["d2h"] = t["unpack_best"] = t["rollup"] = t["scan"] = 0.0
        n_done = 0
        for i in range(0, len(packs), GROUP):
            g = packs[i:i + GROUP]
            t1 = time.time()
            flats = [x for p in g for x in (p[0], p[2])]
            joined = np.asarray(jnp.concatenate(flats))
            t["d2h"] += time.time() - t1
            sizes = [int(x.shape[0]) for x in flats]
            bounds = np.concatenate([[0], np.cumsum(sizes)])
            for ci, (calls_dev, call_cap, rows_dev, gcap) in enumerate(g):
                calls_np = joined[bounds[2 * ci]:bounds[2 * ci + 1]]
                rows_np = joined[bounds[2 * ci + 1]:bounds[2 * ci + 2]]
                t1 = time.time()
                dense = unpack_calls(calls_np, B, call_cap)
                n_calls, cc, cf, cw = dense
                nf, ofi, ocnt, owt = native.best_call_batch(
                    n_calls, None, None, cc, cf, cw)
                t["unpack_best"] += time.time() - t1
                t1 = time.time()
                roll = DeviceFamilyScorer.finish_rollup_global(
                    rows_np, B, gcap, folded=fold_rows)
                n_per, fam, counts, weights, first = roll
                total = int(np.asarray(n_per).sum())
                t["rollup"] += time.time() - t1
                t1 = time.time()
                reduction = BestCallReduction(nf, ofi, ocnt, owt,
                                              eng.db.functions)
                ms = find_best_family_matches_batch(
                    reduction, np.asarray(n_per), fam[:total],
                    counts[:total], weights[:total], first[:total],
                    mapping, 3, False, 0, True, as_arrays=True)
                t["scan"] += time.time() - t1
                n_done += B
        t["total"] = time.time() - t0
        return t, n_done

    REP = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    for p in range(REP):
        t, n = one_pass()
        log(f"pass {p}: total {t['total']*1e3:.0f} ms ({n/t['total']:.0f}/s) "
            + "  ".join(f"{k} {v*1e3:.0f}" for k, v in t.items()
                        if k != "total"))


if __name__ == "__main__":
    main()
