"""Profile the /lookup?find_best_match=1 serving path (bench_family's
workload) to find the host-side time between the 210k-proteins/s
device-resident family program and the ~25k end-to-end rate.

Usage: python scripts/family_prof.py [--cprofile]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    import jax
    cache_dir = os.path.join(bench.CACHE, "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from close_kmers_tpu.core.api import KmerEngine
    from close_kmers_tpu.db.family_db import FamilyData, KmerFamilyMapping
    from close_kmers_tpu.db.signature_db import SignatureDB

    rng = np.random.default_rng(0)
    db, offsets, lengths = bench.build_corpus(rng)
    n_funcs = int(db.fi.max()) + 1
    dbf = SignatureDB(db.keys, db.fi, db.oi, db.avg_off, db.wt,
                      functions=[f"fn{i}" for i in range(n_funcs)])
    n = len(dbf)
    deg = rng.integers(1, 4, size=n)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=offs[1:])
    vals = np.repeat(dbf.fi * 3, deg) + (np.arange(offs[-1]) % 3).astype(np.int32)
    mapping = KmerFamilyMapping()
    mapping._fam_csr = (dbf.keys, offs, vals.astype(np.int32))
    mapping.families = [
        FamilyData(f"PGF_{f:08d}", f"PLF_{f % 5}_{f:08d}", f % 5,
                   f"fn{f // 3}", f, 10, 10) for f in range(3 * n_funcs)]

    eng = KmerEngine(dbf)
    items = [(f"p{i}", offsets[i, :int(lengths[i])])
             for i in range(min(bench.N_QUERY, 4 * bench.BATCH))]
    t0 = time.time()
    eng.best_family_matches(items[:bench.BATCH], mapping)
    print(f"warmup {time.time()-t0:.1f}s", flush=True)

    if "--cprofile" in sys.argv:
        pr = cProfile.Profile()
        t0 = time.time()
        pr.enable()
        ms = eng.best_family_matches(items, mapping)
        pr.disable()
        dt = time.time() - t0
        print(f"{len(items)} proteins in {dt:.2f}s "
              f"({len(items)/dt:.0f}/s)", flush=True)
        st = pstats.Stats(pr)
        st.sort_stats("cumulative").print_stats(28)
    else:
        for _ in range(2):
            t0 = time.time()
            ms = eng.best_family_matches(items, mapping)
            dt = time.time() - t0
            print(f"{len(items)} proteins in {dt:.2f}s "
                  f"({len(items)/dt:.0f}/s)", flush=True)
    n_called = sum(1 for m in ms if m.gfam_id)
    print("placed:", n_called)


if __name__ == "__main__":
    main()
