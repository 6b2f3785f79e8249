"""Wire-gap anatomy III: batch-size / RPC-count scaling.

wire_exp2 showed loop restructuring does not beat the current grouped
readback; the residual ~120 ms above the compute floor is suspected
per-RPC relay overhead (uploads, dispatches, reads are each a tunnel
round trip).  This script scales batch size (8k/16k/32k/64k per
dispatch) with call-cap 1.2 and measures:
  - enqueue-only time for the dispatch loop (how much the Python thread
    spends issuing RPCs)
  - end-to-end pass time with one trailing concat readback per group

Usage: python scripts/wire_exp3.py [passes]
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

    from close_kmers_tpu.core.device_score import DeviceScorer
    from close_kmers_tpu.params import EngineParams

    rng = np.random.default_rng(0)
    db, offsets, lengths = bench.build_corpus(rng)
    ds = DeviceScorer(db)
    params = EngineParams()
    slim = ds.slim_mode()
    NQ = bench.N_QUERY
    REP = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    CAP = float(os.environ.get("CAP", 1.2))

    for BB in (8192, 16384, 32768, 65536):
        n_batches = NQ // BB
        chunks = [np.ascontiguousarray(offsets[a:a + BB])
                  for a in range(0, NQ, BB)]
        lens = lengths[:BB]

        def dispatch(c):
            out, cap = ds.score_batch_packed(c, lens, params,
                                             calls_per_seq_cap=CAP,
                                             slim=slim)
            return out

        t0 = time.time()
        np.asarray(dispatch(chunks[0]))
        log(f"B={BB}: warm+compile {time.time()-t0:.1f}s")

        def one_pass():
            t0 = time.time()
            outs = [dispatch(c) for c in chunks]
            t_enq = time.time() - t0
            if len(outs) > 1:
                res = np.asarray(jnp.concatenate(outs))
            else:
                res = np.asarray(outs[0])
            return time.time() - t0, t_enq, res

        one_pass()
        best = None
        enqs = []
        for _ in range(REP):
            dt, t_enq, _ = one_pass()
            enqs.append(t_enq)
            best = dt if best is None else min(best, dt)
        log(f"B={BB}: best {best*1e3:.0f} ms -> {NQ/best:.0f} proteins/s; "
            f"enqueue {min(enqs)*1e3:.0f} ms")


if __name__ == "__main__":
    main()
