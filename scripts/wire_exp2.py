"""Wire-gap anatomy II: loop structures that keep dispatch ahead of
readback.  wire_exp.py established H2D is cheap (>1 GB/s through the
relay) and fresh-buffer D2H is ~25 MB/s; the remaining question is how
much of the 423 ms full-loop time is the Python thread BLOCKING on
reads between dispatches.  block_until_ready does not synchronize on
this platform (PERF.md round-1), so every timing below ends in a real
np.asarray readback of every output.

Variants measured (all upload fresh batches — true end-to-end):
  A. bench.py current: grouped readback interleaved with dispatch
  B. dispatch-all-then-read: enqueue all uploads+computes, then read
     outputs in order
  C. reader thread: main thread dispatches, a second thread reads
     finished outputs concurrently
  D. depth-limited B: dispatch ahead by at most DEPTH batches (bounded
     device memory), reads trailing on the main thread

Usage: python scripts/wire_exp2.py [passes]
"""

from __future__ import annotations

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

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
    B = bench.BATCH
    NQ = bench.N_QUERY
    n_batches = NQ // B
    REP = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    CAP = 2

    chunks = [np.ascontiguousarray(offsets[a:a + B])
              for a in range(0, NQ, B)]
    lens = lengths[:B]

    def dispatch(c):
        out, cap = ds.score_batch_packed(c, lens, params,
                                         calls_per_seq_cap=CAP, slim=slim)
        return out

    # warm
    np.asarray(dispatch(chunks[0]))

    def variant_B():
        t0 = time.time()
        outs = [dispatch(c) for c in chunks]
        res = [np.asarray(o) for o in outs]
        return time.time() - t0, res

    def variant_C():
        t0 = time.time()
        outs: list = [None] * n_batches
        res: list = [None] * n_batches
        sem = threading.Semaphore(0)

        def reader():
            for k in range(n_batches):
                sem.acquire()
                res[k] = np.asarray(outs[k])

        th = threading.Thread(target=reader)
        th.start()
        for k, c in enumerate(chunks):
            outs[k] = dispatch(c)
            sem.release()
        th.join()
        return time.time() - t0, res

    def variant_D(depth=4):
        t0 = time.time()
        outs = []
        res = []
        for k, c in enumerate(chunks):
            outs.append(dispatch(c))
            if len(outs) > depth:
                res.append(np.asarray(outs.pop(0)))
        while outs:
            res.append(np.asarray(outs.pop(0)))
        return time.time() - t0, res

    def variant_A():
        # the current bench loop, for a same-mood comparison
        import jax.numpy as jnp
        GROUP = 4
        t0 = time.time()
        pending = []
        ready = None
        res = []
        for c in chunks:
            pending.append(dispatch(c))
            if len(pending) >= GROUP:
                if ready is not None:
                    res.append(np.asarray(jnp.concatenate(ready)))
                ready = pending
                pending = []
        for group in (ready, pending):
            if group:
                res.append(np.asarray(jnp.concatenate(group)))
        return time.time() - t0, res

    variants = [("A grouped-interleaved (current)", variant_A),
                ("B dispatch-all-then-read", variant_B),
                ("C reader-thread", variant_C),
                ("D depth-4 trailing reads", variant_D)]
    for name, fn in variants:
        fn()  # warm any shape-specific compiles
        best = None
        times = []
        for _ in range(REP):
            dt, _ = fn()
            times.append(dt)
            best = dt if best is None else min(best, dt)
        log(f"{name}: best {best*1e3:.0f} ms -> {NQ/best:.0f} proteins/s  "
            f"all {[f'{t*1e3:.0f}' for t in times]}")


if __name__ == "__main__":
    main()
