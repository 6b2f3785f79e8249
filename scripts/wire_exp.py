"""Wire-gap anatomy: why end-to-end serving (123k proteins/s, BENCH_r04)
runs at 1/3 of the device-resident rate (365k/s), and which loop
structure closes it.

The serving pass uploads [8192, 308] u8 query batches, dispatches the
fused probe+scan+compact program, and reads back slim call packs.  The
device program itself costs ~22 ms/batch (chained methodology), so at 8
batches/pass anything beyond ~0.18 s/pass is wire or dispatch.  This
script measures, on the real chip through the relay:

  1. pure H2D cost: one 20 MB transfer vs 8x 2.5 MB, raw vs planar-packed
  2. pure D2H cost of the slim call packs
  3. whether H2D overlaps device compute at all (enqueue upload i+1
     while compute i runs, vs strictly serial)
  4. candidate serving-loop structures end-to-end:
       a. current bench loop (upload+dispatch, grouped readback)
       b. background-thread uploader feeding a dispatch loop
       c. double-buffered device staging (upload into standing buffers)

Methodology: wall-clock with block_until_ready on a scalar summary (the
relay's block_until_ready on big arrays forces a D2H; summing to a
scalar first keeps the sync cheap), best-of-N to ride out wire mood.

Usage: python scripts/wire_exp.py [quick]
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


def sync(x):
    import jax
    jax.block_until_ready(x)


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(bench.CACHE, "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from close_kmers_tpu.core.device_score import DeviceScorer
    from close_kmers_tpu.core.engine import pack_offsets_planar
    from close_kmers_tpu.params import EngineParams

    rng = np.random.default_rng(0)
    db, offsets, lengths = bench.build_corpus(rng)
    ds = DeviceScorer(db)
    params = EngineParams()
    slim = ds.slim_mode()
    B = bench.BATCH
    NQ = bench.N_QUERY
    n_batches = NQ // B
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    REP = 2 if quick else 4

    dev = jax.devices()[0]

    @jax.jit
    def checksum(x):
        return jnp.sum(x.astype(jnp.int32))

    # ---- 1. pure H2D ----
    def h2d_once(arrs):
        t0 = time.time()
        bufs = [jax.device_put(a, dev) for a in arrs]
        s = [checksum(b) for b in bufs]
        sync(s)
        return time.time() - t0

    whole = [offsets]
    chunks = [offsets[a:a + B] for a in range(0, NQ, B)]
    planar_whole = [pack_offsets_planar(offsets)]
    planar_chunks = [pack_offsets_planar(c) for c in chunks]
    for name, arrs in [("raw 1x20MB", whole), ("raw 8x2.5MB", chunks),
                       ("planar 1x13MB", planar_whole),
                       ("planar 8x1.7MB", planar_chunks)]:
        h2d_once(arrs)  # warm checksum compile
        ts = [h2d_once(arrs) for _ in range(REP)]
        tot = sum(a.nbytes for a in arrs)
        log(f"H2D {name}: best {min(ts)*1e3:.0f} ms "
            f"({tot/min(ts)/1e6:.0f} MB/s), all {[f'{t*1e3:.0f}' for t in ts]}")

    # ---- 2. compute-only (pre-staged, chained) vs upload+compute ----
    staged = [jax.device_put(c, dev) for c in chunks]
    lens_dev = jax.device_put(lengths[:B], dev)
    sync(staged)

    def dispatch(off_buf):
        out, cap = ds.score_batch_packed(off_buf, lens_dev, params,
                                         calls_per_seq_cap=2, slim=slim)
        return out

    # warm compile
    sync(dispatch(staged[0]))

    def compute_only():
        t0 = time.time()
        outs = [dispatch(s) for s in staged]
        sync([checksum(o) for o in outs])
        return time.time() - t0

    ts = [compute_only() for _ in range(REP)]
    log(f"compute-only (staged inputs, {n_batches} batches): "
        f"best {min(ts)*1e3:.0f} ms -> {NQ/min(ts):.0f} proteins/s")
    t_compute = min(ts)

    # ---- 3. serial upload+dispatch (current loop structure) ----
    def serial_loop():
        t0 = time.time()
        outs = []
        for c in chunks:
            buf = jax.device_put(c, dev)
            outs.append(dispatch(buf))
        sync([checksum(o) for o in outs])
        return time.time() - t0

    ts = [serial_loop() for _ in range(REP)]
    log(f"serial upload+dispatch: best {min(ts)*1e3:.0f} ms -> "
        f"{NQ/min(ts):.0f} proteins/s")

    # ---- 3b. does H2D overlap compute? upload k+1 then dispatch k ----
    def interleaved_loop():
        t0 = time.time()
        bufs = [jax.device_put(chunks[0], dev)]
        outs = []
        for k in range(n_batches):
            if k + 1 < n_batches:
                bufs.append(jax.device_put(chunks[k + 1], dev))
            outs.append(dispatch(bufs[k]))
        sync([checksum(o) for o in outs])
        return time.time() - t0

    ts = [interleaved_loop() for _ in range(REP)]
    log(f"interleaved upload/dispatch: best {min(ts)*1e3:.0f} ms -> "
        f"{NQ/min(ts):.0f} proteins/s")

    # ---- 3c. background-thread uploader ----
    def threaded_loop():
        t0 = time.time()
        bufs: list = [None] * n_batches
        sem = threading.Semaphore(0)

        def uploader():
            for k, c in enumerate(chunks):
                bufs[k] = jax.device_put(c, dev)
                sem.release()

        th = threading.Thread(target=uploader)
        th.start()
        outs = []
        for k in range(n_batches):
            sem.acquire()
            outs.append(dispatch(bufs[k]))
        th.join()
        sync([checksum(o) for o in outs])
        return time.time() - t0

    ts = [threaded_loop() for _ in range(REP)]
    log(f"threaded uploader: best {min(ts)*1e3:.0f} ms -> "
        f"{NQ/min(ts):.0f} proteins/s")

    # ---- 4. D2H of outputs (the real readback, not checksums) ----
    outs = [dispatch(s) for s in staged]
    sync([checksum(o) for o in outs])

    def read_all(group):
        t0 = time.time()
        if group > 1:
            for a in range(0, n_batches, group):
                np.asarray(jnp.concatenate(outs[a:a + group]))
        else:
            for o in outs:
                np.asarray(o)
        return time.time() - t0

    for g in (1, 4, 8):
        ts = [read_all(g) for _ in range(REP)]
        nb = sum(o.size * 4 for o in outs)
        log(f"D2H group={g}: best {min(ts)*1e3:.0f} ms "
            f"({nb/min(ts)/1e6:.0f} MB/s of packs)")

    # ---- 5. full loop: threaded uploads + dispatch + grouped readback ----
    def full_loop(group=4):
        t0 = time.time()
        bufs: list = [None] * n_batches
        sem = threading.Semaphore(0)

        def uploader():
            for k, c in enumerate(chunks):
                bufs[k] = jax.device_put(c, dev)
                sem.release()

        th = threading.Thread(target=uploader)
        th.start()
        outs = []
        done = 0
        res = []
        for k in range(n_batches):
            sem.acquire()
            outs.append(dispatch(bufs[k]))
            if len(outs) >= group and k < n_batches - 1:
                res.append(np.asarray(jnp.concatenate(outs)))
                outs = []
        if outs:
            res.append(np.asarray(jnp.concatenate(outs)))
        th.join()
        return time.time() - t0

    ts = [full_loop() for _ in range(REP)]
    log(f"full loop (threaded H2D + grouped D2H): best {min(ts)*1e3:.0f} ms "
        f"-> {NQ/min(ts):.0f} proteins/s")


if __name__ == "__main__":
    main()
