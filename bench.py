"""Benchmark: proteins/s through the full annotation pipeline on one chip.

Workload (BASELINE.json config 2 analogue): a synthetic signature DB built
from source proteins, then batch annotation of query proteins — device
window-encode + two-level probe, native C++ run/gap scoring + best-call
reduction.  Baseline = the same pipeline on one CPU core through the
native single-core engine (ck_pipeline_batch), standing in for the
reference's one-thread-per-request design (threadpool.cc:18-45; the
reference itself needs boost/TBB not present in this image).

Prints exactly ONE JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_SRC = int(os.environ.get("BENCH_N_SRC", 70_000))     # source proteins
PROT_LEN = int(os.environ.get("BENCH_PROT_LEN", 300))
N_QUERY = int(os.environ.get("BENCH_N_QUERY", 65_536))  # more queries/pass amortize the relay's ~100ms per-transfer floors
BATCH = int(os.environ.get("BENCH_BATCH", 8192))
N_CPU = int(os.environ.get("BENCH_N_CPU", 16384))      # baseline sample (large enough to exceed LLC)
CALL_CAP = float(os.environ.get("BENCH_CALL_CAP", 2))  # calls/seq download cap
PASSES = int(os.environ.get("BENCH_PASSES", 5))        # best-of-N (the relay wire rate swings ~2x; passes are ~1s, warmup dominates)
N_FUNCS = 4096
CACHE = os.environ.get(
    "BENCH_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_corpus(rng):
    from close_kmers_tpu.db.signature_db import SignatureDB

    os.makedirs(CACHE, exist_ok=True)
    tag = f"{N_SRC}x{PROT_LEN}"
    cache_file = os.path.join(CACHE, f"corpus_{tag}.npz")
    t0 = time.time()
    if os.path.exists(cache_file):
        z = np.load(cache_file)
        keys, fi, off = z["keys"], z["fi"], z["off"]
        log(f"corpus loaded from cache in {time.time()-t0:.1f}s")
    else:
        off = rng.integers(0, 20, size=(N_SRC, PROT_LEN), dtype=np.int64
                           ).astype(np.uint8)
        W = PROT_LEN - 8 + 1
        o32 = off.astype(np.int32)
        hi = np.zeros((N_SRC, W), dtype=np.int32)
        lo = np.zeros((N_SRC, W), dtype=np.int32)
        for j in range(4):
            hi = hi * 20 + o32[:, j:j + W]
            lo = lo * 20 + o32[:, 4 + j:4 + j + W]
        keys = (hi.astype(np.int64) * 160000 + lo).ravel()
        fi = np.repeat(np.arange(N_SRC, dtype=np.int64) % N_FUNCS, W)
        keys, idx = np.unique(keys, return_index=True)
        fi = fi[idx].astype(np.int32)
        np.savez(cache_file, keys=keys, fi=fi, off=off)
        log(f"corpus built in {time.time()-t0:.1f}s")

    t0 = time.time()
    db = SignatureDB(
        keys, fi,
        rng.integers(-1, 64, size=len(keys)).astype(np.int32),
        rng.integers(0, PROT_LEN, size=len(keys)).astype(np.int32),
        rng.uniform(0.1, 4.0, size=len(keys)).astype(np.float32),
    )
    log(f"DB: {len(db):,} kmers, max bucket {db.max_bucket}, "
        f"indexed in {time.time()-t0:.1f}s")

    # queries: slices of source proteins (dense-hit regime)
    qi = rng.integers(0, N_SRC, size=N_QUERY)
    width = -(-(PROT_LEN + 8) // 8) * 8   # multiple of 8 for 5-bit packing
    offsets = np.full((N_QUERY, width), 20, dtype=np.uint8)
    offsets[:, :PROT_LEN] = off[qi]
    lengths = np.full(N_QUERY, PROT_LEN, dtype=np.int32)
    return db, offsets, lengths


def bench_tpu(db, offsets, lengths):
    """Device probe + scan scoring (compact CALL download) + native C++
    best-call reduction, with grouped readback pipelining.  (The fully
    fused device find_best_call path exists — DeviceScorer.best_batch_packed
    — but on this H2D-bound link the smaller download buys nothing while
    its extra reduction scans cost ~170 ms/batch, so the compact-CALL
    path is faster end-to-end here.)"""
    from close_kmers_tpu.core.device_score import DeviceScorer
    from close_kmers_tpu.native import api as native
    from close_kmers_tpu.params import EngineParams

    ds = DeviceScorer(db)
    params = EngineParams()

    def host_side(out_np, B, cap):
        dense = DeviceScorer.unpack_dense(out_np, B, cap)
        assert dense is not None, "call cap overflow"
        n_calls, cs, ce, cc, cf, cw = dense
        nf, ofi, ocnt, owt = native.best_call_batch(n_calls, cs, ce, cc, cf, cw)
        return int(n_calls.sum())

    import jax
    import jax.numpy as jnp
    GROUP = int(os.environ.get("BENCH_GROUP", 4))

    # Note: 5-bit packed uploads (engine.pack_offsets) were measured here:
    # the wire savings are real but the device-side unpack's lane
    # interleave costs ~900 ms/batch on this chip, a large net loss.
    # warmup/compile
    t0 = time.time()
    out, cap = ds.score_batch_packed(offsets[:BATCH], lengths[:BATCH], params,
                                     calls_per_seq_cap=CALL_CAP)
    host_side(np.asarray(out), BATCH, cap)
    jax.block_until_ready(jnp.concatenate([out, out]))
    log(f"warmup+compile {time.time()-t0:.1f}s")

    def read_group(group):
        """Concatenate a group's packed outputs on device and read back
        with a single D2H (the relay's per-transfer latency dominates)."""
        outs = [g[0] for g in group]
        joined = np.asarray(jnp.concatenate(outs)) if len(outs) > 1 \
            else np.asarray(outs[0])
        calls = 0
        k = 0
        for _, bsz, cap in group:
            n = bsz + 5 * cap
            calls += host_side(joined[k:k + n], bsz, cap)
            k += n
        return calls, sum(g[1] for g in group)

    def one_pass():
        t0 = time.time()
        total_calls = n_done = 0
        pending = []
        ready = None  # fully-dispatched previous group, read after the next
        for a in range(0, N_QUERY, BATCH):
            b = min(a + BATCH, N_QUERY)
            if b - a < BATCH:
                break
            out, cap = ds.score_batch_packed(offsets[a:b], lengths[a:b],
                                             params,
                                             calls_per_seq_cap=CALL_CAP)
            pending.append((out, b - a, cap))
            if len(pending) >= GROUP:
                if ready is not None:
                    c, n = read_group(ready)
                    total_calls += c
                    n_done += n
                ready = pending
                pending = []
        for group in (ready, pending):
            if group:
                c, n = read_group(group)
                total_calls += c
                n_done += n
        dt = time.time() - t0
        return n_done, dt, total_calls

    best = None
    for p in range(PASSES):
        n_done, dt, total_calls = one_pass()
        log(f"TPU pass {p}: {n_done} proteins in {dt:.2f}s, "
            f"{total_calls} calls")
        if best is None or dt / n_done < best[1] / best[0]:
            best = (n_done, dt)
    return best[0] / best[1]


def bench_cpu(db, offsets, lengths):
    """Single-core baselines: (a) the reference-architecture open-addressed
    hash (kguts layout — this is vs_baseline), (b) our sorted two-level
    index on CPU (stderr only)."""
    from close_kmers_tpu.native import api as native

    t0 = time.time()
    hp = native.HashPipeline(db)
    log(f"hash table built: {hp.size_hash:,} buckets in {time.time()-t0:.1f}s")
    best = None
    for _ in range(3):  # best-of-3: the shared host is noisy
        t0 = time.time()
        n_calls = hp.run(offsets[:N_CPU], lengths[:N_CPU])
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    log(f"CPU single-core (reference hash layout): {N_CPU} proteins in "
        f"{best:.2f}s best-of-3 ({int(n_calls.sum())} calls)")

    t0 = time.time()
    native.pipeline_batch(db, offsets[:N_CPU], lengths[:N_CPU])
    log(f"CPU single-core (sorted two-level): {N_CPU} proteins in "
        f"{time.time()-t0:.2f}s")
    return N_CPU / best


def bench_family(db, offsets, lengths, rng):
    """Config-2 secondary measurement: the full /lookup?find_best_match=1
    serving path — fused device calls+rollup, global packs, vectorized
    best-match scan (proteins/s reported to stderr; primary metric
    unchanged)."""
    from close_kmers_tpu.core.api import KmerEngine
    from close_kmers_tpu.db.family_db import FamilyData, KmerFamilyMapping
    from close_kmers_tpu.db.signature_db import SignatureDB

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
    # Same workload size as the /query bench: with grouped-readback
    # pipelining (api.best_family_matches_padded), larger requests
    # amortize the relay's per-transfer latency floor exactly like
    # bench_tpu's GROUP scheme does.
    items = [(f"p{i}", offsets[i, :int(lengths[i])])
             for i in range(N_QUERY)]
    t0 = time.time()
    # warm the REAL serving chunk shape: a smaller warmup batch would
    # compile its own (useless) B through the remote-compile tunnel
    eng.best_family_matches(items[:KmerEngine.FAMILY_MATCH_CHUNK], mapping)
    log(f"family warmup+compile {time.time()-t0:.1f}s")
    best = None
    for _ in range(2):
        t0 = time.time()
        ms = eng.best_family_matches(items, mapping)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    n_called = sum(1 for m in ms if m.gfam_id)
    log(f"family best-match path: {len(items)} proteins in {best:.2f}s "
        f"({len(items)/best:.0f} proteins/s, {n_called} placed)")


def main():
    import jax
    cache_dir = os.path.join(CACHE, "jax")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        log("compile cache unavailable:", e)
    rng = np.random.default_rng(0)
    db, offsets, lengths = build_corpus(rng)
    cpu_rate = bench_cpu(db, offsets, lengths)
    tpu_rate = bench_tpu(db, offsets, lengths)
    if os.environ.get("BENCH_FAMILY", "1") == "1":
        try:
            bench_family(db, offsets, lengths, rng)
        except Exception as e:
            log("family bench failed:", e)
    print(json.dumps({
        "metric": "proteins_per_s_per_chip",
        "value": round(tpu_rate, 1),
        "unit": "proteins/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
    }))


if __name__ == "__main__":
    main()
