"""PATRIC-density scale demo (VERDICT #3): run the full annotation
pipeline on a >=200M-kmer signature DB (built out-of-core by
scripts/make_scale_db.py) on one real TPU chip, with

* a parity gate: 128 corpus + mutated proteins through the device
  probe + native scorer vs the host oracle, exact call equality;
* the end-to-end TPU throughput (same grouped-readback pipeline as
  bench.py);
* the honest single-CPU-core baseline at a size where the reference's
  open-addressed hash (~26 GB at 208M keys, first prime > 3n buckets,
  kguts.cc:213-215 / build_signature_kmers.cc:862-884) no longer fits
  any cache level;
* an HBM/bytes-per-key memory table.

Writes BENCH_SCALE.json at the repo root.

Usage:
    python scripts/scale_bench.py [--db-dir /root/scale] [--skip-cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: shared TPU pipeline)

log = bench.log


def load_scale_db(db_dir: str):
    from close_kmers_tpu.db.signature_db import SignatureDB, load_index_file

    t0 = time.time()
    z = np.load(os.path.join(db_dir, "scale_db.npz"))
    functions = load_index_file(os.path.join(db_dir, "function.index"))
    db = SignatureDB(z["keys"], z["fi"], z["oi"], z["avg_off"], z["wt"],
                     functions=functions)
    log(f"scale DB loaded: {len(db):,} kmers, max bucket {db.max_bucket}, "
        f"{time.time()-t0:.0f}s")
    return db


def load_queries(db_dir: str, n_query: int, rng):
    """Query proteins straight from the training corpus (dense-hit
    regime, same as bench.py): every valid window is a signature."""
    from close_kmers_tpu.ops.encoder import seq_to_offsets

    path = os.path.join(db_dir, "corpus", "genome0.fa")
    seqs = []
    with open(path) as f:
        for line in f:
            if not line.startswith(">"):
                seqs.append(line.strip())
                if len(seqs) >= n_query:
                    break
    L = len(seqs[0])
    width = -(-(L + 8) // 8) * 8
    offsets = np.full((n_query, width), 20, dtype=np.uint8)
    for i, s in enumerate(seqs):
        offsets[i, :len(s)] = seq_to_offsets(s)
    lengths = np.full(n_query, L, dtype=np.int32)
    return seqs, offsets, lengths


def parity_gate(db, seqs, rng) -> int:
    """128 proteins (64 corpus, 64 mutated/truncated) through
    FastAnnotator (device probe + native scorer) vs the host oracle.
    Returns the total call count (must match exactly)."""
    from close_kmers_tpu.core import oracle as O
    from close_kmers_tpu.core.engine import FastAnnotator
    from close_kmers_tpu.params import EngineParams

    sample = list(seqs[:64])
    alpha = "ACDEFGHIKLMNPQRSTVWY"
    for i in range(64):
        s = list(seqs[64 + i])
        for _ in range(rng.integers(1, 20)):
            s[rng.integers(0, len(s))] = alpha[rng.integers(0, 20)]
        sample.append("".join(s[:rng.integers(9, len(s))]))

    params = EngineParams()
    fa = FastAnnotator(db)
    t0 = time.time()
    _, n_calls, (cs, ce, cc, cf, cw), _ = fa.annotate(sample, params)
    log(f"parity batch annotated in {time.time()-t0:.0f}s (incl compile)")
    total = 0
    for i, s in enumerate(sample):
        calls = []
        O.process_aa_seq(s, db.lookup, params, calls)
        assert n_calls[i] == len(calls), (i, n_calls[i], len(calls))
        for j, c in enumerate(calls):
            got = (int(cs[i, j]), int(ce[i, j]), int(cc[i, j]),
                   int(cf[i, j]), np.float32(cw[i, j]))
            want = (c.start, c.end, c.count, c.fI, np.float32(c.weighted))
            assert got == want, (i, got, want)
        total += len(calls)
    log(f"parity gate OK: {total} calls equal across {len(sample)} proteins")
    return total


def memory_table(db):
    import jax
    d = jax.devices()[0]
    stats = {}
    try:
        ms = d.memory_stats()
        stats["hbm_bytes_in_use"] = int(ms.get("bytes_in_use", -1))
        stats["hbm_bytes_limit"] = int(ms.get("bytes_limit", -1))
    except Exception:
        pass
    return stats


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--db-dir", default="/root/scale")
    ap.add_argument("--skip-cpu", action="store_true")
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--n-cpu", type=int, default=16384)
    args = ap.parse_args()

    import jax
    cache_dir = os.path.join(bench.CACHE, "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(7)
    db = load_scale_db(args.db_dir)
    n = len(db)
    seqs, offsets, lengths = load_queries(args.db_dir, bench.N_QUERY, rng)

    # CPU baseline first (30+ GB host RSS; freed before the TPU run)
    cpu_rate = None
    if not args.skip_cpu:
        bench.N_CPU = args.n_cpu
        t0 = time.time()
        cpu_rate = bench.bench_cpu(db, offsets, lengths)
        log(f"CPU baseline: {cpu_rate:.0f} proteins/s-core "
            f"({time.time()-t0:.0f}s total incl 26 GB hash build)")

    if not args.skip_parity:
        parity_gate(db, seqs, rng)

    t0 = time.time()
    tpu_rate = bench.bench_tpu(db, offsets, lengths)
    log(f"TPU: {tpu_rate:.0f} proteins/s ({time.time()-t0:.0f}s total)")

    from close_kmers_tpu.core.engine import DeviceDB, _lane_pad
    # replicate from_db's layout gates (engine.DeviceDB.from_db) so the
    # artifact records the layout the run actually probed with
    H = len(db.bucket_start) - 1
    WIDE = max(1, int(db.max_bucket))
    fi_max = int(db.fi.max())
    wide = 0 < db.max_bucket <= DeviceDB.WIDE_BUCKET_MAX
    fused = (not wide and fi_max < (1 << (31 - DeviceDB.FUSED_LO_BITS))
             and H * _lane_pad(1 + 2 * WIDE) * 4 <= DeviceDB.FUSED_MAX_BYTES)
    if fused:
        layout = "fused_packed(+payload for oi/avg)"
        row_w = _lane_pad(1 + 2 * WIDE)
    else:
        layout = "lo_wide+payload"
        row_w = _lane_pad(1 + WIDE)
    mem = dict(
        n_kmers=n,
        layout=layout,
        table_bytes=int(H * row_w * 4),
        payload_bytes=int((n + 1) * 16),
        host_npz_bytes_per_key=24.0,
        device_bytes_per_key=round((H * row_w * 4 + (n + 1) * 16) / n, 2),
        reference_hash_bytes_per_key=round(
            next(p for p in [1073741824, 1400303159] if p > 3 * n)
            * 24 / n, 2),
        **memory_table(db),
    )
    out = {
        "metric": "proteins_per_s_per_chip_at_208M_keys",
        "value": round(tpu_rate, 1),
        "unit": "proteins/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2) if cpu_rate else None,
        "cpu_core_proteins_per_s": round(cpu_rate, 1) if cpu_rate else None,
        "memory": mem,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SCALE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
