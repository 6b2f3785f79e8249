"""Real-TPU parity smoke: a small fuzzed batch through the actual chip
(probe + native scorer + fused family rollup) compared against the host
oracle.  Catches backend-specific miscompiles the virtual CPU mesh
can't (VERDICT r1 weak #7).

Run directly (exits nonzero on any mismatch):
    python scripts/tpu_smoke.py [--seed N]
or through the gated test: CLOSE_KMERS_TPU_SMOKE=1 pytest tests/test_tpu_smoke.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=20260820)
    args = ap.parse_args()

    import jax
    assert jax.default_backend() != "cpu", \
        "tpu_smoke must run on the real chip (got cpu backend)"
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)

    from close_kmers_tpu.core import oracle as O
    from close_kmers_tpu.core.engine import FastAnnotator
    from close_kmers_tpu.db.signature_db import SignatureDB
    from close_kmers_tpu.ops import encoder as E
    from close_kmers_tpu.params import LO_CARD, EngineParams

    rng = np.random.default_rng(args.seed)
    n = 30_000
    keys = np.unique(
        rng.integers(0, 3_200_000, size=n, dtype=np.int64) * LO_CARD
        + rng.integers(0, LO_CARD, size=n, dtype=np.int64))
    n_funcs = 64
    db = SignatureDB(
        keys, rng.integers(0, n_funcs, size=len(keys)).astype(np.int32),
        rng.integers(-1, 9, size=len(keys)).astype(np.int32),
        rng.integers(0, 300, size=len(keys)).astype(np.int32),
        rng.uniform(0.05, 6.0, size=len(keys)).astype(np.float32),
        functions=[f"fn{i}" for i in range(n_funcs)])

    from close_kmers_tpu.ops.encoder import decode_kmer

    def rand_seq():
        parts, total = [], 0
        target = int(rng.integers(20, 300))
        while total < target:
            if rng.random() < 0.6:
                parts.append(decode_kmer(int(keys[rng.integers(0, len(keys))])))
            else:
                parts.append("".join(rng.choice(list(E.PROT_ALPHA),
                                                size=int(rng.integers(1, 15)))))
            total += len(parts[-1])
        return "".join(parts)

    seqs = [rand_seq() for _ in range(48)] + ["", "A" * 9]
    params = EngineParams()

    t0 = time.time()
    fa = FastAnnotator(db)
    _, n_calls, (cs, ce, cc, cf, cw), _ = fa.annotate(seqs, params)
    print(f"device annotate: {time.time()-t0:.1f}s "
          f"(backend {__import__('jax').default_backend()})",
          file=sys.stderr)

    bad = 0
    for i, s in enumerate(seqs):
        calls: list = []
        O.process_aa_seq(s, db.lookup, params, calls)
        if int(n_calls[i]) != len(calls):
            print(f"MISMATCH seq {i}: {n_calls[i]} vs {len(calls)} calls")
            bad += 1
            continue
        for j, c in enumerate(calls):
            got = (int(cs[i, j]), int(ce[i, j]), int(cc[i, j]),
                   int(cf[i, j]), np.float32(cw[i, j]))
            want = (c.start, c.end, c.count, c.fI, np.float32(c.weighted))
            if got != want:
                print(f"MISMATCH seq {i} call {j}: {got} vs {want}")
                bad += 1
    total = int(n_calls.sum())
    if bad:
        print(f"tpu_smoke FAILED: {bad} mismatches")
        return 1
    print(f"tpu_smoke OK: {len(seqs)} seqs, {total} calls byte-equal")
    return 0


if __name__ == "__main__":
    sys.exit(main())
