"""Serve calls + family end-to-end through the SUB-BUCKET tier at
PATRIC density (VERDICT r3 weak #3: the deep-bucket serving layout had
probe-only measurements).

Takes the deepest shard of the 971M DB (shard 32: 15.2M keys, max
bucket 2219 — the regime where the wide-row tiers are gated off and
DeviceDB.from_db auto-picks the 2-gather sub-bucket blocks), rebases it
to a local hi window as its own SignatureDB, synthesizes queries that
spell its kmers, and runs the REAL serving programs over it:

* DeviceScorer.best_batch_packed — fused probe + scan + device
  find_best_call (the /query find_best_call=1 program);
* DeviceFamilyScorer.score_family_packed — fused calls + family rollup
  (the /lookup?find_best_match=1 program) + the vectorized host
  best-match scan.

Parity: best calls vs the native oracle over a host searchsorted probe.
Usage: python scripts/sub_serve_demo.py [--db /root/scale1e9] [--shard 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default="/root/scale1e9")
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--shard", type=int, default=32)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    import jax
    from scale_1e9 import load_db, shard_plan
    from close_kmers_tpu.core.device_score import DeviceScorer
    from close_kmers_tpu.core.device_family import DeviceFamilyScorer
    from close_kmers_tpu.core.engine import DeviceDB, finish_best_call
    from close_kmers_tpu.core.family import (BestCallReduction,
                                             find_best_family_matches_batch)
    from close_kmers_tpu.db.family_db import FamilyData, KmerFamilyMapping
    from close_kmers_tpu.db.signature_db import SignatureDB
    from close_kmers_tpu.native import api as native
    from close_kmers_tpu.ops.encoder import decode_kmer, seq_to_offsets
    from close_kmers_tpu.params import LO_CARD, EngineParams

    cache_dir = os.path.join(REPO, ".bench_cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    db = load_db(args.db)
    h_bounds, row_base = shard_plan(db, args.shards)
    s = args.shard
    h0, h1 = int(h_bounds[s]), int(h_bounds[s + 1])
    a, b = int(row_base[s]), int(row_base[s + 1])
    n_funcs = int(db.fi.max()) + 1
    # keep the FULL hi span (not the rebased local window): a standalone
    # serving DB must MISS windows outside the shard's key range, and
    # the single-chip DeviceDB (unlike the sharded path) has no local
    # in-range mask — XLA's clamped gather would alias out-of-range hi
    # onto the last bucket.  Cost: the sub header spans HI_CARD
    # (~205 MB) instead of the 21k local window.
    sub = SignatureDB(db.keys[a:b],
                      db.fi[a:b], db.oi[a:b], db.avg_off[a:b],
                      db.wt[a:b],
                      functions=[f"fn{i}" for i in range(n_funcs)])
    log(f"shard {s}: {len(sub):,} keys, hi span {h1-h0:,}, "
        f"max bucket {sub.max_bucket}")

    # queries spell shard kmers (chained decode) + mutations, so the
    # serving programs hit at realistic density
    rng = np.random.default_rng(2)
    B = args.batch
    L = 304
    offsets = np.full((B, L), 20, dtype=np.uint8)
    lengths = np.zeros(B, dtype=np.int32)
    keys_local = sub.keys
    t0 = time.time()
    # each query chains kmers of ONE function so the run/gap scan forms
    # real calls and each kmer's families clear the hit threshold (mixed
    # random-fi kmers make no >=min_hits same-function runs at all)
    order = np.argsort(sub.fi, kind="stable")
    fi_sorted = sub.fi[order]
    fbounds = np.searchsorted(fi_sorted, np.arange(n_funcs + 1))
    valid_f = np.nonzero(np.diff(fbounds) >= 16)[0]
    ALPHA = "ACDEFGHIKLMNPQRSTVWY"
    for i in range(B):
        f = int(valid_f[rng.integers(len(valid_f))])
        pick = order[fbounds[f]
                     + rng.integers(0, fbounds[f + 1] - fbounds[f],
                                    size=12)]
        parts = [decode_kmer(int(keys_local[k])) for k in pick]
        s_ = "".join(parts)[:L - 9]
        if i % 4 == 1:
            chs = list(s_)
            for _ in range(6):
                chs[int(rng.integers(0, len(chs)))] = \
                    ALPHA[int(rng.integers(0, 20))]
            s_ = "".join(chs)
        o = seq_to_offsets(s_)
        offsets[i, :len(o)] = o
        lengths[i] = len(o)
    log(f"queries built in {time.time()-t0:.0f}s")

    ds = DeviceScorer(sub)
    layout = ("sub" if ds.ddb.sub_blocks is not None else
              "fused" if ds.ddb.fused_wide is not None else
              "wide" if ds.ddb.payload_wide is not None else "bin")
    log(f"serving layout: {layout}")
    assert layout == "sub", layout

    params = EngineParams()
    # /query best-call serving
    t0 = time.time()
    out = np.asarray(ds.best_batch_packed(offsets, lengths, params))
    log(f"best-call warmup+compile {time.time()-t0:.0f}s")
    best_t = None
    for _ in range(args.passes):
        t0 = time.time()
        out = np.asarray(ds.best_batch_packed(offsets, lengths, params))
        dt = time.time() - t0
        best_t = dt if best_t is None else min(best_t, dt)
    rate_q = B / best_t
    log(f"/query best-call via sub tier: {B} proteins in {best_t:.2f}s "
        f"({rate_q:.0f}/s)")

    # parity vs native oracle on a sample
    Nchk = 256
    hi_q = np.zeros((Nchk, L - 8), np.int64)
    lo_q = np.zeros((Nchk, L - 8), np.int64)
    ok = np.ones((Nchk, L - 8), bool)
    o64 = offsets[:Nchk].astype(np.int64)
    W = L - 8
    for j in range(5):
        hi_q = hi_q * 20 + o64[:, j:j + W]
        ok &= offsets[:Nchk, j:j + W] < 20
    for j in range(5, 8):
        lo_q = lo_q * 20 + o64[:, j:j + W]
        ok &= offsets[:Nchk, j:j + W] < 20
    ok &= np.arange(W)[None, :] < (lengths[:Nchk, None] - 8)
    codes = hi_q * LO_CARD + lo_q
    pos = np.searchsorted(sub.keys, codes.reshape(-1)).reshape(codes.shape)
    pos_c = np.minimum(pos, len(sub) - 1)
    fnd = ok & (sub.keys[pos_c] == codes)
    rows, cols = np.nonzero(fnd)
    row_off = np.zeros(Nchk + 1, np.int64)
    np.cumsum(np.bincount(rows, minlength=Nchk), out=row_off[1:])
    pc = pos_c[fnd]
    ncal, cs, ce, cc, cf, cw, _ = native.score_batch(
        cols.astype(np.int32), sub.fi[pc], sub.oi[pc], sub.avg_off[pc],
        sub.wt[pc], row_off, params)
    nfh, ofih, ocnth, owth = native.best_call_batch(ncal, cs, ce, cc,
                                                    cf, cw)
    got = DeviceScorer.finish_best_batch(out[:Nchk], sub.function_of,
                                         overflow="ignore")
    for i in range(Nchk):
        want = finish_best_call(int(nfh[i]), ofih[i], ocnth[i], owth[i],
                                sub.function_of)
        assert (want.function, want.score) == \
            (got[i].function, got[i].score), i
    log(f"parity: {Nchk}-protein best-call sample exact vs native oracle")

    # family best-match serving through the same sub-layout DB
    n = len(sub)
    deg = 1 + (sub.lo % 3)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=offs[1:])
    vals = (np.repeat(sub.fi.astype(np.int64) * 3, deg)
            + (np.arange(offs[-1]) % 3)).astype(np.int32)
    mapping = KmerFamilyMapping()
    mapping._fam_csr = (sub.keys, offs, vals)
    mapping.families = [
        FamilyData(f"PGF_{f:08d}", f"PLF_{f % 5}_{f:08d}", f % 5,
                   f"fn{f // 3}", f, 10, 10) for f in range(3 * n_funcs)]
    from close_kmers_tpu.core.api import KmerEngine
    eng = KmerEngine(sub)
    t0 = time.time()
    ms = eng.best_family_matches_padded(offsets, lengths, mapping,
                                        as_arrays=True)
    log(f"family warmup+compile {time.time()-t0:.0f}s")
    fam_t = None
    for _ in range(args.passes):
        t0 = time.time()
        ms = eng.best_family_matches_padded(offsets, lengths, mapping,
                                            as_arrays=True)
        dt = time.time() - t0
        fam_t = dt if fam_t is None else min(fam_t, dt)
    placed = int((ms.gfam_score > 0).sum())
    rate_f = B / fam_t
    log(f"family best-match via sub tier: {B} proteins in {fam_t:.2f}s "
        f"({rate_f:.0f}/s, {placed} placed)")

    # record into BENCH_1E9.json
    path = os.path.join(REPO, "BENCH_1E9.json")
    data = json.load(open(path))
    data["sub_serve"] = dict(
        shard=s, keys=len(sub), max_bucket=int(sub.max_bucket),
        layout=layout, batch=B,
        query_proteins_per_s=round(rate_q, 1),
        family_proteins_per_s=round(rate_f, 1), placed=placed,
        parity=f"{Nchk}-protein best-call sample exact vs native oracle")
    json.dump(data, open(path, "w"), indent=1)
    log("BENCH_1E9.json updated: sub_serve")
    return 0


if __name__ == "__main__":
    sys.exit(main())
