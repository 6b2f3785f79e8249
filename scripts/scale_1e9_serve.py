"""SERVE the 971M-key signature DB end-to-end from the one real chip,
and baseline it against the reference hash at the same scale (VERDICT
r3 #2: BENCH_1E9 v2 with proteins_per_s, family_proteins_per_s,
cpu_core_proteins_per_s, vs_baseline).

TPU design (the routed pattern on one chip, shard-serial):

1. queries upload ONCE ([NQ, L] u8 offsets — the only per-query H2D);
2. one device program encodes all windows, computes each window's
   owning shard (searchsorted over the shard hi bounds — the same
   partition parallel/sharding._routed_probe_core performs), and sorts
   the flat window stream by owner; the sorted hi/lo/position arrays
   stay RESIDENT on device;
3. per shard: upload the shard's binary-layout table (uniform padded
   shapes -> ONE compile), probe ONLY the shard's own windows (a
   dynamic slice of the sorted stream; out-of-range neighbours mask
   off), and scatter-add (fi+1, wt-bits, lo+1) into persistent [NT]
   accumulators — NO per-shard window upload and NO plane download;
4. after the sweep, a fused per-batch program runs the full scoring
   scan + device find_best_call reductions + the family rollup (family
   lists derived on device from the synthetic fi/lo rule) and only the
   packed results leave the chip;
5. host: best-call finish + vectorized family best-match scan; parity
   gates vs a direct numpy searchsorted of the full 971M arrays and
   the native scorer.

The reported ``resident`` rate excludes the one-time 23 GB table
rotation (a pod holds all 64 shards in HBM; the single-chip bench
excludes its DB upload the same way); ``incl_upload`` includes
everything.

CPU baseline (--cpu-baseline): the reference's open-addressed hash at
prime > 3n buckets (needs the extended ladder: 2,912,934,743 buckets =
69.9 GB; kguts.cc:585-602 layout via native ck_hash_build) over the
same query generator, single core, best-of-3.

Usage:
    python scripts/scale_1e9_serve.py --db /root/scale1e9 [--nb 8]
    python scripts/scale_1e9_serve.py --db /root/scale1e9 --cpu-baseline
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_PATH = os.path.join(REPO, "BENCH_1E9.json")
B = 16384          # scoring batch (bench.py's family chunk size)
MAX_AA = 300       # clip query proteins (uniform W, realistic length)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _rss() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def make_queries_big(db_dir: str, n: int, rng):
    """n corpus proteins sampled with replacement, 1/4 mutated and 1/4
    truncated (scale_1e9.make_queries's rules), clipped to MAX_AA,
    padded to one uniform width."""
    from close_kmers_tpu.io.fasta import parse_fasta_file
    from close_kmers_tpu.ops.encoder import seq_to_offsets
    seqs = []
    for sid, _d, seq in parse_fasta_file(
            os.path.join(db_dir, "corpus", "genome0.fa")):
        if sid:
            seqs.append(seq[:MAX_AA])
        if len(seqs) >= 200_000:
            break
    ALPHA = "ACDEFGHIKLMNPQRSTVWY"
    idx = rng.integers(0, len(seqs), size=n)
    L = -(-(MAX_AA + 1) // 8) * 8
    offsets = np.full((n, L), 20, dtype=np.uint8)
    lengths = np.zeros(n, dtype=np.int32)
    for i in range(n):
        s = seqs[int(idx[i])]
        if i % 4 == 1:
            b = list(s)
            for _ in range(6):
                b[int(rng.integers(0, len(b)))] = \
                    ALPHA[int(rng.integers(0, 20))]
            s = "".join(b)
        elif i % 4 == 2:
            s = s[: int(rng.integers(20, max(21, len(s))))]
        o = seq_to_offsets(s)
        offsets[i, : len(o)] = o
        lengths[i] = len(o)
    return offsets, lengths


def cpu_baseline(args) -> None:
    """Reference-architecture single-core baseline at 971M keys."""
    from close_kmers_tpu.native import api as native

    t0 = time.time()
    z = np.load(os.path.join(args.db, "scale_db.npz"))
    keys, fi, oi, av, wt = (z["keys"], z["fi"].astype(np.int32),
                            z["oi"].astype(np.int32),
                            z["avg_off"].astype(np.int32),
                            z["wt"].astype(np.float32))
    log(f"arrays loaded: {len(keys):,} keys in {time.time()-t0:.0f}s, "
        f"rss {_rss():.1f} GB")

    class _DB:  # HashPipeline duck type (SignatureDB would add ~16 GB)
        pass
    db = _DB()
    db.keys, db.fi, db.oi, db.avg_off, db.wt = keys, fi, oi, av, wt

    t0 = time.time()
    hp = native.HashPipeline(db)
    t_build = time.time() - t0
    log(f"hash built: {hp.size_hash:,} buckets "
        f"({hp.size_hash*24/2**30:.1f} GB) in {t_build:.0f}s, "
        f"rss {_rss():.1f} GB")

    rng = np.random.default_rng(1)
    offsets, lengths = make_queries_big(args.db, args.n_cpu, rng)
    best = None
    for r in range(3):
        t0 = time.time()
        n_calls = hp.run(offsets, lengths)
        dt = time.time() - t0
        log(f"cpu run {r}: {args.n_cpu} proteins in {dt:.2f}s "
            f"({args.n_cpu/dt:.0f}/s, {int(n_calls.sum())} calls)")
        best = dt if best is None else min(best, dt)
    rate = args.n_cpu / best
    _update_bench(dict(cpu_core=dict(
        proteins_per_s=round(rate, 1), n_queries=args.n_cpu,
        size_hash=hp.size_hash, table_gb=round(hp.size_hash * 24 / 2**30, 1),
        build_s=round(t_build, 1),
        layout="reference open-addressed hash, prime > 3n "
               "(kguts.cc:585-602; kmer_image.h:17-23)")))
    log(f"CPU single-core at 971M keys: {rate:.0f} proteins/s")


def _update_bench(patch: dict) -> None:
    data = {}
    if os.path.exists(BENCH_PATH):
        with open(BENCH_PATH) as f:
            data = json.load(f)
    serve = data.setdefault("serve_v2", {})
    serve.update(patch)
    cpu = serve.get("cpu_core", {}).get("proteins_per_s")
    tpu = serve.get("tpu", {})
    if cpu and tpu.get("proteins_per_s_resident"):
        serve["vs_baseline_resident"] = round(
            tpu["proteins_per_s_resident"] / cpu, 2)
        serve["vs_baseline_incl_upload"] = round(
            tpu["proteins_per_s_incl_upload"] / cpu, 2)
    with open(BENCH_PATH, "w") as f:
        json.dump(data, f, indent=1)
    log(f"BENCH_1E9.json updated: {list(patch.keys())}")


def tpu_serve(args) -> None:
    import jax
    import jax.numpy as jnp
    from functools import partial

    from scale_1e9 import load_db, shard_plan
    from close_kmers_tpu.core.device_family import (
        DeviceFamilyScorer, rollup_from_fams)
    from close_kmers_tpu.core.device_score import (
        DeviceScorer, _best_call_device, _scan_score)
    from close_kmers_tpu.core.engine import DeviceDB, encode_windows, \
        probe_windows
    from close_kmers_tpu.core.family import (BestCallReduction,
                                             find_best_family_matches_batch)
    from close_kmers_tpu.db.family_db import FamilyData, KmerFamilyMapping
    from close_kmers_tpu.native import api as native
    from close_kmers_tpu.params import EngineParams

    cache_dir = os.path.join(REPO, ".bench_cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    db = load_db(args.db)
    S = args.shards
    h_bounds, row_base = shard_plan(db, S)
    bs = db.bucket_start
    Hmax = int(np.max(h_bounds[1:] - h_bounds[:-1]))
    m = int(np.max(row_base[1:] - row_base[:-1]))
    n_steps = max(1, int(np.ceil(np.log2(db.max_bucket + 1))))

    NB = args.nb
    NQ = NB * B
    rng = np.random.default_rng(1)
    t0 = time.time()
    offsets, lengths = make_queries_big(args.db, NQ, rng)
    L = offsets.shape[1]
    W = L - 8
    NT = NQ * W
    log(f"queries: {NQ:,} x {L} ({NT/1e6:.1f}M windows) "
        f"in {time.time()-t0:.0f}s")

    funcs = [l.rstrip("\n") for l in open(
        os.path.join(args.db, "function.index"))]
    functions = [f.split("\t")[1] if "\t" in f else f for f in funcs]
    n_funcs = max(int(db.fi.max()) + 1, len(functions))
    functions += [f"fn{i}" for i in range(len(functions), n_funcs)]

    params = EngineParams()
    t_all0 = time.time()

    # ---- 1. query upload
    t0 = time.time()
    d_off = jax.device_put(jnp.asarray(offsets))
    d_len = jax.device_put(jnp.asarray(lengths))
    d_off.block_until_ready()
    t_upload_q = time.time() - t0

    # ---- 2. encode + owner partition + device-resident sort
    bounds32 = jnp.asarray(h_bounds.astype(np.int32))

    @jax.jit
    def encode_sort(off, ln, bounds):
        hi, lo, valid = encode_windows(off, ln)
        hif = jnp.where(valid, hi, -1).reshape(-1)
        lof = jnp.where(valid, lo, -2).reshape(-1)
        # compare-sum owner: jnp.searchsorted cliffs past ~64 bounds
        # (69.6 ms/1.2M windows at S=64 — routed_exp --decomp, r5)
        owner = (hif[:, None] >= bounds[None, 1:S]).sum(
            axis=1, dtype=jnp.int32)
        owner = jnp.where(valid.reshape(-1),
                          jnp.clip(owner, 0, S - 1), S)
        iota = jax.lax.iota(jnp.int32, hif.shape[0])
        s_owner, s_hi, s_lo, s_pos = jax.lax.sort(
            (owner, hif, lof, iota), num_keys=1, is_stable=True)
        counts = jnp.searchsorted(
            s_owner, jnp.arange(S + 1, dtype=jnp.int32), side="left")
        return s_hi, s_lo, s_pos, counts

    t0 = time.time()
    s_hi, s_lo, s_pos, d_counts = encode_sort(d_off, d_len, bounds32)
    starts = np.asarray(d_counts)          # [S+1] (sync point)
    t_encode_cold = time.time() - t0
    # the first call pays compile + executable staging through the relay
    # (~2 min, a per-process startup cost like any server warmup); the
    # WARM call is the serving cost
    t0 = time.time()
    s_hi, s_lo, s_pos, d_counts = encode_sort(d_off, d_len, bounds32)
    np.asarray(d_counts)
    t_encode = time.time() - t0
    log(f"encode+sort cold {t_encode_cold:.1f}s, warm {t_encode:.1f}s")
    counts = np.diff(starts)
    C = -(-int(counts.max()) // 1024) * 1024
    log(f"encode+sort {t_encode:.1f}s; windows/shard min {counts.min():,} "
        f"max {counts.max():,} (C={C:,})")

    # ---- 3. shard-serial probe into persistent accumulators
    @partial(jax.jit, donate_argnums=(7, 8, 9))
    def probe_acc(pair, lo_arr, payload, h0, start, shi, slo, fiacc,
                  wtacc, loacc, spos):
        ddb = DeviceDB(pair, lo_arr, payload, n_steps, m)
        hi_s = jax.lax.dynamic_slice(shi, (start,), (C,))
        lo_s = jax.lax.dynamic_slice(slo, (start,), (C,))
        pos_s = jax.lax.dynamic_slice(spos, (start,), (C,))
        hi_loc = hi_s - h0
        in_r = (hi_loc >= 0) & (hi_loc < Hmax) & (hi_s >= 0)
        found, fi, _oi, _av, wt, _idx = probe_windows(
            ddb, jnp.clip(hi_loc, 0, Hmax - 1)[None], lo_s[None],
            in_r[None])
        f = found[0]
        fiacc = fiacc.at[pos_s].add(jnp.where(f, fi[0] + 1, 0))
        wtacc = wtacc.at[pos_s].add(jnp.where(
            f, jax.lax.bitcast_convert_type(wt[0], jnp.int32), 0))
        loacc = loacc.at[pos_s].add(jnp.where(f, lo_s + 1, 0))
        return fiacc, wtacc, loacc

    fiacc = jnp.zeros(NT, jnp.int32)
    wtacc = jnp.zeros(NT, jnp.int32)
    loacc = jnp.zeros(NT, jnp.int32)

    t_table = 0.0
    t0_all = time.time()
    for s in range(S):
        h0, h1 = int(h_bounds[s]), int(h_bounds[s + 1])
        a, b = int(row_base[s]), int(row_base[s + 1])
        cnt = b - a
        t0 = time.time()
        pair = np.zeros((Hmax, 2), dtype=np.int32)
        loc = (bs[h0:h1 + 1] - a).astype(np.int32)
        pair[: h1 - h0, 0] = loc[:-1]
        pair[: h1 - h0, 1] = loc[1:]
        lo_arr = np.full(m + 1, -1, dtype=np.int32)
        lo_arr[:cnt] = db.lo[a:b]
        payload = np.zeros((m + 1, 4), dtype=np.int32)
        payload[:cnt, 0] = db.fi[a:b]
        payload[:cnt, 1] = db.oi[a:b]
        payload[:cnt, 2] = db.avg_off[a:b]
        payload[:cnt, 3] = db.wt[a:b].view(np.int32)
        d_pair = jax.device_put(jnp.asarray(pair))
        d_lo = jax.device_put(jnp.asarray(lo_arr))
        d_pay = jax.device_put(jnp.asarray(payload))
        d_pay.block_until_ready()
        t_table += time.time() - t0
        fiacc, wtacc, loacc = probe_acc(
            d_pair, d_lo, d_pay, jnp.int32(h0), jnp.int32(int(starts[s])),
            s_hi, s_lo, fiacc, wtacc, loacc, s_pos)
        if s % 8 == 7:
            log(f"  shard {s}: tables {t_table:.0f}s, "
                f"wall {time.time()-t0_all:.0f}s, rss {_rss():.1f} GB")
        del d_pair, d_lo, d_pay
    # sync: a scalar readback is the only reliable barrier on this relay
    n_hits_total = int(np.asarray((fiacc > 0).sum()))
    t_sweep = time.time() - t0_all
    t_probe = t_sweep - t_table
    log(f"sweep: {t_sweep:.0f}s (tables {t_table:.0f}s, probe+dispatch "
        f"{t_probe:.0f}s), {n_hits_total:,} hits")

    # ---- 4. fused per-batch scoring + family rollup
    # the global rollup pack is a FIXED-size D2H buffer: 16*B
    # over-provisioning shipped 3.1 MB/batch over a 5-9 MB/s wire for
    # ~4-6 true groups/protein; 8*B halves it with ample margin
    GCAP = 8 * B

    @jax.jit
    def score_final(fib, wtb, lob):
        fi2 = fib.reshape(B, W)
        found = fi2 > 0
        fi = jnp.where(found, fi2 - 1, 0)
        wt = jax.lax.bitcast_convert_type(wtb.reshape(B, W), jnp.float32)
        av = jnp.zeros_like(fi)
        emit, (cs, ce, cc, cf, cw) = _scan_score(
            found, fi, av, wt, params.min_hits, params.min_weighted_hits,
            params.max_gap, params.order_constraint)
        (nf, fi0, c0, w0, fi1, c1, w1, v2c, ovf) = _best_call_device(
            emit, cc, cf, cw)
        bc = jax.lax.bitcast_convert_type
        best = jnp.stack([nf, fi0, c0, bc(w0, jnp.int32), fi1, c1,
                          bc(w1, jnp.int32), v2c,
                          ovf.astype(jnp.int32)], axis=1)
        # synthetic 1e9 family universe, derived on device: degree
        # deg = 1 + lo % 3, fams = fi*3 + j (j < deg)
        lo2 = lob.reshape(B, W) - 1
        deg = 1 + jnp.where(found, lo2 % 3, -1)
        j3 = jnp.arange(3, dtype=jnp.int32)[None, None, :]
        fams = jnp.where((j3 < deg[..., None]) & found[..., None],
                         fi[..., None] * 3 + j3, -1)
        pack = rollup_from_fams(fams, -GCAP)
        return best, pack

    fiacc2 = fiacc.reshape(NB, B * W)
    wtacc2 = wtacc.reshape(NB, B * W)
    loacc2 = loacc.reshape(NB, B * W)
    t_scores = []
    host_bufs = []
    for b in range(NB):
        t0 = time.time()
        o = score_final(fiacc2[b], wtacc2[b], loacc2[b])
        host_bufs.append((np.asarray(o[0]), np.asarray(o[1])))
        t_scores.append(time.time() - t0)
    # first call pays compile+staging; charge it at the warm mean
    warm = t_scores[1:] or t_scores
    t_score = float(np.sum(warm) + np.mean(warm))
    log(f"scoring+family packs: cold {t_scores[0]:.1f}s + warm "
        f"{np.sum(warm):.1f}s -> charged {t_score:.1f}s")

    # ---- 5. host finish (best-call decision + family best-match scan)
    mapping = KmerFamilyMapping()
    mapping.families = [
        FamilyData(f"PGF_{f:08d}", f"PLF_{f % 5}_{f:08d}", f % 5,
                   functions[f // 3] if f // 3 < len(functions)
                   else f"fn{f//3}", f, 10, 10)
        for f in range(3 * n_funcs)]
    fold_rows = (W * 3 + 1) < (1 << 15)
    t0 = time.time()
    n_called = n_placed = 0
    sample_best = None
    for bi, (best_np, pack_np) in enumerate(host_bufs):
        red = BestCallReduction(
            best_np[:, 0],
            np.stack([best_np[:, 1], best_np[:, 4],
                      np.zeros(B, np.int32)], 1),
            np.stack([best_np[:, 2], best_np[:, 5], best_np[:, 7]], 1),
            np.stack([best_np[:, 3].view(np.float32),
                      best_np[:, 6].view(np.float32),
                      np.zeros(B, np.float32)], 1),
            functions)
        roll = DeviceFamilyScorer.finish_rollup_global(
            pack_np, B, GCAP, folded=fold_rows)
        assert roll is not None, "rollup gcap overflow"
        n_per, fam, cnts, wts, first = roll
        ms = find_best_family_matches_batch(
            red, n_per, fam, cnts, wts, first, mapping,
            genus_filter=False)
        n_called += sum(1 for r in (red.best_call(i) for i in range(B))
                        if r.function) if bi == 0 else 0
        n_placed += sum(1 for m_ in ms if m_.gfam_id)
        if bi == 0:
            sample_best = [red.best_call(i) for i in range(256)]
    t_host = time.time() - t0
    t_total = time.time() - t_all0
    log(f"host finish: {t_host:.1f}s; {n_placed:,} placed")

    # ---- 6. parity gates vs the full 971M arrays
    t0 = time.time()
    sample = slice(0, 256)
    from scale_1e9 import _encode_host
    hi_q, lo_q, valid = (np.asarray(x) for x in _encode_host(
        offsets[sample], lengths[sample]))
    codes = hi_q.astype(np.int64) * 8000 + lo_q
    pos = np.searchsorted(db.keys, codes.reshape(-1)).reshape(codes.shape)
    pos_c = np.minimum(pos, len(db.keys) - 1)
    exp_found = valid & (db.keys[pos_c] == codes)
    fi_chk = np.asarray(fiacc[: 256 * W]).reshape(256, W)
    assert np.array_equal(fi_chk > 0, exp_found), "found-plane mismatch"
    assert np.array_equal(fi_chk[exp_found] - 1,
                          db.fi[pos_c[exp_found]]), "fi mismatch"
    # native oracle best-call on the sample
    rows, cols = np.nonzero(exp_found)
    row_off = np.zeros(257, dtype=np.int64)
    np.cumsum(np.bincount(rows, minlength=256), out=row_off[1:])
    pc = pos_c[exp_found]
    ncal, cs, ce, cc2, cf2, cw2, _ = native.score_batch(
        cols.astype(np.int32), db.fi[pc], db.oi[pc], db.avg_off[pc],
        db.wt[pc], row_off, params)
    nfh, ofih, ocnth, owth = native.best_call_batch(
        ncal, cs, ce, cc2, cf2, cw2)
    from close_kmers_tpu.core.engine import finish_best_call
    fn_of = lambda i: (functions[i] if 0 <= i < len(functions)
                       else "INVALID_OFFSET")
    for i in range(256):
        want = finish_best_call(int(nfh[i]), ofih[i], ocnth[i], owth[i],
                                fn_of)
        got = sample_best[i]
        assert (want.function, want.score, want.weighted_score) == \
            (got.function, got.score, got.weighted_score), \
            f"best-call mismatch at {i}: {want} vs {got}"
    log(f"parity: 256-protein sample exact (planes + best-call) "
        f"in {time.time()-t0:.0f}s")

    resident = t_encode + t_probe + t_score + t_host
    fam_resident = t_encode + t_probe + t_score + t_host  # family incl
    _update_bench(dict(tpu=dict(
        n_queries=NQ, windows=NT, n_shards=S, layout="binary (uniform)",
        t_query_upload=round(t_upload_q, 1),
        t_encode_sort=round(t_encode, 1),
        t_program_staging=round(t_encode_cold - t_encode, 1),
        t_tables_upload=round(t_table, 1),
        t_probe_dispatch=round(t_probe, 1),
        t_score=round(t_score, 1), t_host_finish=round(t_host, 1),
        t_total=round(t_total, 1),
        proteins_per_s_incl_upload=round(NQ / t_total, 1),
        proteins_per_s_resident=round(NQ / resident, 1),
        family_proteins_per_s_resident=round(NQ / fam_resident, 1),
        n_hits=n_hits_total, n_placed=int(n_placed),
        parity="256-protein sample exact vs searchsorted + native oracle",
    )))
    log(f"SERVE 971M: {NQ/t_total:.0f} proteins/s incl upload, "
        f"{NQ/resident:.0f} proteins/s resident "
        f"(encode {t_encode:.1f} probe {t_probe:.1f} score {t_score:.1f} "
        f"host {t_host:.1f})")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default="/root/scale1e9")
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--nb", type=int, default=8)
    ap.add_argument("--n-cpu", type=int, default=8192)
    ap.add_argument("--cpu-baseline", action="store_true")
    args = ap.parse_args()
    if args.cpu_baseline:
        cpu_baseline(args)
    else:
        tpu_serve(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
