"""Serve the 1e9-key signature DB, range-sharded, from the single real
chip — the round-3 PATRIC-scale demo (BASELINE config 5 analogue).

Phases (all against the DB built by make_scale_db.py --aa-bias):

1. shard plan — S bucket-aligned hi ranges (parallel.sharding bounds);
   emits the per-shard HBM memory table proving every shard's serving
   layout fits a v5e's HBM with room for batches.
2. correctness sweep — probes a query batch against EVERY shard
   shard-serially on the real chip (uniform-shape jit, one compile),
   merges the per-shard results on host exactly like the sharded psum
   (each key lives in one shard), and verifies EVERY window against a
   direct numpy searchsorted of the full 1e9 arrays, plus a host-oracle
   byte-parity gate on a protein sample.
3. perf — the lo_wide serving layout on representative shards
   (shallow/median/deep), probe timed with the chained scalar-readback
   method (the relay invalidates naive timing).

Writes BENCH_1E9.json at the repo root.

The cross-shard merge is ALSO validated through the real shard_map+psum
path on the virtual 8-device CPU mesh with --virtual-mesh (separate
invocation: platforms can't mix in one process).

Usage:
    python scripts/scale_1e9.py --db /root/scale1e9 [--shards 64]
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scale_1e9.py --db /root/scale1e9 --virtual-mesh
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

HBM_BYTES = 16 << 30   # v5e


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_db(db_dir: str):
    from close_kmers_tpu.db.signature_db import SignatureDB
    t0 = time.time()
    z = np.load(os.path.join(db_dir, "scale_db.npz"))
    db = SignatureDB(z["keys"], z["fi"], z["oi"], z["avg_off"], z["wt"])
    log(f"DB loaded: {len(db):,} keys, max bucket {db.max_bucket}, "
        f"{time.time()-t0:.0f}s, rss {_rss():.1f} GB")
    return db


def _rss() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def make_queries(db_dir: str, n: int, rng):
    """Real corpus proteins + mutated/truncated variants."""
    from close_kmers_tpu.io.fasta import parse_fasta_file
    from close_kmers_tpu.ops.encoder import seq_to_offsets
    seqs = []
    for sid, _d, seq in parse_fasta_file(
            os.path.join(db_dir, "corpus", "genome0.fa")):
        if sid:
            seqs.append(seq)
        if len(seqs) >= n:
            break
    assert len(seqs) == n, f"corpus too small: {len(seqs)}"
    ALPHA = "ACDEFGHIKLMNPQRSTVWY"
    out = []
    for i, s in enumerate(seqs):
        if i % 4 == 1:      # point mutations
            b = list(s)
            for _ in range(6):
                b[int(rng.integers(0, len(b)))] = \
                    ALPHA[int(rng.integers(0, 20))]
            s = "".join(b)
        elif i % 4 == 2:    # truncation
            s = s[: int(rng.integers(20, len(s)))]
        out.append(s)
    L = -(-(max(len(s) for s in out) + 1) // 8) * 8
    offsets = np.full((n, L), 20, dtype=np.uint8)
    lengths = np.zeros(n, dtype=np.int32)
    for i, s in enumerate(out):
        o = seq_to_offsets(s)
        offsets[i, : len(o)] = o
        lengths[i] = len(o)
    return offsets, lengths


def shard_plan(db, S: int):
    from close_kmers_tpu.parallel.sharding import _hi_range_bounds
    h_bounds = _hi_range_bounds(db, S)
    row_base = db.bucket_start[h_bounds].astype(np.int64)
    return h_bounds, row_base


def shard_stats(db, h_bounds, row_base, S):
    """Per-shard memory table for the lo_wide serving layout."""
    from close_kmers_tpu.core.engine import _lane_pad
    stats = []
    bs = db.bucket_start
    for s in range(S):
        h0, h1 = int(h_bounds[s]), int(h_bounds[s + 1])
        a, b = int(row_base[s]), int(row_base[s + 1])
        counts = bs[h0 + 1:h1 + 1] - bs[h0:h1]
        max_b = int(counts.max()) if h1 > h0 else 0
        row_w = _lane_pad(1 + max_b)
        lo_wide_b = (h1 - h0) * row_w * 4
        payload_b = (b - a + 1) * 16
        stats.append(dict(shard=s, keys=b - a, hi_span=h1 - h0,
                          max_bucket=max_b,
                          lo_wide_bytes=lo_wide_b,
                          payload_bytes=payload_b,
                          total_bytes=lo_wide_b + payload_b))
    return stats


# ---------------------------------------------------------------------------
# Real-chip shard-serial probing
# ---------------------------------------------------------------------------

def probe_all_shards(db, h_bounds, row_base, S, offsets, lengths,
                     perf_shards=3):
    """Correctness sweep (binary layout, uniform shapes, one compile) +
    perf timing on representative shards (lo_wide layout)."""
    import jax
    import jax.numpy as jnp
    from close_kmers_tpu.core.engine import (DeviceDB, _lane_pad,
                                             encode_windows, probe_windows)

    B, L = offsets.shape
    W = L - 8
    Hmax = int(np.max(h_bounds[1:] - h_bounds[:-1]))
    m = int(np.max(row_base[1:] - row_base[:-1]))
    n_steps = max(1, int(np.ceil(np.log2(db.max_bucket + 1))))
    log(f"uniform shard shapes: Hmax={Hmax:,} m={m:,} n_steps={n_steps}")

    d_off = jax.device_put(jnp.asarray(offsets))
    d_len = jax.device_put(jnp.asarray(lengths))

    @jax.jit
    def probe_shard(pair, lo_arr, payload, h0, off, ln):
        ddb = DeviceDB(pair, lo_arr, payload, n_steps, m)
        hi, lo, valid = encode_windows(off, ln)
        hi_loc = hi - h0
        in_r = (hi_loc >= 0) & (hi_loc < Hmax)
        found, fi, oi, av, wt, _ = probe_windows(
            ddb, jnp.clip(hi_loc, 0, Hmax - 1), lo, valid & in_r)
        return found, fi, oi, av, wt

    # merged accumulators (host-side psum analogue)
    M_found = np.zeros((B, W), dtype=bool)
    M_fi = np.full((B, W), -1, dtype=np.int32)
    M_oi = np.full((B, W), -1, dtype=np.int32)
    M_av = np.zeros((B, W), dtype=np.int32)
    M_wt = np.zeros((B, W), dtype=np.float32)

    bs = db.bucket_start
    t_all = time.time()
    t_upload = t_probe = 0.0
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
        t_upload += time.time() - t0

        t0 = time.time()
        found, fi, oi, av, wt = probe_shard(d_pair, d_lo, d_pay,
                                            jnp.int32(h0), d_off, d_len)
        fnd = np.asarray(found)
        t_probe += time.time() - t0
        M_found |= fnd
        for M, arr in ((M_fi, fi), (M_oi, oi), (M_av, av), (M_wt, wt)):
            M[fnd] = np.asarray(arr)[fnd]
        del d_pair, d_lo, d_pay
        if (s + 1) % 8 == 0:
            log(f"  shard {s + 1}/{S}: cum upload {t_upload:.0f}s "
                f"probe {t_probe:.0f}s, merged hits {int(M_found.sum()):,}")
    t_total = time.time() - t_all
    log(f"shard-serial sweep: {S} shards in {t_total:.0f}s "
        f"(upload {t_upload:.0f}s, probe+readback {t_probe:.0f}s)")

    # full-batch exact verification vs direct searchsorted on the host
    t0 = time.time()
    hi_q, lo_q, valid = (np.asarray(x) for x in _encode_host(offsets,
                                                             lengths))
    codes = hi_q.astype(np.int64) * 8000 + lo_q
    pos = np.searchsorted(db.keys, codes.reshape(-1)).reshape(codes.shape)
    pos_c = np.minimum(pos, len(db.keys) - 1)
    exp_found = valid & (db.keys[pos_c] == codes)
    assert np.array_equal(M_found, exp_found), "found plane mismatch"
    pc = pos_c[exp_found]
    assert np.array_equal(M_fi[exp_found], db.fi[pc]), "fi mismatch"
    assert np.array_equal(M_oi[exp_found], db.oi[pc]), "oi mismatch"
    assert np.array_equal(M_av[exp_found], db.avg_off[pc]), "avg mismatch"
    assert np.array_equal(M_wt[exp_found], db.wt[pc]), "wt mismatch"
    log(f"merged-vs-searchsorted: ALL {exp_found.size:,} windows exact "
        f"({int(exp_found.sum()):,} hits), verified in {time.time()-t0:.0f}s")

    # perf: representative shards with the lo_wide serving layout
    order = np.argsort([int((bs[h0 + 1:h1 + 1] - bs[h0:h1]).max())
                        for h0, h1 in zip(h_bounds[:-1], h_bounds[1:])])
    reps = [int(order[0]), int(order[S // 2]), int(order[-1])][:perf_shards]
    max_b_all = int(db.max_bucket)
    row_w = _lane_pad(1 + max_b_all)
    perf = []
    for s in reps:
        h0, h1 = int(h_bounds[s]), int(h_bounds[s + 1])
        a, b = int(row_base[s]), int(row_base[s + 1])
        t0 = time.time()
        lw = np.full((Hmax, row_w), 2 ** 30, dtype=np.int32)
        starts_l = (bs[h0:h1] - a).astype(np.int64)
        lw[: h1 - h0, 0] = starts_l
        rank = np.arange(b - a, dtype=np.int64) \
            - (bs[db.hi[a:b]].astype(np.int64) - a)
        # vectorized row/col scatter (flat)
        flat = (db.hi[a:b].astype(np.int64) - h0) * row_w + 1 + rank
        lwf = lw.reshape(-1)
        lwf[flat] = db.lo[a:b]
        cnt = b - a
        payload = np.zeros((m + 1, 4), dtype=np.int32)
        payload[:cnt, 0] = db.fi[a:b]
        payload[:cnt, 1] = db.oi[a:b]
        payload[:cnt, 2] = db.avg_off[a:b]
        payload[:cnt, 3] = db.wt[a:b].view(np.int32)
        d_lw = jax.device_put(jnp.asarray(lw))
        d_pay = jax.device_put(jnp.asarray(payload))
        t_up = time.time() - t0

        def step(c, lw_t, pay_t, h0_t, off, ln):
            ddb = DeviceDB(lw_t[:0, :2], pay_t[:1, 0], pay_t, n_steps, m,
                           lo_wide=lw_t)
            hi, lo, valid2 = encode_windows(off, ln)
            hi_loc = hi - h0_t
            in_r = (hi_loc >= 0) & (hi_loc < Hmax)
            found, fi, oi, av, wt, _ = probe_windows(
                ddb, jnp.clip(hi_loc, 0, Hmax - 1), lo, valid2 & in_r)
            return (c + found.sum().astype(jnp.float32)
                    + fi.sum().astype(jnp.float32) + wt.sum())

        if not hasattr(probe_all_shards, "_jstep"):
            probe_all_shards._jstep = jax.jit(step)
        jstep = probe_all_shards._jstep
        d_h0 = jnp.int32(h0)

        def run(k):
            c = jnp.float32(0)
            t1 = time.time()
            for _ in range(k):
                c = jstep(c, d_lw, d_pay, d_h0, d_off, d_len)
            float(np.asarray(c))
            return time.time() - t1

        run(2)
        t_lo_r, t_hi_r = run(3), run(9)
        per = (t_hi_r - t_lo_r) / 6
        max_b_shard = int((bs[h0 + 1:h1 + 1] - bs[h0:h1]).max())
        perf.append(dict(shard=s, keys=b - a, max_bucket=max_b_shard,
                         upload_s=round(t_up, 1),
                         probe_ms_per_batch=round(per * 1e3, 1),
                         windows_per_s=int(B * W / per)))
        log(f"perf shard {s}: max_bucket {max_b_shard}, "
            f"{per*1e3:.1f} ms/batch lo_wide probe "
            f"({B*W/per/1e6:.0f}M windows/s)")
        del d_lw, d_pay
    return dict(sweep_s=round(t_total, 1), upload_s=round(t_upload, 1),
                probe_s=round(t_probe, 1),
                merged_hits=int(M_found.sum()),
                n_windows=int(exp_found.size), perf=perf)


def _encode_host(offsets, lengths):
    """Host window encode (numpy; mirrors engine.encode_windows)."""
    B, L = offsets.shape
    W = L - 8
    o32 = offsets.astype(np.int64)
    hi = np.zeros((B, W), dtype=np.int64)
    lo = np.zeros((B, W), dtype=np.int64)
    ok = np.ones((B, W), dtype=bool)
    for j in range(5):
        hi = hi * 20 + o32[:, j:j + W]
        ok &= offsets[:, j:j + W] < 20
    for j in range(5, 8):
        lo = lo * 20 + o32[:, j:j + W]
        ok &= offsets[:, j:j + W] < 20
    pos = np.arange(W)[None, :]
    ok &= pos < (lengths[:, None] - 8)
    return hi, lo, ok


def run_virtual_mesh(db_dir: str, args) -> None:
    """Cross-shard merge through the REAL shard_map+psum path on the
    virtual 8-device CPU mesh, over the full 1e9-key ShardedDB."""
    import jax
    from close_kmers_tpu.parallel.sharding import (ShardedDB, make_mesh,
                                                   probe_sharded)
    assert jax.default_backend() == "cpu", "run with JAX_PLATFORMS=cpu"
    assert len(jax.devices()) >= 8, "need xla_force_host_platform_device_count=8"
    db = load_db(db_dir)
    rng = np.random.default_rng(7)
    offsets, lengths = make_queries(db_dir, 64, rng)
    t0 = time.time()
    mesh = make_mesh(n_data=1, n_table=8)
    sdb = ShardedDB.from_db(db, mesh)
    log(f"virtual ShardedDB built in {time.time()-t0:.0f}s, "
        f"rss {_rss():.1f} GB, layout="
        f"{'sub' if sdb.sub_blocks is not None else 'wide' if sdb.payload_wide is not None else 'binary'}")
    t0 = time.time()
    found, fi, oi, av, wt, hi, lo = (np.asarray(x) for x in probe_sharded(
        sdb, offsets, lengths))
    log(f"virtual-mesh probe in {time.time()-t0:.0f}s")
    hi_q, lo_q, valid = _encode_host(offsets, lengths)
    codes = hi_q * 8000 + lo_q
    pos = np.minimum(np.searchsorted(db.keys, codes.reshape(-1)),
                     len(db.keys) - 1).reshape(codes.shape)
    exp_found = valid & (db.keys[pos] == codes)
    assert np.array_equal(found > 0, exp_found), "virtual found mismatch"
    e = exp_found
    assert np.array_equal(fi[e], db.fi[pos[e]])
    assert np.array_equal(wt[e], db.wt[pos[e]])
    print(json.dumps({"virtual_mesh_1e9": "ok",
                      "n_windows": int(e.size),
                      "n_hits": int(e.sum())}))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default="/root/scale1e9")
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--virtual-mesh", action="store_true")
    args = ap.parse_args()

    if args.virtual_mesh:
        run_virtual_mesh(args.db, args)
        return 0

    import jax
    cache_dir = os.path.join(REPO, ".bench_cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    db = load_db(args.db)
    rng = np.random.default_rng(1)
    offsets, lengths = make_queries(args.db, args.batch, rng)
    S = args.shards
    h_bounds, row_base = shard_plan(db, S)
    stats = shard_stats(db, h_bounds, row_base, S)
    worst = max(s["total_bytes"] for s in stats)
    log(f"memory table: worst shard {worst/2**30:.2f} GB of "
        f"{HBM_BYTES/2**30:.0f} GB HBM; "
        f"median {np.median([s['total_bytes'] for s in stats])/2**30:.2f} GB")
    assert worst < HBM_BYTES * 0.75

    res = probe_all_shards(db, h_bounds, row_base, S, offsets, lengths)

    best = max(p["windows_per_s"] for p in res["perf"])
    worst_perf = min(p["windows_per_s"] for p in res["perf"])
    out = {
        "metric": "sharded_1e9_probe_windows_per_s_per_chip",
        "value": worst_perf,
        "unit": "windows/s (deepest shard, lo_wide layout)",
        "n_kmers": int(len(db)),
        "n_shards": S,
        "max_bucket": int(db.max_bucket),
        "batch_windows": res["n_windows"],
        "correctness": "all windows exact vs host searchsorted",
        "merged_hits": res["merged_hits"],
        "sweep": {k: res[k] for k in ("sweep_s", "upload_s", "probe_s")},
        "per_shard_hbm_bytes": {
            "worst": worst,
            "median": int(np.median([s["total_bytes"] for s in stats])),
        },
        "perf_shards": res["perf"],
    }
    with open(os.path.join(REPO, "BENCH_1E9.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
