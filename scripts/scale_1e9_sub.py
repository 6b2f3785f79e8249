"""Deep-bucket SUB layout perf on the deepest 1e9 shard (follow-up to
scale_1e9.py, which timed the lo_wide layout: its 9.2 KB rows at
max_bucket 2219 cost ~60 ms/batch).  The sub-bucket layout splits every
hi bucket into 16 lo-range blocks so the probe gathers a header row and
one payload-wide-format block — 2 gather ops regardless of bucket depth
(engine.DeviceDB sub tier; cf. the reference's flat hash which is depth-
insensitive by construction, kguts.cc:585-602).

Rebases the shard to a local hi window (SignatureDB n_hi=...) so the
header/blocks scale with the shard, not global HI_CARD.  Updates
BENCH_1E9.json in place with a "sub_perf" entry.

Usage: python scripts/scale_1e9_sub.py [--db /root/scale1e9] [--batch 2048]
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

from scale_1e9 import load_db, make_queries, shard_plan, _encode_host  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default="/root/scale1e9")
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from close_kmers_tpu.core.engine import (DeviceDB, encode_windows,
                                             probe_windows)
    from close_kmers_tpu.db.signature_db import SignatureDB
    from close_kmers_tpu.params import LO_CARD

    cache_dir = os.path.join(REPO, ".bench_cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    db = load_db(args.db)
    rng = np.random.default_rng(1)
    offsets, lengths = make_queries(args.db, args.batch, rng)
    S = args.shards
    h_bounds, row_base = shard_plan(db, S)
    bs = db.bucket_start
    deep = int(np.argmax([int((bs[h0 + 1:h1 + 1] - bs[h0:h1]).max())
                          for h0, h1 in zip(h_bounds[:-1], h_bounds[1:])]))
    h0, h1 = int(h_bounds[deep]), int(h_bounds[deep + 1])
    a, b = int(row_base[deep]), int(row_base[deep + 1])
    max_b = int((bs[h0 + 1:h1 + 1] - bs[h0:h1]).max())
    log(f"deepest shard {deep}: keys {b-a:,}, hi span {h1-h0:,}, "
        f"max bucket {max_b}")

    t0 = time.time()
    sdb = SignatureDB(db.keys[a:b] - h0 * LO_CARD, db.fi[a:b], db.oi[a:b],
                      db.avg_off[a:b], db.wt[a:b], n_hi=h1 - h0)
    ddb = DeviceDB.from_db(sdb, wide=False, fused=False, wide_lo=False,
                           sub=True)
    assert ddb.sub_blocks is not None, \
        f"sub layout gated off (max_sub too deep for SUB_BUCKET_MAX?)"
    t_build = time.time() - t0
    hdr_b = ddb.sub_header.size * 4
    blk_b = ddb.sub_blocks.size * 4
    log(f"sub layout: header {hdr_b/2**20:.0f} MB + blocks "
        f"{blk_b/2**30:.2f} GB, sub_w {ddb.sub_w}, built+uploaded in "
        f"{t_build:.0f}s")

    d_off = jax.device_put(jnp.asarray(offsets))
    d_len = jax.device_put(jnp.asarray(lengths))
    d_h0 = jnp.int32(h0)
    Hspan = h1 - h0

    def step(c, sh_t, sb_t, pay_t, h0_t, off, ln):
        ddb2 = DeviceDB(sh_t[:0, :2], pay_t[:1, 0], pay_t, ddb.n_steps,
                        ddb.n, sub_header=sh_t, sub_blocks=sb_t,
                        sub_w=ddb.sub_w)
        hi, lo, valid = encode_windows(off, ln)
        hi_loc = hi - h0_t
        in_r = (hi_loc >= 0) & (hi_loc < Hspan)
        found, fi, oi, av, wt, _ = probe_windows(
            ddb2, jnp.clip(hi_loc, 0, Hspan - 1), lo, valid & in_r)
        return (c + found.sum().astype(jnp.float32)
                + fi.sum().astype(jnp.float32) + wt.sum())

    jstep = jax.jit(step)
    pay = ddb.payload

    def run(k):
        c = jnp.float32(0)
        t1 = time.time()
        for _ in range(k):
            c = jstep(c, ddb.sub_header, ddb.sub_blocks, pay, d_h0,
                      d_off, d_len)
        float(np.asarray(c))
        return time.time() - t1

    run(2)
    t_lo_r, t_hi_r = run(3), run(9)
    per = (t_hi_r - t_lo_r) / 6
    B, L = offsets.shape
    W = L - 8
    log(f"sub probe: {per*1e3:.1f} ms/batch ({B*W/per/1e6:.1f}M windows/s)")

    # correctness vs host searchsorted on the shard's key range
    hi_q, lo_q, valid = _encode_host(offsets, lengths)
    hi32 = hi_q.astype(np.int32)
    v_in = valid & (hi32 >= h0) & (hi32 < h1)
    found, fi, oi, av, wt, _ = probe_windows(
        DeviceDB(ddb.sub_header[:0, :2], pay[:1, 0], pay, ddb.n_steps,
                 ddb.n, sub_header=ddb.sub_header, sub_blocks=ddb.sub_blocks,
                 sub_w=ddb.sub_w),
        jnp.asarray(np.clip(hi32 - h0, 0, Hspan - 1)),
        jnp.asarray(lo_q.astype(np.int32)), jnp.asarray(v_in))
    codes = hi_q.astype(np.int64) * LO_CARD + lo_q
    in_r = valid & (hi_q >= h0) & (hi_q < h1)
    pos = np.minimum(np.searchsorted(db.keys, codes.reshape(-1)),
                     len(db.keys) - 1).reshape(codes.shape)
    exp = in_r & (db.keys[pos] == codes)
    assert np.array_equal(np.asarray(found), exp), "sub found mismatch"
    e = exp
    assert np.array_equal(np.asarray(fi)[e], db.fi[pos[e]])
    assert np.array_equal(np.asarray(wt)[e], db.wt[pos[e]])
    log(f"sub layout exact on shard range: {int(e.sum()):,} hits")

    out_path = os.path.join(REPO, "BENCH_1E9.json")
    with open(out_path) as f:
        bench = json.load(f)
    bench["sub_perf"] = {
        "shard": deep, "keys": b - a, "max_bucket": max_b,
        "sub_w": ddb.sub_w,
        "header_bytes": int(hdr_b), "blocks_bytes": int(blk_b),
        "probe_ms_per_batch": round(per * 1e3, 1),
        "windows_per_s": int(B * W / per),
        "correctness": f"exact vs host searchsorted, {int(e.sum())} hits",
    }
    with open(out_path, "w") as f:
        json.dump(bench, f, indent=1)
    print(json.dumps(bench["sub_perf"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
