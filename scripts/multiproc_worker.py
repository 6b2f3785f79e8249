"""Worker for the multi-process jax.distributed test/bench.

Each process brings up jax.distributed on the CPU backend with N virtual
local devices, joins the global ("data", "table") mesh, builds the SAME
deterministic signature DB + batch, runs the sharded annotate step, and
verifies its own addressable output shards against the single-chip
engine's full-batch reference computed locally.  Exit 0 = parity.

Invoked by tests/test_multiprocess.py and scripts/scaling_bench.py:
    python scripts/multiproc_worker.py <pid> <nproc> <port> [--bench]
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    bench = "--bench" in sys.argv
    local_devices = int(os.environ.get("MP_LOCAL_DEVICES", "4"))
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}")

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from close_kmers_tpu.core.engine import FastAnnotator
    from close_kmers_tpu.db.signature_db import SignatureDB
    from close_kmers_tpu.ops import encoder as E
    from close_kmers_tpu.parallel.multihost import (addressable_rows,
                                                    replicate_to_global)
    from close_kmers_tpu.parallel.sharding import (ShardedDB, make_mesh,
                                                   probe_sharded)
    from close_kmers_tpu.params import LO_CARD

    assert jax.process_count() == nproc, jax.process_count()
    n_global = nproc * local_devices

    # deterministic DB + queries (identical in every process)
    rng = np.random.default_rng(42)
    n = 30_000
    his = rng.integers(0, 3_200_000, size=n, dtype=np.int64)
    keys = np.unique(his * LO_CARD
                     + rng.integers(0, LO_CARD, size=n, dtype=np.int64))
    db = SignatureDB(
        keys,
        rng.integers(0, 50, size=len(keys)).astype(np.int32),
        rng.integers(-1, 9, size=len(keys)).astype(np.int32),
        rng.integers(0, 300, size=len(keys)).astype(np.int32),
        rng.uniform(0.1, 4.0, size=len(keys)).astype(np.float32),
    )
    B, L = 64, 128
    seqs = []
    for i in range(B):
        frags = [E.decode_kmer(int(keys[rng.integers(0, len(keys))]))
                 for _ in range(rng.integers(1, 12))]
        seqs.append("".join(frags)[:L - 9])

    mesh = make_mesh(n_data=2, n_table=n_global // 2)
    sdb = ShardedDB.from_db(db, mesh)
    fa = FastAnnotator(db)
    offsets, lengths = fa.pad_batch(seqs, pad_to=L)
    g_off, g_len = replicate_to_global(mesh, offsets,
                                       lengths.astype(np.int32))

    t0 = time.time()
    found, fi, oi, av, wt, hi, lo = probe_sharded(sdb, g_off, g_len)
    jax.block_until_ready(found)
    dt = time.time() - t0

    # single-chip reference on the full batch, computed locally
    from close_kmers_tpu.core.engine import TpuEngine
    rfound, rfi, roi, rav, rwt = TpuEngine(db).probe_padded(offsets, lengths)

    n_checked = 0
    # sharded miss fi/oi are 0-masked by the psum merge; the single-chip
    # path reports -1 (miss masking happens in the consumer)
    for arr, exp in ((found, rfound.astype(np.int32)),
                     (fi, np.where(rfound, rfi, 0)),
                     (oi, np.where(rfound, roi, 0)), (av, rav), (wt, rwt)):
        for idx, data in addressable_rows(arr):
            assert np.array_equal(data, exp[idx]), \
                f"proc {pid}: shard {idx} mismatch"
            n_checked += 1

    if bench:
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            out = probe_sharded(sdb, g_off, g_len)
        jax.block_until_ready(out[0])
        per = (time.time() - t0) / reps
        print(f"proc {pid}: {B / per:.0f} seqs/s/process "
              f"({per * 1e3:.1f} ms/step)", flush=True)

    print(f"proc {pid}: OK ({n_checked} shards checked, first step "
          f"{dt:.1f}s, {jax.process_count()} procs x {local_devices} "
          f"local devices)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
