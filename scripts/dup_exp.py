"""Probe-count reduction study (VERDICT r3 #4): measure duplicate-window
rates on the real workloads, then apply the roofline arithmetic to
decide whether sort-dedup-before-gather can ever pay on this chip.

The arithmetic (PERF.md round-3 roofline): the XLA row gather is
issue-bound at ~4.8 ns/row INDEPENDENT of row width — and reconstructing
the full window grid from U unique results needs one more per-window
gather at exactly that rate.  So dedup replaces

    probe_all:   Nw * g            (g = per-row gather cost)
with
    dedup:       sort(Nw) + U * g + Nw * g   (scatter-back gather)

which is a NET LOSS at any duplicate rate for the narrow/1-gather
layouts (the scatter-back alone costs the original probe).  It can only
pay for BYTE-BOUND rows (deep-bucket tiers whose rows are KBs, e.g. the
208M fused rows at 25.6 ms vs the 11.9 ms narrow floor): there

    pays iff dup_frac * (g_wide - g_narrow) > sort_cost/Nw

i.e. dup_frac > ~30% at the measured 208M-layout numbers.  This script
measures dup_frac per workload so PERF.md can carry the verdict with
data.

Usage: python scripts/dup_exp.py        (CPU-only, no TPU needed)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("CLOSE_KMERS_JAX_PLATFORM", "cpu")

import bench  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def dup_stats(offsets, lengths, label):
    """Windows = valid 8-mers of the padded batch; dup rate = 1 - U/N."""
    B, L = offsets.shape
    W = L - 8
    o = offsets.astype(np.int64)
    code = np.zeros((B, W), dtype=np.int64)
    ok = np.ones((B, W), dtype=bool)
    for j in range(8):
        code = code * 20 + o[:, j:j + W]
        ok &= offsets[:, j:j + W] < 20
    ok &= np.arange(W)[None, :] < (lengths[:, None] - 8)
    codes = code[ok]
    n = len(codes)
    u = len(np.unique(codes))
    log(f"{label}: {n:,} windows, {u:,} unique, dup {1 - u / max(1, n):.1%}")
    return dict(label=label, windows=int(n), unique=int(u),
                dup_frac=round(1 - u / max(1, n), 4))


def main() -> int:
    rng = np.random.default_rng(0)
    db, offsets, lengths = bench.build_corpus(rng)
    out = []

    # 1. serving batches (the /query bench workload: corpus slices)
    out.append(dup_stats(offsets[:8192], lengths[:8192], "serving B=8192"))
    out.append(dup_stats(offsets[:65536], lengths[:65536],
                         "serving B=65536"))

    # 2. NR preload analogue: the DB's OWN source proteins (families.nr
    #    re-annotation scans the training corpus — nr_loader.cc:160-183)
    z = np.load(os.path.join(bench.CACHE,
                             f"corpus_{bench.N_SRC}x{bench.PROT_LEN}.npz"))
    src = z["off"][:8192]
    src_off = np.full((8192, bench.PROT_LEN + 8), 20, np.uint8)
    src_off[:, :bench.PROT_LEN] = src
    src_len = np.full(8192, bench.PROT_LEN, np.int32)
    out.append(dup_stats(src_off, src_len, "NR preload B=8192"))

    # 3. genome 6-frame windows
    from dna_bench import synth_genome
    from close_kmers_tpu.ops.translate import six_frame_kguts_offsets
    genome = synth_genome(rng, offsets[:, :bench.PROT_LEN], int(2e6))
    frames = six_frame_kguts_offsets(genome)
    L = max(len(p) for _s, _o, p in frames) + 8
    g_off = np.full((6, L), 20, np.uint8)
    g_len = np.zeros(6, np.int32)
    for i, (_s, _o, p) in enumerate(frames):
        g_off[i, :len(p)] = p
        g_len[i] = len(p)
    out.append(dup_stats(g_off, g_len, "genome 6-frame 2Mbp"))

    # 4. fastq ORF batch
    from fq_bench import synth_reads
    from close_kmers_tpu.ops.translate import batch_orf_arrays
    reads = synth_reads(rng, offsets[:2048, :bench.PROT_LEN], 20000, 150)
    ofs, lens, _ = batch_orf_arrays([s for _, s in reads])
    out.append(dup_stats(ofs, lens, "fastq ORFs (20k reads)"))

    # The verdict arithmetic at the measured rates (PERF.md round-3
    # numbers, all per 2.49M windows): probe_narrow 11.9 ms (issue-bound,
    # width-independent), probe_wide 25.6 ms (208M fused rows,
    # byte-bound), sort 4.3 ms, scatter-back = one more narrow gather =
    # 11.9 ms.  dedup net change = sort + scatter_back - dup_frac * probe.
    SORT, NARROW, WIDE = 4.3, 11.9, 25.6
    for d in out:
        frac = d["dup_frac"]
        # narrow/1-gather tier: pays iff frac * 11.9 > 16.2 -> impossible
        d["narrow_net_ms_per_2.49M"] = round(SORT + NARROW - frac * NARROW,
                                             2)
        # byte-bound wide tier: pays iff frac > (4.3+11.9)/25.6 = 63%
        d["wide_net_ms_per_2.49M"] = round(SORT + NARROW - frac * WIDE, 2)
        d["wide_tier_pays"] = d["wide_net_ms_per_2.49M"] < 0
    import json
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
