"""Build a PATRIC-density-scale signature DB (default ≥200M kmers) with
the out-of-core builder, on this box, without exceeding RAM.

Generates a synthetic annotated-protein corpus (N genomes sharing a
function vocabulary so every function passes the ≥min_reps keep rule,
build_signature_kmers.cc:432-488), runs build_signature_kmers_external
over it, and writes a loadable DB directory:

    <out>/scale_db.npz        keys/fi/oi/avg_off/wt (uncompressed savez)
    <out>/function.index
    <out>/BUILD_STATS.json    kmer counts, peak RSS, wall times

Usage:
    python scripts/make_scale_db.py --out /root/scale --target-kmers 2.1e8
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALPHA = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)

# Approximate natural amino-acid frequencies (UniProt/Swiss-Prot order
# matched to ALPHA): biased sampling skews the hi-bucket occupancy the
# way real PATRIC proteins do (deep buckets around common-aa prefixes,
# cf. the reference's bucket statistics kguts.h:259-261) instead of the
# uniform ~Poisson depths a flat-random corpus produces.
AA_FREQ = np.array([8.25, 1.38, 5.45, 6.75, 3.86, 7.07, 2.27, 5.96, 5.84,
                    9.66, 2.42, 4.06, 4.70, 3.93, 5.53, 6.56, 5.34, 6.87,
                    1.08, 2.92])
AA_FREQ = AA_FREQ / AA_FREQ.sum()


def peak_rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def gen_corpus(corpus_dir: str, n_genomes: int, prots_per_genome: int,
               prot_len: int, n_funcs: int, aa_bias: bool = False) -> list[str]:
    os.makedirs(corpus_dir, exist_ok=True)
    files = []
    for g in range(n_genomes):
        path = os.path.join(corpus_dir, f"genome{g}.fa")
        files.append(path)
        if os.path.exists(path):
            continue
        rng = np.random.default_rng(1000 + g)
        probs = AA_FREQ if aa_bias else None
        chars = ALPHA[rng.choice(20, size=prots_per_genome * prot_len,
                                 p=probs)]
        chars = chars.reshape(prots_per_genome, prot_len)
        with open(path, "w") as f:
            for p in range(prots_per_genome):
                f.write(f">fig|{g + 1}.1.peg.{p + 1} "
                        f"Synthetic function {p % n_funcs}\n")
                f.write(chars[p].tobytes().decode("latin-1"))
                f.write("\n")
        print(f"wrote {path}", flush=True)
    return files


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/scale")
    ap.add_argument("--target-kmers", type=float, default=2.1e8)
    ap.add_argument("--n-genomes", type=int, default=10)
    ap.add_argument("--prot-len", type=int, default=258)
    ap.add_argument("--n-funcs", type=int, default=2000)
    ap.add_argument("--buffer-records", type=int, default=16_000_000)
    ap.add_argument("--aa-bias", action="store_true",
                    help="sample residues at natural aa frequencies "
                         "(PATRIC-like skewed bucket depths)")
    args = ap.parse_args()

    from close_kmers_tpu.db.builder import build_signature_kmers_external
    from close_kmers_tpu.db.signature_db import write_index_file
    from close_kmers_tpu.params import LO_CARD

    windows_per_prot = args.prot_len - 7
    prots_per_genome = int(args.target_kmers
                           / (args.n_genomes * windows_per_prot)) + 1
    os.makedirs(args.out, exist_ok=True)

    t0 = time.time()
    files = gen_corpus(os.path.join(args.out, "corpus"), args.n_genomes,
                       prots_per_genome, args.prot_len, args.n_funcs,
                       aa_bias=args.aa_bias)
    t_corpus = time.time() - t0
    print(f"corpus: {args.n_genomes} genomes x {prots_per_genome} proteins "
          f"x {args.prot_len} aa in {t_corpus:.0f}s", flush=True)

    t0 = time.time()
    r = build_signature_kmers_external(
        files, work_dir=os.path.join(args.out, "work"),
        buffer_records=args.buffer_records,
        progress=lambda m: print(m, flush=True))
    t_build = time.time() - t0
    print(f"external build: {r.stats['distinct_signatures']:,} signatures "
          f"from {r.stats['total_kmers_extracted']:,} extracted in "
          f"{t_build:.0f}s, peak RSS {peak_rss_gb():.1f} GB", flush=True)

    # assemble the probe-table arrays (vectorized; skips final.kmers text)
    t0 = time.time()
    keys, fi, oi, avg_off, wt = r.to_arrays()
    assert (np.diff(keys) > 0).all(), "global key order violated"
    out_npz = os.path.join(args.out, "scale_db.npz")
    np.savez(out_npz, keys=keys, fi=fi, oi=oi, avg_off=avg_off, wt=wt)
    write_index_file(os.path.join(args.out, "function.index"),
                     r.fm.functions_by_index())
    t_out = time.time() - t0

    stats = dict(
        n_kmers=int(len(keys)),
        distinct_signatures=int(r.stats["distinct_signatures"]),
        total_extracted=int(r.stats["total_kmers_extracted"]),
        n_hi_buckets=int(keys.max() // LO_CARD - keys.min() // LO_CARD + 1),
        corpus_s=round(t_corpus, 1),
        build_s=round(t_build, 1),
        output_s=round(t_out, 1),
        peak_rss_gb=round(peak_rss_gb(), 2),
    )
    with open(os.path.join(args.out, "BUILD_STATS.json"), "w") as f:
        json.dump(stats, f, indent=1)
    print(json.dumps(stats), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
