"""Byte-parity against the COMPILED REFERENCE engine (not the oracle).

Builds /root/reference/{kguts.cc,kmer_image.cc,kmer_encoder.cc,
fasta_parser.cc} verbatim behind a ~50-line boost shim
(scripts/ref_harness/), drives the resulting binary over data dirs
written by OUR builder (kmer.table.mem_map + function.index + otu.index),
and diffs its PROTEIN-ID/HIT/CALL/OTU-COUNTS/BEST-CALL byte stream
against core.oracle — the hand-derived re-statement every other parity
test in this repo bottoms out in.  A mismatch here means the oracle
misread kguts.cc (kguts.cc:783-877, 1008-1199) and must be fixed.

Covers: fuzzed protein rounds, fuzzed DNA rounds (process_seq,
kguts.cc:910-937), engine-parameter sweeps (min_hits/max_gap/
order_constraint/min_weighted_hits), and the checked-in golden corpus
(tests/golden/queries.fa over tests/golden/data).

OTU-COUNTS ties: the reference sorts otus_by_count with std::sort and a
strictly-by-count comparator (kguts.h:193-216), so the order of
equal-count OTUs is implementation-defined once the vector is large
enough for introsort to leave insertion order behind.  The diff treats
OTU lines as equal when the count sequences match and each count class
shows the same oI multiset, modulo the top-5 print cutoff.

Usage: python scripts/ref_parity.py [--rounds N] [--seed S] [--no-golden]
Exit status 0 = parity; 1 = any byte difference (repro seed printed).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REFERENCE = "/root/reference"
HARNESS_SRC = os.path.join(REPO, "scripts", "ref_harness")
HARNESS_BIN = os.path.join(REPO, ".build", "ref_harness")

REF_SOURCES = [
    os.path.join(HARNESS_SRC, "main.cc"),
    os.path.join(REFERENCE, "kguts.cc"),
    os.path.join(REFERENCE, "kmer_image.cc"),
    os.path.join(REFERENCE, "kmer_encoder.cc"),
    os.path.join(REFERENCE, "fasta_parser.cc"),
]


def build_harness() -> str:
    os.makedirs(os.path.dirname(HARNESS_BIN), exist_ok=True)
    if os.path.exists(HARNESS_BIN):
        bin_mtime = os.path.getmtime(HARNESS_BIN)
        deps = REF_SOURCES + [
            os.path.join(HARNESS_SRC, "shim", "boost", "program_options.hpp"),
            os.path.join(HARNESS_SRC, "shim", "boost", "timer", "timer.hpp"),
        ]
        if all(os.path.getmtime(d) < bin_mtime for d in deps):
            return HARNESS_BIN
    cmd = ["g++", "-O2", "-std=c++14", "-w",
           "-I", os.path.join(HARNESS_SRC, "shim"), "-I", REFERENCE,
           *REF_SOURCES, "-o", HARNESS_BIN]
    print("building reference harness:", " ".join(cmd))
    subprocess.run(cmd, check=True)
    return HARNESS_BIN


# ---------------------------------------------------------------------------
# Data-dir + FASTA plumbing
# ---------------------------------------------------------------------------

def write_data_dir(db, out_dir: str) -> None:
    from close_kmers_tpu.db.signature_db import write_index_file
    os.makedirs(out_dir, exist_ok=True)
    db.save_mem_map(os.path.join(out_dir, "kmer.table.mem_map"))
    write_index_file(os.path.join(out_dir, "function.index"), db.functions)
    write_index_file(os.path.join(out_dir, "otu.index"), db.otus)


def write_fasta(path: str, seqs: list[tuple[str, str]]) -> None:
    with open(path, "w") as f:
        for sid, seq in seqs:
            f.write(f">{sid}\n{seq}\n")


def run_harness(data_dir: str, fasta: str, params, dna: bool = False,
                want_hits: bool = True) -> str:
    args = [HARNESS_BIN]
    if dna:
        args.append("--dna")
    if not want_hits:
        args.append("--no-hits")
    for name, val in (("min_hits", params.min_hits),
                      ("min_weighted_hits", params.min_weighted_hits),
                      ("max_gap", params.max_gap),
                      ("order_constraint", params.order_constraint)):
        args.append(f"--p:{name}={val}")
    args.append(data_dir)
    with open(fasta, "rb") as f:
        out = subprocess.run(args, stdin=f, stdout=subprocess.PIPE,
                             stderr=subprocess.DEVNULL, check=True)
    # KmerImage logs "mmap <path>" to stdout (kmer_image.cc); keep only
    # the block grammar.
    keep = ("PROTEIN-ID\t", "HIT\t", "CALL\t", "OTU-COUNTS\t",
            "BEST-CALL\t", "//")
    return "".join(l for l in out.stdout.decode().splitlines(True)
                   if l.startswith(keep))


def oracle_stream(seqs: list[tuple[str, str]], db, params,
                  dna: bool = False, want_hits: bool = True) -> str:
    """Produce the same block grammar from core.oracle."""
    from close_kmers_tpu.core import oracle as O
    function_of = O.function_of_factory(db.functions)
    blocks = []
    for sid, seq in seqs:
        calls: list = []
        otu = O.OtuStats()
        hit_lines: list[str] = []
        hit_cb = ((lambda h: hit_lines.append(O.format_hit(h, function_of)))
                  if want_hits else None)
        if dna:
            O.process_seq(seq, db.lookup, params, calls, hit_cb, otu)
        else:
            O.process_aa_seq(seq, db.lookup, params, calls, hit_cb, otu)
        parts = [f"PROTEIN-ID\t{sid}\t{len(seq)}\n"]
        parts += hit_lines
        parts += [O.format_call(c, function_of) for c in calls]
        parts.append(O.format_otu_stats(sid, len(seq), otu))
        b = O.find_best_call(calls, function_of)
        parts.append(f"BEST-CALL\t{b.function_index}\t{b.function}\t"
                     f"{O.fmt_float(b.score)}\t{O.fmt_float(b.weighted_score)}"
                     f"\t{O.fmt_float(b.score_offset)}\n")
        parts.append("//\n")
        blocks.append("".join(parts))
    return "".join(blocks)


# ---------------------------------------------------------------------------
# OTU tie-aware line comparison (see module docstring)
# ---------------------------------------------------------------------------

def _otu_pairs(line: str) -> list[tuple[int, int]]:
    toks = line.rstrip("\n").split("\t")[2:]
    return [(int(c), int(o)) for c, o in (t.split("-", 1) for t in toks)]


def otu_lines_equivalent(a: str, b: str) -> bool:
    if a == b:
        return True
    head_a, head_b = a.split("\t", 2)[:2], b.split("\t", 2)[:2]
    if head_a != head_b:
        return False
    pa, pb = _otu_pairs(a), _otu_pairs(b)
    if [c for c, _ in pa] != [c for c, _ in pb]:
        return False
    # same count sequence: compare oI sets per count class; the boundary
    # class (possibly truncated at 5) must still show count-identical sets
    # because both sides print the same number of pairs per class.
    from collections import defaultdict
    ga, gb = defaultdict(set), defaultdict(set)
    for c, o in pa:
        ga[c].add(o)
    for c, o in pb:
        gb[c].add(o)
    return ga == gb


def diff_streams(ref: str, ours: str, label: str) -> bool:
    if ref == ours:
        return True
    ref_lines, our_lines = ref.splitlines(True), ours.splitlines(True)
    ok = True
    for i in range(max(len(ref_lines), len(our_lines))):
        rl = ref_lines[i] if i < len(ref_lines) else "<EOF>"
        ol = our_lines[i] if i < len(our_lines) else "<EOF>"
        if rl == ol:
            continue
        if (rl.startswith("OTU-COUNTS") and ol.startswith("OTU-COUNTS")
                and otu_lines_equivalent(rl, ol)):
            continue
        # Empty-calls early return never assigns score_offset
        # (kguts.cc:1010-1018), so the reference prints uninitialized
        # stack memory there; no caller reads it when function_index==-1
        # (query_request.cc:131, lookup_request.cc:226 gate on a
        # non-empty function).  Mask the garbage field.
        if rl.startswith("BEST-CALL\t-1\t") and ol.startswith("BEST-CALL\t-1\t"):
            if (rl.rsplit("\t", 1)[0] == ol.rsplit("\t", 1)[0]):
                continue
        ok = False
        print(f"[{label}] MISMATCH at line {i + 1}:")
        print(f"  ref : {rl!r}")
        print(f"  ours: {ol!r}")
        for j in range(max(0, i - 3), min(len(ref_lines), i)):
            print(f"  ctx ref[{j + 1}]: {ref_lines[j]!r}")
        break
    return ok


# ---------------------------------------------------------------------------
# Fuzz rounds
# ---------------------------------------------------------------------------

PROT_FUZZ_NOISE = "XxUuBbZzJjOo*"   # isalpha or '*' only (fasta_parser.h:97)


def make_db(rng: np.random.Generator):
    from close_kmers_tpu.db.signature_db import SignatureDB
    from close_kmers_tpu.params import LO_CARD
    n = int(rng.integers(2_000, 30_000))
    his = rng.integers(0, 3_200_000, size=n, dtype=np.int64)
    keys = np.unique(his * LO_CARD
                     + rng.integers(0, LO_CARD, size=n, dtype=np.int64))
    n_funcs = int(rng.integers(2, 40))
    n_otus = 16
    return SignatureDB(
        keys,
        rng.integers(0, n_funcs, size=len(keys)).astype(np.int32),
        rng.integers(-1, n_otus, size=len(keys)).astype(np.int32),
        rng.integers(0, 500, size=len(keys)).astype(np.int32),
        rng.uniform(0.05, 6.0, size=len(keys)).astype(np.float32),
        functions=[f"fn{i} role" for i in range(n_funcs)],
        otus=[f"otu{i}" for i in range(n_otus)],
    )


def gen_protein_seqs(rng: np.random.Generator, db) -> list[tuple[str, str]]:
    from close_kmers_tpu.ops import encoder as E
    from close_kmers_tpu.ops.encoder import decode_kmer
    keys = db.keys

    def rand_seq() -> str:
        parts = []
        total = 0
        target = int(rng.integers(0, 280))
        while total < target:
            r = rng.random()
            if r < 0.55:
                k = decode_kmer(int(keys[rng.integers(0, len(keys))]))
                parts.append(k[: int(rng.integers(4, 9))])
            elif r < 0.8:
                parts.append("".join(rng.choice(list(E.PROT_ALPHA),
                                                size=int(rng.integers(1, 20)))))
            elif r < 0.9:
                parts.append("".join(rng.choice(list(PROT_FUZZ_NOISE),
                                                size=int(rng.integers(1, 4)))))
            else:
                f = int(rng.integers(0, len(keys)))
                for q in range(int(rng.integers(1, 5))):
                    parts.append(decode_kmer(int(keys[min(f + q,
                                                          len(keys) - 1)])))
            total += len(parts[-1])
        return "".join(parts)

    seqs = [(f"s{i}", rand_seq())
            for i in range(int(rng.integers(6, 24)))]
    seqs += [("empty", ""), ("eight", "A" * 8), ("nine", "A" * 9),
             ("kx3", decode_kmer(int(keys[0])) * 3)]
    return seqs


def gen_dna_seqs(rng: np.random.Generator, db) -> list[tuple[str, str]]:
    """DNA whose frames embed DB kmers: back-translate protein fragments
    through table 11 and splice with random/ambiguous DNA."""
    from close_kmers_tpu.ops.encoder import decode_kmer
    from close_kmers_tpu.ops.translate import GENETIC_CODE
    by_aa: dict[str, list[str]] = {}
    bases = "acgt"
    for idx, aa in enumerate(GENETIC_CODE):
        codon = bases[(idx >> 4) & 3] + bases[(idx >> 2) & 3] + bases[idx & 3]
        by_aa.setdefault(aa, []).append(codon)
    keys = db.keys

    def back_translate(prot: str) -> str:
        out = []
        for ch in prot:
            opts = by_aa.get(ch.upper())
            if not opts:
                opts = by_aa["X"] if "X" in by_aa else ["nnn"]
            out.append(opts[int(rng.integers(0, len(opts)))])
        return "".join(out)

    def rand_dna() -> str:
        parts = []
        total = 0
        target = int(rng.integers(30, 900))
        while total < target:
            r = rng.random()
            if r < 0.5:
                prot = "".join(decode_kmer(int(keys[rng.integers(0, len(keys))]))
                               for _ in range(int(rng.integers(1, 4))))
                parts.append(back_translate(prot))
            elif r < 0.8:
                parts.append("".join(rng.choice(list("acgtACGT"),
                                                size=int(rng.integers(3, 60)))))
            else:
                parts.append("".join(rng.choice(list("nryswkmN"),
                                                size=int(rng.integers(1, 5)))))
            total += len(parts[-1])
        return "".join(parts)

    return [(f"d{i}", rand_dna()) for i in range(int(rng.integers(4, 12)))]


def fuzz_round(seed: int, dna: bool) -> bool:
    from close_kmers_tpu.params import EngineParams
    rng = np.random.default_rng(seed)
    db = make_db(rng)
    seqs = (gen_dna_seqs if dna else gen_protein_seqs)(rng, db)
    params = EngineParams(
        min_hits=int(rng.integers(1, 7)),
        min_weighted_hits=int(rng.choice([0, 0, 1, 3])),
        max_gap=int(rng.choice([5, 30, 200, 1000])),
        order_constraint=int(rng.integers(0, 2)),
    )
    with tempfile.TemporaryDirectory() as td:
        write_data_dir(db, td)
        fasta = os.path.join(td, "in.fa")
        write_fasta(fasta, seqs)
        ref = run_harness(td, fasta, params, dna=dna)
        ours = oracle_stream(seqs, db, params, dna=dna)
    label = f"{'dna' if dna else 'prot'} seed={seed} params={params}"
    return diff_streams(ref, ours, label)


def golden_round() -> bool:
    """The checked-in golden corpus through the reference binary."""
    from close_kmers_tpu.db.signature_db import SignatureDB, load_index_file
    from close_kmers_tpu.io.fasta import parse_fasta_bytes
    from close_kmers_tpu.params import EngineParams
    gdir = os.path.join(REPO, "tests", "golden")
    ddir = os.path.join(gdir, "data")
    db = SignatureDB.load_npz(
        os.path.join(ddir, "signature_db.npz"),
        functions=load_index_file(os.path.join(ddir, "function.index")),
        otus=load_index_file(os.path.join(ddir, "otu.index")))
    with open(os.path.join(gdir, "queries.fa"), "rb") as f:
        seqs = [(sid, seq) for sid, _d, seq in parse_fasta_bytes(f.read())]
    params = EngineParams()
    with tempfile.TemporaryDirectory() as td:
        write_data_dir(db, td)
        fasta = os.path.join(td, "in.fa")
        write_fasta(fasta, seqs)
        ref = run_harness(td, fasta, params)
        ours = oracle_stream(seqs, db, params)
    return diff_streams(ref, ours, "golden corpus")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-golden", action="store_true")
    args = ap.parse_args()

    build_harness()
    n_seqs = 0
    if not args.no_golden:
        if not golden_round():
            print("FAIL: golden corpus")
            return 1
        print("golden corpus: parity ok")
    for i in range(args.rounds):
        seed = args.seed + i
        dna = (i % 3 == 2)
        if not fuzz_round(seed, dna):
            print(f"FAIL: repro with --seed {seed} "
                  f"({'dna' if dna else 'protein'} round)")
            return 1
        print(f"round {i + 1}/{args.rounds} "
              f"({'dna' if dna else 'prot'}, seed {seed}): parity ok")
        n_seqs += 1
    print(f"PARITY OK: {args.rounds} fuzz rounds vs the compiled reference")
    return 0


if __name__ == "__main__":
    sys.exit(main())
