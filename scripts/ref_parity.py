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

FAMILY_BIN = os.path.join(REPO, ".build", "family_harness")

ENGINE_SOURCES = [
    os.path.join(REFERENCE, "kguts.cc"),
    os.path.join(REFERENCE, "kmer_image.cc"),
    os.path.join(REFERENCE, "kmer_encoder.cc"),
    os.path.join(REFERENCE, "fasta_parser.cc"),
]
REF_SOURCES = [os.path.join(HARNESS_SRC, "main.cc")] + ENGINE_SOURCES
FAMILY_SOURCES = ([os.path.join(HARNESS_SRC, "family_main.cc")]
                  + ENGINE_SOURCES
                  + [os.path.join(REFERENCE, "kmer.cc"),
                     os.path.join(REFERENCE, "family_mapper.cc")])


def _shim_deps() -> list[str]:
    shim = os.path.join(HARNESS_SRC, "shim")
    out = []
    for root, _dirs, files in os.walk(shim):
        out += [os.path.join(root, f) for f in files]
    return out


def _build(bin_path: str, sources: list[str], extra: list[str]) -> str:
    os.makedirs(os.path.dirname(bin_path), exist_ok=True)
    if os.path.exists(bin_path):
        bin_mtime = os.path.getmtime(bin_path)
        if all(os.path.getmtime(d) < bin_mtime
               for d in sources + _shim_deps()):
            return bin_path
    cmd = ["g++", "-O2", "-std=c++14", "-w",
           "-I", os.path.join(HARNESS_SRC, "shim"), "-I", REFERENCE,
           *sources, "-o", bin_path, *extra]
    print("building reference harness:", " ".join(cmd))
    subprocess.run(cmd, check=True)
    return bin_path


def build_harness() -> str:
    return _build(HARNESS_BIN, REF_SOURCES, [])


def build_family_harness() -> str:
    """The family-stack harness additionally compiles kmer.cc (TBB
    concurrent maps) + family_mapper.cc against the installed oneTBB."""
    return _build(FAMILY_BIN, FAMILY_SOURCES,
                  ["-DUSE_TBB=1", "-ltbb", "-lpthread"])


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


# ---------------------------------------------------------------------------
# Family-stack parity (kmer.cc + family_mapper.cc compiled verbatim)
# ---------------------------------------------------------------------------

def make_family_universe(rng: np.random.Generator):
    """A synthetic PATRIC universe over a fuzzed signature DB: families.dat
    (9-col, kmer.cc:358-374), genus map, an NR fasta of family member
    proteins built from DB kmers, and query proteins.

    Constraint for byte-level f32 determinism: each PGF gets at most TWO
    local families — the reference's pgf_rollup sums per-family f32
    totals in std::unordered_map iteration order (family_mapper.cc:137),
    so 3+ addends could differ from our first-hit-order fold by an ulp.
    Per-family weighted totals themselves are exact both sides (summed in
    hit order).  Ties that remain are handled by the semantic comparator
    (tie_aware_best_match_ok)."""
    from close_kmers_tpu.ops.encoder import decode_kmer

    db = make_db(rng)
    keys = db.keys
    n_funcs = len(db.functions)
    genera = ["Escherichia", "Bacillus", "Leptospira", "Unmappedia"]
    genus_tax = {"Escherichia": "562", "Bacillus": "1386",
                 "Leptospira": "171"}   # Unmappedia exercises the fallback

    n_pgf = int(rng.integers(2, 7))
    fam_rows = []        # (gf_num, peg, seqlen, function, genus, lf_num)
    nr_seqs = []
    lf_counter = 1

    def family_protein() -> str:
        parts = []
        total = 0
        target = int(rng.integers(60, 240))
        while total < target:
            if rng.random() < 0.75:
                f = int(rng.integers(0, len(keys)))
                for q in range(int(rng.integers(1, 4))):
                    parts.append(decode_kmer(int(keys[min(f + q,
                                                          len(keys) - 1)])))
            else:
                from close_kmers_tpu.ops import encoder as E
                parts.append("".join(rng.choice(list(E.PROT_ALPHA),
                                                size=int(rng.integers(1, 15)))))
            total += len(parts[-1])
        return "".join(parts)

    # A family's function must be what the engine would actually CALL its
    # members (in the real system the DB is built from those annotations)
    # — otherwise best_call_function never matches fd.function and the
    # rollup never fires (family_mapper.cc:141).  Derive it from the
    # first member's oracle best call.
    from close_kmers_tpu.core import oracle as O
    function_of = O.function_of_factory(db.functions)

    def called_function(prot: str) -> str:
        calls: list = []
        O.process_aa_seq(prot, db.lookup, None, calls, None, None)
        best = O.find_best_call(calls, function_of)
        fn = best.function
        if not fn or " ?? " in fn:
            return "hypothetical protein"
        return fn

    peg_n = 1
    for g in range(n_pgf):
        for lf in range(int(rng.integers(1, 3))):       # <= 2 LFs per PGF
            genus = genera[int(rng.integers(0, len(genera)))]
            lf_num = lf_counter
            lf_counter += 1
            prots = [family_protein()
                     for _ in range(int(rng.integers(1, 3)))]
            fn = called_function(prots[0])
            for prot in prots:
                peg = f"fig|83333.{g + 1}.peg.{peg_n}"
                peg_n += 1
                fam_rows.append((g + 1, peg, len(prot), fn, genus, lf_num))
                nr_seqs.append((peg, prot))

    # Queries must share kmers with the NR members to exercise the family
    # rollup: splice slices of NR proteins (often from two different
    # families — ambiguity pressure) with random/DB-kmer filler.
    from close_kmers_tpu.ops import encoder as E

    def query_protein() -> str:
        parts = []
        for _ in range(int(rng.integers(1, 4))):
            src = nr_seqs[int(rng.integers(0, len(nr_seqs)))][1]
            a = int(rng.integers(0, max(1, len(src) - 20)))
            ln = int(rng.integers(15, 120))
            parts.append(src[a:a + ln])
            if rng.random() < 0.4:
                parts.append("".join(rng.choice(list(E.PROT_ALPHA),
                                                size=int(rng.integers(1, 12)))))
        return "".join(parts)

    queries = [(f"q{i}", query_protein())
               for i in range(int(rng.integers(4, 12)))]
    queries.append(("qrand", family_protein()))
    queries.append(("qempty", ""))
    return db, fam_rows, nr_seqs, queries, genus_tax


def write_family_inputs(td: str, db, fam_rows, nr_seqs, queries, genus_tax):
    write_data_dir(db, td)
    genus_path = os.path.join(td, "genus.map")
    with open(genus_path, "w") as f:
        for g, t in genus_tax.items():
            f.write(f"{g}\t{t}\n")
    fams_path = os.path.join(td, "families.dat")
    with open(fams_path, "w") as f:
        for gf, peg, seqlen, fn, genus, lf in fam_rows:
            f.write(f"GF{gf:07d}\t1\t1\t{peg}\t{seqlen}\t{fn}\t{lf}\t"
                    f"{genus}\t{lf}\n")
    nr_path = os.path.join(td, "families.nr")
    write_fasta(nr_path, nr_seqs)
    q_path = os.path.join(td, "queries.fa")
    write_fasta(q_path, queries)
    return fams_path, genus_path, nr_path, q_path


def run_family_harness(td, fams_path, genus_path, nr_path, q_path,
                       threshold: int, ambiguous: bool,
                       all_matches: bool) -> str:
    args = [FAMILY_BIN, "--threshold", str(threshold)]
    if ambiguous:
        args.append("--ambiguous")
    if all_matches:
        args.append("--all")
    args += [td, fams_path, genus_path, nr_path]
    with open(q_path, "rb") as f:
        out = subprocess.run(args, stdin=f, stdout=subprocess.PIPE,
                             stderr=subprocess.DEVNULL, check=True)
    # drop KmerImage's "mmap <path>" and KmerPegMapping's ctor/dtor logs
    # (both printed to stdout by the reference sources)
    drop = ("mmap", "Constructed KmerPegMapping", "Destroyed KmerPegMapping")
    return "".join(l for l in out.stdout.decode().splitlines(True)
                   if not l.startswith(drop))


def our_family_state(db, fam_rows_paths, queries, params):
    """Build our mapping (load_families + oracle-hit NR preload) and the
    per-query (BestCall, seq_score dict) pairs — all host-path, the same
    code the engine paths are parity-locked against."""
    from close_kmers_tpu.core import oracle as O
    from close_kmers_tpu.core.family import accumulate_family_scores
    from close_kmers_tpu.db.family_db import KmerFamilyMapping

    fams_path, genus_path, nr_path = fam_rows_paths
    from close_kmers_tpu.io.fasta import parse_fasta_file
    mapping = KmerFamilyMapping()
    mapping.load_genus_map(genus_path)
    mapping.load_families(fams_path)
    nr_params = None  # NR scan runs with default engine params
    for sid, _d, seq in parse_fasta_file(nr_path):
        pid = mapping.encode_peg(sid)
        fam = mapping.peg_to_family.get(pid)
        if fam is None:
            continue
        hits: list = []
        O.process_aa_seq(seq, db.lookup, nr_params, [], hits.append, None)
        for h in hits:
            mapping.add_fam_mapping(fam, h.code)

    function_of = O.function_of_factory(db.functions)
    per_query = []
    for sid, seq in queries:
        calls: list = []
        hits: list = []
        O.process_aa_seq(seq, db.lookup, params, calls, hits.append, None)
        best = O.find_best_call(calls, function_of)
        seq_score = accumulate_family_scores(hits, mapping)
        per_query.append((sid, best, seq_score))
    return mapping, per_query


def _cxx_float(x) -> str:
    """std::ostream default float formatting (6 significant digits)."""
    return f"{float(np.float32(x)):g}"


def tie_aware_best_match_ok(ref_line: str, sid, best, seq_score, mapping,
                            threshold: int, ambiguous: bool) -> bool:
    """Semantic comparison of one best_match_t line: ids must match ours
    unless the score is tied, in which case any family achieving the
    same (printed) score is accepted — the reference's pick depends on
    std::unordered_map iteration order (family_mapper.cc:138-205)."""
    from close_kmers_tpu.core.family import (find_best_family_match,
                                             resolve_best_call_function)

    m = find_best_family_match(best, seq_score, mapping, threshold,
                               ambiguous, 0, genus_filter=False)
    cols = ref_line.rstrip("\n").split("\t")
    if len(cols) != 7 or cols[0] != sid:
        print(f"  bad family line for {sid}: {ref_line!r}")
        return False
    r_gfam, r_gscore, r_lfam, r_lscore = cols[1], cols[2], cols[3], cols[4]
    r_fn, r_score = cols[5], cols[6]

    if (r_fn != m.function or r_score != _cxx_float(m.score)
            or r_gscore != _cxx_float(m.gfam_score)
            or r_lscore != _cxx_float(m.lfam_score)):
        print(f"  {sid}: ref {cols[1:]} != ours "
              f"[{m.gfam_id}, {_cxx_float(m.gfam_score)}, {m.lfam_id}, "
              f"{_cxx_float(m.lfam_score)}, {m.function}, "
              f"{_cxx_float(m.score)}]")
        return False
    if r_gfam == m.gfam_id and r_lfam == m.lfam_id:
        return True

    # tie resolution: rebuild the candidate sets and accept any argmax
    best_fn, ambig_fn, do_ambig = resolve_best_call_function(best, ambiguous)
    lf_cands, pgf_rollup, pgf_rollup_ambig = set(), {}, {}
    for fid, s in seq_score.items():
        if s.hit_total < threshold or not (0 <= fid < len(mapping.families)):
            continue
        fd = mapping.families[fid]
        if fd.function == best_fn:
            pgf_rollup[fd.pgf] = np.float32(
                pgf_rollup.get(fd.pgf, np.float32(0.0)) + s.weighted_total)
        elif do_ambig and fd.function == ambig_fn:
            pgf_rollup_ambig[fd.pgf] = np.float32(
                pgf_rollup_ambig.get(fd.pgf, np.float32(0.0))
                + s.weighted_total)
            if do_ambig:
                pass
        else:
            continue
        if _cxx_float(s.weighted_total) == r_lscore \
                and np.float32(s.weighted_total) > 0:
            lf_cands.add(fd.plf)
    rollup = pgf_rollup
    if do_ambig and m.function == ambig_fn:
        rollup = pgf_rollup_ambig
    gf_cands = {p for p, sc in rollup.items()
                if _cxx_float(sc) == r_gscore and sc > 0}
    lf_ok = (r_lfam == m.lfam_id) or (r_lfam in lf_cands)
    gf_ok = (r_gfam == m.gfam_id) or (r_gfam in gf_cands)
    if not (lf_ok and gf_ok):
        print(f"  {sid}: tie check failed ref=({r_gfam},{r_lfam}) "
              f"ours=({m.gfam_id},{m.lfam_id}) cands=({gf_cands},{lf_cands})")
    return lf_ok and gf_ok


def all_matches_equivalent(ref: str, ours: str, label: str) -> bool:
    """find_all_matches blocks compare as multisets per query (the sort
    is by weighted score with arbitrary tie order), with the descending-
    weight invariant checked on the reference stream."""
    def blocks(stream):
        out, cur = {}, None
        for line in stream.splitlines():
            if line == "//":
                cur = None
            elif cur is None:
                cur = line
                out[cur] = []
            else:
                out[cur].append(line)
        return out

    rb, ob = blocks(ref), blocks(ours)
    if rb.keys() != ob.keys():
        print(f"[{label}] query id sets differ: {sorted(rb)} vs {sorted(ob)}")
        return False
    for q in rb:
        if sorted(rb[q]) != sorted(ob[q]):
            print(f"[{label}] all-matches rows differ for {q}:")
            for l in rb[q]:
                print(f"  ref : {l!r}")
            for l in ob[q]:
                print(f"  ours: {l!r}")
            return False
        wts = [float(l.split("\t")[2]) for l in rb[q]]
        if any(wts[i] < wts[i + 1] for i in range(len(wts) - 1)):
            print(f"[{label}] ref rows not weight-descending for {q}")
            return False
    return True


def family_fuzz_round(seed: int) -> bool:
    from close_kmers_tpu.core.family import all_matches_rows
    from close_kmers_tpu.params import EngineParams

    rng = np.random.default_rng(seed)
    db, fam_rows, nr_seqs, queries, genus_tax = make_family_universe(rng)
    threshold = int(rng.choice([1, 3, 3, 5]))
    ambiguous = bool(rng.integers(0, 2))
    params = EngineParams()
    label = f"family seed={seed} thr={threshold} ambig={ambiguous}"
    with tempfile.TemporaryDirectory() as td:
        fams_path, genus_path, nr_path, q_path = write_family_inputs(
            td, db, fam_rows, nr_seqs, queries, genus_tax)
        ref_best = run_family_harness(td, fams_path, genus_path, nr_path,
                                      q_path, threshold, ambiguous, False)
        ref_all = run_family_harness(td, fams_path, genus_path, nr_path,
                                     q_path, threshold, ambiguous, True)
        mapping, per_query = our_family_state(
            db, (fams_path, genus_path, nr_path), queries, params)

    ref_lines = ref_best.splitlines(True)
    if len(ref_lines) != len(per_query):
        print(f"[{label}] line count {len(ref_lines)} != {len(per_query)}")
        return False
    placed = sum(1 for l in ref_lines if l.split("\t")[1])
    if placed == 0:
        print(f"[{label}] VACUOUS round: no query placed in any family")
        return False
    for line, (sid, best, seq_score) in zip(ref_lines, per_query):
        if not tie_aware_best_match_ok(line, sid, best, seq_score, mapping,
                                       threshold, ambiguous):
            print(f"[{label}] best-match mismatch for {sid}")
            return False

    ours_all = []
    for sid, _best, seq_score in per_query:
        ours_all.append(sid + "\n")
        ours_all.append(all_matches_rows(seq_score, mapping, threshold,
                                         family_mode=True))
    if not all_matches_equivalent(ref_all, "".join(ours_all), label):
        return False
    return True


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
    ap.add_argument("--family-rounds", type=int, default=10)
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
    if args.family_rounds:
        build_family_harness()
        for i in range(args.family_rounds):
            seed = args.seed + 1000 + i
            if not family_fuzz_round(seed):
                print(f"FAIL: family repro with --seed {seed - 1000}")
                return 1
            print(f"family round {i + 1}/{args.family_rounds} "
                  f"(seed {seed}): parity ok")
    print(f"PARITY OK: {args.rounds} engine + {args.family_rounds} family "
          f"fuzz rounds vs the compiled reference")
    return 0


if __name__ == "__main__":
    sys.exit(main())
