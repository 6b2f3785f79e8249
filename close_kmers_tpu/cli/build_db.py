"""build_signature_kmers CLI: construct a signature-kmer data directory.

Mirrors the reference builder's main options
(/root/reference/build_signature_kmers.cc:1071-1168): fasta inputs,
kept-function fasta inputs, function definition files, good-function /
good-role lists, min-reps threshold, and the output data dir; plus the
recall and validation harness modes.
"""

from __future__ import annotations

import argparse
import os
import sys


def _read_list(path: str) -> list[str]:
    with open(path) as f:
        return [line.rstrip("\n") for line in f if line.strip()]


def main(argv=None):
    ap = argparse.ArgumentParser(prog="build_signature_kmers")
    ap.add_argument("kmer_data_dir", help="output data directory")
    ap.add_argument("--fasta", action="append", default=[],
                    help="annotated protein fasta file (repeatable)")
    ap.add_argument("--fasta-dir", action="append", default=[],
                    help="directory of annotated protein fastas")
    ap.add_argument("--fasta-keep-functions", action="append", default=[],
                    help="fasta whose functions are always kept")
    ap.add_argument("--function-defs", action="append", default=[],
                    help="id<TAB>function assignment file")
    ap.add_argument("--good-functions", default=None,
                    help="file of functions to always keep")
    ap.add_argument("--good-roles", default=None,
                    help="file of roles to always keep")
    ap.add_argument("--min-reps-required", type=int, default=5)
    ap.add_argument("--final-kmers", default=None,
                    help="extra path for the text kmer table")
    ap.add_argument("--mem-map", action="store_true",
                    help="also write the reference-format kmer.table.mem_map")
    ap.add_argument("--recall-output", default=None,
                    help="directory for recall mode output (Calls/, New/)")
    ap.add_argument("--recall-min-hits", type=int, default=5)
    ap.add_argument("--recall-max-gap", type=int, default=200)
    ap.add_argument("--validation-folder", default=None,
                    help="folder with anno/ + seq/ for validation mode")
    args = ap.parse_args(argv)

    from ..db.builder import build_signature_kmers

    fastas = list(args.fasta)
    for d in args.fasta_dir:
        fastas.extend(os.path.join(d, f) for f in sorted(os.listdir(d)))

    good_functions = _read_list(args.good_functions) if args.good_functions else []
    good_roles = _read_list(args.good_roles) if args.good_roles else []

    result = build_signature_kmers(
        fastas, args.fasta_keep_functions, args.function_defs,
        args.min_reps_required, good_functions, good_roles)
    print(f"kept {len(result.fm.function_index)} functions", file=sys.stderr)
    print(f"Kept {len(result.kept_keys)} kmers", file=sys.stderr)
    print(f"distinct_signatures={result.stats['distinct_signatures']}",
          file=sys.stderr)
    print("num_seqs_with_a_signature="
          f"{result.stats['num_seqs_with_a_signature']}", file=sys.stderr)

    result.write_data_dir(args.kmer_data_dir, mem_map=args.mem_map)
    if args.final_kmers:
        result.write_final_kmers(args.final_kmers)

    if args.recall_output or args.validation_folder:
        from ..db.recall import run_recall, run_validation
        from ..core.api import KmerEngine
        eng = KmerEngine(result.to_signature_db())
        if args.recall_output:
            run_recall(eng, result.fm, fastas, args.recall_output,
                       args.recall_min_hits, args.recall_max_gap)
        if args.validation_folder:
            run_validation(eng, args.validation_folder,
                           args.recall_min_hits, args.recall_max_gap)
    return 0


if __name__ == "__main__":
    sys.exit(main())
