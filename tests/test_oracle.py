"""CPU-oracle semantics tests: hand-constructed scenarios exercising the
reference's documented behaviors (SCORING.txt, kguts.cc:734-877,1008-1199)."""

import numpy as np
import pytest

from close_kmers_tpu.params import EngineParams, K, MAX_ENCODED
from close_kmers_tpu.ops import encoder as E
from close_kmers_tpu.core import oracle as O
from close_kmers_tpu.db.signature_db import SignatureDB


def mk_db(entries, functions=None):
    return SignatureDB.from_entries(entries, functions=functions)


def kmers_of(seq):
    return [seq[i:i + K] for i in range(len(seq) - K + 1)]


def run(seq, db, params=None, want_hits=False):
    calls, hits, otu = [], [], O.OtuStats()
    O.process_aa_seq(seq, db.lookup, params or EngineParams(),
                     calls, hits.append if want_hits else None, otu)
    return calls, hits, otu


def test_simple_run_single_call():
    # 6 consecutive kmers of one function -> one CALL covering them.
    seq = "MKLVINGKTACDEF" + "WYHH"   # length 18 -> scan positions 0..9
    db_entries = []
    for i in range(6):
        db_entries.append((seq[i:i + K], 100, 7, 2.0, 3))
    db = mk_db(db_entries)
    calls, hits, otu = run(seq, db, want_hits=True)
    assert len(calls) == 1
    c = calls[0]
    assert (c.start, c.end, c.count, c.fI) == (0, 5 + K - 1, 6, 7)
    assert np.float32(c.weighted) == np.float32(12.0)
    assert len(hits) == 6
    assert otu.otus_by_count == [(3, 6)]


def test_last_window_never_scanned():
    # The kmer at position len-K is excluded (kguts.cc:792).
    seq = "ACDEFGHIKLMNPQRS"  # len 16, last window starts at 8
    db = mk_db([(seq[8:16], 10, 1, 1.0, 0)])
    calls, hits, _ = run(seq, db, EngineParams(min_hits=1), want_hits=True)
    assert hits == []
    assert calls == []
    # ...but a hit one position earlier is seen.
    db2 = mk_db([(seq[7:15], 10, 1, 1.0, 0)])
    _, hits2, _ = run(seq, db2, EngineParams(min_hits=1), want_hits=True)
    assert len(hits2) == 1 and hits2[0].pos == 7


def test_min_hits_threshold():
    seq = "MKLVINGKTACDEFWYHH"
    db = mk_db([(seq[i:i + K], 100, 7, 1.0, 3) for i in range(4)])
    calls, _, _ = run(seq, db)  # default min_hits=5
    assert calls == []
    calls, _, _ = run(seq, db, EngineParams(min_hits=4))
    assert len(calls) == 1 and calls[0].count == 4


def test_two_in_a_row_terminates_run():
    # A run of f=1 followed by two consecutive f=2 hits flushes the f=1
    # run immediately (kguts.cc:852-856; SCORING.txt two-hit rule), and
    # the two f=2 hits seed the next run via the reseed quirk.
    rng = np.random.default_rng(11)
    seq = "".join(rng.choice(list(E.PROT_ALPHA), size=40))
    kms = kmers_of(seq)
    assert len(set(kms)) == len(kms)  # all windows distinct
    entries = [(kms[i], 50, 1, 1.0, 0) for i in range(5)]
    entries += [(kms[10], 50, 2, 1.0, 1), (kms[12], 50, 2, 1.0, 1),
                (kms[14], 50, 2, 1.0, 1), (kms[16], 50, 2, 1.0, 1),
                (kms[18], 50, 2, 1.0, 1)]
    db = mk_db(entries)
    calls, _, _ = run(seq, db, EngineParams(min_hits=5))
    assert len(calls) == 2
    assert calls[0].fI == 1 and calls[0].count == 5
    assert (calls[0].start, calls[0].end) == (0, 4 + K - 1)
    # Second call includes the two seeding hits at 10 and 12.
    assert calls[1].fI == 2 and calls[1].count == 5
    assert (calls[1].start, calls[1].end) == (10, 18 + K - 1)


def test_interleaved_singleton_does_not_terminate():
    # One odd-function hit inside a run does not flush it; the run's call
    # keeps counting its own function, and the call start is the first
    # buffered hit (kguts.cc:755).
    seq = "ACDEFGHIKLMNPQRSTVWYACDEF"
    kms = kmers_of(seq)
    entries = [(kms[i], 50, 1, 1.0, 0) for i in [0, 2, 4, 6, 8]]
    entries.append((kms[3], 50, 9, 1.0, 4))  # lone intruder
    db = mk_db(entries)
    calls, _, otu = run(seq, db, EngineParams(min_hits=5))
    assert len(calls) == 1
    c = calls[0]
    assert c.fI == 1 and c.count == 5
    assert (c.start, c.end) == (0, 8 + K - 1)
    # The intruder's OTU gets no vote (kguts.cc:762-768).
    assert otu.otus_by_count == [(0, 5)]


def test_gap_terminates_run():
    # Hits separated by more than max_gap split into two runs.
    seq = "".join(np.random.default_rng(3).choice(list(E.PROT_ALPHA), size=300))
    kms = kmers_of(seq)
    entries = [(kms[i], 50, 1, 1.0, 0) for i in [0, 1, 2, 3, 4]]
    entries += [(kms[i], 50, 1, 1.0, 0) for i in [250, 251, 252, 253, 254]]
    db = mk_db(entries)
    calls, _, _ = run(seq, db, EngineParams(min_hits=5, max_gap=200))
    assert len(calls) == 2
    assert (calls[0].start, calls[0].end) == (0, 4 + K - 1)
    assert (calls[1].start, calls[1].end) == (250, 254 + K - 1)
    # With a huge max_gap they merge into one run.
    calls2, _, _ = run(seq, db, EngineParams(min_hits=5, max_gap=300))
    assert len(calls2) == 1 and calls2[0].count == 10


def test_gap_discards_short_run():
    # A sub-min_hits run before a gap is dropped silently (kguts.cc:827-830).
    seq = "".join(np.random.default_rng(4).choice(list(E.PROT_ALPHA), size=300))
    kms = kmers_of(seq)
    entries = [(kms[i], 50, 1, 1.0, 0) for i in [0, 1]]
    entries += [(kms[i], 50, 1, 1.0, 0) for i in [250, 251, 252, 253, 254]]
    db = mk_db(entries)
    calls, _, _ = run(seq, db, EngineParams(min_hits=5, max_gap=200))
    assert len(calls) == 1
    assert calls[0].start == 250


def test_scan_positions_match_vectorized_valid_mask():
    # The scalar advance/roll loop visits exactly the valid windows in
    # [0, len-K) — the invariant the device encoder relies on.
    rng = np.random.default_rng(5)
    chars = list(E.PROT_ALPHA) + ["X", "x", "*"]
    for trial in range(20):
        n = int(rng.integers(0, 60))
        seq = "".join(rng.choice(chars, size=n))
        pI = E.seq_to_offsets(seq)
        got = O.iter_scan_positions(pI)
        hi, lo, valid = E.encode_windows_hi_lo(pI)
        expect = [int(i) for i in np.nonzero(valid)[0]]
        assert got == expect, seq


def test_weighted_accumulation_is_float32_sequential():
    seq = "ACDEFGHIKLMNPQRSTVWYACDEF"
    kms = kmers_of(seq)
    wts = [0.1, 0.2, 0.3, 0.4, 0.5]
    entries = [(kms[i], 50, 1, wts[i], 0) for i in range(5)]
    db = mk_db(entries)
    calls, _, _ = run(seq, db, EngineParams(min_hits=5))
    acc = np.float32(0)
    for w in wts:
        acc = np.float32(acc + np.float32(w))
    assert np.float32(calls[0].weighted) == acc


# ---------------------------------------------------------------------------
# find_best_call
# ---------------------------------------------------------------------------

def C(start, end, count, fI, weighted):
    return O.Call(start, end, count, fI, np.float32(weighted))


FUNCS = {7241: "DNA gyrase subunit B (EC 5.99.1.3)",
         7507: "DNA topoisomerase IV subunit B (EC 5.99.1.3)"}


def fn_of(i):
    return FUNCS.get(i, f"func{i}")


def test_find_best_call_scoring_txt_example():
    # The worked example from /root/reference/SCORING.txt:82-97.
    calls = [C(10, 86, 6, 7241, 8.7125), C(99, 129, 12, 7241, 31.9442),
             C(162, 173, 5, 7507, 9.1869), C(182, 216, 10, 7241, 21.9685)]
    r = O.find_best_call(calls, fn_of)
    assert r.function_index == 7241
    assert r.function == FUNCS[7241]
    assert r.score == 28.0
    assert O.fmt_float(r.weighted_score) == "62.6252"
    assert r.score_offset == 23.0


def test_find_best_call_bridge_merge():
    # Interior below 5 and exterior >= 10 discards the interior
    # (kguts.cc:1063-1086).
    calls = [C(0, 50, 6, 1, 6.0), C(60, 70, 4, 2, 4.0), C(80, 120, 6, 1, 6.0)]
    r = O.find_best_call(calls, fn_of)
    assert r.function_index == 1
    assert r.score == 12.0          # interior's 4 hits discarded
    assert r.score_offset == 12.0   # only one function remains after merge


def test_find_best_call_no_bridge_when_interior_5():
    calls = [C(0, 50, 6, 1, 6.0), C(60, 70, 5, 2, 5.0), C(80, 120, 6, 1, 6.0)]
    r = O.find_best_call(calls, fn_of)
    assert r.function_index == 1
    assert r.score == 12.0
    assert r.score_offset == 7.0    # 12 - 5


def test_find_best_call_empty():
    r = O.find_best_call([], fn_of)
    assert r.function_index == -1 and r.function == "" and r.score == 0.0


def test_find_best_call_ambiguous_two():
    calls = [C(0, 50, 8, 1, 8.0), C(60, 100, 6, 2, 6.0)]
    r = O.find_best_call(calls, fn_of)
    assert r.function_index == -1
    # offset = 2 <= 5 -> ambiguous; f1/f2 sorted descending lexicographically
    # (kguts.cc:1176-1183: swap if f2 > f1).
    assert r.function == "func2 ?? func1"
    assert r.score == 8.0


def test_find_best_call_ambiguous_three_with_pair_offset():
    calls = [C(0, 50, 20, 1, 20.0), C(60, 100, 18, 2, 18.0),
             C(110, 150, 6, 3, 6.0)]
    r = O.find_best_call(calls, fn_of)
    assert r.function_index == -1
    assert r.function == "func2 ?? func1"
    assert r.score == 20.0
    assert r.score_offset == 12.0   # pair_offset = 18 - 6
    assert r.weighted_score == 20.0


def test_find_best_call_ambiguous_three_without_pair_offset():
    calls = [C(0, 50, 20, 1, 20.0), C(60, 100, 18, 2, 18.0),
             C(110, 150, 16, 3, 16.0)]
    r = O.find_best_call(calls, fn_of)
    assert r.function_index == -1
    assert r.function == ""         # pair_offset = 2, not > 5
    assert r.score == 0.0


def test_find_best_call_single_function_offset_is_count():
    calls = [C(0, 50, 3, 1, 3.0)]
    r = O.find_best_call(calls, fn_of)
    # vec.size()==1: offset = count = 3 < 5 and vec.size() < 2 -> no call.
    assert r.function_index == -1 and r.function == ""
    calls = [C(0, 50, 5, 1, 5.0)]
    r = O.find_best_call(calls, fn_of)
    assert r.function_index == 1 and r.score == 5.0


def test_partial_sort_top2_tie_behavior():
    # Deterministic libstdc++ heap-select replication; on a weighted tie
    # between the first two entries, make_heap roots the second element,
    # so vec[0] after sorting is the first element.
    vec = [("a", 0, 1.0), ("b", 0, 1.0), ("c", 0, 0.5)]
    O.partial_sort_top2(vec, lambda e: e[2])
    assert vec[0][0] == "a" and vec[1][0] == "b"


def test_format_call_and_otu():
    c = C(10, 86, 6, 7241, 8.7125)
    assert O.format_call(c, fn_of) == \
        "CALL\t10\t86\t6\t7241\tDNA gyrase subunit B (EC 5.99.1.3)\t8.7125\n"
    otu = O.OtuStats()
    for oI, n in [(127, 3), (425, 1), (818, 1), (785, 1), (753, 1), (999, 1)]:
        for _ in range(n):
            otu.add(oI)
    otu.finalize()
    # count desc, ties ascending otu; only top 5 printed (kguts.cc:966).
    s = O.format_otu_stats("fig|x", 234, otu)
    assert s == "OTU-COUNTS\tfig|x[234]\t3-127\t1-425\t1-753\t1-785\t1-818\n"


def test_fmt_float_matches_cxx_ostream():
    assert O.fmt_float(8.7125) == "8.7125"
    assert O.fmt_float(31.9442) == "31.9442"
    assert O.fmt_float(1.0) == "1"
    assert O.fmt_float(0.25) == "0.25"
    assert O.fmt_float(1234567.0) == "1.23457e+06"


def test_dna_process_seq_six_frames():
    # A protein planted in frame +2 of a DNA contig is found.
    prot = "MKLVINGKTACDEFWYHH"
    from close_kmers_tpu.ops.translate import translate_kguts
    codon_of = {}
    # build a DNA string that translates (frame 0) to prot using fixed codons
    table = {"M": "ATG", "K": "AAA", "L": "CTG", "V": "GTT", "I": "ATT",
             "N": "AAC", "G": "GGT", "T": "ACC", "A": "GCG", "C": "TGC",
             "D": "GAT", "E": "GAA", "F": "TTT", "W": "TGG", "Y": "TAT",
             "H": "CAT"}
    dna = "C" + "".join(table[c] for c in prot)  # offset 1 => frame +2
    assert translate_kguts(dna, 1) == prot
    db = mk_db([(prot[i:i + K], 100, 7, 2.0, 3) for i in range(6)])
    calls = []
    O.process_seq(dna, db.lookup, EngineParams(), calls, None, None)
    assert len(calls) == 1 and calls[0].fI == 7 and calls[0].count == 6
