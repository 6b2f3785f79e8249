"""DNA batch path and long-contig tiling parity tests."""

import numpy as np
import pytest

from close_kmers_tpu.params import EngineParams
from close_kmers_tpu.core import oracle as O
from close_kmers_tpu.core.api import KmerEngine
from close_kmers_tpu.core.dna import (annotate_dna_batch,
                                      annotate_long_sequence,
                                      probe_long_sequence)

from test_engine import random_db, random_seqs

BASES = "ACGT"
# reverse-translation table (codon per aa) for generating test DNA
CODON = {"A": "GCG", "C": "TGC", "D": "GAT", "E": "GAA", "F": "TTT",
         "G": "GGT", "H": "CAT", "I": "ATT", "K": "AAA", "L": "CTG",
         "M": "ATG", "N": "AAC", "P": "CCG", "Q": "CAG", "R": "CGT",
         "S": "AGC", "T": "ACC", "V": "GTT", "W": "TGG", "Y": "TAT"}


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(2024)
    db = random_db(rng)
    eng = KmerEngine(db)
    return rng, db, eng


def test_dna_batch_matches_oracle(corpus):
    rng, db, eng = corpus
    params = EngineParams(min_hits=3)
    contigs = []
    for i in range(6):
        prot = db._test_prots[i][:40]
        dna = "N" * int(rng.integers(0, 3)) + \
            "".join(CODON[c] for c in prot) + \
            "".join(rng.choice(list(BASES), size=int(rng.integers(0, 30))))
        contigs.append((f"c{i}", dna))
    results = annotate_dna_batch(eng, contigs, params)
    n_with_calls = 0
    for (cid, dna), (calls, _h, otu) in zip(contigs, results):
        o_calls, o_otu = [], O.OtuStats()
        O.process_seq(dna, db.lookup, params, o_calls, None, o_otu)
        assert [(c.start, c.end, c.count, c.fI) for c in calls] == \
            [(c.start, c.end, c.count, c.fI) for c in o_calls], cid
        for a, b in zip(calls, o_calls):
            assert np.float32(a.weighted) == np.float32(b.weighted)
        assert otu.otus_by_count == o_otu.otus_by_count
        n_with_calls += bool(calls)
    assert n_with_calls >= 4


def test_long_sequence_tiling_equals_untiled(corpus):
    rng, db, eng = corpus
    # Build a long protein (~30k aa) stitched from family fragments.
    parts = []
    total = 0
    while total < 30000:
        p = db._test_prots[int(rng.integers(0, len(db._test_prots)))]
        a = int(rng.integers(0, 40))
        s = p[a:a + int(rng.integers(8, 60))]
        parts.append(s)
        total += len(s)
        if rng.random() < 0.1:
            parts.append("X")
            total += 1
    seq = "".join(parts)

    h_tiled = probe_long_sequence(eng, seq, tile=1024)
    h_ref = eng.fa.probe_compact(*eng.fa.pad_batch([seq]))
    assert np.array_equal(h_tiled["pos"], h_ref["pos"])
    assert np.array_equal(h_tiled["fi"], h_ref["fi"])
    assert np.array_equal(h_tiled["code"], h_ref["code"])
    assert np.array_equal(np.float32(h_tiled["wt"]), np.float32(h_ref["wt"]))


def test_probe_compact_plane_dropping(corpus):
    # want_oi/want_avg=False must leave pos/fi/wt identical (only the
    # download shrinks; dropped keys come back as zeros).
    rng, db, eng = corpus
    seq = db._test_prots[0] * 4
    full = eng.fa.probe_compact(*eng.fa.pad_batch([seq]))
    slim = eng.fa.probe_compact(*eng.fa.pad_batch([seq]), want_code=False,
                                want_oi=False, want_avg=False)
    assert np.array_equal(full["pos"], slim["pos"])
    assert np.array_equal(full["fi"], slim["fi"])
    assert np.array_equal(np.float32(full["wt"]), np.float32(slim["wt"]))
    assert not slim["oi"].any() and not slim["avg_off"].any()
    assert "code" not in slim


def test_annotate_long_sequence_calls(corpus):
    rng, db, eng = corpus
    prot = db._test_prots[0]
    seq = prot * 3 + "XX" + prot
    params = EngineParams(min_hits=3, max_gap=50)
    calls, otu = annotate_long_sequence(eng, "big", seq, params, tile=128)
    o_calls, o_otu = [], O.OtuStats()
    O.process_aa_seq(seq, db.lookup, params, o_calls, None, o_otu)
    assert [(c.start, c.end, c.count, c.fI) for c in calls] == \
        [(c.start, c.end, c.count, c.fI) for c in o_calls]
    assert otu.otus_by_count == o_otu.otus_by_count
