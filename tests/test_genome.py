"""Device-resident genome path (core/genome.py): the 6-frame translate +
tile + cross-tile-carry scoring program must reproduce oracle.process_seq
byte-exactly, including runs and gaps crossing tile boundaries."""

import numpy as np
import pytest

from close_kmers_tpu.params import EngineParams
from close_kmers_tpu.core import oracle as O
from close_kmers_tpu.core.genome import GenomeAnnotator, STEP

from test_engine import random_db
from test_dna import CODON, BASES


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    db = random_db(rng)
    return rng, db, GenomeAnnotator(db)


def _synth(rng, db, n_bases):
    parts, tot = [], 0
    while tot < n_bases:
        prot = db._test_prots[int(rng.integers(0, len(db._test_prots)))]
        g = "".join(CODON[c] for c in prot)
        parts.append(g)
        tot += len(g)
        j = int(rng.integers(0, 900))
        parts.append("".join(rng.choice(list(BASES), size=j)))
        tot += j
        if rng.random() < 0.2:
            parts.append("NRY"[:int(rng.integers(1, 4))])
            tot += 2
    return "".join(parts)


def _flat(frames):
    return [(a, b, c, d, np.float32(w))
            for fr in frames for a, b, c, d, w in fr]


def _oracle(dna, db, params):
    calls = []
    O.process_seq(dna, db.lookup, params, calls, None, None)
    return [(c.start, c.end, c.count, c.fI, np.float32(c.weighted))
            for c in calls]


def test_genome_small_matches_oracle(setup):
    rng, db, ga = setup
    params = EngineParams(min_hits=3)
    for _ in range(3):
        dna = _synth(rng, db, 2000)
        per_frame, frames = ga.calls_of(dna, params)
        assert _flat(frames) == _oracle(dna, db, params)
        assert int(per_frame.sum()) == len(_flat(frames))


@pytest.mark.parametrize("mh,gap", [(3, 200), (1, 50)])
def test_genome_cross_tile_matches_oracle(setup, mh, gap):
    """Frames span many tiles (aa length >> STEP); runs, gaps, and the
    reseed quirk must thread exactly through the carry fixpoint."""
    rng, db, ga = setup
    params = EngineParams(min_hits=mh, max_gap=gap)
    dna = _synth(rng, db, 12 * STEP)   # ~12 active tiles per frame
    per_frame, frames = ga.calls_of(dna, params)
    want = _oracle(dna, db, params)
    assert _flat(frames) == want
    assert len(want) > 10              # non-trivial coverage


def test_genome_call_cap_escalates(setup):
    rng, db, ga = setup
    params = EngineParams(min_hits=1)
    dna = _synth(rng, db, 6000)
    per_frame, frames = ga.calls_of(dna, params, call_cap=2)
    assert _flat(frames) == _oracle(dna, db, params)


def test_genome_ambiguous_and_empty(setup):
    _rng, db, ga = setup
    params = EngineParams()
    for dna in ("N" * 500, "ACGT" * 10, ""):
        if not dna:
            continue               # digits array must be non-empty
        per_frame, frames = ga.calls_of(dna, params)
        assert int(per_frame.sum()) == len(_flat(frames))
        assert _flat(frames) == _oracle(dna, db, params)
