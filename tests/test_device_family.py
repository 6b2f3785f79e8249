"""On-device family rollup vs the host accumulation path."""

import numpy as np
import pytest

from close_kmers_tpu.core import family as F
from close_kmers_tpu.core.engine import FastAnnotator, TpuEngine
from close_kmers_tpu.core.device_family import DeviceFamilyScorer
from close_kmers_tpu.db.family_db import KmerFamilyMapping

from test_engine import random_db, random_seqs


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(55)
    db = random_db(rng)
    seqs = random_seqs(rng, db, n=24)
    mapping = KmerFamilyMapping()
    for k in db.keys:
        for fid in set(rng.integers(0, 40, size=rng.integers(1, 5)).tolist()):
            mapping.add_fam_mapping(int(fid), int(k))
    return db, seqs, mapping


def test_device_rollup_matches_host(setup):
    db, seqs, mapping = setup
    dfs = DeviceFamilyScorer(db, mapping)
    eng = TpuEngine(db)
    fa = FastAnnotator(db)
    offsets, lengths = fa.pad_batch(seqs)
    n_per_seq, fam, counts, weights = dfs.rollup(offsets, lengths)

    hit_lists = eng.hits_of_batch(seqs)
    k = 0
    total = 0
    for s, seq in enumerate(seqs):
        py = F.accumulate_family_scores(hit_lists[s], mapping)
        n = int(n_per_seq[s])
        got = {int(fam[k + i]): (int(counts[k + i]), float(weights[k + i]))
               for i in range(n)}
        want = {fid: (ss.hit_count, float(ss.weighted_total))
                for fid, ss in py.items()}
        assert set(got) == set(want), s
        for fid in want:
            assert got[fid][0] == want[fid][0]          # counts exact
            # the row-sorted grouping scan adds weights in the host
            # path's exact visit order — bit-identical f32 sums
            assert got[fid][1] == want[fid][1]
        # device entries are family-id ordered within a sequence
        assert [int(fam[k + i]) for i in range(n)] == sorted(got)
        k += n
        total += n
    assert total > 50


def test_device_rollup_cap_retry(setup):
    db, seqs, mapping = setup
    dfs = DeviceFamilyScorer(db, mapping)
    fa = FastAnnotator(db)
    offsets, lengths = fa.pad_batch(seqs)
    a = dfs.rollup(offsets, lengths, fams_per_seq_cap=1)
    b = dfs.rollup(offsets, lengths, fams_per_seq_cap=64)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_device_rollup_no_hits(setup):
    db, _, mapping = setup
    dfs = DeviceFamilyScorer(db, mapping)
    offsets = np.full((4, 64), 20, dtype=np.uint8)
    lengths = np.zeros(4, dtype=np.int32)
    n_per_seq, fam, counts, weights = dfs.rollup(offsets, lengths)
    assert n_per_seq.sum() == 0 and len(fam) == 0


def test_rollup_cap_escalation_sticky(setup):
    """Forcing the overflow path must produce identical results and
    raise the instance's default cap so later batches skip the retry."""
    db, seqs, mapping = setup
    from close_kmers_tpu.core.engine import FastAnnotator
    dfs = DeviceFamilyScorer(db, mapping)
    fa = FastAnnotator(db)
    offsets, lengths = fa.pad_batch(seqs)
    roomy = dfs.rollup(offsets, lengths, 64)
    tight = dfs.rollup(offsets, lengths, 1)   # forces escalation
    for a, b in zip(roomy, tight):
        assert np.array_equal(a, b)
    if int(roomy[0].sum()) > len(seqs):       # overflow actually happened
        assert dfs._default_cap >= 4 or dfs._default_cap == 8
    after = dfs.rollup(offsets, lengths)      # sticky default path
    for a, b in zip(roomy, after):
        assert np.array_equal(a, b)
