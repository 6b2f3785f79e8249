"""On-device scan scoring parity vs the CPU oracle."""

import numpy as np
import pytest

from close_kmers_tpu.params import EngineParams
from close_kmers_tpu.core import oracle as O
from close_kmers_tpu.core.engine import FastAnnotator
from close_kmers_tpu.core.device_score import DeviceScorer

from test_engine import random_db, random_seqs


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(77)
    db = random_db(rng)
    seqs = random_seqs(rng, db, n=48)
    return db, seqs


@pytest.mark.parametrize("params", [
    EngineParams(),
    EngineParams(min_hits=2, max_gap=40),
    EngineParams(min_hits=1),
    EngineParams(order_constraint=1, min_hits=2),
    EngineParams(min_weighted_hits=3),
])
def test_device_calls_match_oracle(corpus, params):
    db, seqs = corpus
    ds = DeviceScorer(db)
    fa = FastAnnotator(db)
    offsets, lengths = fa.pad_batch(seqs)
    n_calls, calls = ds.score_batch(offsets, lengths, params,
                                    calls_per_seq_cap=64)
    total = 0
    for s, seq in enumerate(seqs):
        o_calls = []
        O.process_aa_seq(seq, db.lookup, params, o_calls, None, None)
        got = calls[s]
        want = [(c.start, c.end, c.count, c.fI, np.float32(c.weighted))
                for c in o_calls]
        assert [(g[0], g[1], g[2], g[3]) for g in got] == \
            [(w[0], w[1], w[2], w[3]) for w in want], (s, seq)
        for g, w in zip(got, want):
            assert np.float32(g[4]) == w[4]
        total += len(got)
    assert total > 20


def test_device_cap_retry(corpus):
    db, seqs = corpus
    ds = DeviceScorer(db)
    fa = FastAnnotator(db)
    offsets, lengths = fa.pad_batch(seqs)
    params = EngineParams(min_hits=1)
    # tiny cap forces the internal retry-with-bigger-cap path
    n1, c1 = ds.score_batch(offsets, lengths, params, calls_per_seq_cap=1)
    n2, c2 = ds.score_batch(offsets, lengths, params, calls_per_seq_cap=64)
    assert n1.tolist() == n2.tolist()
    assert c1 == c2


def test_device_empty_batch_rows(corpus):
    db, _ = corpus
    ds = DeviceScorer(db)
    offsets = np.full((4, 32), 20, dtype=np.uint8)
    lengths = np.zeros(4, dtype=np.int32)
    n_calls, calls = ds.score_batch(offsets, lengths)
    assert n_calls.tolist() == [0, 0, 0, 0]


def test_packed_upload_path(corpus):
    """5-bit packed uploads produce identical packed outputs."""
    import jax.numpy as jnp
    from close_kmers_tpu.core.engine import pack_offsets, unpack_offsets
    db, seqs = corpus
    ds = DeviceScorer(db)
    fa = FastAnnotator(db)
    offsets, lengths = fa.pad_batch(seqs)
    L = offsets.shape[1]
    if L % 8:
        offsets = np.concatenate(
            [offsets, np.full((offsets.shape[0], 8 - L % 8), 20, np.uint8)],
            axis=1)
        L = offsets.shape[1]
    packed = pack_offsets(offsets)
    # unpack roundtrip
    assert np.array_equal(np.asarray(unpack_offsets(jnp.asarray(packed), L)),
                          offsets)
    params = EngineParams()
    out1, cap1 = ds.score_batch_packed(offsets, lengths, params)
    out2, cap2 = ds.score_batch_packed(packed, lengths, params, packed_L=L)
    assert cap1 == cap2
    assert np.array_equal(np.asarray(out1), np.asarray(out2))


def test_planar_packed_upload_path(corpus):
    """Planar int32 packed uploads produce identical packed outputs."""
    import jax.numpy as jnp
    from close_kmers_tpu.core.engine import (pack_offsets_planar,
                                             unpack_offsets_planar)
    db, seqs = corpus
    ds = DeviceScorer(db)
    fa = FastAnnotator(db)
    offsets, lengths = fa.pad_batch(seqs)
    packed = pack_offsets_planar(offsets)
    L6 = 6 * packed.shape[1]
    # unpack roundtrip (pad columns decode to 20 = the pad value)
    padded = np.concatenate(
        [offsets, np.full((offsets.shape[0], L6 - offsets.shape[1]), 20,
                          np.uint8)], axis=1)
    assert np.array_equal(
        np.asarray(unpack_offsets_planar(jnp.asarray(packed), L6)), padded)
    params = EngineParams()
    out1, cap1 = ds.score_batch_packed(padded, lengths, params)
    out2, cap2 = ds.score_batch_packed(packed, lengths, params,
                                       packed_L=L6, pack_mode=2)
    assert cap1 == cap2
    assert np.array_equal(np.asarray(out1), np.asarray(out2))
