"""Multi-device sharding tests on the virtual 8-device CPU mesh:
sharded probe must equal the single-chip probe exactly."""

import jax
import numpy as np
import pytest

from close_kmers_tpu.params import EngineParams
from close_kmers_tpu.core.engine import FastAnnotator
from close_kmers_tpu.parallel.sharding import (
    ShardedEngine, ShardedDB, make_mesh, annotate_step_sharded)

from test_engine import random_db, random_seqs


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(99)
    db = random_db(rng)
    seqs = random_seqs(rng, db, n=32)
    return db, seqs


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("shape", [(1, 8), (2, 4), (4, 2), (8, 1)])
def test_sharded_probe_matches_single_chip(corpus, shape):
    db, seqs = corpus
    fa = FastAnnotator(db)
    offsets, lengths = fa.pad_batch(seqs)
    want = fa.probe_compact(offsets, lengths)

    mesh = make_mesh(*shape)
    se = ShardedEngine(db, mesh)
    got = se.probe_compact(offsets, lengths)

    for k in ("pos", "fi", "oi", "avg_off", "code", "row_off"):
        assert np.array_equal(got[k], want[k]), k
    assert np.allclose(got["wt"], want["wt"])
    assert np.array_equal(np.float32(got["wt"]), np.float32(want["wt"]))


def test_sharded_batch_padding(corpus):
    # Batch size not divisible by the data axis is padded internally.
    db, seqs = corpus
    mesh = make_mesh(4, 2)
    se = ShardedEngine(db, mesh)
    fa = FastAnnotator(db)
    offsets, lengths = fa.pad_batch(seqs[:7])
    got = se.probe_compact(offsets, lengths)
    want = fa.probe_compact(offsets, lengths)
    assert np.array_equal(got["code"], want["code"])
    assert np.array_equal(got["row_off"], want["row_off"])


def test_annotate_step_runs_sharded(corpus):
    db, seqs = corpus
    mesh = make_mesh(2, 4)
    se = ShardedEngine(db, mesh)
    fa = FastAnnotator(db)
    offsets, lengths = fa.pad_batch(seqs[:8])
    n_hits, weighted, func_wt, n_calls, call_wt = annotate_step_sharded(
        se.sdb, offsets, lengths)
    n_hits = np.asarray(n_hits)
    # cross-check hit counts against the compact probe
    want = fa.probe_compact(offsets, lengths)
    counts = np.diff(want["row_off"])
    assert np.array_equal(n_hits, counts)
    assert np.asarray(func_wt).shape == (8, 128)
    assert np.asarray(n_calls).shape == (8,)
    assert (np.asarray(n_calls) >= 0).all()


def test_sharded_db_row_ranges(corpus):
    db, _ = corpus
    mesh = make_mesh(1, 8)
    sdb = ShardedDB.from_db(db, mesh)
    assert sdb.n_shards == 8
    # all DB rows are covered exactly once
    lo = np.asarray(sdb.lo)[:, :-1]
    valid_rows = (lo >= 0).sum()
    assert valid_rows == len(db)
