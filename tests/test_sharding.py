"""Multi-device sharding tests on the virtual 8-device CPU mesh:
sharded probe must equal the single-chip probe exactly."""

import jax
import numpy as np
import pytest

from close_kmers_tpu.params import EngineParams
from close_kmers_tpu.core.engine import FastAnnotator
from close_kmers_tpu.parallel.sharding import (
    ShardedEngine, ShardedDB, make_mesh,
    probe_sharded, probe_routed, serve_step_sharded, shard_fam_table)

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


def test_probe_step_hit_counts_sharded(corpus):
    """Per-sequence hit counts from the sharded probe grid must match the
    single-chip compact probe (the annotate_step n_hits cross-check,
    retired with the mod-128 sketch, now against probe_sharded)."""
    db, seqs = corpus
    mesh = make_mesh(2, 4)
    sdb = ShardedDB.from_db(db, mesh)
    fa = FastAnnotator(db)
    offsets, lengths = fa.pad_batch(seqs[:8])
    found = np.asarray(probe_sharded(sdb, offsets, lengths)[0])
    want = fa.probe_compact(offsets, lengths)
    assert np.array_equal(found.sum(axis=1), np.diff(want["row_off"]))


def test_sharded_db_row_ranges(corpus):
    db, _ = corpus
    mesh = make_mesh(1, 8)
    sdb = ShardedDB.from_db(db, mesh)
    assert sdb.n_shards == 8
    # all DB rows are covered exactly once
    lo = np.asarray(sdb.lo)[:, :-1]
    valid_rows = (lo >= 0).sum()
    assert valid_rows == len(db)
    # bucket-aligned ranges: row boundaries fall on bucket boundaries
    assert sdb.row_base[0] == 0 and sdb.row_base[-1] == len(db)
    assert np.isin(sdb.row_base, db.bucket_start).all()


@pytest.mark.parametrize("wide", [True, False])
def test_sharded_probe_wide_vs_narrow(corpus, wide):
    """The per-shard payload-wide 1-gather layout must agree with the
    per-shard binary-search layout exactly."""
    db, seqs = corpus
    fa = FastAnnotator(db)
    offsets, lengths = fa.pad_batch(seqs)
    want = fa.probe_compact(offsets, lengths)

    mesh = make_mesh(2, 4)
    se = ShardedEngine(db, mesh)
    se.sdb = ShardedDB.from_db(db, mesh, wide_payload=wide)
    assert (se.sdb.payload_wide is not None) == wide
    got = se.probe_compact(offsets, lengths)
    for k in ("pos", "fi", "oi", "avg_off", "code", "row_off"):
        assert np.array_equal(got[k], want[k]), k
    assert np.array_equal(np.float32(got["wt"]), np.float32(want["wt"]))


def test_sharded_family_rollup_matches_single_chip(corpus):
    """The sharded annotation step's family rollup must be bit-identical
    to the single-chip device rollup (which itself is bit-identical to
    the host accumulation)."""
    from close_kmers_tpu.core.device_family import (
        DeviceFamilyDB, DeviceFamilyScorer)
    from close_kmers_tpu.db.family_db import KmerFamilyMapping
    from close_kmers_tpu.parallel.sharding import shard_fam_table

    db, seqs = corpus
    rng = np.random.default_rng(7)
    mapping = KmerFamilyMapping()
    for k in db.keys:
        for fid in set(rng.integers(0, 40, size=rng.integers(1, 5)).tolist()):
            mapping.add_fam_mapping(int(fid), int(k))

    dfs = DeviceFamilyScorer(db, mapping)
    fa = FastAnnotator(db)
    offsets, lengths = fa.pad_batch(seqs)
    want = dfs.rollup(offsets, lengths, fams_per_seq_cap=64)

    mesh = make_mesh(2, 4)
    sdb = ShardedDB.from_db(db, mesh)
    fam_np = np.asarray(dfs.fdb.fam)
    fam_sh = shard_fam_table(fam_np, sdb)
    outs = serve_step_sharded(sdb, offsets, lengths,
                              fam_shards=fam_sh, cap_seq=64, routed=False)
    assert len(outs) == 4
    got = DeviceFamilyScorer.finish_rollup_rows(np.asarray(outs[3]), 64)
    assert got is not None
    for a, b in zip(got, want):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_sharded_deep_bucket_sub_layout(corpus):
    """A deep-bucket DB (buckets beyond the wide-row bound) must probe
    through the per-shard sub-bucket layout and still match the
    single-chip result exactly."""
    from close_kmers_tpu.db.signature_db import SignatureDB
    from close_kmers_tpu.params import LO_CARD

    rng = np.random.default_rng(13)
    n = 60_000
    his = rng.integers(2000, 2400, size=n, dtype=np.int64)
    los = rng.integers(0, LO_CARD, size=n, dtype=np.int64)
    keys = np.unique(his * LO_CARD + los)
    db = SignatureDB(
        keys,
        rng.integers(0, 50, size=len(keys)).astype(np.int32),
        rng.integers(-1, 8, size=len(keys)).astype(np.int32),
        rng.integers(0, 300, size=len(keys)).astype(np.int32),
        rng.uniform(0.1, 3.0, size=len(keys)).astype(np.float32),
    )
    from close_kmers_tpu.core.engine import DeviceDB
    assert db.max_bucket > DeviceDB.WIDE_BUCKET_MAX

    # queries spell DB kmers at known spots (plus random misses)
    from close_kmers_tpu.ops.encoder import decode_kmer, seq_to_offsets
    from close_kmers_tpu.ops import encoder as E
    seqs = []
    for i in range(16):
        s = "".join(rng.choice(list(E.PROT_ALPHA), size=64))
        km = decode_kmer(int(keys[rng.integers(0, len(keys))]))
        seqs.append(s[:10] + km + s[18:])

    fa = FastAnnotator(db)
    offsets, lengths = fa.pad_batch(seqs)
    want = fa.probe_compact(offsets, lengths)
    assert len(want["pos"]) >= 16

    mesh = make_mesh(2, 4)
    se = ShardedEngine(db, mesh)
    assert se.sdb.sub_blocks is not None and se.sdb.payload_wide is None
    got = se.probe_compact(offsets, lengths)
    for k in ("pos", "fi", "oi", "avg_off", "code", "row_off"):
        assert np.array_equal(got[k], want[k]), k
    assert np.array_equal(np.float32(got["wt"]), np.float32(want["wt"]))


# ---------------------------------------------------------------- routed

@pytest.mark.parametrize("shape", [(1, 8), (2, 4), (4, 2)])
def test_routed_probe_matches_replicated(corpus, shape):
    """The routed probe (batch sharded over data x table, one all_to_all
    per direction, one gather per window pod-wide) must equal the
    replicated psum-merge probe exactly, with no overflow at the default
    capacity."""
    db, seqs = corpus
    fa = FastAnnotator(db)
    offsets, lengths = fa.pad_batch(seqs)
    mesh = make_mesh(*shape)
    sdb = ShardedDB.from_db(db, mesh)
    want = probe_sharded(sdb, offsets, lengths)
    got = probe_routed(sdb, offsets, lengths)
    for a, b in zip(want[:5], got[:5]):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.asarray(got[8]).sum() == 0  # nothing dropped


def test_routed_probe_overflow_fallback_exact(corpus):
    """With a deliberately tiny per-pair capacity, overflowing windows
    must take the all_gather+psum fallback and still be exact (and be
    counted)."""
    db, seqs = corpus
    fa = FastAnnotator(db)
    offsets, lengths = fa.pad_batch(seqs)
    mesh = make_mesh(2, 4)
    sdb = ShardedDB.from_db(db, mesh)
    want = probe_sharded(sdb, offsets, lengths)
    got = probe_routed(sdb, offsets, lengths, capacity_factor=0.01,
                       ov_frac=1.0)
    for a, b in zip(want[:5], got[:5]):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.asarray(got[7]).sum() > 0   # fallback actually exercised
    assert np.asarray(got[8]).sum() == 0


def test_routed_probe_drop_reporting(corpus):
    """Windows beyond BOTH capacities report found=0 and are counted in
    n_dropped (callers re-dispatch bigger)."""
    db, seqs = corpus
    fa = FastAnnotator(db)
    offsets, lengths = fa.pad_batch(seqs)
    mesh = make_mesh(2, 4)
    sdb = ShardedDB.from_db(db, mesh)
    got = probe_routed(sdb, offsets, lengths, capacity_factor=0.01,
                       ov_frac=10_000.0)
    want = probe_sharded(sdb, offsets, lengths)
    n_drop = int(np.asarray(got[8]).sum())
    assert n_drop > 0
    # found is a subset of the true result, short by exactly n_drop hits
    # at most (dropped windows may also be misses)
    f_got = np.asarray(got[0])
    f_want = np.asarray(want[0])
    assert (f_got <= f_want).all()
    assert f_want.sum() - f_got.sum() <= n_drop


@pytest.mark.parametrize("routed", [True, False])
def test_serve_step_matches_single_chip(corpus, routed):
    """The promoted serving step must reproduce the single-chip device
    best-call pack and family rollup rows bit-exactly, with REAL engine
    params, in both probe modes."""
    from close_kmers_tpu.core.device_score import DeviceScorer
    from close_kmers_tpu.core.device_family import DeviceFamilyScorer
    from close_kmers_tpu.db.family_db import KmerFamilyMapping

    db, seqs = corpus
    fa = FastAnnotator(db)
    offsets, lengths = fa.pad_batch(seqs)
    mesh = make_mesh(2, 4)
    sdb = ShardedDB.from_db(db, mesh)

    rng = np.random.default_rng(7)
    mapping = KmerFamilyMapping()
    for k in db.keys:
        for fid in set(rng.integers(0, 40, size=rng.integers(1, 5)).tolist()):
            mapping.add_fam_mapping(int(fid), int(k))
    dfs = DeviceFamilyScorer(db, mapping)
    fam_sh = shard_fam_table(np.asarray(dfs.fdb.fam), sdb)

    ds = DeviceScorer(db)
    params = EngineParams(min_hits=3, max_gap=150)
    want_best = np.asarray(ds.best_batch_packed(offsets, lengths, params))
    want_roll = dfs.rollup(offsets, lengths, fams_per_seq_cap=64)

    best, n_ovf, n_drop, rows = serve_step_sharded(
        sdb, offsets, lengths, params=params, fam_shards=fam_sh,
        cap_seq=64, routed=routed)
    assert np.array_equal(np.asarray(best), want_best)
    got_roll = DeviceFamilyScorer.finish_rollup_rows(np.asarray(rows), 64)
    for a, b in zip(got_roll, want_roll):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.asarray(n_drop).sum() == 0


def test_serve_step_params_matter(corpus):
    """Real per-request EngineParams must flow into the sharded scoring
    scan (the r3 sketch hardcoded min_hits=5/max_gap=200)."""
    db, seqs = corpus
    fa = FastAnnotator(db)
    offsets, lengths = fa.pad_batch(seqs)
    mesh = make_mesh(2, 4)
    sdb = ShardedDB.from_db(db, mesh)
    loose, _, _ = serve_step_sharded(
        sdb, offsets, lengths, params=EngineParams(min_hits=1))
    strict, _, _ = serve_step_sharded(
        sdb, offsets, lengths, params=EngineParams(min_hits=10))
    # looser params can only find >= as many functions per row
    assert (np.asarray(loose)[:, 0] >= np.asarray(strict)[:, 0]).all()
    assert not np.array_equal(np.asarray(loose), np.asarray(strict))
