"""Device /matrix pair counting (core/matrix.py) vs a direct numpy
replay of the reference's registration-order semantics
(matrix_request.cc:83-161): every hit of protein s counts each peg in
the hit kmer's list that is a matrix protein registered before s."""

import numpy as np
import pytest

from close_kmers_tpu.core.api import KmerEngine
from close_kmers_tpu.core.matrix import DeviceMatrix
from close_kmers_tpu.db.signature_db import SignatureDB


def _mk_db(rng, n_src=300, plen=60, n_funcs=64):
    off = rng.integers(0, 20, size=(n_src, plen)).astype(np.uint8)
    W = plen - 8 + 1
    o32 = off.astype(np.int32)
    hi = np.zeros((n_src, W), dtype=np.int32)
    lo = np.zeros((n_src, W), dtype=np.int32)
    for j in range(4):
        hi = hi * 20 + o32[:, j:j + W]
        lo = lo * 20 + o32[:, 4 + j:4 + j + W]
    keys = (hi.astype(np.int64) * 160000 + lo).ravel()
    fi = np.repeat(np.arange(n_src, dtype=np.int64) % n_funcs, W)
    keys, idx = np.unique(keys, return_index=True)
    fi = fi[idx].astype(np.int32)
    db = SignatureDB(
        keys, fi,
        rng.integers(-1, 8, size=len(keys)).astype(np.int32),
        rng.integers(0, plen, size=len(keys)).astype(np.int32),
        rng.uniform(0.1, 4.0, size=len(keys)).astype(np.float32))
    return db, off


def _host_pairs(eng, offsets, lengths, peg_offs, peg_vals, rank):
    """Reference replay: probe rows host-side, walk the CSR per hit."""
    h = eng.fa.probe_compact(offsets, lengths, rows_only=True)
    keys = eng.db.keys
    pairs = {}
    for s in range(offsets.shape[0]):
        a, b = int(h["row_off"][s]), int(h["row_off"][s + 1])
        codes = h["code"][a:b]
        if not len(codes):
            continue
        pos = np.searchsorted(keys, codes)
        pos = np.minimum(pos, len(keys) - 1)
        pos = pos[keys[pos] == codes]
        for p in pos:
            for v in peg_vals[peg_offs[p]:peg_offs[p + 1]]:
                if rank[v] < s:
                    k = (s, int(rank[v]))
                    pairs[k] = pairs.get(k, 0) + 1
    return pairs


@pytest.mark.parametrize("seed", [0, 1])
def test_device_matrix_parity(seed):
    rng = np.random.default_rng(seed)
    db, off = _mk_db(rng)
    eng = KmerEngine(db)
    n = len(db)
    P = 100
    deg = rng.integers(0, 4, size=n)
    peg_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=peg_offs[1:])
    peg_vals = rng.integers(0, 2 * P, size=int(peg_offs[-1]))
    # rank: pegs < P are matrix proteins ranked by id; others outsiders
    rank = np.full(2 * P, 1 << 20, dtype=np.int64)
    rank[:P] = np.arange(P)

    qi = rng.integers(0, len(off), size=P)
    plen = off.shape[1]
    width = -(-(plen + 8) // 8) * 8
    offsets = np.full((P, width), 20, dtype=np.uint8)
    offsets[:, :plen] = off[qi]
    lengths = np.full(P, plen, dtype=np.int32)

    want = _host_pairs(eng, offsets, lengths, peg_offs, peg_vals, rank)
    dm = DeviceMatrix(eng, max_deg=4)
    dm.CHUNK = 64   # force multi-chunk + padded tail
    got = dm.count_pairs(offsets, lengths, peg_offs, peg_vals, rank,
                         pair_cap=1 << 14)
    assert got == want


def test_device_matrix_cap_escalation():
    rng = np.random.default_rng(2)
    db, off = _mk_db(rng, n_src=50)
    eng = KmerEngine(db)
    n = len(db)
    P = 40
    deg = np.ones(n, dtype=np.int64)
    peg_offs = np.concatenate([[0], np.cumsum(deg)])
    peg_vals = rng.integers(0, P, size=n)
    rank = np.arange(P, dtype=np.int64)
    qi = rng.integers(0, len(off), size=P)
    plen = off.shape[1]
    width = -(-(plen + 8) // 8) * 8
    offsets = np.full((P, width), 20, dtype=np.uint8)
    offsets[:, :plen] = off[qi]
    lengths = np.full(P, plen, dtype=np.int32)
    want = _host_pairs(eng, offsets, lengths, peg_offs, peg_vals, rank)
    dm = DeviceMatrix(eng, max_deg=1)
    got = dm.count_pairs(offsets, lengths, peg_offs, peg_vals, rank,
                         pair_cap=4)   # force the retry path
    assert got == want
