"""Multi-chip sharding: the signature DB range-sharded across a device
mesh, probed with shard_map and merged with psum.

The reference is single-node shared-memory: N threads share one mmap'd
hash table (/root/reference/threadpool.cc:18-45, kmer_image.cc:41-107).
The TPU-native design (SURVEY.md §2.8) treats the signature DB as *model
state*:

* mesh axes ``("data", "table")`` — batch rows are data-parallel over
  ``data``; the DB's sorted key space is split into contiguous row ranges
  over ``table`` (the tensor-parallel analogue: each table shard owns a
  key range, like an expert shard owns experts);
* each (data, table) device probes its batch shard against its table
  shard — every kmer key lives in exactly one shard, so merging the
  per-shard probe results is a ``psum`` over ``table`` of zero-masked
  payloads (no all-to-all routing needed);
* outputs land sharded over ``data`` and replicated over ``table``,
  ready for data-parallel host scoring or on-device reductions.

Per-shard bucket tables: each shard rebuilds its own two-level bucket
bounds over the full hi space (HI_CARD pairs per shard), so the local
probe kernel is identical to the single-chip one.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..params import HI_CARD, LO_CARD
from ..db.signature_db import SignatureDB
from ..core.engine import DeviceDB, encode_windows, probe_windows


def make_mesh(n_data: int | None = None, n_table: int | None = None,
              devices=None) -> Mesh:
    """Build a ("data", "table") mesh.  Default: all devices on "table"
    (the DB usually dominates memory), n_data=1."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None and n_table is None:
        n_data, n_table = 1, n
    elif n_data is None:
        n_data = n // n_table
    elif n_table is None:
        n_table = n // n_data
    assert n_data * n_table == n, (n_data, n_table, n)
    arr = np.array(devices).reshape(n_data, n_table)
    return Mesh(arr, ("data", "table"))


@dataclasses.dataclass
class ShardedDB:
    """Signature DB split into ``S`` contiguous sorted-key ranges, padded
    to equal length M, stacked as [S, ...] arrays sharded over "table"."""

    bucket_pair: jax.Array   # i32[S, HI_CARD, 2]
    lo: jax.Array            # i32[S, M+1]
    payload: jax.Array       # i32[S, M+1, 4]
    n_steps: int
    m: int                   # rows per shard (excluding pad row)
    n_shards: int
    mesh: Mesh

    @classmethod
    def from_db(cls, db: SignatureDB, mesh: Mesh) -> "ShardedDB":
        S = mesh.shape["table"]
        n = len(db)
        m = -(-n // S) if n else 1
        max_bucket = 0
        bp = np.zeros((S, HI_CARD, 2), dtype=np.int32)
        lo = np.full((S, m + 1), -1, dtype=np.int32)
        payload = np.zeros((S, m + 1, 4), dtype=np.int32)
        payload[:, :, 0] = -1
        payload[:, :, 1] = -1
        for s in range(S):
            a, b = s * m, min((s + 1) * m, n)
            cnt = max(0, b - a)
            if cnt:
                lo[s, :cnt] = db.lo[a:b]
                payload[s, :cnt, 0] = db.fi[a:b]
                payload[s, :cnt, 1] = db.oi[a:b]
                payload[s, :cnt, 2] = db.avg_off[a:b]
                payload[s, :cnt, 3] = db.wt[a:b].view(np.int32)
                counts = np.bincount(db.hi[a:b], minlength=HI_CARD)
                cum = np.cumsum(counts)
                bp[s, :, 1] = cum
                bp[s, 1:, 0] = cum[:-1]
                max_bucket = max(max_bucket, int(counts.max()))
        n_steps = max(1, math.ceil(math.log2(max_bucket + 1))) if max_bucket else 1

        shard = NamedSharding(mesh, P("table", None))
        put = lambda a: jax.device_put(jnp.asarray(a), shard)
        return cls(put(bp), put(lo), put(payload), n_steps, m, S, mesh)


def _local_probe(bp, lo, payload, offsets, lengths, *, n_steps, m):
    """Per-device body: probe the local batch shard against the local
    table shard and zero-mask payloads for the cross-shard psum."""
    ddb = DeviceDB(bp[0], lo[0], payload[0], n_steps, m)
    hi_q, lo_q, valid = encode_windows(offsets, lengths)
    found, p_fi, p_oi, p_av, p_wt, _ = probe_windows(ddb, hi_q, lo_q, valid)
    fnd = found.astype(jnp.int32)
    out = (
        jax.lax.psum(fnd, "table"),
        jax.lax.psum(jnp.where(found, p_fi, 0), "table"),
        jax.lax.psum(jnp.where(found, p_oi, 0), "table"),
        jax.lax.psum(jnp.where(found, p_av, 0), "table"),
        jax.lax.psum(jnp.where(found, p_wt, 0.0), "table"),
        hi_q, lo_q,
    )
    return out


@functools.partial(jax.jit, static_argnames=("n_steps", "m", "mesh"))
def _probe_sharded_jit(bp, lo, payload, n_steps, m, mesh,
                       offsets, lengths):
    fn = jax.shard_map(
        functools.partial(_local_probe, n_steps=n_steps, m=m),
        mesh=mesh,
        in_specs=(P("table", None, None), P("table", None),
                  P("table", None, None), P("data", None), P("data")),
        out_specs=(P("data", None),) * 7,
    )
    return fn(bp, lo, payload, offsets, lengths)


def probe_sharded(sdb: ShardedDB, offsets, lengths):
    """Probe a [B, L] batch against the sharded DB.  Returns
    (found, fi, oi, avg_off, wt, hi, lo) with found as int32 0/1;
    batch rows must be divisible by the data axis size."""
    return _probe_sharded_jit(sdb.bucket_pair, sdb.lo, sdb.payload,
                              sdb.n_steps, sdb.m,
                              sdb.mesh, jnp.asarray(offsets),
                              jnp.asarray(lengths))


def _annotate_step_local(bp, lo, payload, offsets, lengths, *, n_steps, m):
    """One full device-side annotation step: probe + psum merge + the
    complete run/gap/two-hit scoring scan + per-sequence reductions.
    This is the framework's "training step" analogue — the compute graph
    the driver dry-runs over an N-device mesh."""
    from ..core.device_score import _scan_score

    found, p_fi, p_oi, p_av, p_wt, hi_q, lo_q = _local_probe(
        bp, lo, payload, offsets, lengths, n_steps=n_steps, m=m)
    fnd = found > 0
    n_hits = jnp.sum(found, axis=1)
    weighted = jnp.sum(jnp.where(fnd, p_wt, 0.0), axis=1)
    # the full sequential scoring state machine over the merged hits
    emit, (c_start, c_end, c_cnt, c_fi, c_wt) = _scan_score(
        fnd, p_fi, p_av, p_wt, 5, 0, 200, 0)
    n_calls = emit.sum(axis=1, dtype=jnp.int32)
    call_wt = jnp.sum(jnp.where(emit, c_wt, 0.0), axis=1)
    # per-sequence per-function weighted rollup onto a capped function
    # table (segment-reduce analogue of seq_score accumulation)
    NFUNC_TILE = 128
    f_mod = jnp.where(fnd, p_fi % NFUNC_TILE, NFUNC_TILE)
    one_hot = jax.nn.one_hot(f_mod, NFUNC_TILE + 1, dtype=jnp.float32)
    func_wt = jnp.einsum("bwf,bw->bf", one_hot,
                         jnp.where(fnd, p_wt, 0.0))
    return n_hits, weighted, func_wt[:, :NFUNC_TILE], n_calls, call_wt


@functools.partial(jax.jit, static_argnames=("n_steps", "m", "mesh"))
def _annotate_step_jit(bp, lo, payload, n_steps, m, mesh,
                       offsets, lengths):
    fn = jax.shard_map(
        functools.partial(_annotate_step_local, n_steps=n_steps, m=m),
        mesh=mesh,
        in_specs=(P("table", None, None), P("table", None),
                  P("table", None, None), P("data", None), P("data")),
        out_specs=(P("data"), P("data"), P("data", None), P("data"),
                   P("data")),
    )
    return fn(bp, lo, payload, offsets, lengths)


def annotate_step_sharded(sdb: ShardedDB, offsets, lengths):
    """Full jitted multi-chip annotation step (probe + merge + on-device
    score reductions)."""
    return _annotate_step_jit(sdb.bucket_pair, sdb.lo, sdb.payload,
                              sdb.n_steps, sdb.m,
                              sdb.mesh, jnp.asarray(offsets),
                              jnp.asarray(lengths))


class ShardedEngine:
    """Drop-in engine over a sharded DB: same compact-hit interface as
    FastAnnotator.probe_compact, batch sharded over "data"."""

    def __init__(self, db: SignatureDB, mesh: Mesh | None = None):
        self.mesh = mesh or make_mesh()
        self.db = db
        self.sdb = ShardedDB.from_db(db, self.mesh)

    def pad_to_data_axis(self, B: int) -> int:
        d = self.mesh.shape["data"]
        return -(-B // d) * d

    def pad_batch(self, seqs, pad_to=None):
        from ..core.engine import FastAnnotator
        return FastAnnotator.pad_batch(self, seqs, pad_to)

    def hits_of_batch(self, seqs, pad_to=None):
        """Compact per-sequence oracle.Hit lists (FastAnnotator-compatible
        interface for NR preload and handlers)."""
        from ..core import oracle as Orc
        h = self.probe_compact(*self.pad_batch(seqs, pad_to))
        out = []
        for s in range(len(seqs)):
            a, b = int(h["row_off"][s]), int(h["row_off"][s + 1])
            out.append([Orc.Hit(oI=int(h["oi"][k]), pos=int(h["pos"][k]),
                                avg_off=int(h["avg_off"][k]),
                                fI=int(h["fi"][k]), wt=float(h["wt"][k]),
                                code=int(h["code"][k]))
                        for k in range(a, b)])
        return out

    def probe_compact(self, offsets: np.ndarray, lengths: np.ndarray):
        B = offsets.shape[0]
        Bp = self.pad_to_data_axis(B)
        if Bp != B:
            offsets = np.concatenate(
                [offsets, np.full((Bp - B, offsets.shape[1]), 20, np.uint8)])
            lengths = np.concatenate([lengths, np.zeros(Bp - B, np.int32)])
        found, fi, oi, av, wt, hi, lo = probe_sharded(self.sdb, offsets, lengths)
        found = np.asarray(found)[:B] > 0
        rows, cols = np.nonzero(found)
        row_off = np.zeros(B + 1, dtype=np.int64)
        np.cumsum(np.bincount(rows, minlength=B), out=row_off[1:])
        code = (np.asarray(hi)[:B][rows, cols].astype(np.int64) * LO_CARD
                + np.asarray(lo)[:B][rows, cols].astype(np.int64))
        return dict(pos=cols.astype(np.int32),
                    fi=np.asarray(fi)[:B][rows, cols],
                    oi=np.asarray(oi)[:B][rows, cols],
                    avg_off=np.asarray(av)[:B][rows, cols],
                    wt=np.asarray(wt)[:B][rows, cols],
                    code=code, row_off=row_off)
