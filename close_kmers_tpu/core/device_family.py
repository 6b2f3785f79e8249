"""On-device family-score rollup.

The /lookup family path accumulates, per sequence, {family: (hit_count,
weighted_total += 1/N)} over every signature-kmer hit
(/root/reference/lookup_request.cc:446-469).  The host path ships compact
hit lists off-device first (~KBs per protein); this module keeps the
rollup on device so only the per-(sequence, family) score triples leave
the chip:

1. the kmer→family CSR is densified to a degree-padded [N+1, D] int32
   table aligned to the signature DB rows (D = max families per kmer);
   the 1/N degree weight is recomputed on device from the row's non-pad
   count (bit-identical to an IEEE f32 1/n table lookup, one less
   gather op);
2. the probe's matched row index gathers each hit's family row;
   (sequence, family) pairs are stable-sorted (two int32 keys —
   no 64-bit packing) and segment-reduced into run triples.

Exactness: hit counts are integer-exact.  weighted_total is a float32
segment reduction whose association order XLA chooses, so it can differ
from the reference's strictly-sequential adds in the last ulp; the
native/host path (native.family_scores) remains the byte-exact reference
and the server default.  Stable sorting preserves hit-then-list order
within each segment, so any divergence is pure f32 reassociation.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..db.signature_db import SignatureDB
from .engine import DeviceDB, encode_windows, probe_windows


@dataclasses.dataclass
class DeviceFamilyDB:
    fam: jax.Array      # i32[N+1, D] family ids, -1 padded
    d: int

    @classmethod
    def from_mapping(cls, db: SignatureDB, mapping, device=None) -> "DeviceFamilyDB":
        keys, offs, vals = mapping.fam_csr()
        n = len(db)
        rows = np.searchsorted(db.keys, keys)
        ok = (rows < n) & (db.keys[np.minimum(rows, n - 1)] == keys) \
            if n else np.zeros(len(keys), bool)
        counts = (offs[1:] - offs[:-1])
        D = int(counts.max()) if len(counts) else 1
        D = max(D, 1)
        fam = np.full((n + 1, D), -1, dtype=np.int32)
        # vectorized densify: column j gets the j-th family of every kmer
        # whose degree exceeds j
        for j in range(D):
            m = ok & (counts > j)
            fam[rows[m], j] = vals[offs[:-1][m] + j]
        put = functools.partial(jax.device_put, device=device)
        return cls(put(jnp.asarray(fam)), D)


@functools.partial(jax.jit, static_argnames=("capf",))
def _family_rollup_jit(bucket_pair, lo_arr, payload,
                       n, n_steps, fam_tab, offsets, lengths, capf,
                       lo_wide=None, payload_wide=None):
    ddb = DeviceDB(bucket_pair, lo_arr, payload, n_steps, n, lo_wide,
                   payload_wide)
    hi, lo, valid = encode_windows(offsets, lengths)
    found, _fi, _oi, _av, _wt, idx = probe_windows(ddb, hi, lo, valid)

    B, W = hi.shape
    fams = fam_tab[idx]                      # [B, W, D]
    D = fams.shape[-1]
    # 1/degree recomputed from the gathered row (degree = non-pad count);
    # saves the second gather op.  Selected from host-computed IEEE f32
    # constants (a static chain over deg in 1..D) rather than a device
    # divide — TPU f32 division is reciprocal-based and not guaranteed
    # correctly rounded, and these weights must match the host path's
    # np.float32(1.0/n) bit-for-bit.
    deg = (fams >= 0).sum(axis=-1)
    w = jnp.zeros(deg.shape, jnp.float32)
    for k in range(1, D + 1):
        w = jnp.where(deg == k, jnp.float32(np.float32(1.0) / np.float32(k)),
                      w)
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, W, D), 0)

    flat_f = fams.reshape(-1)
    flat_b = rows.reshape(-1)
    flat_w = jnp.broadcast_to(w[:, :, None], (B, W, D)).reshape(-1)
    BIG = jnp.int32(2 ** 30)
    ok = flat_f >= 0
    kb = jnp.where(ok, flat_b, BIG)
    kf = jnp.where(ok, flat_f, BIG)
    kw = jnp.where(ok, flat_w, 0.0)
    sb, sf, sw = jax.lax.sort((kb, kf, kw), num_keys=2, is_stable=True)

    change = jnp.concatenate([
        jnp.ones(1, bool), (sb[1:] != sb[:-1]) | (sf[1:] != sf[:-1])])
    rid = jnp.cumsum(change.astype(jnp.int32)) - 1
    rid_c = jnp.minimum(rid, capf - 1)
    is_real = sb != BIG
    counts = jax.ops.segment_sum(is_real.astype(jnp.int32), rid_c, capf)
    weights = jax.ops.segment_sum(sw, rid_c, capf)
    run_f = jax.ops.segment_min(jnp.where(is_real, sf, BIG), rid_c, capf)
    n_runs = jnp.sum(change & is_real)
    # per-sequence run counts for host-side slicing
    per_seq = jax.ops.segment_sum((change & is_real).astype(jnp.int32),
                                  jnp.minimum(jnp.where(is_real, sb, B), B),
                                  B + 1)[:B]
    # single packed buffer (one D2H, pipeline-friendly):
    # [B per_seq] ++ [capf run_f] ++ [capf counts] ++ [capf wt-bits] ++ [n_runs]
    return jnp.concatenate([
        per_seq, run_f, counts,
        jax.lax.bitcast_convert_type(weights, jnp.int32),
        n_runs[None].astype(jnp.int32)])


class DeviceFamilyScorer:
    """Fused probe + family rollup engine."""

    def __init__(self, db: SignatureDB, mapping, device=None):
        self.db = db
        self.ddb = DeviceDB.from_db(db, device=device)
        self.fdb = DeviceFamilyDB.from_mapping(db, mapping, device=device)

    def rollup(self, offsets: np.ndarray, lengths: np.ndarray,
               fams_per_seq_cap: int | None = None):
        if fams_per_seq_cap is None:
            # sticky: an overflow escalation re-raises the default so the
            # capf recompile cliff is paid once per scorer, not per batch
            fams_per_seq_cap = self._default_cap
        return self._rollup(offsets, lengths, fams_per_seq_cap)

    _default_cap = 8

    def rollup_packed(self, offsets: np.ndarray, lengths: np.ndarray,
                      fams_per_seq_cap: int | None = None):
        """Async variant: dispatches the fused rollup and returns the
        un-transferred packed device buffer plus capf, so callers can
        pipeline dispatch against readback.  Unpack with finish_rollup
        (None result = cap overflow, re-dispatch with a bigger cap)."""
        if fams_per_seq_cap is None:
            fams_per_seq_cap = self._default_cap
        B = offsets.shape[0]
        capf = B * fams_per_seq_cap
        d = self.ddb
        out = _family_rollup_jit(
            d.bucket_pair, d.lo, d.payload, d.n,
            d.n_steps, self.fdb.fam,
            jnp.asarray(offsets), jnp.asarray(lengths), capf, d.lo_wide,
            d.payload_wide)
        return out, capf

    @staticmethod
    def finish_rollup(out_np: np.ndarray, B: int, capf: int):
        """Packed buffer -> (n_per_seq [B], fam, count, weight).  Returns
        None when the run count overflowed capf (caller retries)."""
        n_runs = int(out_np[-1])
        if n_runs > capf - 1:
            return None
        per_seq = out_np[:B]
        run_f = out_np[B:B + capf][:n_runs]
        counts = out_np[B + capf:B + 2 * capf][:n_runs]
        weights = out_np[B + 2 * capf:B + 3 * capf][:n_runs].copy() \
            .view(np.float32)
        return per_seq, run_f, counts, weights

    def _rollup(self, offsets: np.ndarray, lengths: np.ndarray,
                fams_per_seq_cap: int):
        """Returns (n_per_seq [B], fam, count, weight arrays concatenated
        in (sequence, family-id) order).  Note: within a sequence the
        entries are family-id-ordered (sort-based), not first-hit-ordered
        like the host path."""
        B = offsets.shape[0]
        out, capf = self.rollup_packed(offsets, lengths, fams_per_seq_cap)
        res = self.finish_rollup(np.asarray(out), B, capf)
        if res is None:
            self._default_cap = max(self._default_cap, fams_per_seq_cap * 4)
            return self._rollup(offsets, lengths, fams_per_seq_cap * 4)
        return res
