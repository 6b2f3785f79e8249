"""Engine facade: batch protein annotation with oracle-exact outputs,
backed by the device probe + native C++ scoring.

This is the layer request handlers talk to — the analogue of a
thread-local KmerGuts in the reference's ThreadPool
(/root/reference/threadpool.h:42, threadpool.cc:27-43), except one engine
serves all requests with batched device probes.
"""

from __future__ import annotations

import numpy as np

from ..params import EngineParams
from ..db.signature_db import SignatureDB
from . import oracle as O
from .engine import FastAnnotator, finish_best_call


class AnnotationResult:
    __slots__ = ("seq_id", "seq_len", "calls", "hits", "otu", "best")

    def __init__(self, seq_id, seq_len, calls, hits, otu, best=None):
        self.seq_id = seq_id
        self.seq_len = seq_len
        self.calls = calls
        self.hits = hits
        self.otu = otu
        self.best = best


class KmerEngine:
    """Batch annotation engine with reference-exact semantics."""

    def __init__(self, db: SignatureDB, device=None, mesh=None):
        """``mesh``: optional jax Mesh — probe against a range-sharded DB
        over its ("data","table") axes instead of one device."""
        self.db = db
        if mesh is not None:
            from ..parallel.sharding import ShardedEngine
            self.fa = ShardedEngine(db, mesh)
        else:
            self.fa = FastAnnotator(db, device=device)
        self.function_of = db.function_of

    # -- core batch annotation ----------------------------------------------

    def annotate(self, items: list[tuple[str, str]],
                 params: EngineParams | None = None,
                 want_hits: bool = False, want_otu: bool = False,
                 want_best: bool = False) -> list[AnnotationResult]:
        """process_aa_seq for a batch: device probe, native scoring.
        ``hits`` are oracle.Hit lists (populated only if want_hits);
        ``otu`` are finalized OtuStats (only if want_otu);
        ``best`` are BestCall (only if want_best)."""
        return self.annotate_with_hits(items, params, want_hits, want_otu,
                                       want_best)[0]

    def annotate_with_hits(self, items, params=None, want_hits=False,
                           want_otu=False, want_best=False):
        """annotate() plus the batch's compact hit arrays as an explicit
        return — concurrency-safe (no reliance on the _last_hits stash,
        which a second caller can overwrite between annotate and read)."""
        from ..native import api as native

        params = params or EngineParams()
        seqs = [s for _, s in items]
        if not items:
            return [], dict(row_off=np.zeros(1, np.int64))
        offsets, lengths = self.fa.pad_batch(seqs)
        h = self.fa.probe_compact(offsets, lengths)
        n_calls, cs, ce, cc, cf, cw, votes = native.score_batch(
            h["pos"], h["fi"], h["oi"], h["avg_off"], h["wt"], h["row_off"],
            params, max_calls_per_seq=max(64, offsets.shape[1] // 4),
            want_votes=want_otu)
        if want_best:
            nf, ofi, ocnt, owt = native.best_call_batch(
                n_calls, cs, ce, cc, cf, cw)
        results = []
        for s, (sid, seq) in enumerate(items):
            calls = [O.Call(int(cs[s, i]), int(ce[s, i]), int(cc[s, i]),
                            int(cf[s, i]), np.float32(cw[s, i]))
                     for i in range(int(n_calls[s]))]
            hits = None
            a, b = int(h["row_off"][s]), int(h["row_off"][s + 1])
            if want_hits:
                hits = [O.Hit(oI=int(h["oi"][k]), pos=int(h["pos"][k]),
                              avg_off=int(h["avg_off"][k]), fI=int(h["fi"][k]),
                              wt=float(h["wt"][k]), code=int(h["code"][k]))
                        for k in range(a, b)]
            otu = None
            if want_otu:
                otu = O.OtuStats()
                for k in range(a, b):
                    if votes[k]:
                        otu.add(int(h["oi"][k]))
                otu.finalize()
            best = None
            if want_best:
                best = finish_best_call(int(nf[s]), ofi[s], ocnt[s], owt[s],
                                        self.function_of)
            results.append(AnnotationResult(sid, len(seq), calls, hits, otu,
                                            best))
        self._last_hits = h  # compact hit arrays for family accumulation
        return results, h

    def family_scores_batch(self, mapping, h=None) -> tuple:
        """Per-sequence family score accumulation against ``mapping``'s
        CSR.  ``h``: compact hit arrays from annotate_with_hits; defaults
        to the most recent annotate() batch (single-caller use only)."""
        from ..native import api as native
        if h is None:
            h = self._last_hits
        keys, offs, vals = mapping.fam_csr()
        return native.family_scores(h["code"], h["row_off"], keys, offs, vals)

    def hits_compact(self):
        return self._last_hits

    def best_call(self, calls: list[O.Call]) -> O.BestCall:
        return O.find_best_call(calls, self.function_of)
