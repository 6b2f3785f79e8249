"""kser: the signature-kmer annotation server CLI.

Parity with the reference's kser main (/root/reference/kser.cc):

* ``kser [options] <port> <kmer-data-dir>``;
* auto-discovers family assets inside the data dir like kser.cc:104-184:
  ``families.dat`` (9-column PATRIC families), ``families.genus_map``,
  ``families.nr`` (file or directory of NR FASTAs), ``VERSION`` and
  ``families.version`` version stamps;
* preloads the family NR (NRLoader analogue, kserver.cc:96-126) through
  the batch engine;
* ``--reps-file/--reps-dir`` load family representatives (kser.cc:258-277);
* ``--listen-port-file`` writes the bound port (kserver.cc:154-159);
* ``--no-listen`` exits after loading (kser.cc option).
"""

from __future__ import annotations

import argparse
import asyncio
import os
import sys
import time


def discover_data_dir(data_dir: str) -> dict:
    """kser.cc:104-184 auto-discovery."""
    found = {}
    def maybe(name, key):
        p = os.path.join(data_dir, name)
        if os.path.exists(p):
            found[key] = p
    maybe("families.dat", "families_file")
    maybe("families.genus_map", "genus_map")
    maybe("families.nr", "nr_path")
    maybe("VERSION", "kmer_version_file")
    maybe("families.version", "families_version_file")
    return found


def load_server_context(data_dir: str, args=None, batch_size: int = 2048,
                        n_shards: int = 0):
    from ..core.api import KmerEngine
    from ..db.signature_db import SignatureDB
    from ..db.family_db import FamilyReps
    from ..server.http import ServerContext

    t0 = time.time()
    db = SignatureDB.load_dir(data_dir)
    print(f"loaded signature DB: {len(db):,} kmers in {time.time()-t0:.1f}s",
          file=sys.stderr)
    mesh = None
    if n_shards:
        from ..parallel.sharding import make_mesh
        mesh = make_mesh(1, n_shards)
        print(f"serving with {n_shards} table shards", file=sys.stderr)
    engine = KmerEngine(db, mesh=mesh)

    found = discover_data_dir(data_dir)
    kmer_version = families_version = ""
    if "kmer_version_file" in found:
        kmer_version = open(found["kmer_version_file"]).read().strip()
    if "families_version_file" in found:
        families_version = open(found["families_version_file"]).read().strip()

    family_mode = "families_file" in found
    reps = None
    if args is not None:
        if args.reps_file or args.reps_dir:
            reps = FamilyReps()
            if args.reps_file:
                reps.load_reps_file(args.reps_file)
            if args.reps_dir:
                reps.load_reps_directory(args.reps_dir)

    ctx = ServerContext(engine, family_mode=family_mode, family_reps=reps,
                        kmer_version=kmer_version,
                        families_version=families_version,
                        batch_size=batch_size)

    if family_mode:
        root = ctx.mapping("")
        t0 = time.time()
        if "genus_map" in found:
            root.load_genus_map(found["genus_map"])
        root.load_families(found["families_file"])
        print(f"loaded families: {len(root.families):,} in "
              f"{time.time()-t0:.1f}s", file=sys.stderr)
        if "nr_path" in found:
            t0 = time.time()
            n = 0
            nr = found["nr_path"]
            files = ([os.path.join(nr, f) for f in sorted(os.listdir(nr))]
                     if os.path.isdir(nr) else [nr])
            adapter = _EngineNrAdapter(engine)
            for f in files:
                n += root.load_nr(f, adapter)
            print(f"NR preload: {n:,} proteins in {time.time()-t0:.1f}s",
                  file=sys.stderr)
    return ctx


class _EngineNrAdapter:
    """Adapter giving KmerFamilyMapping.load_nr the hits_of_batch interface
    backed by the fast compact probe."""

    def __init__(self, engine):
        self.engine = engine

    def hits_of_batch(self, seqs):
        from ..core import oracle as O
        fa = self.engine.fa
        h = fa.probe_compact(*fa.pad_batch(seqs))
        out = []
        for s in range(len(seqs)):
            a, b = int(h["row_off"][s]), int(h["row_off"][s + 1])
            out.append([O.Hit(oI=int(h["oi"][k]), pos=int(h["pos"][k]),
                              avg_off=int(h["avg_off"][k]),
                              fI=int(h["fi"][k]), wt=float(h["wt"][k]),
                              code=int(h["code"][k]))
                        for k in range(a, b)])
        return out


def main(argv=None):
    ap = argparse.ArgumentParser(prog="kser",
                                 description="TPU signature-kmer server")
    ap.add_argument("port", type=int)
    ap.add_argument("data_dir")
    ap.add_argument("--listen-port-file", default=None)
    ap.add_argument("--no-listen", action="store_true")
    ap.add_argument("--reps-file", default=None)
    ap.add_argument("--reps-dir", default=None)
    ap.add_argument("--batch-size", type=int, default=2048)
    ap.add_argument("--restore", default=None,
                    help="restore mapping state from a /checkpoint file")
    ap.add_argument("--checkpoint-dir", default=".",
                    help="directory for /checkpoint output")
    ap.add_argument("--shards", type=int, default=0,
                    help="range-shard the DB across this many devices "
                         "(table axis of a 1 x N mesh)")
    ap.add_argument("--pid-file", default=None,
                    help="write the server pid to this file (kser.cc:215-245)")
    ap.add_argument("--n-kmer-threads", type=int, default=1,
                    help="accepted for reference CLI compat; batching "
                         "replaces thread-level parallelism")
    args = ap.parse_args(argv)

    if args.pid_file:
        with open(args.pid_file, "w") as f:
            f.write(f"{os.getpid()}\n")
    ctx = load_server_context(args.data_dir, args, args.batch_size,
                              args.shards)
    ctx.checkpoint_dir = args.checkpoint_dir
    if args.restore:
        ctx.restore(args.restore)
        print(f"restored mapping state from {args.restore}", file=sys.stderr)
    if args.no_listen:
        return 0

    from ..server.http import serve
    asyncio.run(serve(ctx, port=args.port, port_file=args.listen_port_file))
    return 0


if __name__ == "__main__":
    sys.exit(main())
