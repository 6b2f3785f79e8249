"""Family databases: PATRIC global/local family metadata, kmer→family and
kmer→peg mappings, and family representative pegs.

Parity targets in /root/reference:

* KmerPegMapping — kmer.h:25-159, kmer.cc.  TBB concurrent hash maps
  become host-side dicts during load, finalized into CSR arrays (sorted
  int64 kmer keys + offsets + flat value list) for query-time lookups and
  for shipping to device.
* load_families — kmer.cc:358-508 (9-column families.dat: pgf/plf naming,
  genus mapping, per-family size/count rollup).
* load_genus_map — kmer.cc:338-355.
* add_fam_mapping — kmer.cc:244-268: per-kmer family list is DEDUPED,
  first-insertion order (fam_map_insert, kmer.cc:216-230).
* add_mapping (peg mode) — kmer.cc:174-214: NOT deduped.
* NR preload — nr_loader.cc:131-186: per NR protein, all signature-kmer
  hits map the kmer to the protein's family.
* FamilyReps — family_reps.cc:14-80.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np


@dataclasses.dataclass
class FamilyData:
    """family_data_t (kmer.h:58-68)."""
    pgf: str
    plf: str
    genus_id: int
    function: str
    family_id: int
    total_size: int
    count: int


class KmerFamilyMapping:
    """Host-side mapping database (KmerPegMapping analog).

    Pegs are interned to dense ids in first-seen order (assign_new_peg_id,
    kmer.h:111-118); families to dense ids in first-seen file order
    (kmer.cc:446-501, single-threaded here so deterministic).
    """

    def __init__(self) -> None:
        self.genus_map: dict[str, str] = {}
        self.families: list[FamilyData] = []
        self.family_key_to_id: dict[tuple[str, str], int] = {}
        self.peg_names: list[str] = []
        self.peg_to_id: dict[str, int] = {}
        self.peg_to_family: dict[int, int] = {}
        # build-phase maps; finalized into CSR
        self._kmer_to_fams: dict[int, list[int]] = {}
        self._kmer_to_pegs: dict[int, list[int]] = {}
        self._fam_csr = None
        self._peg_csr = None
        self._meta_arrays = None
        # Bumped by any mutation of `families` (load_families); keys the
        # family_meta_arrays cache so in-place metadata edits or a
        # same-length reload can't serve stale interned arrays.
        self._families_gen = 0

    def family_meta_arrays(self):
        """Interned per-family metadata for the vectorized best-match scan
        (core.family.find_best_family_matches_batch): int32 arrays
        (func_id, pgf_id, genus_id) over family ids, the pgf/plf name
        lists those ids index, and the function-string intern dict.
        Cached; invalidated by the families generation counter."""
        F = len(self.families)
        gen = (self._families_gen, F)
        if self._meta_arrays is not None and self._meta_arrays[0] == gen:
            return self._meta_arrays[1]
        func_intern: dict[str, int] = {}
        pgf_intern: dict[str, int] = {}
        func_id = np.empty(F, dtype=np.int32)
        pgf_id = np.empty(F, dtype=np.int32)
        genus_id = np.empty(F, dtype=np.int32)
        plf_names = []
        for i, fd in enumerate(self.families):
            func_id[i] = func_intern.setdefault(fd.function, len(func_intern))
            pgf_id[i] = pgf_intern.setdefault(fd.pgf, len(pgf_intern))
            genus_id[i] = fd.genus_id
            plf_names.append(fd.plf)
        pgf_names = list(pgf_intern)
        out = (func_id, pgf_id, genus_id, pgf_names, plf_names, func_intern)
        self._meta_arrays = (gen, out)
        return out

    # -- id interning -------------------------------------------------------

    def encode_peg(self, peg: str) -> int:
        pid = self.peg_to_id.get(peg)
        if pid is None:
            pid = len(self.peg_names)
            self.peg_to_id[peg] = pid
            self.peg_names.append(peg)
        return pid

    def decode_peg(self, pid: int) -> str:
        return self.peg_names[pid]

    # -- loading ------------------------------------------------------------

    def load_genus_map(self, path: str) -> None:
        """genus \\t taxon-id lines (kmer.cc:338-355)."""
        with open(path) as f:
            for line in f:
                cols = line.rstrip("\n").split("\t")
                if len(cols) >= 2:
                    self.genus_map[cols[0]] = cols[1]

    def lookup_genus(self, genus: str) -> str:
        return self.genus_map.get(genus, "")

    def load_families(self, path: str) -> None:
        """PATRIC families.dat: 9 columns (kmer.cc:358-374).

        pgf = "PGF_" + col0[2:]; plf = "PLF_" + genus-taxon + "_" +
        zero-padded(col8, 8); unmapped genus falls back to the genus name
        itself with genus_id 0 (kmer.cc:423-444).
        """
        warned: set[str] = set()
        self._families_gen += 1
        with open(path) as f:
            for line in f:
                cols = line.rstrip("\n").split("\t")
                if len(cols) < 9:
                    continue
                pgf = "PGF_" + cols[0][2:]
                mapped = self.genus_map.get(cols[7])
                if mapped is None:
                    if cols[7] not in warned:
                        warned.add(cols[7])
                    plf_mid = cols[7]
                    genus_id = 0
                else:
                    plf_mid = mapped
                    genus_id = int(mapped)
                plf = "PLF_" + plf_mid + "_" + "0" * max(0, 8 - len(cols[8])) + cols[8]
                pid = self.encode_peg(cols[3])
                seqlen = int(cols[4])
                fkey = (pgf, plf)
                fam_id = self.family_key_to_id.get(fkey)
                if fam_id is None:
                    fam_id = len(self.families)
                    self.family_key_to_id[fkey] = fam_id
                    self.families.append(FamilyData(pgf, plf, genus_id, cols[5],
                                                    fam_id, seqlen, 1))
                else:
                    fd = self.families[fam_id]
                    fd.total_size += seqlen
                    fd.count += 1
                self.peg_to_family[pid] = fam_id

    # -- kmer mapping inserts ----------------------------------------------

    def add_fam_mapping(self, fam_id: int, kmer: int) -> None:
        """Deduped, insertion-ordered (kmer.cc:216-230,244-268)."""
        lst = self._kmer_to_fams.get(kmer)
        if lst is None:
            self._kmer_to_fams[kmer] = [fam_id]
        elif fam_id not in lst:
            lst.append(fam_id)
        self._fam_csr = None

    def add_peg_mapping(self, peg_id: int, kmer: int) -> None:
        """NOT deduped (kmer.cc:174-214)."""
        self._kmer_to_pegs.setdefault(kmer, []).append(peg_id)
        self._peg_csr = None

    def load_nr(self, nr_path: str, engine, batch_size: int = 512) -> int:
        """Preload kmer→family mappings from a families NR FASTA
        (nr_loader.cc:131-186): for each protein with a known family,
        every signature-kmer hit maps that kmer to the family.

        ``engine`` must expose hits_of_batch(list[str]) (TpuEngine or a
        host fallback).  Returns number of proteins processed.
        """
        from ..io.fasta import parse_fasta_file

        seqs = list(parse_fasta_file(nr_path))
        n_done = 0
        for i in range(0, len(seqs), batch_size):
            chunk = seqs[i:i + batch_size]
            hit_lists = engine.hits_of_batch([s for _, _, s in chunk])
            for (sid, _, _), hits in zip(chunk, hit_lists):
                pid = self.encode_peg(sid)
                fam_id = self.peg_to_family.get(pid)
                if fam_id is None:
                    # NO FAM FOR id (nr_loader.cc:152-158): skip.
                    continue
                for h in hits:
                    self.add_fam_mapping(fam_id, h.code)
                n_done += 1
        return n_done

    # -- CSR finalization & lookup ------------------------------------------

    @staticmethod
    def _to_csr(d: dict[int, list[int]]):
        keys = np.array(sorted(d.keys()), dtype=np.int64)
        offs = np.zeros(len(keys) + 1, dtype=np.int64)
        vals_list = []
        for i, k in enumerate(keys):
            v = d[int(k)]
            vals_list.append(np.asarray(v, dtype=np.int32))
            offs[i + 1] = offs[i] + len(v)
        vals = (np.concatenate(vals_list) if vals_list
                else np.zeros(0, dtype=np.int32))
        return keys, offs, vals

    def fam_csr(self):
        if self._fam_csr is None:
            self._fam_csr = self._to_csr(self._kmer_to_fams)
        return self._fam_csr

    def peg_csr(self):
        if self._peg_csr is None:
            self._peg_csr = self._to_csr(self._kmer_to_pegs)
        return self._peg_csr

    def families_of_kmer(self, kmer: int) -> list[int]:
        lst = self._kmer_to_fams.get(kmer)
        return lst if lst is not None else []

    def pegs_of_kmer(self, kmer: int) -> list[int]:
        lst = self._kmer_to_pegs.get(kmer)
        return lst if lst is not None else []

    def write_kmer_distribution(self, os_) -> None:
        """--kmer-family-distribution-file debug dump
        (kmer.cc:526-545): ``kmer \\t code \\t n_families`` per kmer,
        plus ``pgf plf function`` columns when exactly one family."""
        from ..ops.encoder import decode_kmer

        for code, fams in self._kmer_to_fams.items():
            os_.write(f"{decode_kmer(code)}\t{code}\t{len(fams)}")
            if len(fams) == 1:
                fd = self.families[fams[0]]
                os_.write(f"\t{fd.pgf}\t{fd.plf}\t{fd.function}")
            os_.write("\n")

    def dump_sizes(self) -> str:
        """/dump_sizes debug endpoint content (kmer.cc:510-524 analog)."""
        lines = [
            f"kmer_to_id_: size={len(self._kmer_to_pegs)}",
            f"kmer_to_id_: content size={sum(len(v) for v in self._kmer_to_pegs.values())}",
            f"peg_to_id_: size={len(self.peg_to_id)}",
            f"kmer_to_family_id_: size={len(self._kmer_to_fams)}",
            f"family_data_: size={len(self.families)}",
        ]
        return "\n".join(lines) + "\n"


@dataclasses.dataclass
class RepData:
    """family_reps.h:28-38."""
    feature_id: str
    contig: str
    contig_length: int
    start: int
    end: int
    strand: str


class FamilyReps:
    """Local-family representative pegs (family_reps.cc)."""

    def __init__(self) -> None:
        self.reps: dict[str, list[RepData]] = {}

    def load_reps_file(self, path: str) -> None:
        """TSV with header; columns per family_reps.cc:44-49:
        col3 = local family id (key), col2 = feature, col5 = contig,
        col6 = start, col7 = end, col8 = strand, col9 = contig length."""
        with open(path) as f:
            f.readline()  # header
            for line in f:
                cols = line.rstrip("\n").split("\t")
                if len(cols) < 10:
                    continue
                try:
                    self.reps.setdefault(cols[3], []).append(RepData(
                        feature_id=cols[2], contig=cols[5],
                        contig_length=int(cols[9]) if cols[9] else 0,
                        start=int(cols[6]), end=int(cols[7]),
                        strand=cols[8][0] if cols[8] else " "))
                except ValueError:
                    # reference aborts the whole file on stoul errors
                    # (family_reps.cc:52-55); we skip the line.
                    continue

    def load_reps_directory(self, path: str) -> None:
        for name in sorted(os.listdir(path)):
            self.load_reps_file(os.path.join(path, name))
