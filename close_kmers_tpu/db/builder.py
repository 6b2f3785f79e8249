"""Offline signature-kmer database builder.

Re-implements build_signature_kmers (/root/reference/build_signature_kmers.cc)
with vectorized extraction and sort/segment group-by in place of the TBB
concurrent multimap + parallel_for pipeline:

* FunctionMap — id→function assignments from def files
  (build_signature_kmers.cc:270-295) and fasta deflines (:308-414),
  function→genome occurrence sets, and the keep rule: >= min_reps genomes
  OR in the good-functions list OR any role in the good-roles list
  (:432-488); kept functions get dense indexes in sorted-function order
  (:481-487, std::set iteration).
* SEED function hygiene — strip_func_comment and roles_of_function
  (seed_utils.h:10-39).
* Kmer extraction — every 8-char window of every kept-function protein
  whose characters are in the ok_prot set (UPPER+lower alphabet,
  :569-632); note offset-from-end n = len - i INCLUDES the kmer itself,
  and unlike the query engine's scan bound, the final window IS extracted.
* Signature selection (process_set, :663-710) — per kmer group: plurality
  function (ties keep the smallest function index, std::max_element), keep
  iff best_count >= 0.8 * group size; median offset = sorted[size/2].
* Weight formula (:841-853) —
  w = log((NSiFj+1)/(NSi-NSiFj+1)) + log((NSF-NFj+KS)/(NFj+KS)).
* Outputs (:1310-1376) — function.index, empty otu.index, stub genomes
  file, final.kmers text, and the two-level sorted-array DB (plus a
  reference-compatible mem_map on request).

Kmers containing lowercase letters survive extraction and statistics but
encode to the invalid sentinel at table-insert time and are therefore
dropped from the probe table, exactly like insert_kmer (kguts.cc:202-210).

Determinism: the reference's concurrent_vector fill makes its final.kmers
order nondeterministic; this builder orders kept kmers by raw kmer bytes.
"""

from __future__ import annotations

import os
import re

import numpy as np

from ..params import K
from .signature_db import SignatureDB, write_index_file

STRIP_FUNC_COMMENT_RE = re.compile(r"(\s*\#.*$)")
SPLIT_FUNCTION_RE = re.compile(r"\s+[/@]\s+|\s*;\s+")
GENOME_RE = re.compile(r"\s+(.*)\s+\[([^]]+)\]$")
FIGID_RE = re.compile(r"fig\|(\d+\.\d+)")
GENOME_ID_RE = re.compile(r"\d+\.\d+")

MAX_SEQUENCES_PER_FILE = 1 << 32

# ok_prot (build_signature_kmers.cc:569-570): upper AND lower case.
_OK_PROT = np.zeros(256, dtype=bool)
for _c in "ACDEFGHIKLMNPQRSTVWYacdefghiklmnpqrstvwy":
    _OK_PROT[ord(_c)] = True


def strip_func_comment(s: str) -> str:
    return STRIP_FUNC_COMMENT_RE.sub("", s)


def roles_of_function(function: str) -> list[str]:
    return SPLIT_FUNCTION_RE.split(strip_func_comment(function))


class FunctionMap:
    """build_signature_kmers.cc:264-559."""

    def __init__(self) -> None:
        self.id_function: dict[str, str] = {}
        self.function_genomes: dict[str, set[str]] = {}
        self.good_functions: set[str] = set()
        self.good_roles: set[str] = set()
        self.function_index: dict[str, int] = {}

    def load_id_assignments(self, path: str) -> None:
        with open(path) as f:
            for line in f:
                line = line.rstrip("\n")
                s = line.find("\t")
                if s < 0:
                    continue
                s2 = line.find("\t", s + 1)
                func = line[s + 1:] if s2 < 0 else line[s + 1:s2]
                self.id_function[line[:s]] = strip_func_comment(func)

    def load_fasta_file(self, path: str, keep_function_flag: bool = False) -> None:
        from ..io.fasta import parse_fasta_file
        genome = ""
        for sid, defline, seq in parse_fasta_file(path):
            if not sid:
                continue
            func = ""
            if defline:
                x = len(defline) - len(defline.lstrip(" \t"))
                func = defline[x:]
            genome_loc = ""
            m = GENOME_RE.fullmatch(defline)
            if m:
                func = strip_func_comment(m.group(1))
                genome_loc = m.group(2)
            if not genome:
                if not defline:
                    m2 = FIGID_RE.search(sid)
                    if m2:
                        genome = m2.group(1)
                elif genome_loc:
                    genome = genome_loc
            if not genome:
                genome = os.path.basename(path)
            cur = self.id_function.get(sid, "")
            if not cur:
                if func:
                    self.id_function[sid] = func
            else:
                func = cur
            if func:
                self.function_genomes.setdefault(func, set()).add(genome)
                if keep_function_flag:
                    self.good_functions.add(func)

    def process_kept_functions(self, min_reps_required: int = 5) -> None:
        kept = set()
        for function, genomes in self.function_genomes.items():
            ok = len(genomes) >= min_reps_required \
                or function in self.good_functions
            if not ok:
                for role in roles_of_function(function):
                    if role in self.good_roles:
                        ok = True
                        break
            if ok:
                kept.add(function)
        for i, f in enumerate(sorted(kept)):
            self.function_index[f] = i

    def lookup_function(self, sid: str) -> str:
        return self.id_function.get(sid, "")

    def lookup_index(self, func: str) -> int:
        return self.function_index.get(func, -1)

    def functions_by_index(self) -> list[str]:
        out = [""] * len(self.function_index)
        for f, i in self.function_index.items():
            out[i] = f
        return out


def _extract_kmers(fm: FunctionMap, path: str, file_number: int,
                   seqs_with_func: np.ndarray, keys, funcs, offs, seq_ids):
    """load_fasta/load_sequence (:572-656): append raw-byte kmer keys with
    attributes for every valid window of every kept-function protein."""
    from ..io.fasta import parse_fasta_file
    next_seq_id = file_number * MAX_SEQUENCES_PER_FILE
    for sid, _d, seq in parse_fasta_file(path):
        if not sid:
            continue
        func = fm.lookup_function(sid)
        if not func:
            continue
        seq_id = next_seq_id
        next_seq_id += 1
        fi = fm.lookup_index(func)
        if fi < 0:
            continue
        seqs_with_func[fi] += 1
        b = np.frombuffer(seq.encode("latin-1"), dtype=np.uint8)
        n = len(b) - K + 1
        if n <= 0:
            continue
        ok = np.ones(n, dtype=bool)
        okc = _OK_PROT[b]
        key = np.zeros(n, dtype=np.uint64)
        for j in range(K):
            ok &= okc[j:j + n]
            key = (key << np.uint64(8)) | b[j:j + n].astype(np.uint64)
        idx = np.nonzero(ok)[0]
        keys.append(key[idx])
        funcs.append(np.full(len(idx), fi, dtype=np.int32))
        # offset from end INCLUDING this kmer: n_dist = len - i  (:609)
        offs.append((len(b) - idx).astype(np.int32))
        seq_ids.append(np.full(len(idx), seq_id, dtype=np.int64))


def _key_to_kmer(key: int) -> str:
    return int(key).to_bytes(8, "big").decode("latin-1")


class BuildResult:
    def __init__(self, fm, kept_keys, median_off, best_func, weights, stats):
        self.fm = fm
        self.kept_keys = kept_keys        # uint64 raw-byte kmer keys
        self.median_off = median_off
        self.best_func = best_func
        self.weights = weights
        self.stats = stats

    def kept_kmer_strings(self):
        return [_key_to_kmer(k) for k in self.kept_keys]

    def to_signature_db(self) -> SignatureDB:
        """Insertable entries only (valid uppercase encodings), like
        write_hashtable + insert_kmer (:886-892, kguts.cc:202-210)."""
        entries = []
        for i, key in enumerate(self.kept_keys):
            entries.append((_key_to_kmer(key), int(self.median_off[i]),
                            int(self.best_func[i]), float(self.weights[i]),
                            -1))
        return SignatureDB.from_entries(entries,
                                        functions=self.fm.functions_by_index())

    def write_final_kmers(self, path: str) -> None:
        with open(path, "w") as f:
            for i, key in enumerate(self.kept_keys):
                f.write(f"{_key_to_kmer(key)}\t{int(self.median_off[i])}\t"
                        f"{int(self.best_func[i])}\t"
                        f"{'%g' % np.float32(self.weights[i])}\t-1\n")

    def write_data_dir(self, out_dir: str, mem_map: bool = False) -> None:
        """:1310-1323, 1363-1376."""
        os.makedirs(out_dir, exist_ok=True)
        write_index_file(os.path.join(out_dir, "function.index"),
                         self.fm.functions_by_index())
        open(os.path.join(out_dir, "otu.index"), "w").close()
        with open(os.path.join(out_dir, "genomes"), "w") as f:
            f.write("empty genomes\n")
        self.write_final_kmers(os.path.join(out_dir, "final.kmers"))
        db = self.to_signature_db()
        db.save_npz(os.path.join(out_dir, "signature_db.npz"))
        if mem_map:
            db.save_mem_map(os.path.join(out_dir, "kmer.table.mem_map"))


def build_signature_kmers(
    fasta_paths: list[str],
    kept_function_fasta_paths: list[str] = (),
    def_paths: list[str] = (),
    min_reps_required: int = 5,
    good_functions: list[str] = (),
    good_roles: list[str] = (),
) -> BuildResult:
    """The full builder pipeline (main, :1170-1376)."""
    fm = FunctionMap()
    fm.good_functions.update(good_functions)
    fm.good_roles.update(good_roles)
    for p in def_paths:
        fm.load_id_assignments(p)
    all_fastas = []
    for p in fasta_paths:
        fm.load_fasta_file(p, False)
        all_fastas.append(p)
    for p in kept_function_fasta_paths:
        fm.load_fasta_file(p, True)
        all_fastas.append(p)
    fm.process_kept_functions(min_reps_required)

    n_funcs = len(fm.function_index)
    seqs_with_func = np.zeros(max(n_funcs, 1), dtype=np.int64)
    keys, funcs, offs, seq_ids = [], [], [], []
    for file_number, p in enumerate(all_fastas):
        _extract_kmers(fm, p, file_number, seqs_with_func,
                       keys, funcs, offs, seq_ids)

    if keys:
        key = np.concatenate(keys)
        func = np.concatenate(funcs)
        off = np.concatenate(offs)
        seq_id = np.concatenate(seq_ids)
    else:
        key = np.zeros(0, dtype=np.uint64)
        func = off = np.zeros(0, dtype=np.int32)
        seq_id = np.zeros(0, dtype=np.int64)

    # ---- group by kmer (sort-based replacement for the TBB multimap) ----
    order = np.lexsort((func, key))
    key_s, func_s, off_s, seq_s = key[order], func[order], off[order], seq_id[order]
    grp_start = np.nonzero(np.concatenate(
        [[True], key_s[1:] != key_s[:-1]]))[0] if len(key_s) else np.zeros(0, int)
    grp_end = np.concatenate([grp_start[1:], [len(key_s)]]).astype(np.int64) \
        if len(key_s) else np.zeros(0, int)

    kept_keys, med_off, best_funcs, nsi, nsifj = [], [], [], [], []
    kept_group_ranges = []
    for a, b in zip(grp_start, grp_end):
        a, b = int(a), int(b)
        count = b - a
        # plurality function: entries sorted by func within group; ties on
        # count keep the smallest index (std::max_element over std::map)
        fvals, fcounts = np.unique(func_s[a:b], return_counts=True)
        bi = int(np.argmax(fcounts))   # first max = smallest func on ties
        best_func, best_count = int(fvals[bi]), int(fcounts[bi])
        if best_count < 0.8 * count:
            continue
        o = np.sort(off_s[a:b])
        kept_keys.append(key_s[a])
        med_off.append(int(o[len(o) // 2]))
        best_funcs.append(best_func)
        nsi.append(count)
        nsifj.append(best_count)
        kept_group_ranges.append((a, b))

    kept_keys = np.array(kept_keys, dtype=np.uint64)
    med_off = np.array(med_off, dtype=np.int32)
    best_funcs = np.array(best_funcs, dtype=np.int32)
    nsi = np.array(nsi, dtype=np.int64)
    nsifj = np.array(nsifj, dtype=np.int64)

    # NSF: distinct sequences containing any kept signature (:699)
    if kept_group_ranges:
        seq_sets = np.concatenate([seq_s[a:b] for a, b in kept_group_ranges])
        nsf = len(np.unique(seq_sets))
    else:
        nsf = 0
    ks = len(kept_keys)  # distinct_signatures (:705)

    # ---- weights (:841-853), float32 operands, double log math ----
    NSF = np.float64(np.float32(nsf))
    KS = np.float64(np.float32(ks))
    NSi = np.float32(nsi).astype(np.float64)
    NSiFj = np.float32(nsifj).astype(np.float64)
    NFj = np.float32(seqs_with_func[best_funcs] if n_funcs else
                     np.zeros(0)).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        w = (np.log((NSiFj + 1.0) / (NSi - NSiFj + 1.0))
             + np.log((NSF - NFj + KS) / (NFj + KS)))
    weights = w.astype(np.float32)

    stats = dict(
        distinct_signatures=ks,
        num_seqs_with_a_signature=nsf,
        seqs_with_func=seqs_with_func,
        total_kmers_extracted=int(len(key)),
    )
    return BuildResult(fm, kept_keys, med_off, best_funcs, weights, stats)
