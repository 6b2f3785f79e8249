"""DB builder tests: keep rules, plurality selection, median offsets,
weight formula, output formats, and end-to-end round trip through the
server engine."""

import math
import os

import numpy as np
import pytest

from close_kmers_tpu.db import builder as B
from close_kmers_tpu.db.signature_db import SignatureDB, load_index_file


def test_strip_and_roles():
    assert B.strip_func_comment("Some function # with comment") == "Some function"
    assert B.roles_of_function("Role A / Role B @ Role C; Role D") == \
        ["Role A", "Role B", "Role C", "Role D"]
    assert B.roles_of_function("Lone role") == ["Lone role"]


@pytest.fixture()
def corpus(tmp_path):
    rng = np.random.default_rng(17)
    alpha = list("ACDEFGHIKLMNPQRSTVWY")
    protA = "".join(rng.choice(alpha, size=40))
    protB = "".join(rng.choice(alpha, size=40))
    protC = "".join(rng.choice(alpha, size=40))
    files = []
    # function A in 5 genomes (kept), B in 2 (dropped), C in 1 but kept
    # via good-roles.
    for g in range(5):
        p = tmp_path / f"g{g}.fa"
        body = f">fig|{100+g}.1.peg.1 Function A\n{protA}\n"
        if g < 2:
            body += f">fig|{100+g}.1.peg.2 Function B\n{protB}\n"
        if g == 0:
            body += f">fig|{100}.1.peg.3 Role X / Role Y\n{protC}\n"
        p.write_text(body)
        files.append(str(p))
    return files, protA, protB, protC


def test_keep_rules(corpus, tmp_path):
    files, protA, protB, protC = corpus
    r = B.build_signature_kmers(files, min_reps_required=5,
                                good_roles=["Role Y"])
    funcs = r.fm.functions_by_index()
    assert "Function A" in funcs
    assert "Function B" not in funcs
    assert "Role X / Role Y" in funcs        # kept via good role
    assert funcs == sorted(funcs)            # std::set assignment order

    # every kept kmer belongs to A or C's protein
    kms = set(r.kept_kmer_strings())
    expA = {protA[i:i + 8] for i in range(len(protA) - 7)}
    expC = {protC[i:i + 8] for i in range(len(protC) - 7)}
    assert kms == (expA | expC) - (expA & expC) | (expA & expC)  # sanity
    assert kms == expA | expC


def test_median_offset_and_counts(corpus):
    files, protA, protB, protC = corpus
    r = B.build_signature_kmers(files, min_reps_required=5)
    # protA appears 5x (identical): each kmer group has 5 entries with the
    # same offset; median = that offset; offset includes the kmer (len-i).
    kms = r.kept_kmer_strings()
    for i, km in enumerate(kms):
        pos = protA.find(km)
        assert pos >= 0
        assert r.median_off[i] == len(protA) - pos
    assert (np.array(r.stats["seqs_with_func"]) == 5).all()
    assert r.stats["distinct_signatures"] == len(kms)
    assert r.stats["num_seqs_with_a_signature"] == 5


def test_weight_formula(corpus):
    files, protA, protB, protC = corpus
    r = B.build_signature_kmers(files, min_reps_required=5)
    # NSF=5, KS=33, NSi=5, NSiFj=5, NFj=5 for every kmer
    ks = r.stats["distinct_signatures"]
    want = math.log(6.0 / 1.0) + math.log((5.0 - 5.0 + ks) / (5.0 + ks))
    assert np.allclose(r.weights, np.float32(want), rtol=1e-6)


def test_plurality_rule(tmp_path):
    # One shared kmer between two functions: 5 copies under A, 1 under B
    # -> plurality 5/6 >= 0.8 keeps it under A.  With 2 under B, 5/7 < 0.8
    # -> rejected.
    core = "MKLVINGW"
    padA = "AAAAAAAA"
    for nB, expect_kept in [(1, True), (2, False)]:
        d = tmp_path / f"case{nB}"
        d.mkdir()
        files = []
        for g in range(5):
            p = d / f"a{g}.fa"
            p.write_text(f">fig|{g}.1.peg.1 Func A\n{padA}{core}\n")
            files.append(str(p))
        for g in range(5):
            p = d / f"b{g}.fa"
            # distinct context so only `core` is shared
            uniq = "CDEF"[g % 4] + "GHI"[g % 3] + "KLMNPQ"[g % 6] * 6
            body = f">fig|{50+g}.1.peg.9 Func B\n{uniq}\n"
            if g < nB:
                body = f">fig|{50+g}.1.peg.9 Func B\n{core}\n"
            p.write_text(body)
            files.append(str(p))
        r = B.build_signature_kmers(files, min_reps_required=5)
        fa = r.fm.lookup_index("Func A")
        kms = r.kept_kmer_strings()
        if expect_kept:
            assert core in kms
            i = kms.index(core)
            assert r.best_func[i] == fa
        else:
            assert core not in kms


def test_lowercase_kmers_in_stats_not_table(tmp_path):
    files = []
    for g in range(5):
        p = tmp_path / f"g{g}.fa"
        p.write_text(f">fig|{g}.1.peg.1 Func L\nmklvinwwMKLVINGW\n")
        files.append(str(p))
    r = B.build_signature_kmers(files, min_reps_required=5)
    kms = r.kept_kmer_strings()
    assert "mklvinww" in kms          # extracted + counted
    db = r.to_signature_db()
    # ...but not insertable (kguts.cc:202-210)
    from close_kmers_tpu.ops.encoder import encode_aa_kmer
    assert db.lookup(encode_aa_kmer("MKLVINGW")) is not None
    assert len(db) < len(kms)


def test_write_data_dir_roundtrip(corpus, tmp_path):
    files, protA, protB, protC = corpus
    r = B.build_signature_kmers(files, min_reps_required=5)
    out = tmp_path / "kmerdata"
    r.write_data_dir(str(out), mem_map=True)
    assert (out / "genomes").read_text() == "empty genomes\n"
    assert (out / "otu.index").read_text() == ""
    funcs = load_index_file(str(out / "function.index"))
    assert funcs == r.fm.functions_by_index()
    # final.kmers loads back with identical content
    db1 = SignatureDB.load_final_kmers(str(out / "final.kmers"), funcs)
    db2 = SignatureDB.load_mem_map(str(out / "kmer.table.mem_map"), funcs)
    assert np.array_equal(db1.keys, db2.keys)
    assert np.array_equal(db1.fi, db2.fi)

    # engine round trip: training protein recalls its function
    from close_kmers_tpu.core.api import KmerEngine
    eng = KmerEngine(SignatureDB.load_dir(str(out)))
    res = eng.annotate([("q", protA)], want_best=True)
    assert res[0].best.function == "Function A"


def test_validation_missing_counts_empty_id_records(corpus, tmp_path):
    """Validation parity on degenerate inputs: an empty-id record is
    counted, and counted as `missing` iff the truth map has an entry for
    the empty id (recall_sequence returns an empty optional for empty
    ids, build_signature_kmers.cc:914-915; the counting is :1005-1021).
    validate_fasta also runs parse_complete() twice (:1023-1024), adding
    one phantom empty record per file to `count`."""
    import io

    from close_kmers_tpu.core.api import KmerEngine
    from close_kmers_tpu.db.recall import run_validation

    files, protA, _protB, _protC = corpus
    r = B.build_signature_kmers(files, min_reps_required=5)
    out = tmp_path / "kmerdata"
    r.write_data_dir(str(out))
    eng = KmerEngine(SignatureDB.load_dir(str(out)))

    vdir = tmp_path / "valid"
    (vdir / "anno").mkdir(parents=True)
    (vdir / "seq").mkdir()
    # truth: one real id and one EMPTY id entry
    (vdir / "anno" / "g0").write_text(
        "fig|100.1.peg.1\tFunction A\n\tGhost function\n")
    # seq: the real record plus an empty-id record carrying sequence data
    (vdir / "seq" / "g0").write_text(f">fig|100.1.peg.1\n{protA}\n>\n{protA}\n")

    buf = io.StringIO()
    totals = run_validation(eng, str(vdir), out=buf)
    # 3 = real record + empty-id record + phantom parse_complete record;
    # missing=2 because the phantom record's empty id ALSO matches the
    # empty-id truth entry (lookup_function("") is non-empty here).
    assert totals == dict(count=3, correct=1, incorrect=0, missing=2)


def test_validation_empty_id_without_truth_not_missing(corpus, tmp_path):
    import io

    from close_kmers_tpu.core.api import KmerEngine
    from close_kmers_tpu.db.recall import run_validation

    files, protA, _protB, _protC = corpus
    r = B.build_signature_kmers(files, min_reps_required=5)
    out = tmp_path / "kmerdata"
    r.write_data_dir(str(out))
    eng = KmerEngine(SignatureDB.load_dir(str(out)))

    vdir = tmp_path / "valid"
    (vdir / "anno").mkdir(parents=True)
    (vdir / "seq").mkdir()
    (vdir / "anno" / "g0").write_text("fig|100.1.peg.1\tFunction A\n")
    (vdir / "seq" / "g0").write_text(f">fig|100.1.peg.1\n{protA}\n>\n{protA}\n")

    buf = io.StringIO()
    totals = run_validation(eng, str(vdir), out=buf)
    assert totals == dict(count=3, correct=1, incorrect=0, missing=0)


def test_external_builder_byte_identical(corpus, tmp_path):
    """Out-of-core (spill-shard) builder output is byte-identical to the
    in-memory path, including with multiple spill flushes."""
    files, _pA, _pB, _pC = corpus
    r_mem = B.build_signature_kmers(files, min_reps_required=5,
                                    good_roles=["Role Y"])
    out_mem = tmp_path / "mem"
    r_mem.write_data_dir(str(out_mem))

    r_ext = B.build_signature_kmers_external(
        files, min_reps_required=5, good_roles=["Role Y"],
        work_dir=str(tmp_path / "work"), buffer_records=7)  # force flushes
    out_ext = tmp_path / "ext"
    r_ext.write_data_dir(str(out_ext))

    for leaf in ("final.kmers", "function.index"):
        assert (out_ext / leaf).read_bytes() == (out_mem / leaf).read_bytes()
    assert r_ext.stats["distinct_signatures"] == r_mem.stats["distinct_signatures"]
    assert r_ext.stats["num_seqs_with_a_signature"] == \
        r_mem.stats["num_seqs_with_a_signature"]
    assert r_ext.stats["total_kmers_extracted"] == \
        r_mem.stats["total_kmers_extracted"]
    db1 = SignatureDB.load_npz(str(out_mem / "signature_db.npz"))
    db2 = SignatureDB.load_npz(str(out_ext / "signature_db.npz"))
    assert np.array_equal(db1.keys, db2.keys)
    assert np.array_equal(db1.wt, db2.wt)


def test_external_builder_cleans_stale_spills(corpus, tmp_path):
    """Reusing a --work-dir after an interrupted run must not mix the old
    run's spill records in (flush() appends): _ShardSpiller clears stale
    *.spill files on init."""
    files, *_ = corpus
    work = tmp_path / "work"
    spill_dir = work / "spill"
    os.makedirs(spill_dir)
    # fake leftovers from a dead run: a full spill record of garbage
    stale = np.zeros(3, dtype=B._SPILL_DTYPE)
    stale["key"] = [0x4141414141414141] * 3   # 'AAAAAAAA'
    with open(spill_dir / "04141.spill", "wb") as f:
        f.write(stale.tobytes())
    r_ext = B.build_signature_kmers_external(
        files, min_reps_required=5, good_roles=["Role Y"],
        work_dir=str(work), buffer_records=7)
    r_mem = B.build_signature_kmers(files, min_reps_required=5,
                                    good_roles=["Role Y"])
    out_ext, out_mem = tmp_path / "ext", tmp_path / "mem"
    r_ext.write_data_dir(str(out_ext))
    r_mem.write_data_dir(str(out_mem))
    assert (out_ext / "final.kmers").read_bytes() == \
        (out_mem / "final.kmers").read_bytes()


def test_plurality_threshold_is_float32(tmp_path):
    """The keep rule is float32 (thresh = float(count) * 0.8f,
    build_signature_kmers.cc:673): synthetic group sizes where f32 and
    f64 thresholds straddle an integer must follow the f32 decision."""
    rng = np.random.default_rng(0)
    # count = 16777227 diverges (f32 keeps, f64 drops at the critical
    # best_count); too big to build, so unit-test _group_kept directly
    # on a tiny case plus verify the dtype of the comparison path.
    key = np.full(10, 7, dtype=np.uint64)
    func = np.array([0] * 8 + [1] * 2, dtype=np.int32)
    off = np.arange(10, dtype=np.int32)
    seq = np.arange(10, dtype=np.int64)
    keys, med, bf, nsi, nsifj, kept_seq = B._group_kept(key, func, off, seq)
    assert len(keys) == 1 and bf[0] == 0 and nsi[0] == 10 and nsifj[0] == 8
    assert med[0] == off[5]

    # 7 of 9 -> 7 < 7.2 dropped
    func2 = np.array([0] * 7 + [1] * 2, dtype=np.int32)
    keys2, *_ = B._group_kept(key[:9], func2, off[:9], seq[:9])
    assert len(keys2) == 0
