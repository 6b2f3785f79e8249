"""kmerge matrix + Adaboost tests."""

import io
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def setup_inputs(tmp_path):
    kdir = tmp_path / "KMERS"
    kdir.mkdir()
    # resistant genomes share AAA; susceptible have CCC
    (kdir / "r1").write_text("AAACGT\t3\nGGGTTT\t1\n")
    (kdir / "r2").write_text("AAACGT\t5\n")
    (kdir / "s1").write_text("CCCGTA\t2\nGGGTTT\t1\n")
    (kdir / "s2").write_text("CCCGTA\t1\n")
    (tmp_path / "res.list").write_text("r1\nr2\n")
    (tmp_path / "sus.list").write_text("s1\ns2\n")
    return tmp_path


def run_kmerge(tmp, *extra):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    p = subprocess.run(
        [sys.executable, "-m", "close_kmers_tpu.cli.kmerge",
         str(tmp / "res.list"), str(tmp / "sus.list"),
         "-d", str(tmp / "KMERS")] + list(extra),
        capture_output=True, env=env)
    assert p.returncode == 0, p.stderr.decode()
    return p.stdout.decode()


def test_boolean_matrix(tmp_path):
    tmp = setup_inputs(tmp_path)
    out = run_kmerge(tmp)
    lines = out.strip().split("\n")
    assert lines[0] == "labels\t1\t1\t0\t0"
    rows = {l.split("\t")[0]: l.split("\t")[1:] for l in lines[1:]}
    # AAACGT present in both resistant, absent in sus (inverted default 1)
    assert rows["AAACGT"] == ["1", "1", "1", "1"]
    # CCCGTA absent in resistant (0), present in sus -> inverted 0
    assert rows["CCCGTA"] == ["0", "0", "0", "0"]
    # GGGTTT in r1 (1) and s1 (inverted 0); defaults r2=0, s2=1
    assert rows["GGGTTT"] == ["1", "0", "0", "1"]


def test_count_matrix(tmp_path):
    tmp = setup_inputs(tmp_path)
    out = run_kmerge(tmp, "--use-kmer-counts")
    rows = {l.split("\t")[0]: l.split("\t")[1:]
            for l in out.strip().split("\n")[1:]}
    assert rows["AAACGT"] == ["3", "5", "0", "0"]
    assert rows["CCCGTA"] == ["0", "0", "2", "1"]


def test_no_header(tmp_path):
    tmp = setup_inputs(tmp_path)
    out = run_kmerge(tmp, "--no-header")
    assert not out.startswith("labels")


def test_adaboost_picks_perfect_separator(tmp_path):
    tmp = setup_inputs(tmp_path)
    out = run_kmerge(tmp, "-a", "-r", "2")
    lines = out.strip().split("\n")
    assert len(lines) == 2
    first = lines[0].split("\t")
    # AAACGT is the perfect all-ones separator: error 0, picked first.
    assert float(first[0]) < 1e-9
    assert first[2:] == ["AAACGT"]
    assert float(first[1]) > 5  # large alpha on perfect split


def test_kmc_roundtrip(tmp_path):
    """io.kmc writer -> reader round trip, sorted iteration order."""
    from close_kmers_tpu.io.kmc import (read_kmc_db, read_kmc_info,
                                        write_kmc_db)
    items = [("AAACGT", 3), ("GGGTTT", 1), ("CCCGTA", 260), ("TTTTTT", 7)]
    base = str(tmp_path / "db1")
    write_kmc_db(base, items, kmer_length=6, lut_prefix_length=2,
                 counter_size=2)
    info = read_kmc_info(base)
    assert (info.kmer_length, info.lut_prefix_length, info.counter_size,
            info.total_kmers) == (6, 2, 2, 4)
    got = list(read_kmc_db(base))
    assert got == sorted(items)


def test_kmc_counter_saturates(tmp_path):
    """Counts beyond the counter field saturate (KMC clamps) instead of
    raising OverflowError from to_bytes."""
    from close_kmers_tpu.io.kmc import read_kmc_db, write_kmc_db
    base = str(tmp_path / "db_sat")
    write_kmc_db(base, [("AAACGT", 300), ("GGGTTT", 70000)],
                 kmer_length=6, lut_prefix_length=2, counter_size=1)
    got = dict(read_kmc_db(base))
    assert got == {"AAACGT": 255, "GGGTTT": 255}


def test_kmc_binary_input_matches_text(tmp_path):
    """A KMC binary DB and its text dump produce identical matrices
    (kmerge.cc:325-338 input sniffing, :375-400 iteration)."""
    from close_kmers_tpu.io.kmc import write_kmc_db
    tmp = setup_inputs(tmp_path)
    text_out = run_kmerge(tmp)
    kdir = tmp / "KMERS"
    # replace r1 and s2 with binary KMC DBs: r1 referenced bare (sibling
    # .kmc_pre sniff), s2 referenced with the .kmc_pre extension
    write_kmc_db(str(kdir / "r1"), [("AAACGT", 3), ("GGGTTT", 1)],
                 kmer_length=6, lut_prefix_length=2)
    (kdir / "r1").unlink()
    write_kmc_db(str(kdir / "s2"), [("CCCGTA", 1)], kmer_length=6,
                 lut_prefix_length=3, counter_size=1)
    (kdir / "s2").unlink()
    (tmp / "sus.list").write_text("s1\ns2.kmc_pre\n")
    bin_out = run_kmerge(tmp)
    # the s2 column is named s2.kmc_pre in the header-less matrix body;
    # values must match the all-text run line for line
    assert bin_out == text_out
