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
