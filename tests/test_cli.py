"""CLI tool tests: kfile, fastq_to_protein, validators, unique_prots,
build_db with recall/validation."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from close_kmers_tpu.ops import encoder as E

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_tool(args, stdin=b"", env_extra=None):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    if env_extra:
        env.update(env_extra)
    p = subprocess.run([sys.executable, "-m", "close_kmers_tpu.cli.tools"]
                       + args, input=stdin, capture_output=True, env=env)
    return p


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    rng = np.random.default_rng(5)
    tmp = tmp_path_factory.mktemp("cli")
    prot = "".join(rng.choice(list(E.PROT_ALPHA), size=60))
    files = []
    for g in range(5):
        p = tmp / f"g{g}.fa"
        p.write_text(f">fig|{g}.1.peg.1 Amidase\n{prot}\n")
        files.append(str(p))
    out = tmp / "data"
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "close_kmers_tpu.cli.build_db", str(out)]
        + [f"--fasta={f}" for f in files],
        capture_output=True, env=env)
    assert r.returncode == 0, r.stderr.decode()
    assert b"Kept 53 kmers" in r.stderr
    return tmp, out, prot, files


def test_kfile(built):
    tmp, data, prot, files = built
    r = run_tool(["kfile", str(data)], stdin=f">p1\n{prot}\n".encode())
    assert r.returncode == 0, r.stderr.decode()
    out = r.stdout.decode()
    assert out.startswith("CALL\t0\t58\t52\t0\tAmidase\t")
    assert "OTU-COUNTS\tp1[60]\t52--1" in out


def test_fastq_to_protein(built, tmp_path):
    table = {"M": "ATG", "K": "AAA", "L": "CTG", "V": "GTT", "I": "ATT",
             "N": "AAC", "G": "GGT", "W": "TGG"}
    prot = "MKLVINGWMKLV"
    dna = "".join(table[c] for c in prot)
    fq = tmp_path / "r.fq"
    fq.write_text(f"@r1\n{dna}\n+\n{'I'*len(dna)}\n")
    r = run_tool(["fastq_to_protein", str(fq)])
    assert r.returncode == 0, r.stderr.decode()
    out = r.stdout.decode()
    assert f">r1:1:1\n{prot}\n" in out


def test_validate_fasta(built, tmp_path):
    good = tmp_path / "good.fa"
    good.write_text(">a\nMKLV\n>b\nACDE\n")
    r = run_tool(["validate_fasta", str(good)])
    out = r.stdout.decode()
    assert "valid\t1" in out and "n_seqs\t2" in out
    assert "total_size\t8" in out and "mean\t4.00" in out

    bad = tmp_path / "bad.fa"
    bad.write_text("MKLV\n")  # missing >
    r = run_tool(["validate_fasta", str(bad)])
    out = r.stdout.decode()
    assert "valid\t0" in out
    assert "error_message\tMissing >" in out


def test_validate_fastq(built, tmp_path):
    fq = tmp_path / "r.fq"
    fq.write_text("@r1\nACGT\n+\nIIII\n")
    r = run_tool(["validate_fastq", str(fq)])
    assert "valid\t1" in r.stdout.decode()


def test_unique_prots(built, tmp_path):
    tmp, data, prot, files = built
    fa = tmp_path / "u.fa"
    fa.write_text(f">a\n{prot}\n>b\n{prot}\n>c\nMMMMMMMMMMMM\n")
    r = run_tool(["unique_prots", str(data), str(fa)])
    lines = r.stdout.decode().strip().split("\n")
    assert "2\ta b" in lines
    assert "1\tc" in lines


def test_build_db_recall_and_validation(built, tmp_path):
    tmp, data, prot, files = built
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    out2 = tmp_path / "data2"
    recall = tmp_path / "recall"
    vdir = tmp_path / "valid"
    (vdir / "anno").mkdir(parents=True)
    (vdir / "seq").mkdir()
    (vdir / "anno" / "g0").write_text("fig|0.1.peg.1\tAmidase\n")
    (vdir / "seq" / "g0").write_text(f">fig|0.1.peg.1\n{prot}\n")
    r = subprocess.run(
        [sys.executable, "-m", "close_kmers_tpu.cli.build_db", str(out2)]
        + [f"--fasta={f}" for f in files]
        + [f"--recall-output={recall}", f"--validation-folder={vdir}"],
        capture_output=True, env=env)
    assert r.returncode == 0, r.stderr.decode()
    calls = (recall / "Calls" / "g0.fa").read_text()
    assert calls.startswith("fig|0.1.peg.1\tAmidase\t52\t")
    # recall agrees with training annotation -> New/ file is empty
    assert (recall / "New" / "g0.fa").read_text() == ""
    # count=2: validate_fasta calls parse_complete() a second time after
    # parse() (build_signature_kmers.cc:1023-1024), so one phantom empty
    # record per file is counted.
    assert "count=2 correct=1 incorrect=0 missing=0" in r.stdout.decode()


def test_kser_reference_cli_compat(tmp_path):
    """The reference's kser invocation style must work verbatim:
    -l/-d flags, thread-count/reserve/no-populate no-op flags,
    --family-reps on a file, and --kmer-family-distribution-file
    (kser.cc:52-75, README:1)."""
    golden = os.path.join(REPO, "tests", "golden", "data")
    dist = tmp_path / "dist.tsv"
    reps = tmp_path / "reps.tsv"
    reps.write_text("h\n" + "\t".join(
        ["g", "fig|562.1.peg.1", "PLF_562_00000001", "x", "c1", "100",
         "200", "+", "5000", "z"]) + "\n")
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "close_kmers_tpu.cli.kser",
         "--n-kmer-thread", "6", "--reserve-mapping", "1000000",
         "--no-populate-mmap", "--no-listen",
         "--family-reps", str(reps),
         "--kmer-family-distribution-file", str(dist),
         "-l", "0", "-d", golden],
        capture_output=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr.decode()
    lines = dist.read_text().splitlines()
    assert lines, "distribution dump is empty"
    cols = lines[0].split("\t")
    assert len(cols) in (3, 6) and cols[2].isdigit()
    # single-family kmers carry pgf/plf/function columns
    assert any(len(l.split("\t")) == 6 for l in lines)


def test_kser_daemonize(tmp_path):
    """--daemonize forks; the parent exits immediately while the child
    writes the pid/port files and serves (kser.cc:215-245)."""
    import socket
    import time as T

    golden = os.path.join(REPO, "tests", "golden", "data")
    pidf = tmp_path / "pid"
    portf = tmp_path / "port"
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    # no capture: the daemon child inherits stdio, so captured pipes
    # would never reach EOF (the reference leaves fds attached too)
    r = subprocess.run(
        [sys.executable, "-m", "close_kmers_tpu.cli.kser", "0", golden,
         "--daemonize", "--pid-file", str(pidf),
         "--listen-port-file", str(portf)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        env=env, timeout=300)
    assert r.returncode == 0
    assert pidf.exists(), "parent must write the child pid before exiting"
    pid = int(pidf.read_text())
    for _ in range(240):
        if portf.exists() and portf.read_text().strip():
            break
        T.sleep(1)
    port = int(portf.read_text())
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=30)
        s.sendall(b"GET /version HTTP/1.1\n\n")
        out = s.recv(65536)
        assert b"200 OK" in out
        s.close()
    finally:
        os.kill(pid, 15)


def test_build_db_reference_style_dirs(tmp_path):
    """The reference builder invocation style — -F <dir>, -D <dir>,
    --kmer-data-dir flag, repeatable --good-functions, --n-threads —
    must work (build_signature_kmers.cc:1105-1122)."""
    rng = np.random.default_rng(9)
    fdir = tmp_path / "fastas"
    fdir.mkdir()
    prot = "".join(rng.choice(list(E.PROT_ALPHA), size=60))
    for g in range(5):
        (fdir / f"g{g}.fa").write_text(f">fig|{g}.1.peg.1 Amidase\n{prot}\n")
    ddir = tmp_path / "defs"
    ddir.mkdir()
    (ddir / "d.tsv").write_text("fig|0.1.peg.1\tAmidase\n")
    gf = tmp_path / "good.txt"
    gf.write_text("Amidase\n")
    out = tmp_path / "data"
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "close_kmers_tpu.cli.build_db",
         "-F", str(fdir), "-D", str(ddir),
         "--good-functions", str(gf), "--n-threads", "4",
         "--kmer-data-dir", str(out)],
        capture_output=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr.decode()
    assert (out / "function.index").exists()
    assert (out / "final.kmers").exists()
