"""Tests for metrics/checkpoint endpoints, kclient, and multihost
partitioning helpers."""

import os
import subprocess
import sys

import pytest

from close_kmers_tpu.parallel.multihost import (partition_file_ranges,
                                                read_lines_in_range,
                                                host_shard)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_partition_file_ranges_cover():
    ranges = partition_file_ranges(1000, 3)
    assert ranges[0][0] == 0 and ranges[-1][1] == 1000
    for (a1, b1), (a2, b2) in zip(ranges, ranges[1:]):
        assert b1 == a2


def test_read_lines_in_range_exactly_once(tmp_path):
    lines = [f"line-{i:04d}-{'x' * (i % 17)}" for i in range(200)]
    p = tmp_path / "f.txt"
    p.write_text("\n".join(lines) + "\n")
    size = os.path.getsize(p)
    got = []
    for a, b in partition_file_ranges(size, 7):
        got.extend(read_lines_in_range(str(p), a, b))
    assert got == lines


def test_host_shard_round_robin():
    items = list(range(10))
    parts = [host_shard(items, pid, 3) for pid in range(3)]
    assert sorted(x for p in parts for x in p) == items
    assert parts[0] == [0, 3, 6, 9]


# -- server metrics/checkpoint (reuses the test_server fixtures) ------------

from test_server import data_dir, server, http, post  # noqa: E402,F401


def test_metrics_endpoint(server):
    port, prots, fam_spec, funcs = server
    body = f">m1\n{prots[fam_spec[0][0]]}\n".encode()
    post(port, "/query", body)
    resp = http(port, b"GET /metrics HTTP/1.1\n\n").decode()
    assert "requests\t" in resp
    assert "proteins\t" in resp
    assert "proteins_per_s\t" in resp
    assert "requests/query\t" in resp


def test_checkpoint_and_restore(server, tmp_path, monkeypatch):
    port, prots, fam_spec, funcs = server
    # populate a keyed universe, checkpoint, then restore into a fresh ctx
    body = f">cp1\n{prots[fam_spec[0][0]]}\n".encode()
    post(port, "/mapping/ckpt/add?silent=1", body)
    resp = http(port, b"GET /checkpoint HTTP/1.1\n\n").decode()
    assert "200 OK" in resp

    import glob
    files = glob.glob("checkpoint.*")
    assert files
    from close_kmers_tpu.server.http import ServerContext
    ctx2 = ServerContext(engine=None)
    ctx2.restore(files[0])
    assert "ckpt" in ctx2.mapping_map
    assert "cp1" in ctx2.mapping_map["ckpt"].peg_to_id
    for f in files:
        os.unlink(f)


def test_kclient_cli(server, tmp_path):
    port, prots, fam_spec, funcs = server
    fa = tmp_path / "q.fa"
    fa.write_text(f">k1\n{prots[fam_spec[0][0]]}\n")
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    p = subprocess.run(
        [sys.executable, "-m", "close_kmers_tpu.cli.kclient",
         "127.0.0.1", str(port), str(fa), "--endpoint", "/query"],
        capture_output=True, env=env)
    assert p.returncode == 0, p.stderr.decode()
    assert "PROTEIN-ID\tk1" in p.stdout.decode()

    p = subprocess.run(
        [sys.executable, "-m", "close_kmers_tpu.cli.kclient",
         "127.0.0.1", str(port), str(fa), "--endpoint", "/query",
         "--param", "details=1", "--fold-hits"],
        capture_output=True, env=env)
    out = p.stdout.decode()
    assert out.split("\t")[1].startswith(funcs[0])
