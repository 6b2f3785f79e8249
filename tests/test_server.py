"""End-to-end server tests: build a reference-format data directory, start
the kser server, and speak the pidgin-HTTP protocol over a real socket."""

import asyncio
import gzip
import os
import socket
import threading

import numpy as np
import pytest

from close_kmers_tpu.params import K
from close_kmers_tpu.ops import encoder as E
from close_kmers_tpu.db.signature_db import SignatureDB, write_index_file


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    """Reference-format data dir with family assets."""
    rng = np.random.default_rng(31)
    d = tmp_path_factory.mktemp("kmerdata")
    funcs = ["DNA gyrase subunit B (EC 5.99.1.3)",
             "Acetate kinase (EC 2.7.2.1)",
             "hypothetical protein"]
    fam_spec = [("fig|100.1.peg.1", 0, "Escherichia", "1"),
                ("fig|100.1.peg.2", 1, "Escherichia", "2"),
                ("fig|200.2.peg.3", 0, "Bacillus", "3")]
    prots = {peg: "".join(rng.choice(list(E.PROT_ALPHA), size=120))
             for peg, _, _, _ in fam_spec}
    seen = {}
    for peg, fi, _, _ in fam_spec:
        p = prots[peg]
        for i in range(len(p) - K + 1):
            seen.setdefault(p[i:i + K], (p[i:i + K], 10, fi, 1.0, 3 + fi))
    db = SignatureDB.from_entries(seen.values(), functions=funcs)
    db.save_npz(str(d / "signature_db.npz"))
    write_index_file(str(d / "function.index"), funcs)
    write_index_file(str(d / "otu.index"), ["otuA", "otuB", "otuC", "otuD",
                                            "otuE", "otuF"])
    (d / "VERSION").write_text("77\n")
    (d / "families.version").write_text("fam-9\n")
    (d / "families.genus_map").write_text("Escherichia\t562\nBacillus\t1386\n")
    with open(d / "families.dat", "w") as f:
        for i, (peg, fi, genus, lf) in enumerate(fam_spec):
            f.write(f"GF0000000{i}\t1\t1\t{peg}\t{len(prots[peg])}\t"
                    f"{funcs[fi]}\t{lf}\t{genus}\t{lf}\n")
    with open(d / "families.nr", "w") as f:
        for peg, *_ in fam_spec:
            f.write(f">{peg}\n{prots[peg]}\n")
    return d, prots, fam_spec, funcs


@pytest.fixture(scope="module")
def server(data_dir):
    """Start the server on a random port in a background thread."""
    from close_kmers_tpu.cli.kser import load_server_context
    from close_kmers_tpu.server.http import serve

    d, prots, fam_spec, funcs = data_dir
    ctx = load_server_context(str(d), batch_size=64)
    assert ctx.family_mode

    loop = asyncio.new_event_loop()
    port_holder = {}
    ready = threading.Event()

    async def run():
        srv = await asyncio.start_server(
            lambda r, w: __import__(
                "close_kmers_tpu.server.http", fromlist=["handle_connection"]
            ).handle_connection(r, w, ctx), "127.0.0.1", 0)
        port_holder["port"] = srv.sockets[0].getsockname()[1]
        ready.set()
        async with srv:
            await ctx.stop_event.wait()

    t = threading.Thread(target=lambda: loop.run_until_complete(run()),
                         daemon=True)
    t.start()
    assert ready.wait(60)
    yield port_holder["port"], prots, fam_spec, funcs
    ctx.stop_event.set()


def http(port: int, request: bytes, timeout=60) -> bytes:
    s = socket.create_connection(("127.0.0.1", port), timeout=timeout)
    s.sendall(request)
    out = b""
    while True:
        chunk = s.recv(65536)
        if not chunk:
            break
        out += chunk
    s.close()
    return out


def post(port, path, body: bytes, timeout=60) -> str:
    req = (f"POST {path} HTTP/1.1\nContent-length: {len(body)}\n\n"
           ).encode() + body
    return http(port, req, timeout).decode("latin-1")


def test_version(server):
    port, *_ = server
    resp = http(port, b"GET /version HTTP/1.1\n\n").decode()
    assert "HTTP/1.1 200 OK" in resp
    assert "kmer\t77" in resp
    assert "families\tfam-9" in resp
    assert "family-mode\t1" in resp


def test_genus_lookup(server):
    port, *_ = server
    resp = http(port, b"GET /genus_lookup/Escherichia HTTP/1.1\n\n").decode()
    assert resp.endswith("562\n")
    resp = http(port, b"GET /genus_lookup/Nonexistent HTTP/1.1\n\n").decode()
    assert "404" in resp


def test_404(server):
    port, *_ = server
    resp = http(port, b"GET /nope HTTP/1.1\n\n").decode()
    assert "404" in resp


def test_query_call_lines(server):
    port, prots, fam_spec, funcs = server
    peg = fam_spec[0][0]
    body = f">q1\n{prots[peg]}\n".encode()
    resp = post(port, "/query", body)
    assert "PROTEIN-ID\tq1\t120" in resp
    assert "CALL\t" in resp
    assert funcs[0] in resp
    assert "OTU-COUNTS\tq1[120]" in resp


def test_query_details_and_best_call(server):
    port, prots, fam_spec, funcs = server
    peg = fam_spec[1][0]
    body = f">q2\n{prots[peg]}\n".encode()
    resp = post(port, "/query?details=1", body)
    assert "HIT\t" in resp
    resp = post(port, "/query?find_best_call=1", body)
    lines = [l for l in resp.split("\n") if l.startswith("q2\t")]
    assert len(lines) == 1
    assert funcs[1] in lines[0]


def test_lookup_best_match(server):
    port, prots, fam_spec, funcs = server
    peg = fam_spec[0][0]
    body = f">{peg}\n{prots[peg]}\n".encode()
    resp = post(port, "/lookup?find_best_match=1&target_genus=Escherichia",
                body)
    row = [l for l in resp.split("\n") if l.startswith("fig|")][0].split("\t")
    assert row[1] == "PGF_00000000"
    assert row[3] == "PLF_562_00000001"
    assert row[5] == funcs[0]


def test_lookup_all_matches(server):
    port, prots, fam_spec, funcs = server
    peg = fam_spec[0][0]
    body = f">qq\n{prots[peg]}\n".encode()
    resp = post(port, "/lookup", body)
    assert "qq\n" in resp
    assert "PGF_00000000" in resp
    assert resp.rstrip().endswith("//")


def test_add_and_matrix(server):
    port, prots, fam_spec, funcs = server
    p1, p2 = fam_spec[0][0], fam_spec[2][0]
    # same function (0) => the two proteins share no kmers (random), so add
    # a shared-prefix pair instead
    a = prots[p1]
    b = prots[p1][:60] + prots[p2][60:]
    body = f">protA\n{a}\n>protB\n{b}\n".encode()
    resp = post(port, "/mapping/u1/add?silent=1", body)
    assert "200 OK" in resp
    resp = post(port, "/mapping/u1/matrix", body)
    rows = [l for l in resp.split("\n") if l.startswith("prot")]
    assert rows, resp
    cols = rows[0].split("\t")
    shared = int(cols[2])
    assert shared > 0
    # score = count/(l1+l2)
    assert abs(float(cols[3]) - shared / 240.0) < 1e-4


def test_add_best_call_line(server):
    port, prots, fam_spec, funcs = server
    body = f">pX\n{prots[fam_spec[0][0]]}\n".encode()
    resp = post(port, "/mapping/u2/add", body)
    assert "BEST-CALL\tpX\t" + funcs[0] in resp


def test_fq_lookup_plain_and_gzip(server):
    port, prots, fam_spec, funcs = server
    # Reverse-translate a protein fragment into DNA via a codon table.
    table = {"A": "GCG", "C": "TGC", "D": "GAT", "E": "GAA", "F": "TTT",
             "G": "GGT", "H": "CAT", "I": "ATT", "K": "AAA", "L": "CTG",
             "M": "ATG", "N": "AAC", "P": "CCG", "Q": "CAG", "R": "CGT",
             "S": "AGC", "T": "ACC", "V": "GTT", "W": "TGG", "Y": "TAT"}
    prot = prots[fam_spec[0][0]][:40]
    dna = "".join(table[c] for c in prot)
    fq = f"@read1\n{dna}\n+\n{'I' * len(dna)}\n"
    resp = post(port, "/fq_lookup", fq.encode())
    lines = [l for l in resp.split("\n") if l.startswith("read1\t")]
    assert lines, resp
    cols = lines[0].split("\t")
    assert cols[1] == "1"          # frame +1
    assert float(cols[2]) > 0      # score
    assert "PGF_00000000" in lines[0]
    # gzipped body gives identical output
    resp2 = post(port, "/fq_lookup", gzip.compress(fq.encode()))
    lines2 = [l for l in resp2.split("\n") if l.startswith("read1\t")]
    assert lines2 == lines


def test_dump_sizes(server):
    port, *_ = server
    resp = http(port, b"GET /dump_sizes HTTP/1.1\n\n").decode()
    assert "memory dump" in resp
    assert "Mapping '':" in resp


def test_concurrent_clients_identical_responses(server):
    """Many concurrent clients hitting mixed endpoints get byte-identical
    responses to serial requests (the compute-thread offload must not
    cross-contaminate per-request hit state)."""
    port, prots, fam_spec, funcs = server
    import concurrent.futures as cf

    reqs = []
    for i, (peg, fi, genus, lf) in enumerate(fam_spec * 3):
        body = f">c{i}\n{prots[peg]}\n>d{i}\nMKLVXX\n".encode()
        path = ["/query", "/lookup", "/lookup?find_best_match=1"][i % 3]
        reqs.append((path, body))

    serial = [post(port, p, b) for p, b in reqs]
    with cf.ThreadPoolExecutor(max_workers=len(reqs)) as ex:
        concurrent = list(ex.map(lambda pb: post(port, *pb), reqs))
    assert concurrent == serial
    assert all("HTTP/1.1 200 OK" in r for r in serial)


@pytest.fixture(scope="module")
def server_devfam(data_dir):
    """A second server whose engine is FORCED onto the fused device
    calls+family-rollup path (device_family_min=0) — responses must be
    byte-identical to the host-path server's."""
    from close_kmers_tpu.cli.kser import load_server_context

    d, prots, fam_spec, funcs = data_dir
    ctx = load_server_context(str(d), batch_size=64)
    ctx.engine.device_family_min = 0
    for m in ctx.mapping_map.values():
        if hasattr(m, "_device_scorer"):
            del m._device_scorer

    loop = asyncio.new_event_loop()
    port_holder = {}
    ready = threading.Event()

    async def run():
        srv = await asyncio.start_server(
            lambda r, w: __import__(
                "close_kmers_tpu.server.http", fromlist=["handle_connection"]
            ).handle_connection(r, w, ctx), "127.0.0.1", 0)
        port_holder["port"] = srv.sockets[0].getsockname()[1]
        ready.set()
        async with srv:
            await ctx.stop_event.wait()

    t = threading.Thread(target=lambda: loop.run_until_complete(run()),
                         daemon=True)
    t.start()
    assert ready.wait(60)
    yield port_holder["port"], ctx
    ctx.stop_event.set()


def test_device_family_server_byte_identical(server, server_devfam):
    port_host, prots, fam_spec, funcs = server
    port_dev, ctx = server_devfam
    # every protein + a junk one, through the family endpoints
    body = "".join(f">{p}\n{s}\n" for p, s in prots.items()).encode()
    body += b">junk\nXXXXAAAA\n"
    for path in ("/lookup?find_best_match=1&target_genus=Escherichia",
                 "/lookup?find_best_match=1&allow_ambiguous_functions=1",
                 "/lookup", "/lookup?find_reps=1"):
        a = post(port_host, path, body)
        b = post(port_dev, path, body)
        assert a == b, path
    # the /fq_lookup path routes through annotate_family too
    table = {"A": "GCG", "C": "TGC", "D": "GAT", "E": "GAA", "F": "TTT",
             "G": "GGT", "H": "CAT", "I": "ATT", "K": "AAA", "L": "CTG",
             "M": "ATG", "N": "AAC", "P": "CCG", "Q": "CAG", "R": "CGT",
             "S": "AGC", "T": "ACC", "V": "GTT", "W": "TGG", "Y": "TAT"}
    prot = prots[fam_spec[0][0]][:40]
    dna = "".join(table[c] for c in prot)
    fq = f"@read1\n{dna}\n+\n{'I' * len(dna)}\n".encode()
    assert post(port_host, "/fq_lookup", fq) == \
        post(port_dev, "/fq_lookup", fq)
    # the device scorer really was engaged for the root mapping
    root = ctx.mapping_map[""]
    assert getattr(root, "_device_scorer", (None, None))[1] is not None


def test_matrix_differential_vs_naive(server, data_dir):
    """Differential check of the vectorized /matrix accumulation against
    a literal transcription of the reference's per-hit loop
    (matrix_request.cc:130-161): register -> per hit -> per peg of the
    kmer -> count when already registered."""
    port, prots, fam_spec, funcs = server
    d, _, _, _ = data_dir
    rng = np.random.default_rng(77)
    base = prots[fam_spec[0][0]]
    # overlapping chimeras so many pairs share kmers, plus a stranger
    seqs = {}
    for i in range(6):
        a, b = rng.integers(0, 100, size=2)
        seqs[f"m{i}"] = base[:20 + a % 80] + base[b % 60:]
    seqs["stranger"] = "".join(rng.choice(list(E.PROT_ALPHA), size=90))
    body = "".join(f">{k}\n{v}\n" for k, v in seqs.items()).encode()
    add = post(port, "/mapping/diff/add?silent=1", body)
    assert "200 OK" in add
    resp = post(port, "/mapping/diff/matrix", body)
    got = {}
    for line in resp.split("\n")[3:]:
        if line.count("\t") == 3:
            p1, p2, cnt, _s = line.split("\t")
            got[(p1, p2)] = int(cnt)

    # naive replication: same engine, same add semantics
    from close_kmers_tpu.cli.kser import load_server_context
    ctx2 = load_server_context(str(d), batch_size=64)
    eng = ctx2.engine
    mapping = ctx2.mapping("diff2")
    items = list(seqs.items())
    _res, h = eng.annotate_with_hits(items, want_hits=True)
    for s, (sid, _seq) in enumerate(items):
        pid = mapping.encode_peg(sid)
        a, b = int(h["row_off"][s]), int(h["row_off"][s + 1])
        for k in range(a, b):
            mapping.add_peg_mapping(pid, int(h["code"][k]))
    want = {}
    registered = {}
    for s, (sid, seq) in enumerate(items):
        eid = mapping.encode_peg(sid)
        registered[eid] = len(seq)
        a, b = int(h["row_off"][s]), int(h["row_off"][s + 1])
        for k in range(a, b):
            for other in mapping.pegs_of_kmer(int(h["code"][k])):
                if other != eid and other in registered:
                    key = (sid, mapping.decode_peg(other))
                    want[key] = want.get(key, 0) + 1
    assert got == want and len(got) > 3


def test_checkpoint_and_restore(server, data_dir, tmp_path):
    """/checkpoint persists mapping universes; a fresh context with
    --restore sees the ingested state (krequest2.cc:361-408 analogue)."""
    from close_kmers_tpu.cli.kser import load_server_context

    port, prots, fam_spec, funcs = server
    peg, *_ = fam_spec[0]
    body = f">ckpt|1\n{prots[peg]}\n".encode()
    resp = post(port, "/mapping/ckpt_u/add?silent=1", body)
    assert "200 OK" in resp
    resp = http(port, b"GET /checkpoint HTTP/1.1\n\n").decode()
    assert "200 OK" in resp and "OK" in resp
    path = f"./checkpoint.{os.getpid()}"
    assert os.path.exists(path)

    d, *_ = data_dir
    ctx2 = load_server_context(str(d), batch_size=64)
    assert "ckpt_u" not in ctx2.mapping_map
    ctx2.restore(path)
    os.remove(path)
    m = ctx2.mapping_map["ckpt_u"]
    assert "ckpt|1" in m.peg_to_id
    assert len(m._kmer_to_pegs) > 0
