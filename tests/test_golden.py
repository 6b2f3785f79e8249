"""Golden conversation snapshots: byte-for-byte server behavior lock.

tests/golden/ holds a frozen data directory, query FASTA, and the exact
response bytes for a set of canned requests.  Any change to parsing,
scoring, formatting, or the wire protocol that alters these bytes fails
here — re-record deliberately only when a semantic change is intended.
"""

import asyncio
import os
import socket
import threading

import pytest

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.fixture(scope="module")
def golden_server():
    from close_kmers_tpu.cli.kser import load_server_context
    from close_kmers_tpu.server.http import handle_connection

    ctx = load_server_context(os.path.join(GOLDEN, "data"), batch_size=64)
    loop = asyncio.new_event_loop()
    holder = {}
    ready = threading.Event()

    async def run():
        srv = await asyncio.start_server(
            lambda r, w: handle_connection(r, w, ctx), "127.0.0.1", 0)
        holder["port"] = srv.sockets[0].getsockname()[1]
        ready.set()
        async with srv:
            await ctx.stop_event.wait()

    t = threading.Thread(target=lambda: loop.run_until_complete(run()),
                         daemon=True)
    t.start()
    assert ready.wait(60)
    yield holder["port"]
    ctx.stop_event.set()


def http(port, req: bytes) -> bytes:
    s = socket.create_connection(("127.0.0.1", port), timeout=60)
    s.sendall(req)
    out = b""
    while True:
        c = s.recv(65536)
        if not c:
            break
        out += c
    s.close()
    return out


def play(port, reqs) -> bytes:
    """Run a conversation: one request or a list run back to back on
    fresh connections; the snapshot is the concatenated responses."""
    if isinstance(reqs, (bytes, bytearray)):
        reqs = [reqs]
    return b"".join(http(port, r) for r in reqs)


def _post(path: bytes, body: bytes) -> bytes:
    return (b"POST " + path + b" HTTP/1.1\nContent-length: %d\n\n"
            % len(body) + body)


def _matrix_body(body: bytes) -> bytes:
    """Deterministic chimera set from the golden queries: A=q1,
    B=q1[:60]+q2[60:], C=q2 — overlapping pairs share kmer runs."""
    import re
    seqs = dict(re.findall(rb">(\S+)[^\n]*\n([A-Z\n]+)", body))
    s1 = seqs[b"q1"].replace(b"\n", b"")
    s2 = seqs[b"q2"].replace(b"\n", b"")
    return (b">A\n" + s1 + b"\n>B\n" + s1[:60] + s2[60:] + b"\n>C\n"
            + s2 + b"\n")


def _reads(name: str) -> bytes:
    with open(os.path.join(GOLDEN, name), "rb") as f:
        return f.read()


CONVS = {
    "version": lambda body: b"GET /version HTTP/1.1\n\n",
    "query": lambda body:
        b"POST /query HTTP/1.1\nContent-length: %d\n\n" % len(body) + body,
    "query_details": lambda body:
        b"POST /query?details=1&min_hits=3 HTTP/1.1\nContent-length: %d\n\n"
        % len(body) + body,
    "query_best": lambda body:
        b"POST /query?find_best_call=1 HTTP/1.1\nContent-length: %d\n\n"
        % len(body) + body,
    "lookup": lambda body:
        b"POST /lookup HTTP/1.1\nContent-length: %d\n\n" % len(body) + body,
    "lookup_best": lambda body:
        b"POST /lookup?find_best_match=1&target_genus=Escherichia "
        b"HTTP/1.1\nContent-length: %d\n\n" % len(body) + body,
    # stateful conversations run in isolated /mapping/<key>/ universes
    "wadd": lambda body: _post(b"/mapping/gold_add/add", body),
    "xmatrix": lambda body: [
        _post(b"/mapping/gold_m/add?silent=1", _matrix_body(body)),
        _post(b"/mapping/gold_m/matrix", _matrix_body(body)),
    ],
    "yfq": lambda body: _post(b"/fq_lookup", _reads("reads.fq")),
    "zfq_gz": lambda body: _post(b"/fq_lookup", _reads("reads.fq.gz")),
}


@pytest.mark.parametrize("name", sorted(CONVS))
def test_golden_conversation(golden_server, name):
    with open(os.path.join(GOLDEN, "queries.fa"), "rb") as f:
        body = f.read()
    want = open(os.path.join(GOLDEN, f"{name}.resp"), "rb").read()
    got = play(golden_server, CONVS[name](body))
    assert got == want, f"golden mismatch for {name}"
