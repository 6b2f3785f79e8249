"""Non-family server mode: /lookup reports per-peg hit rows
(lookup_request.cc:380-397) and per-request engine params apply."""

import asyncio
import os
import threading

import numpy as np
import pytest

from close_kmers_tpu.ops import encoder as E
from close_kmers_tpu.params import K
from close_kmers_tpu.db.signature_db import SignatureDB, write_index_file

from test_server import http, post


@pytest.fixture(scope="module")
def peg_server(tmp_path_factory):
    """Server over a data dir with NO families.dat -> family_mode off."""
    rng = np.random.default_rng(77)
    d = tmp_path_factory.mktemp("pegdata")
    prot = "".join(rng.choice(list(E.PROT_ALPHA), size=80))
    entries = {}
    for i in range(len(prot) - K + 1):
        entries.setdefault(prot[i:i + K], (prot[i:i + K], 10, 0, 1.0, -1))
    db = SignatureDB.from_entries(entries.values(), functions=["some fn"])
    db.save_npz(str(d / "signature_db.npz"))
    write_index_file(str(d / "function.index"), ["some fn"])
    write_index_file(str(d / "otu.index"), [])

    from close_kmers_tpu.cli.kser import load_server_context
    from close_kmers_tpu.server.http import handle_connection

    ctx = load_server_context(str(d), batch_size=64)
    assert not ctx.family_mode
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
    yield holder["port"], prot
    ctx.stop_event.set()


def test_peg_mode_lookup(peg_server):
    port, prot = peg_server
    # /add two pegs sharing the signature kmers, then /lookup a query:
    # rows are "peg \t hit_count" (no family columns without peg_to_family)
    body = f">pegA\n{prot}\n>pegB\n{prot[:40]}\n".encode()
    resp = post(port, "/add?silent=1", body)
    assert "200 OK" in resp
    q = f">query\n{prot[5:60]}\n".encode()
    resp = post(port, "/lookup", q)
    lines = resp.split("\n")
    assert "query" in lines
    rows = [l.split("\t") for l in lines if l.startswith("peg")]
    assert rows, resp
    counts = {r[0]: int(r[1]) for r in rows}
    # pegA contains all query kmers; pegB only the overlapping prefix part
    assert counts["pegA"] > counts.get("pegB", 0) > 0
    assert resp.rstrip().endswith("//")


def test_engine_params_via_query(peg_server):
    port, prot = peg_server
    # min_hits=999 suppresses all calls in /query
    body = f">q\n{prot}\n".encode()
    resp = post(port, "/query?min_hits=999", body)
    assert "CALL\t" not in resp
    resp = post(port, "/query?min_hits=3", body)
    assert "CALL\t" in resp
    # min_weighted_hits filters by weighted sum
    resp = post(port, "/query?min_weighted_hits=10000", body)
    assert "CALL\t" not in resp
    # max_gap tiny splits runs; with a gap-free run it still calls
    resp = post(port, "/query?max_gap=1", body)
    assert "CALL\t" in resp
