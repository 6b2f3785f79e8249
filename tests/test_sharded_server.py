"""Sharded serving: a kser instance whose engine probes a range-sharded DB
over the 8-device mesh must produce byte-identical golden responses."""

import asyncio
import os
import threading

import pytest

from test_golden import CONVS, GOLDEN, play


@pytest.fixture(scope="module")
def sharded_server():
    import jax
    from close_kmers_tpu.cli.kser import load_server_context
    from close_kmers_tpu.server.http import handle_connection

    ctx = load_server_context(os.path.join(GOLDEN, "data"), batch_size=64,
                              n_shards=len(jax.devices()))
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
    assert ready.wait(120)
    yield holder["port"]
    ctx.stop_event.set()


@pytest.mark.parametrize("name", sorted(CONVS))
def test_sharded_golden_conversation(sharded_server, name):
    with open(os.path.join(GOLDEN, "queries.fa"), "rb") as f:
        body = f.read()
    want = open(os.path.join(GOLDEN, f"{name}.resp"), "rb").read()
    got = play(sharded_server, CONVS[name](body))
    assert got == want, f"sharded golden mismatch for {name}"


@pytest.fixture(scope="module")
def routed_server():
    """Same server, ROUTED probe (the pod-scale configuration)."""
    import jax
    from close_kmers_tpu.cli.kser import load_server_context
    from close_kmers_tpu.server.http import handle_connection

    ctx = load_server_context(os.path.join(GOLDEN, "data"), batch_size=64,
                              n_shards=len(jax.devices()), routed=True)
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
    assert ready.wait(120)
    yield holder["port"]
    ctx.stop_event.set()


@pytest.mark.parametrize("name", ["lookup", "query_best"])
def test_routed_golden_conversation(routed_server, name):
    """The routed-probe server must serve byte-identical goldens."""
    with open(os.path.join(GOLDEN, "queries.fa"), "rb") as f:
        body = f.read()
    want = open(os.path.join(GOLDEN, f"{name}.resp"), "rb").read()
    got = play(routed_server, CONVS[name](body))
    assert got == want, f"routed golden mismatch for {name}"
