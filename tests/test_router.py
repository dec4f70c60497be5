# -*- coding: utf-8 -*-
"""Multi-host replica router tests: sticky routing, failover, stats
aggregation — all over real aiohttp servers (no TTS engine; stub
backends record which replica served each request)."""
import asyncio

from aiohttp import web
from aiohttp.test_utils import TestClient, TestServer

from illufly_tts_tpu.api.router import (
    Backend,
    _hrw_pick,
    create_router_app,
)


def make_stub_backend(name, log):
    """A replica stub with the /api/tts surface the router proxies."""
    app = web.Application()

    async def tts(request):
        body = await request.json()
        log.append((name, body.get("text")))
        return web.json_response({
            "status": "success", "replica": name,
            "audio_base64": "", "sample_rate": 24000,
        })

    async def info(request):
        return web.json_response({"service": "stub", "replica": name})

    async def stats(request):
        return web.json_response({"replica": name, "requests": len(log)})

    app.router.add_post("/api/tts", tts)
    app.router.add_get("/api/tts/info", info)
    app.router.add_get("/api/tts/stats", stats)
    return app


def test_hrw_pick_stable_and_minimal_movement():
    backends = [Backend(f"http://h{i}:1") for i in range(4)]
    picks = {k: _hrw_pick(backends, k).base_url for k in
             (f"user{i}" for i in range(64))}
    # stable
    for k, url in picks.items():
        assert _hrw_pick(backends, k).base_url == url
    # kill one replica: only its keys move
    dead = backends[1]
    dead.healthy = False
    moved = 0
    for k, url in picks.items():
        new = _hrw_pick(backends, k).base_url
        if url == dead.base_url:
            assert new != url
            moved += 1
        else:
            assert new == url
    assert moved > 0


async def test_router_sticky_and_failover():
    log_a, log_b = [], []
    server_a = TestServer(make_stub_backend("a", log_a))
    server_b = TestServer(make_stub_backend("b", log_b))
    await server_a.start_server()
    await server_b.start_server()
    try:
        router = create_router_app(
            [f"http://{server_a.host}:{server_a.port}",
             f"http://{server_b.host}:{server_b.port}"],
            health_interval=0.2,
        )
        client = TestClient(TestServer(router))
        await client.start_server()
        try:
            # sticky: one user's requests land on one replica
            for i in range(6):
                resp = await client.post(
                    "/api/tts", json={"text": f"t{i}"},
                    headers={"X-Dev-User": "alice"},
                )
                assert resp.status == 200
            replicas = {name for name, _ in log_a + log_b}
            assert len(replicas) == 1

            # several users spread across replicas (64 users, 2 replicas)
            for u in range(64):
                resp = await client.post(
                    "/api/tts", json={"text": "x"},
                    headers={"X-Dev-User": f"user{u}"},
                )
                assert resp.status == 200
            assert log_a and log_b

            # stats aggregates both
            resp = await client.get("/api/tts/stats")
            body = await resp.json()
            assert body["alive"] == 2
            assert len(body["replicas"]) == 2

            # failover: kill replica a; alice re-routes to a survivor
            await server_a.close()
            await asyncio.sleep(0.5)  # health loop notices
            n_before = len(log_b)
            for i in range(3):
                resp = await client.post(
                    "/api/tts", json={"text": f"f{i}"},
                    headers={"X-Dev-User": "alice"},
                )
                assert resp.status == 200
            assert len(log_b) >= n_before  # b took over (or already had her)
            resp = await client.get("/api/tts/info")
            assert resp.status == 200
            assert (await resp.json())["replica"] == "b"
        finally:
            await client.close()
    finally:
        await server_b.close()
        await server_a.close()


async def test_router_no_replicas_is_503():
    router = create_router_app(["http://127.0.0.1:1"], health_interval=0.2)
    client = TestClient(TestServer(router))
    await client.start_server()
    try:
        await asyncio.sleep(0.4)  # health loop marks it down
        resp = await client.post("/api/tts", json={"text": "x"})
        assert resp.status == 503
    finally:
        await client.close()


async def test_router_routes_openai_endpoint():
    """/v1/audio/speech proxies through the same sticky routing as
    /api/tts (path-faithful: proxy uses request.rel_url)."""
    from aiohttp.test_utils import TestClient, TestServer

    log = []
    stub = make_stub_backend("r1", log)

    async def oa(request):
        body = await request.json()
        log.append(("r1-oa", body.get("input")))
        return web.Response(body=b"RIFFxxxxWAVE",
                            content_type="audio/wav")

    stub.router.add_post("/v1/audio/speech", oa)
    backend_client = TestClient(TestServer(stub))
    await backend_client.start_server()
    try:
        base = (f"http://127.0.0.1:"
                f"{backend_client.server.port}")
        router = create_router_app([base], health_interval=0.1)
        rc = TestClient(TestServer(router))
        await rc.start_server()
        try:
            await asyncio.sleep(0.3)  # let the health loop mark it up
            resp = await rc.post(
                "/v1/audio/speech",
                json={"input": "你好", "voice": "alloy"},
            )
            assert resp.status == 200, await resp.text()
            assert (await resp.read()).startswith(b"RIFF")
            assert ("r1-oa", "你好") in log
        finally:
            await rc.close()
    finally:
        await backend_client.close()
