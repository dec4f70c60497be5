# -*- coding: utf-8 -*-
"""MCP split-deployment tests: protocol dispatch, stdio subprocess
round-trip, SSE transport, and the HTTP gateway.

The reference documents (README.md:44-66) and its run log proves
(server.log:4-37) an MCP server/client split that is absent from its code
snapshot; these tests pin the restored capability. The subprocess/SSE
tests use TTS_FAKE_BACKEND so no model is built (mcp/server.py keeps
engine imports lazy)."""
import base64
import os
import sys
import wave
import io

import pytest

from illufly_tts_tpu.mcp import protocol as p
from illufly_tts_tpu.mcp.server import FakeBackend, MCPServer, TOOLS


async def test_dispatch_handshake_and_tools():
    server = MCPServer(FakeBackend())
    reply = await server.handle_message(p.request(1, "initialize", {
        "protocolVersion": p.PROTOCOL_VERSION, "capabilities": {},
        "clientInfo": {"name": "t", "version": "0"},
    }))
    assert reply["result"]["protocolVersion"] == p.PROTOCOL_VERSION
    assert reply["result"]["serverInfo"]["name"] == "illufly-tts-tpu"

    assert await server.handle_message(
        p.notification("notifications/initialized")
    ) is None
    assert server.initialized

    reply = await server.handle_message(p.request(2, "tools/list"))
    names = {t["name"] for t in reply["result"]["tools"]}
    assert names == {"text_to_speech", "list_voices", "get_info"}
    assert names == {t.name for t in TOOLS}

    reply = await server.handle_message(p.request(3, "tools/call", {
        "name": "text_to_speech",
        "arguments": {"text": "你好", "voice": "zf_001"},
    }))
    result = p.parse_content_text(reply["result"])
    assert result["status"] == "success"
    wav = base64.b64decode(result["audio_base64"])
    assert wav[:4] == b"RIFF"

    reply = await server.handle_message(p.request(4, "tools/call", {
        "name": "nope", "arguments": {},
    }))
    assert reply["result"]["isError"]

    reply = await server.handle_message(p.request(5, "bogus/method"))
    assert reply["error"]["code"] == p.METHOD_NOT_FOUND


async def test_tool_return_timestamps():
    """text_to_speech accepts return_timestamps (same flag as POST /tts);
    absent or false, no timestamps field appears."""
    server = MCPServer(FakeBackend())
    reply = await server.handle_message(p.request(1, "tools/call", {
        "name": "text_to_speech",
        "arguments": {"text": "你好", "return_timestamps": True},
    }))
    result = p.parse_content_text(reply["result"])
    assert result["status"] == "success"
    assert result["timestamps"] and (
        result["timestamps"][0]["end_s"] > result["timestamps"][0]["start_s"]
    )
    reply = await server.handle_message(p.request(2, "tools/call", {
        "name": "text_to_speech", "arguments": {"text": "你好"},
    }))
    assert "timestamps" not in p.parse_content_text(reply["result"])


async def test_tool_error_flag_for_empty_text():
    server = MCPServer(FakeBackend())
    reply = await server.handle_message(p.request(1, "tools/call", {
        "name": "text_to_speech", "arguments": {"text": ""},
    }))
    assert reply["result"]["isError"]
    assert p.parse_content_text(reply["result"])["status"] == "error"


def _fake_server_cmdline():
    return sys.executable, [
        "-m", "illufly_tts_tpu.api.mcp_server", "--transport", "stdio",
    ]


async def test_stdio_subprocess_roundtrip(monkeypatch):
    monkeypatch.setenv("TTS_FAKE_BACKEND", "1")
    from illufly_tts_tpu.client.mcp_client import TTSMcpClient

    cmd, args = _fake_server_cmdline()
    client = TTSMcpClient(process_command=cmd, process_args=args,
                          timeout=60.0)
    async with client:
        tools = await client.list_tools()
        assert {t["name"] for t in tools} >= {"text_to_speech"}
        voices = await client.list_voices()
        assert voices and voices[0]["id"] == "zf_001"
        result = await client.text_to_speech("测试文本", "zf_001")
        assert result["status"] == "success"
        wav_bytes = base64.b64decode(result["audio_base64"])
        with wave.open(io.BytesIO(wav_bytes)) as w:
            assert w.getframerate() == 24000
            assert w.getnframes() > 0
        # a long text yields a reply line far past asyncio's default
        # 64 KiB stream limit — regression test for the raised limit
        result = await client.text_to_speech("长" * 2000, "zf_001")
        assert result["status"] == "success"
        assert len(base64.b64decode(result["audio_base64"])) > 500_000


async def test_sse_roundtrip(monkeypatch):
    from aiohttp.test_utils import TestServer

    from illufly_tts_tpu.client.mcp_client import TTSMcpClient

    server = MCPServer(FakeBackend())
    test_server = TestServer(server.create_sse_app())
    await test_server.start_server()
    try:
        client = TTSMcpClient(host=test_server.host,
                              port=test_server.port, timeout=30.0)
        async with client:
            info = await client.get_info()
            assert info["service"] == "illufly-tts-tpu-mcp"
            result = await client.text_to_speech("你好世界")
            assert result["status"] == "success"
            # large-reply stress through the SSE line parser too
            result = await client.text_to_speech("长" * 2000)
            assert result["status"] == "success"
            assert len(base64.b64decode(result["audio_base64"])) > 500_000
    finally:
        await test_server.close()


async def test_sse_token_auth(monkeypatch):
    """TTS_MCP_TOKEN gates /sse and /messages (the SSE transport has no
    JWT layer); unset = open (loopback default bind)."""
    from aiohttp.test_utils import TestClient, TestServer

    monkeypatch.setenv("TTS_MCP_TOKEN", "s3cret")
    server = MCPServer(FakeBackend())
    client = TestClient(TestServer(server.create_sse_app()))
    await client.start_server()
    try:
        resp = await client.post("/messages?session_id=x", json={})
        assert resp.status == 401
        resp = await client.post(
            "/messages?session_id=x", json={},
            headers={"Authorization": "Bearer wrong"},
        )
        assert resp.status == 401
        # correct token passes auth (404: the session doesn't exist)
        resp = await client.post(
            "/messages?session_id=x", json={},
            headers={"Authorization": "Bearer s3cret"},
        )
        assert resp.status == 404
        # EventSource-style query token on /sse
        async with client.get("/sse?token=s3cret") as resp:
            assert resp.status == 200
        async with client.get("/sse") as resp:
            assert resp.status == 401
    finally:
        await client.close()


async def test_sse_client_authenticates_with_token(monkeypatch):
    """The client picks TTS_MCP_TOKEN from the env and round-trips
    against a token-gated server; a wrong token fails FAST (the POST
    status is checked instead of waiting out the request timeout)."""
    from aiohttp.test_utils import TestServer

    from illufly_tts_tpu.client.mcp_client import MCPError, TTSMcpClient

    monkeypatch.setenv("TTS_MCP_TOKEN", "tok")
    server = MCPServer(FakeBackend())
    test_server = TestServer(server.create_sse_app())
    await test_server.start_server()
    try:
        client = TTSMcpClient(host=test_server.host,
                              port=test_server.port, timeout=30.0)
        async with client:
            info = await client.get_info()
            assert info["service"] == "illufly-tts-tpu-mcp"
        bad = TTSMcpClient(host=test_server.host, port=test_server.port,
                           timeout=30.0, token="wrong")
        import aiohttp

        with pytest.raises((MCPError, aiohttp.ClientResponseError)):
            await bad.connect()
        await bad.close()
    finally:
        await test_server.close()


async def test_gateway_over_stdio_subprocess(monkeypatch, tmp_path):
    monkeypatch.setenv("TTS_FAKE_BACKEND", "1")
    monkeypatch.setenv("TTS_DEV_MODE", "true")
    from aiohttp.test_utils import TestClient, TestServer

    from illufly_tts_tpu.api.gateway import create_gateway_app

    cmd, args = _fake_server_cmdline()
    app = create_gateway_app(process_command=cmd, process_args=args)
    client = TestClient(TestServer(app))
    await client.start_server()
    try:
        resp = await client.post("/api/tts", json={"text": "网关测试"})
        assert resp.status == 200
        body = await resp.json()
        assert body["status"] == "success"
        assert base64.b64decode(body["audio_base64"])[:4] == b"RIFF"

        resp = await client.get("/api/tts/voices")
        assert resp.status == 200
        assert (await resp.json())["voices"][0]["id"] == "zf_001"

        resp = await client.get("/api/tts/info")
        assert resp.status == 200

        resp = await client.post("/api/tts", json={})
        assert resp.status == 400
    finally:
        await client.close()


async def test_gateway_requires_auth(monkeypatch):
    """Without dev mode, the gateway edge enforces JWT like serve does."""
    monkeypatch.delenv("TTS_DEV_MODE", raising=False)
    monkeypatch.setenv("TTS_FAKE_BACKEND", "1")
    monkeypatch.setenv("FASTAPI_SECRET_KEY", "gw-secret")
    from aiohttp.test_utils import TestClient, TestServer

    from illufly_tts_tpu.api.auth import create_access_token
    from illufly_tts_tpu.api.gateway import create_gateway_app

    cmd, args = _fake_server_cmdline()
    app = create_gateway_app(process_command=cmd, process_args=args)
    client = TestClient(TestServer(app))
    await client.start_server()
    try:
        resp = await client.post("/api/tts", json={"text": "x"})
        assert resp.status == 401
        token = create_access_token({"user_id": "u", "roles": ["user"]})
        resp = await client.post(
            "/api/tts", json={"text": "auth测试"},
            headers={"Authorization": f"Bearer {token}"},
        )
        assert resp.status == 200
    finally:
        await client.close()


async def test_tool_pitch_forwarded_to_backend():
    """The 'pitch' tool argument must reach the backend (regression: the
    dispatch layer once dropped it, silently rendering neutral-pitch
    audio on every MCP-proxied surface)."""
    seen = {}

    class SpyBackend(FakeBackend):
        async def text_to_speech(self, text, voice="zf_001", speed=1.0,
                                 return_timestamps=False, pitch=1.0):
            seen["pitch"] = pitch
            return await super().text_to_speech(
                text, voice, speed, return_timestamps, pitch
            )

    server = MCPServer(SpyBackend())
    reply = await server.handle_message(p.request(1, "tools/call", {
        "name": "text_to_speech",
        "arguments": {"text": "你好", "pitch": 1.5},
    }))
    assert p.parse_content_text(reply["result"])["status"] == "success"
    assert seen["pitch"] == 1.5
    # out-of-range pitch is an error on the MCP path too
    reply = await server.handle_message(p.request(2, "tools/call", {
        "name": "text_to_speech",
        "arguments": {"text": "你好", "pitch": 9.9},
    }))
    out = p.parse_content_text(reply["result"])
    assert out["status"] == "error" and "pitch" in out["error"]
