# -*- coding: utf-8 -*-
"""FastAPI mount-shim tests via a stub ``fastapi`` module.

fastapi is not installed in this image, so the shim
(illufly_tts_tpu/api/fastapi_compat.py) is exercised against a minimal
stand-in that records routes and lifecycle hooks. Covers the reference
README's advertised integration surface (reference README.md:67-89):
``mount_tts_service(app, require_user=..., host=..., port=...)`` —
custom auth injection and the remote MCP proxy mode.
"""
import importlib
import sys
import types

import pytest


# ---------------------------------------------------------------------------
# stub fastapi
# ---------------------------------------------------------------------------

class _HTTPException(Exception):
    def __init__(self, status_code: int, detail: str = ""):
        super().__init__(detail)
        self.status_code = status_code
        self.detail = detail


class _Router:
    def __init__(self):
        self.routes = {}

    def post(self, path):
        def deco(fn):
            self.routes[("POST", path)] = fn
            return fn
        return deco

    def get(self, path):
        def deco(fn):
            self.routes[("GET", path)] = fn
            return fn
        return deco


class _App(_Router):
    def __init__(self):
        super().__init__()
        self.state = types.SimpleNamespace()
        self.events = {"startup": [], "shutdown": []}

    def on_event(self, name):
        def deco(fn):
            self.events[name].append(fn)
            return fn
        return deco

    def include_router(self, router, prefix=""):
        for (method, path), fn in router.routes.items():
            self.routes[(method, prefix + path)] = fn


class _Request:
    def __init__(self, headers=None, cookies=None, query=None):
        self.headers = dict(headers or {})
        self.cookies = dict(cookies or {})
        self.query_params = dict(query or {})


@pytest.fixture()
def compat(monkeypatch):
    """Import fastapi_compat against the stub fastapi, freshly."""
    stub = types.ModuleType("fastapi")
    stub.FastAPI = _App
    stub.APIRouter = _Router
    stub.HTTPException = _HTTPException
    stub.Request = _Request
    monkeypatch.setitem(sys.modules, "fastapi", stub)
    sys.modules.pop("illufly_tts_tpu.api.fastapi_compat", None)
    mod = importlib.import_module("illufly_tts_tpu.api.fastapi_compat")
    yield mod
    sys.modules.pop("illufly_tts_tpu.api.fastapi_compat", None)


class FakeMcpClient:
    """Stands in for TTSMcpClient in remote-proxy mode."""

    instances = []

    def __init__(self, **kw):
        self.kw = kw
        self.connected = False
        self.tts_calls = []
        FakeMcpClient.instances.append(self)

    async def connect(self):
        self.connected = True

    async def close(self):
        self.connected = False

    async def text_to_speech(self, text, voice, speed, pitch=1.0):
        self.tts_calls.append((text, voice, speed))
        if voice == "no_such_voice":
            return {"status": "error", "error": "voice not found: " + voice}
        return {"status": "success", "audio_base64": "QUJD",
                "sample_rate": 24000}

    async def list_voices(self):
        return [{"id": "zf_001", "name": "zf_001"}]

    async def get_info(self):
        return {"service": "remote-tts"}


async def _mount_remote(compat, monkeypatch, **extra):
    import illufly_tts_tpu.client.mcp_client as mc

    FakeMcpClient.instances = []
    monkeypatch.setattr(mc, "TTSMcpClient", FakeMcpClient)
    app = compat.FastAPI()
    compat.mount_tts_service(app, host="127.0.0.1", port=31111, **extra)
    for hook in app.events["startup"]:
        await hook()
    return app


async def test_remote_proxy_tts_success_and_errors(compat, monkeypatch):
    hook_calls = []

    def require_user():
        hook_calls.append(1)
        return {"user_id": "hosted_user"}

    app = await _mount_remote(compat, monkeypatch, require_user=require_user)
    client = FakeMcpClient.instances[0]
    assert client.connected
    assert client.kw["host"] == "127.0.0.1" and client.kw["port"] == 31111

    body = compat.TextToSpeechRequest(text="你好", voice_id="zf_001",
                                      speed=1.25)
    out = await app.routes[("POST", "/api/tts")](body, _Request())
    assert out["status"] == "success" and out["audio_base64"] == "QUJD"
    assert client.tts_calls == [("你好", "zf_001", 1.25)]
    assert hook_calls  # host auth hook ran instead of built-in JWT

    # caller-fault (bad voice) → 400; server-side failure text → 500
    bad = compat.TextToSpeechRequest(text="hi", voice_id="no_such_voice")
    with pytest.raises(compat.HTTPException) as exc:
        await app.routes[("POST", "/api/tts")](bad, _Request())
    assert exc.value.status_code == 400

    async def boom(text, voice, speed, pitch=1.0):
        return {"status": "error", "error": "device lost"}
    client.text_to_speech = boom
    with pytest.raises(compat.HTTPException) as exc:
        await app.routes[("POST", "/api/tts")](body, _Request())
    assert exc.value.status_code == 500

    # voices + info proxy through
    voices = await app.routes[("GET", "/api/tts/voices")](_Request())
    assert voices == {"voices": [{"id": "zf_001", "name": "zf_001"}]}
    info = await app.routes[("GET", "/api/tts/info")](_Request())
    assert info == {"service": "remote-tts"}

    for hook in app.events["shutdown"]:
        await hook()
    assert not client.connected


async def test_require_user_async_hook(compat, monkeypatch):
    async def require_user():
        return {"user_id": "async_user"}

    app = await _mount_remote(compat, monkeypatch, require_user=require_user)
    out = await app.routes[("GET", "/api/tts/voices")](_Request())
    assert out["voices"]


async def test_default_auth_rejects_anonymous(compat, monkeypatch):
    monkeypatch.delenv("TTS_DEV_MODE", raising=False)
    app = await _mount_remote(compat, monkeypatch)
    with pytest.raises(compat.HTTPException) as exc:
        await app.routes[("GET", "/api/tts/voices")](_Request())
    assert exc.value.status_code == 401


async def test_malformed_mcp_response_is_502(compat, monkeypatch):
    app = await _mount_remote(compat, monkeypatch,
                              require_user=lambda: {"user_id": "u"})
    client = FakeMcpClient.instances[0]

    async def weird(text, voice, speed, pitch=1.0):
        return "not a dict"
    client.text_to_speech = weird
    body = compat.TextToSpeechRequest(text="hi")
    with pytest.raises(compat.HTTPException) as exc:
        await app.routes[("POST", "/api/tts")](body, _Request())
    assert exc.value.status_code == 502
