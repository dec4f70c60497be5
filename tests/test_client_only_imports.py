# -*- coding: utf-8 -*-
"""The client-only half of the split deployment must not import jax.

pyproject's `client` extra promises the MCP client, the HTTP gateway and
the FastAPI proxy shim run on a web host with just aiohttp (+fastapi for
the shim) — no engine stack (reference README.md:22-28 client install,
:53-55 split deployment). These tests run a fresh interpreter with the
jax stack IMPORT-BLOCKED and exercise those surfaces.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _blocker(blocked: str) -> str:
    return f"""
import sys

class _Block:
    BLOCKED = {blocked}

    def find_spec(self, name, path=None, target=None):
        if name.split(".")[0] in self.BLOCKED:
            raise ImportError(
                "BLOCKED: client-only deployment must not import " + name
            )
        return None

sys.meta_path.insert(0, _Block())
"""


FASTAPI_STUB = r"""
import types

stub = types.ModuleType("fastapi")


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
        for key, fn in router.routes.items():
            self.routes[(key[0], prefix + key[1])] = fn


class _Exc(Exception):
    def __init__(self, status_code, detail=""):
        self.status_code = status_code
        self.detail = detail


stub.FastAPI = _App
stub.APIRouter = _Router
stub.HTTPException = _Exc
stub.Request = object
sys.modules["fastapi"] = stub
"""


def _run(prelude: str, body: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", prelude + body],
        cwd=REPO, capture_output=True, text=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )


def test_mcp_client_and_gateway_import_without_jax():
    proc = _run(
        _blocker('("jax", "jaxlib", "flax", "optax", "orbax", "numpy")'),
        "from illufly_tts_tpu.client.mcp_client import TTSMcpClient\n"
        "from illufly_tts_tpu.api.gateway import create_gateway_app\n"
        "app = create_gateway_app(server_host='h', server_port=1)\n"
        "routes = {r.method + ' ' + r.resource.canonical\n"
        "          for r in app.router.routes() if r.resource}\n"
        "assert 'POST /api/tts' in routes, routes\n"
        "print('CLIENT-ONLY OK')\n",
    )
    assert proc.returncode == 0, proc.stderr
    assert "CLIENT-ONLY OK" in proc.stdout


def test_fastapi_shim_remote_mode_imports_without_jax():
    # pydantic imports numpy when it is installed, so only the jax stack
    # is blocked here; the point is that the ENGINE never loads
    proc = _run(
        _blocker('("jax", "jaxlib", "flax", "optax", "orbax")')
        + FASTAPI_STUB,
        "from illufly_tts_tpu.api.fastapi_compat import mount_tts_service\n"
        "import fastapi\n"
        "app = fastapi.FastAPI()\n"
        "mount_tts_service(app, host='h', port=1,\n"
        "                  require_user=lambda: {'user_id': 'u'})\n"
        "assert ('POST', '/api/tts') in app.routes\n"
        "print('SHIM OK')\n",
    )
    assert proc.returncode == 0, proc.stderr
    assert "SHIM OK" in proc.stdout
