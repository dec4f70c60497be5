"""Test configuration.

Tests always run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (reference has no distributed tests at all —
see SURVEY.md §4; this is the TPU-native analogue).

Environment must be set before the first `import jax` anywhere.
"""
import os

# NOTE: the environment's axon sitecustomize force-registers the TPU backend
# and pins JAX_PLATFORMS=axon before conftest runs; plain env overrides are
# ignored. jax.config.update after import is authoritative.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import asyncio  # noqa: E402
import inspect  # noqa: E402

import pytest  # noqa: E402


def pytest_collection_modifyitems(items):
    for item in items:
        if inspect.iscoroutinefunction(getattr(item, "function", None)):
            item.add_marker(pytest.mark.asyncio)


try:  # pytest-asyncio may not be installed; provide a minimal fallback.
    import pytest_asyncio  # noqa: F401

    HAVE_PYTEST_ASYNCIO = True
except ImportError:
    HAVE_PYTEST_ASYNCIO = False

if not HAVE_PYTEST_ASYNCIO:

    @pytest.hookimpl(tryfirst=True)
    def pytest_pyfunc_call(pyfuncitem):
        fn = pyfuncitem.function
        if inspect.iscoroutinefunction(fn):
            sig = inspect.signature(fn)
            kwargs = {
                name: pyfuncitem.funcargs[name]
                for name in sig.parameters
                if name in pyfuncitem.funcargs
            }
            loop = asyncio.new_event_loop()
            try:
                loop.run_until_complete(fn(**kwargs))
            finally:
                loop.close()
            return True
        return None
