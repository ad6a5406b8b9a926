"""Test harness configuration.

All tests run on the CPU backend with 8 virtual devices so that sharding /
mesh logic is exercised without TPU hardware (mirrors the reference's strategy
of mocking heavy externals while testing real logic — reference
tests/conftest.py:54-69,263-299).

IMPORTANT: env vars must be set before jax initializes its backends, which is
why this block sits at the very top of conftest, before any project import.
"""

import os

# Force CPU even when JAX_PLATFORMS is preset (e.g. to the axon TPU tunnel).
# NOTE: the axon PJRT plugin ignores the env var, so the config.update call
# below is the one that actually sticks; env vars are set first anyway so XLA
# sees the host-device-count flag before backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache across tests AND suite runs: every
# ModelManager.reset_instance() builds fresh jit closures whose first call
# recompiles the tiny-model programs — on this 1-core host those compiles
# stack up under suite load and were the root cause of the flaky
# 60s-receive-timeout in test_session_document_upload_then_rag_query.
# The dir is keyed by the host CPU fingerprint (see
# tensortruth_tpu.models.manager.host_cache_tag — inlined here because
# conftest must configure jax before any project import): XLA:CPU AOT
# executables are microarch-specific and a cache carried across hosts
# fails to load ("Machine type ... doesn't match") on every entry.
def _host_cache_tag() -> str:
    import hashlib
    import platform

    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats += " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        feats += platform.processor()
    return hashlib.sha256(feats.encode()).hexdigest()[:10]


_test_cache = os.path.expanduser(
    "~/.cache/tensortruth_tpu_jax_test_" + _host_cache_tag()
)
os.makedirs(_test_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _test_cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import asyncio
import inspect

import numpy as np
import pytest

# -- minimal asyncio support (pytest-asyncio is not available) -----------------

_loop_holder: dict = {}


@pytest.fixture
def event_loop():
    loop = asyncio.new_event_loop()
    _loop_holder["loop"] = loop
    yield loop
    _loop_holder.pop("loop", None)
    loop.close()


def pytest_pyfunc_call(pyfuncitem):
    if inspect.iscoroutinefunction(pyfuncitem.obj):
        loop = _loop_holder.get("loop")
        own = loop is None
        if own:
            loop = asyncio.new_event_loop()
        kwargs = {
            n: pyfuncitem.funcargs[n] for n in pyfuncitem._fixtureinfo.argnames
        }
        try:
            loop.run_until_complete(pyfuncitem.obj(**kwargs))
        finally:
            if own:
                loop.close()
        return True
    return None


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tiny_tokenizer():
    from tensortruth_tpu.tokenization import SimpleTokenizer

    return SimpleTokenizer()


@pytest.fixture
def sample_text():
    # Deterministic multi-paragraph text, long enough to produce a
    # multi-level hierarchy with small chunk sizes.
    paras = []
    for i in range(40):
        words = [f"w{i}_{j}" for j in range(60)]
        paras.append(f"Paragraph {i} about topic {i % 7}. " + " ".join(words) + ".")
    return "\n\n".join(paras)
