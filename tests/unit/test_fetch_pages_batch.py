"""fetch_pages_batch tool: link discovery honors the config flag and
appends head-fetched suggestions (reference
orchestrator_tool_wrappers.py:651-929)."""

import asyncio

import pytest

from tensortruth_tpu.web.search import fetch_pages_batch_tool

MD = "intro [deep dive](https://example.com/deep) text"


@pytest.fixture
def fake_fetch(monkeypatch):
    import tensortruth_tpu.web.fetch as fetch_mod

    monkeypatch.setattr(
        fetch_mod, "fetch_url_as_markdown", lambda url: ("Title", MD)
    )


def test_links_discovered_with_metadata(fake_fetch, monkeypatch, event_loop):
    import tensortruth_tpu.web.links as links_mod

    async def fake_meta(links, max_links=8, timeout=5.0):
        return [
            {"url": u, "anchor_text": a, "title": "Deep", "description": "d",
             "fetchable": True}
            for a, u in links
        ]

    monkeypatch.setattr(links_mod, "fetch_link_metadata", fake_meta)
    out = event_loop.run_until_complete(
        fetch_pages_batch_tool(["https://example.com/a"], discover_links=True)
    )
    assert out[0]["status"] == "success"
    assert out[0]["links"] == [{"title": "deep dive", "url": "https://example.com/deep"}]
    assert "Discovered links" in out[0]["link_suggestions"]
    assert "https://example.com/deep" in out[0]["link_suggestions"]


def test_discover_links_off_skips_discovery(fake_fetch, monkeypatch, event_loop):
    import tensortruth_tpu.web.links as links_mod

    async def boom(*a, **k):  # must never be called when the flag is off
        raise AssertionError("head fetch ran with discover_links=False")

    monkeypatch.setattr(links_mod, "fetch_link_metadata", boom)
    out = event_loop.run_until_complete(
        fetch_pages_batch_tool(["https://example.com/a"], discover_links=False)
    )
    assert out[0]["status"] == "success"
    assert out[0]["links"] == []
    assert "link_suggestions" not in out[0]


def test_flag_defaults_from_config(fake_fetch, monkeypatch, tmp_path, event_loop):
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    from tensortruth_tpu.app.config import TensorTruthTPUConfig, save_config

    cfg = TensorTruthTPUConfig.default()
    cfg.web_search.discover_links = False
    save_config(cfg)

    import tensortruth_tpu.web.links as links_mod

    async def boom(*a, **k):
        raise AssertionError("head fetch ran despite config off")

    monkeypatch.setattr(links_mod, "fetch_link_metadata", boom)
    out = event_loop.run_until_complete(
        fetch_pages_batch_tool(["https://example.com/a"])  # discover_links=None
    )
    assert out[0]["links"] == []


async def test_discover_links_config_ttl_cache(monkeypatch, tmp_path):
    """Advisor r2: the discover_links default is TTL-cached — load_config
    must NOT run on every tool call, but a changed config is picked up
    after the TTL expires."""
    from tensortruth_tpu.web import search as search_mod

    calls = {"n": 0}

    class Cfg:
        class web_search:
            discover_links = False

    def fake_load():
        calls["n"] += 1
        return Cfg

    import tensortruth_tpu.app.config as config_mod

    monkeypatch.setattr(config_mod, "load_config", fake_load)
    monkeypatch.setattr(search_mod, "_DISCOVER_LINKS_CACHE", None)

    assert search_mod._discover_links_default() is False
    assert search_mod._discover_links_default() is False
    assert calls["n"] == 1  # second call served from cache

    # expire the TTL → re-read
    t0, v = search_mod._DISCOVER_LINKS_CACHE
    monkeypatch.setattr(
        search_mod, "_DISCOVER_LINKS_CACHE",
        (t0 - search_mod._DISCOVER_LINKS_TTL - 1, v),
    )
    Cfg.web_search.discover_links = True
    assert search_mod._discover_links_default() is True
    assert calls["n"] == 2
