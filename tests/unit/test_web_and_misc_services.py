"""Web metrics/link discovery, image service, metadata store, service tools."""

import asyncio

import numpy as np
import pytest

from tensortruth_tpu.core.source import SourceNode, SourceStatus
from tensortruth_tpu.services.image_service import ImageService
from tensortruth_tpu.services.metadata_store import MetadataStore
from tensortruth_tpu.web.links import extract_links_from_markdown
from tensortruth_tpu.web.metrics import compute_source_metrics
from tensortruth_tpu.web.pipeline import fit_sources_to_context, rerank_sources


def test_source_metrics():
    srcs = [
        SourceNode(content="x" * 400, score=0.8),
        SourceNode(content="", status=SourceStatus.FAILED),
        SourceNode(content="y" * 100, score=0.2, status=SourceStatus.FILTERED),
    ]
    m = compute_source_metrics(srcs)
    assert m["total"] == 3
    assert m["by_status"] == {"success": 1, "failed": 1, "filtered": 1}
    assert m["score_max"] == 0.8
    assert m["estimated_tokens"] == 125


def test_extract_links():
    md = (
        "see [A](https://a.com/x) and [A2](https://a.com/x) "
        "[B](https://b.com/y) [rel](/docs/guide) [frag](#sec) "
        "[login](https://a.com/login) [js](javascript:alert(1))"
    )
    links = extract_links_from_markdown(md, "https://base.org/page")
    urls = [u for _, u in links]
    assert urls.count("https://a.com/x") == 1  # deduped
    assert "https://base.org/docs/guide" in urls  # relative resolved
    assert not any("#" in u for u in urls)  # fragments dropped
    assert not any("login" in u for u in urls)  # boilerplate dropped
    assert not any(u.startswith("javascript") for u in urls)

    # already-fetched exclusion
    links = extract_links_from_markdown(
        md, "https://base.org/page", exclude_urls={"https://a.com/x"}
    )
    assert "https://a.com/x" not in [u for _, u in links]


def test_fit_sources_to_context():
    srcs = [SourceNode(content="a" * 10_000, score=0.9),
            SourceNode(content="b" * 10_000, score=0.8),
            SourceNode(content="c" * 10_000, score=0.7)]
    out = fit_sources_to_context(srcs, context_window=8192, input_pct=0.6, per_source_pct=0.15)
    # per-source cap = 8192*0.15*4 ≈ 4915 chars; budget ≈ 19660 chars → all 3 fit capped
    assert len(out) == 3
    assert all(len(s.content) <= int(8192 * 0.15) * 4 for s in out)
    assert [s.score for s in out] == [0.9, 0.8, 0.7]


def test_rerank_sources_thin_penalty():
    class R:
        def rerank(self, q, docs, top_n):
            return np.arange(len(docs)), np.ones(len(docs), np.float32)

    thick = SourceNode(content="x" * 1000)
    thin = SourceNode(content="x" * 100)
    passed, _ = rerank_sources(R(), "q", [thick, thin], lambda s: s.content, 0.1)
    assert thick.score == pytest.approx(1.0)
    assert thin.score < 0.7  # penalized


def test_image_service(tmp_path):
    svc = ImageService(images_dir_fn=lambda sid: tmp_path)
    png = b"\x89PNG\r\n\x1a\n" + b"fakepngdata"
    image_id = svc.save_image("s1", png)
    assert image_id.endswith(".png")
    assert svc.get_path("s1", image_id).read_bytes() == png
    assert svc.get_path("s1", "missing.png") is None
    import base64

    b64_id = svc.save_base64("s1", "data:image/png;base64," + base64.b64encode(png).decode())
    assert b64_id == image_id  # content-addressed


def test_metadata_store(tmp_path):
    store = MetadataStore(tmp_path)
    assert store.get("d1") is None
    store.set("d1", {"title": "T"})
    assert store.get("d1") == {"title": "T"}
    assert store.all() == {"d1": {"title": "T"}}
    assert store.delete("d1")
    assert not store.delete("d1")


def test_manage_mcp_server_confirmation_flow(tmp_path):
    """manage_mcp_server waits for approval; approval applies the change."""
    from tensortruth_tpu.services.mcp_server_service import MCPServerService
    from tensortruth_tpu.services.orchestrator_tools import create_service_tools
    from tensortruth_tpu.services.tool_confirmation_service import ToolConfirmationService

    class Services:
        mcp_service = MCPServerService(tmp_path / "mcp.json")
        confirmation_service = ToolConfirmationService()

    services = Services()
    emitted = []

    async def emit(msg):
        emitted.append(msg)

    tools = create_service_tools(services, emit=emit)

    async def scenario():
        task = asyncio.create_task(
            tools["manage_mcp_server"].fn(action="add", name="srv", config={"command": "x"})
        )
        await asyncio.sleep(0.05)
        assert emitted and emitted[0]["type"] == "confirmation_request"
        services.confirmation_service.approve(emitted[0]["confirmation_id"])
        result = await task
        assert "done" in result
        assert any(s["name"] == "srv" for s in services.mcp_service.list_servers())

        # rejection path
        task = asyncio.create_task(
            tools["manage_mcp_server"].fn(action="remove", name="srv")
        )
        await asyncio.sleep(0.05)
        services.confirmation_service.reject(emitted[-1]["confirmation_id"])
        result = await task
        assert "rejected" in result
        assert any(s["name"] == "srv" for s in services.mcp_service.list_servers())

    asyncio.run(scenario())
