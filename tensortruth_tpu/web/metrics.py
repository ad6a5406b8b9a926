"""Aggregate stats over web SourceNodes + markdown link discovery.

Mirrors reference core/source_metrics.py (per-status counts, score stats,
content volume) and utils/web_search.py:1727-1820 (link extraction from
fetched markdown for agent follow-up).
"""

from __future__ import annotations

import re
import statistics

from tensortruth_tpu.core.source import SourceNode

_MD_LINK_RE = re.compile(r"\[([^\]]+)\]\((https?://[^)\s]+)\)")


def compute_source_metrics(sources: list[SourceNode]) -> dict:
    by_status: dict[str, int] = {}
    for s in sources:
        by_status[s.status.value] = by_status.get(s.status.value, 0) + 1
    scores = [s.score for s in sources if s.score is not None]
    chars = sum(len(s.content or "") for s in sources)
    return {
        "total": len(sources),
        "by_status": by_status,
        "score_mean": statistics.mean(scores) if scores else None,
        "score_max": max(scores) if scores else None,
        "total_content_chars": chars,
        "estimated_tokens": chars // 4,
    }


def extract_links_from_markdown(markdown: str, max_links: int = 20) -> list[dict]:
    """[{title, url}] — deduped in order of appearance
    (reference web_search.py:1727)."""
    seen: set[str] = set()
    out: list[dict] = []
    for m in _MD_LINK_RE.finditer(markdown):
        title, url = m.group(1).strip(), m.group(2)
        if url in seen:
            continue
        seen.add(url)
        out.append({"title": title, "url": url})
        if len(out) >= max_links:
            break
    return out
