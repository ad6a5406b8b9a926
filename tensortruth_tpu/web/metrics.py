"""Aggregate stats over web SourceNodes.

Mirrors reference core/source_metrics.py (per-status counts, score stats,
content volume). Link discovery lives in web/links.py.
"""

from __future__ import annotations

import statistics

from tensortruth_tpu.core.source import SourceNode


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


