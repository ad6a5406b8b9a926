"""PDF book fetching with chapter/page splitting
(reference scrapers/book.py:21-449)."""

from __future__ import annotations

import logging
import re
from pathlib import Path

logger = logging.getLogger(__name__)

DEFAULT_PAGES_PER_CHUNK = 15


def _safe(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]+", "_", name).strip("_")[:80]


def fetch_book(
    book_name: str,
    config: dict,
    output_base_dir: str | Path,
    pages_per_chunk: int = DEFAULT_PAGES_PER_CHUNK,
) -> bool:
    """Download a book PDF, split into page chunks, write markdown per chunk.

    The reference splits by embedded TOC chapters when available
    (reference book.py:109-298) — TOC extraction needs PyMuPDF outlines;
    with the fallback extractor, fixed page chunks are used
    (reference book.py:299, default 15 pages).
    """
    import requests

    from tensortruth_tpu.utils.pdf import (
        extract_pdf_pages,
        post_process_markdown,
        split_pages_into_chunks,
    )

    output_dir = Path(output_base_dir) / f"book_{book_name}"
    output_dir.mkdir(parents=True, exist_ok=True)
    url = config.get("url") or config.get("pdf_url", "")
    try:
        r = requests.get(url, timeout=120, headers={"User-Agent": "Mozilla/5.0"})
        r.raise_for_status()
    except Exception as e:
        logger.error("book download failed %s: %s", url, e)
        return False

    pages = extract_pdf_pages(r.content)
    if not pages:
        logger.error("no extractable text in book %s", book_name)
        return False
    chunks = split_pages_into_chunks(pages, config.get("pages_per_chunk", pages_per_chunk))
    for i, chunk in enumerate(chunks, 1):
        out = output_dir / f"{i:02d}_chapter_{i}_{_safe(book_name)}.md"
        out.write_text(post_process_markdown(chunk), encoding="utf-8")
    logger.info("book %s: %d chunks", book_name, len(chunks))
    return True


def fetch_book_category(books: dict, output_base_dir: str | Path) -> bool:
    ok = 0
    for name, config in books.items():
        if fetch_book(name, config, output_base_dir):
            ok += 1
    return ok > 0
