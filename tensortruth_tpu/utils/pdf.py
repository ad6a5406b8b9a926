"""PDF utilities: text extraction, page splitting, math normalization.

Covers the contracts of reference utils/pdf.py:23-658 that matter to the
engine (extractable-text probe, page-chunk splitting, math-delimiter
normalization, invalid-character scrubbing). The reference converts PDFs via
PyMuPDF/marker (C/CUDA deps unavailable in this environment); here a backend
ladder is used:

1. ``pymupdf`` when importable (same quality as the reference),
2. a dependency-free fallback extractor: parses xref-less PDFs by scanning
   COS objects, zlib-inflating content streams and pulling text from
   Tj/TJ/' operators — good enough for digitally-born PDFs, returns "" for
   scanned ones (matching the reference's extractable-text probe semantics).
"""

from __future__ import annotations

import logging
import re
import zlib

logger = logging.getLogger(__name__)

# -- backend ladder ------------------------------------------------------------


def _extract_with_pymupdf(data: bytes) -> list[str] | None:
    try:
        import pymupdf  # type: ignore
    except ImportError:
        return None
    with pymupdf.open(stream=data, filetype="pdf") as doc:
        return [page.get_text() for page in doc]


_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
# Text-showing operators inside content streams: (..) Tj, (..) ', [..] TJ
_TJ_RE = re.compile(rb"\((?:\\.|[^\\()])*\)\s*(?:Tj|')|\[(?:\\.|[^\]])*\]\s*TJ")
_PSTR_RE = re.compile(rb"\((?:\\.|[^\\()])*\)")
_PAGE_RE = re.compile(rb"/Type\s*/Page[^s]")

_ESCAPES = {
    b"\\n": b"\n", b"\\r": b"\r", b"\\t": b"\t",
    b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\",
}


def _decode_pdf_string(raw: bytes) -> str:
    body = raw[1:-1]
    for esc, rep in _ESCAPES.items():
        body = body.replace(esc, rep)
    body = re.sub(rb"\\(\d{1,3})", lambda m: bytes([int(m.group(1), 8) & 0xFF]), body)
    if body.startswith(b"\xfe\xff"):  # UTF-16BE text string
        try:
            return body[2:].decode("utf-16-be", errors="ignore")
        except Exception:
            return ""
    return body.decode("latin-1", errors="ignore")


def _extract_fallback(data: bytes) -> list[str]:
    """Naive stream-scan extraction; one pseudo-page per content stream."""
    pages: list[str] = []
    for m in _STREAM_RE.finditer(data):
        raw = m.group(1)
        try:
            content = zlib.decompress(raw)
        except zlib.error:
            content = raw
        parts: list[str] = []
        for op in _TJ_RE.finditer(content):
            for s in _PSTR_RE.finditer(op.group(0)):
                parts.append(_decode_pdf_string(s.group(0)))
        text = "".join(parts)
        if text.strip():
            pages.append(text)
    return pages


def extract_pdf_pages(data: bytes) -> list[str]:
    """Per-page text; empty list when nothing extractable."""
    pages = _extract_with_pymupdf(data)
    if pages is None:
        pages = _extract_fallback(data)
    return pages


def pdf_to_text(data: bytes) -> str:
    return "\n\n".join(extract_pdf_pages(data))


def has_extractable_text(data: bytes, min_chars: int = 100) -> bool:
    """Extractable-text probe (reference utils/pdf.py extractable check)."""
    return len(pdf_to_text(data).strip()) >= min_chars


def split_pages_into_chunks(pages: list[str], pages_per_chunk: int = 15) -> list[str]:
    """Fixed page chunks, default 15 (reference scrapers/book.py:299)."""
    return [
        "\n\n".join(pages[i : i + pages_per_chunk])
        for i in range(0, len(pages), pages_per_chunk)
    ]


# -- math delimiter normalization (reference utils/pdf.py:469-520) -------------

_DISPLAY_RE = re.compile(r"\\\[(.+?)\\\]", re.DOTALL)
_INLINE_RE = re.compile(r"\\\((.+?)\\\)", re.DOTALL)


def normalize_math_delimiters(text: str) -> str:
    r"""``\[...\]`` → ``$$...$$`` and ``\(...\)`` → ``$...$`` so markdown
    renderers and the chunker see one canonical math syntax."""
    text = _DISPLAY_RE.sub(lambda m: f"$${m.group(1)}$$", text)
    text = _INLINE_RE.sub(lambda m: f"${m.group(1)}$", text)
    return text


_INVALID_RE = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\ufffe\uffff\ud800-\udfff]")


def scrub_invalid_chars(text: str) -> str:
    """Strip control/surrogate characters that break JSON/sqlite persistence
    (reference scripts/check_invalid_characters.py contract)."""
    return _INVALID_RE.sub("", text)


def post_process_markdown(text: str) -> str:
    return scrub_invalid_chars(normalize_math_delimiters(text))
