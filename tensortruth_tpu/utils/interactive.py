"""Interactive wizard for adding documentation sources.

Mirrors reference utils/interactive.py:1-661 (guided add of
library/paper/book sources with prompts and arXiv metadata auto-fetch),
compacted: one prompt loop per source type, validation before save,
network-dependent metadata lookups degrade gracefully.
"""

from __future__ import annotations

import json
import logging

from tensortruth_tpu.app.sources import load_user_sources, save_user_sources
from tensortruth_tpu.utils.validation import validate_library_config

logger = logging.getLogger(__name__)


def _ask(prompt: str, default: str = "", input_fn=input) -> str:
    suffix = f" [{default}]" if default else ""
    value = input_fn(f"{prompt}{suffix}: ").strip()
    return value or default


def add_library_interactive(input_fn=input) -> tuple[str, dict]:
    name = _ask("Library name (e.g. numpy_2.1)", input_fn=input_fn)
    doc_type = _ask("Doc type (sphinx/doxygen)", "sphinx", input_fn)
    config: dict = {"doc_type": doc_type}
    if doc_type == "sphinx":
        config["inventory_url"] = _ask("objects.inv URL", input_fn=input_fn)
        config["doc_root"] = _ask("Doc root URL (blank = derive)", input_fn=input_fn)
        if not config["doc_root"]:
            config.pop("doc_root")
    else:
        config["doc_root"] = _ask("Doxygen HTML root URL", input_fn=input_fn)
    selector = _ask("CSS content selector (blank = auto)", input_fn=input_fn)
    if selector:
        config["selector"] = selector
    err = validate_library_config(config)
    if err:
        raise ValueError(err)
    return name, config


def add_papers_interactive(input_fn=input) -> tuple[str, dict]:
    category = _ask("Paper category name (e.g. attention)", input_fn=input_fn)
    papers: dict = {}
    while True:
        arxiv_id = _ask("arXiv id (blank to finish)", input_fn=input_fn)
        if not arxiv_id:
            break
        meta: dict = {}
        try:  # auto-fetch title/authors (reference wizard behavior)
            from tensortruth_tpu.web.fetch import ArxivHandler

            title, _ = ArxivHandler().fetch(f"https://arxiv.org/abs/{arxiv_id}")
            if title:
                meta["title"] = title
                print(f"  found: {title}")
        except Exception as e:
            logger.debug("arXiv lookup failed: %s", e)
        papers[arxiv_id] = meta
    return category, {"papers": papers}


def add_book_interactive(input_fn=input) -> tuple[str, dict]:
    name = _ask("Book name", input_fn=input_fn)
    config = {"url": _ask("PDF URL", input_fn=input_fn)}
    pages = _ask("Pages per chunk", "15", input_fn)
    config["pages_per_chunk"] = int(pages)
    return name, config


def interactive_add(input_fn=input) -> None:
    """Top-level wizard loop (reference fetch_sources interactive mode)."""
    section = _ask("Add what? (libraries/papers/books)", "libraries", input_fn)
    adders = {
        "libraries": add_library_interactive,
        "papers": add_papers_interactive,
        "books": add_book_interactive,
    }
    if section not in adders:
        raise ValueError(f"unknown section {section}")
    name, config = adders[section](input_fn)
    sources = load_user_sources()
    sources.setdefault(section, {})[name] = config
    save_user_sources(sources)
    print(f"saved {section}/{name}: {json.dumps(config)}")
