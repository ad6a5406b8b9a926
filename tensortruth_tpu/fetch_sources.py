"""`tensor-truth-tpu-docs` CLI — fetch documentation sources.

Mirrors reference fetch_sources.py:26-550: list/validate sources, add new
ones non-interactively, fetch libraries (sphinx/doxygen), paper categories
(arXiv) and books (PDF) into ``library_docs/``, updating ``sources.json``.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

from tensortruth_tpu.app.paths import get_library_docs_dir
from tensortruth_tpu.app.sources import (
    list_all_modules,
    load_user_sources,
    save_user_sources,
)
from tensortruth_tpu.utils.validation import validate_library_config, validate_sources

logger = logging.getLogger(__name__)


def cmd_list(sources: dict) -> int:
    for section in ("libraries", "papers", "books"):
        entries = sources.get(section, {})
        print(f"{section} ({len(entries)}):")
        for name in sorted(entries):
            print(f"  - {name}")
    return 0


def cmd_validate(sources: dict) -> int:
    report = validate_sources(sources, get_library_docs_dir())
    ok = True
    for module, status in report["modules"].items():
        mark = "OK " if status["ok"] else "ERR"
        print(f"[{mark}] {module}" + (f" — {status['error']}" if status["error"] else ""))
        ok &= status["ok"]
    for d in report["orphaned_dirs"]:
        print(f"[???] orphaned docs dir: {d}")
    return 0 if ok else 1


def cmd_add(sources: dict, args) -> int:
    section = args.section
    config = json.loads(args.config) if args.config else {}
    if section == "libraries":
        err = validate_library_config(config)
        if err:
            logger.error(err)
            return 1
    sources.setdefault(section, {})[args.name] = config
    save_user_sources(sources)
    print(f"added {section}/{args.name}")
    return 0


def cmd_fetch(sources: dict, args) -> int:
    docs_dir = get_library_docs_dir()
    targets = args.modules or list_all_modules(sources)
    ok = True
    for module in targets:
        if module in sources.get("libraries", {}):
            from tensortruth_tpu.scrapers.library import scrape_library

            ok &= scrape_library(module, sources["libraries"][module], docs_dir)
        elif module in sources.get("papers", {}):
            from tensortruth_tpu.scrapers.arxiv import fetch_paper_category

            ok &= fetch_paper_category(
                module, sources["papers"][module], docs_dir,
                converter=getattr(args, "converter", None),
            )
        elif module in sources.get("books", {}):
            from tensortruth_tpu.scrapers.book import fetch_book

            ok &= fetch_book(
                module, sources["books"][module], docs_dir,
                converter=getattr(args, "converter", None),
            )
        else:
            logger.error("unknown module: %s", module)
            ok = False
    return 0 if ok else 1


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Fetch documentation sources")
    sub = parser.add_subparsers(dest="command", required=True)
    sub.add_parser("list")
    sub.add_parser("validate")
    p_add = sub.add_parser("add")
    p_add.add_argument("section", choices=["libraries", "papers", "books"])
    p_add.add_argument("name")
    p_add.add_argument("--config", help="JSON config for the source")
    p_fetch = sub.add_parser("fetch")
    p_fetch.add_argument("--modules", nargs="*", help="default: all configured")
    p_fetch.add_argument(
        "--converter",
        choices=["auto", "marker", "pymupdf4llm", "pymupdf", "fallback"],
        default=None,
        help="PDF conversion quality tier for books/papers (reference "
        "fetch_sources converter flag): marker/pymupdf4llm when installed, "
        "pure-python fallback always available. Default: per-source config "
        "or auto-detect.",
    )
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")
    sources = load_user_sources()
    if args.command == "list":
        return cmd_list(sources)
    if args.command == "validate":
        return cmd_validate(sources)
    if args.command == "add":
        return cmd_add(sources, args)
    return cmd_fetch(sources, args)


if __name__ == "__main__":
    sys.exit(main())
