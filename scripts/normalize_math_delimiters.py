#!/usr/bin/env python3
"""Normalize LaTeX math delimiters in markdown to one canonical syntax.

\\[...\\] → $$...$$ and \\(...\\) → $...$ — this repo's canonical
direction (tensortruth_tpu.utils.pdf.normalize_math_delimiters), so
markdown renderers and the chunker see a single math syntax. Batch-CLI
analog of reference scripts/normalize_math_delimiters.py (which picks the
opposite canonical form; the capability — one delimiter style corpus-wide
— is the same).

Usage:
    python scripts/normalize_math_delimiters.py [--file F.md] [--dry-run]

Without --file, processes every .md under the library docs dir.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from tensortruth_tpu.app.paths import get_library_docs_dir  # noqa: E402
from tensortruth_tpu.utils.pdf import normalize_math_delimiters  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--file", type=Path, help="process one file instead of the docs dir")
    ap.add_argument("--dry-run", action="store_true", help="report without writing")
    args = ap.parse_args()

    files = [args.file] if args.file else sorted(get_library_docs_dir().rglob("*.md"))
    changed = 0
    for f in files:
        if not f.is_file():
            continue
        text = f.read_text(encoding="utf-8", errors="replace")
        out = normalize_math_delimiters(text)
        if out != text:
            changed += 1
            print(f"{'would change' if args.dry_run else 'normalized'}: {f}")
            if not args.dry_run:
                f.write_text(out, encoding="utf-8")
    print(f"{len(files)} file(s) scanned, {changed} changed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
