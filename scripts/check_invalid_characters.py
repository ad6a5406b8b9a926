#!/usr/bin/env python3
"""Report (and optionally remove) invalid Unicode characters in markdown.

Scans U+FFFD replacement characters, NULs, and Unicode noncharacters that
PDF extraction can leave behind (reference scripts/check_invalid_characters.py;
the scrub itself is tensortruth_tpu.utils.pdf.scrub_invalid_chars).

Usage:
    python scripts/check_invalid_characters.py [--file F.md] [--fix] [--verbose]

Without --file, scans every .md under the library docs dir.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from tensortruth_tpu.app.paths import get_library_docs_dir  # noqa: E402
from tensortruth_tpu.utils.pdf import scrub_invalid_chars  # noqa: E402

INVALID = {"�", "\x00", "￾", "￿"}


def check_file(path: Path, fix: bool, verbose: bool) -> int:
    text = path.read_text(encoding="utf-8", errors="replace")
    count = sum(text.count(c) for c in INVALID)
    if count:
        print(f"{path}: {count} invalid character(s)")
        if verbose:
            for ln, line in enumerate(text.splitlines(), 1):
                bad = sum(line.count(c) for c in INVALID)
                if bad:
                    print(f"  line {ln}: {bad}")
        if fix:
            # scrub_invalid_chars strips the persistence hazards (controls,
            # surrogates, noncharacters); U+FFFD is cosmetic, removed here.
            cleaned = scrub_invalid_chars(text)
            for c in INVALID:
                cleaned = cleaned.replace(c, "")
            path.write_text(cleaned, encoding="utf-8")
            print(f"  fixed {path}")
    return count


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--file", type=Path, help="check one file instead of the docs dir")
    ap.add_argument("--fix", action="store_true", help="remove invalid characters in place")
    ap.add_argument("--verbose", action="store_true", help="line-by-line detail")
    args = ap.parse_args()

    files = [args.file] if args.file else sorted(get_library_docs_dir().rglob("*.md"))
    total = sum(check_file(f, args.fix, args.verbose) for f in files if f.is_file())
    print(f"{len(files)} file(s) scanned, {total} invalid character(s)"
          + (" removed" if args.fix and total else ""))
    return 1 if (total and not args.fix) else 0


if __name__ == "__main__":
    raise SystemExit(main())
