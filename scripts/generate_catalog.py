"""Regenerate extension_library/catalog.json from the YAML files present
(reference scripts/generate_catalog.py)."""

import json
import sys
from pathlib import Path

import yaml

LIB = Path(__file__).resolve().parent.parent / "extension_library"


def main() -> int:
    entries = []
    for ext_type in ("commands", "agents"):
        d = LIB / ext_type
        if not d.exists():
            continue
        for f in sorted(d.glob("*.y*ml")):
            spec = yaml.safe_load(f.read_text()) or {}
            entries.append(
                {
                    "name": spec.get("name", f.stem),
                    "ext_type": ext_type,
                    "filename": f.name,
                    "description": spec.get("description", ""),
                }
            )
    (LIB / "catalog.json").write_text(json.dumps(entries, indent=2) + "\n")
    print(f"wrote {len(entries)} catalog entries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
