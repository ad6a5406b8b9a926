#!/usr/bin/env bash
# Auto-format (reference scripts/format.sh). Uses whatever is available;
# formatting tools are optional in this environment.
set -uo pipefail
cd "$(dirname "$0")/.."
ran=0
if python -c "import black" 2>/dev/null; then
  python -m black tensortruth_tpu tests scripts bench.py __graft_entry__.py; ran=1
fi
if python -c "import isort" 2>/dev/null; then
  python -m isort tensortruth_tpu tests scripts; ran=1
fi
[ "$ran" = 1 ] || echo "no formatter installed (black/isort); skipping"
echo "format done"
