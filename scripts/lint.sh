#!/usr/bin/env bash
# Static checks (reference scripts/lint.sh). Uses whatever is available.
set -uo pipefail
cd "$(dirname "$0")/.."
python -m compileall -q tensortruth_tpu tests bench.py __graft_entry__.py || exit 1
if python -c "import flake8" 2>/dev/null; then
  python -m flake8 --max-line-length 100 --extend-ignore=E203,W503 tensortruth_tpu
fi
echo "lint ok"
