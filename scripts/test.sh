#!/usr/bin/env bash
# CI entry (reference scripts/test.sh): unit first, then integration.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/unit -q "$@"
python -m pytest tests/integration -q -m "not slow" "$@"
