#!/usr/bin/env bash
# CI entry (reference scripts/test.sh): unit first, then integration.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/unit -q "$@"
python -m pytest tests/integration -q -m "not slow" "$@"
# Trained-weight quality gate: full convert->embed->recall@10-vs-torch when
# a real HF snapshot exists on this machine; clean SKIP otherwise.
JAX_PLATFORMS="${JAX_PLATFORMS:-cpu}" python scripts/verify_trained_parity.py
