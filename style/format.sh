#!/usr/bin/env bash
# Format sweep (the reference's style/format.sh runs clang-format + black; this
# repo is Python-only, so: black for layout, ruff for lint).
# Usage: ./style/format.sh [--check]
set -euo pipefail
cd "$(dirname "$0")/.."

TARGETS=(jaybenne_tpu tests tst analysis bench.py __graft_entry__.py)

if [[ "${1:-}" == "--check" ]]; then
  black --check --quiet "${TARGETS[@]}" || { echo "black: reformat needed"; exit 1; }
  ruff check "${TARGETS[@]}"
else
  black --quiet "${TARGETS[@]}" || true
  ruff check --fix "${TARGETS[@]}" || true
fi
echo "format: ok"
