#!/usr/bin/env bash
# CI entry point: fast tier first (sub-2-minute smoke on 1 CPU, covers every
# module), then the full compile-heavy tier (Pallas interpret, SPMD meshes,
# pipeline e2e, live-torch parity — ~16 min warm on 1 CPU).
#
#   scripts/ci.sh          # fast, then slow
#   scripts/ci.sh fast     # fast tier only
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== fast tier (pytest -m 'not slow') ==="
python -m pytest tests/ -m "not slow" -q -x

if [[ "${1:-all}" != "fast" ]]; then
  echo "=== slow tier (pytest -m slow) ==="
  python -m pytest tests/ -m "slow" -q -x
fi
