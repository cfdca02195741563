#!/usr/bin/env bash
# One-command CI-style suite run (VERDICT r2 item 1).
#
# Uses pytest-xdist (-n 2) when importable — the suite is compile-dominated
# and xdist workers share the persistent XLA compile cache — and falls back
# to a serial run on bare pytest. Exits non-zero on any failure; no
# deselects.
set -euo pipefail
cd "$(dirname "$0")/.."
# Full-suite processes need the raised mmap cap (see tests/conftest.py);
# opt in to the best-effort sysctl write here rather than on every import.
export GTSFM_TEST_RAISE_MAP_COUNT=1
XDIST_ARGS=()
if python -c "import xdist" 2>/dev/null; then
  XDIST_ARGS=(-n 2)
fi
exec python -m pytest tests/ -q "${XDIST_ARGS[@]}" "$@"
