#!/usr/bin/env bash
# Build-and-check script — the analog of the reference's build_web.sh
# (runs the whole test suite, builds the native geometry library, and
# renders the diagram demo).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== tests =="
python -m pytest tests/ -q

echo "== native diagram library =="
python - <<'PY'
from constraint_solver_tpu.diagram.geometry import _build_lib, demo
print("built:", _build_lib())
out = demo("/tmp/out.svg")
print(f"demo render: {len(out)} bytes -> /tmp/out.svg")
PY

echo "== baseline bench binary =="
g++ -O3 -march=native -o /tmp/baseline_nqueens bench/baseline_nqueens.cc
echo "built: /tmp/baseline_nqueens"
echo "OK"
