#!/usr/bin/env bash
# CI harness — the build_all.sh / .github/workflows/CI.yml:52-185 equivalent.
#
# Stages:
#   0. lint (stdlib AST gate — the clippy/CodeQL stage equivalent,
#      .github/workflows/CI.yml + codeql.yml; no 3rd-party linter in-image)
#   1. unit + e2e test suite (CPU; conftest forces the CPU backend and an
#      8-device virtual mesh)
#   2. CLI matrix: gen-fixtures -> zksetup -> prove -> show -> verify for
#      every parameter set (the reference CI runs the same 4x5 matrix)
#   3. multi-chip dryrun (8 virtual devices: sharded MSM + sharded prove)
#   4. multi-host smoke (2 processes x 4 devices, gloo collectives over the
#      DCN-standing-in gRPC transport)
#   5. bench smoke (BENCH_LOG_N=12; requires an accelerator — skipped when
#      SKIP_BENCH=1)
#
# Usage: scripts/ci.sh [quick]   ("quick" = rs256 CLI column only)

set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== [0/5] lint ==="
python scripts/lint.py

echo "=== [1/5] pytest ==="
python -m pytest tests/ -x -q

echo "=== [2/5] CLI matrix ==="
SETS=(rs256 rs256-sd rs256-db mdl1)
if [[ "${1:-}" == "quick" ]]; then SETS=(rs256); fi
for name in "${SETS[@]}"; do
  echo "--- parameter set: $name ---"
  for step in gen-fixtures zksetup prove show verify; do
    echo "  $ crescent $step --name $name"
    python -m crescent_tpu.cli "$step" --name "$name"
  done
done

echo "=== [3/5] multi-chip dryrun ==="
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "=== [4/5] multi-host (DCN) smoke ==="
python scripts/multihost_smoke.py 2 4

echo "=== [5/5] bench smoke ==="
if [[ "${SKIP_BENCH:-0}" == "1" ]]; then
  echo "skipped (SKIP_BENCH=1)"
else
  BENCH_LOG_N=12 python bench.py
fi

echo "CI: all stages green"
