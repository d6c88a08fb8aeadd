#!/usr/bin/env bash
# Pre-snapshot green gate (VERDICT r10 item 2): round 10 ended with a
# red ScaleDesignSpec because plan-pin edits were committed without a
# full-suite run. This script is the LAST command of every round's
# work: it runs the full suite and exits non-zero (loudly) on any
# failure, so a snapshot on red is a deliberate act, never an
# accident. Usage:  bash tools/green_gate.sh
set -uo pipefail
cd "$(dirname "$0")/.."
echo "[green_gate] running full sbt test suite..."
if sbt -batch test > /tmp/green_gate.log 2>&1; then
  tail -5 /tmp/green_gate.log
  echo "[green_gate] GREEN — safe to snapshot/commit artifacts."
else
  echo "[green_gate] *** SUITE IS RED — do NOT snapshot. Failures:"
  grep -E "\*\*\* FAILED|TESTS FAILED|error\]" /tmp/green_gate.log | tail -30
  exit 1
fi
