#!/usr/bin/env bash
# The commit gate (SURVEY §4): ANY commit touching src/main must pass
# this first — round 3 was zeroed by one non-compiling final snapshot.
#   usage: scripts/gate.sh [sfDir]   (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="$(mktemp -d /tmp/graft-gate.XXXXXX)"
trap 'rm -rf "$OUT"' EXIT

sbt -batch "compile; Test/compile" >/dev/null
sbt -batch test 2>&1 | grep -E "Tests:|FAILED" | tail -2
# A query that THROWS at runtime leaves no output dir — check_oracle
# would then never see it, so a runtime-broken (but compiling) snapshot
# would gate green. Verify records such failures in _failures.txt
# (machine-readable; its exit code stays 0 for the driver's contract).
sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | grep -E '\[verify\]' || true
if [ -f "$OUT/_failures.txt" ]; then
  echo "GATE FAIL: queries failed at runtime in Verify:" >&2
  cat "$OUT/_failures.txt" >&2
  exit 1
fi
# show every non-PASS line (FAIL/WARN/SKIP + summary), not just the tail
python3 scripts/check_oracle.py "$SF" "$OUT" | grep -vE '^PASS'
