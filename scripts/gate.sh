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
sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | grep -E '\[verify\]' || true
python3 scripts/check_oracle.py "$SF" "$OUT" | tail -3
