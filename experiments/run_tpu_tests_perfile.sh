#!/bin/sh
# On-chip test runner (QNX_TEST_TPU=1), one pytest PROCESS PER FILE.
#
# Why: long single-process pytest runs through the TPU relay wedge at
# arbitrary tests (a test that passes in 2 min in a fresh process can stall
# 45+ min mid-run in a long-lived one — observed 3x on 2026-08-21, each at
# a different test). Fresh processes with per-file timeouts make coverage
# collection robust: a wedge costs one file, not the run. See BASELINE.md
# "Round-4 on-chip suite runs".
#
# Usage: sh experiments/run_tpu_tests_perfile.sh [timeout_s] [file ...]
set -u
TMO="${1:-1500}"; [ $# -gt 0 ] && shift
FILES="${*:-$(ls tests/test_*.py)}"
FAILED=0
for f in $FILES; do
  echo "=== $f"
  timeout "$TMO" env QNX_TEST_TPU=1 python -m pytest "$f" -q
  rc=$?
  if [ $rc -eq 124 ]; then echo "TIMEOUT after ${TMO}s (relay-slow, not a failure)"
  elif [ $rc -ne 0 ]; then echo "FAILED rc=$rc"; FAILED=1
  fi
  sleep 30   # let the relay chip claim settle between processes
done
exit $FAILED
