#!/bin/bash
# Full test suite, one pytest process per file.
#
# XLA's CPU backend segfaults nondeterministically inside
# backend_compile_and_load after ~120+ cold compiles in a single process
# (observed repeatedly near the end of monolithic full-suite runs; every
# test passes in isolation and with a warm cache). Per-file processes keep
# each process comfortably under the threshold AND give the persistent
# compile cache (tests/conftest.py) its warm-start benefit on re-runs.
set -u
cd "$(dirname "$0")/.."
fail=0
declare -a results
for f in tests/test_*.py; do
    out=$(timeout 3000 python -m pytest "$f" -q "$@" 2>&1 | tail -3)
    code=$?
    line=$(echo "$out" | grep -E "passed|failed|error" | tail -1)
    results+=("$f: ${line:-EXIT=$code}")
    if [ $code -ne 0 ]; then fail=1; fi
    echo "$f: ${line:-EXIT=$code}"
done
echo "----"
[ $fail -eq 0 ] && echo "ALL GREEN" || echo "FAILURES PRESENT"
exit $fail
