#!/bin/bash
# Sharded test runner (VERDICT r4 #2): one pytest PROCESS per test file.
#
# Why: the monolithic suite segfaults inside XLA:CPU's compiler once a
# single process has accumulated enough compiled programs (r4: SIGABRT +
# segfault in test_parallel; r5 probe: segfault compiling the loop-step in
# test_slam_integration at 43% — the SAME tests pass in a fresh process).
# Fresh processes bound the accumulated compiler state; per-shard logs make
# any crash attributable.
#
# Usage: bash tools/run_test_shards.sh [outdir]   (default out/r5_tests)
cd /root/repo
OUT=${1:-out/r5_tests}
mkdir -p "$OUT"
overall=0
summary="$OUT/SUMMARY.txt"
: > "$summary"
for f in tests/test_*.py; do
  name=$(basename "$f" .py)
  timeout 2400 python -m pytest "$f" -q > "$OUT/$name.log" 2>&1
  rc=$?
  tailline=$(grep -E "passed|failed|error|no tests ran" "$OUT/$name.log" | tail -1)
  echo "$name rc=$rc  $tailline" | tee -a "$summary"
  [ $rc -ne 0 ] && overall=1
done
# heavy shard: the multi-device full-pipeline compiles, own process each
for t in "tests/test_parallel.py -m heavy"; do
  name="heavy_$(basename $(echo $t | cut -d' ' -f1) .py)"
  timeout 3600 python -m pytest $t -q > "$OUT/$name.log" 2>&1
  rc=$?
  tailline=$(grep -E "passed|failed|error|no tests ran" "$OUT/$name.log" | tail -1)
  echo "$name rc=$rc  $tailline" | tee -a "$summary"
  [ $rc -ne 0 ] && overall=1
done
echo "OVERALL rc=$overall" | tee -a "$summary"
exit $overall
