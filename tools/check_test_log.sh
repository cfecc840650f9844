#!/usr/bin/env bash
# Structural gate for the committed test log (VERDICT r9–r11: the log kept
# trailing HEAD). Fails unless the newest target/test_r*.log
#   (a) is newer than the last commit that touched src/ or build.sbt, and
#   (b) ends with a green "All tests passed." summary.
# Usage: tools/check_test_log.sh [path-to-log]
# Wire into the end-of-round routine: run AFTER `sbt test | tee
# target/test_r<N>.log` and BEFORE the snapshot commit; a non-zero exit
# means re-run the tests, not ship the stale log.
set -euo pipefail
cd "$(dirname "$0")/.."

log="${1:-}"
if [ -z "$log" ]; then
  log=$(ls -t target/test_r*.log 2>/dev/null | head -1 || true)
fi
if [ -z "$log" ] || [ ! -f "$log" ]; then
  echo "FAIL: no test log found (target/test_r*.log)"; exit 1
fi

src_ts=$(git log -1 --format=%ct -- src/ build.sbt)
log_ts=$(stat -c %Y "$log")
if [ "$log_ts" -lt "$src_ts" ]; then
  echo "FAIL: $log (mtime $(date -u -d @"$log_ts" +%FT%TZ)) predates the last" \
       "src-touching commit ($(date -u -d @"$src_ts" +%FT%TZ)) — re-run sbt test"
  exit 1
fi

if ! tail -n 10 "$log" | grep -q "All tests passed."; then
  echo "FAIL: $log does not end with a green 'All tests passed.' summary"
  exit 1
fi

passed=$(grep -Eo "Tests: succeeded [0-9]+" "$log" | tail -1 | grep -Eo "[0-9]+" || echo "?")
echo "OK: $log is fresh (log $(date -u -d @"$log_ts" +%FT%TZ) >= src commit" \
     "$(date -u -d @"$src_ts" +%FT%TZ)) and green ($passed tests)"
