#!/bin/bash
# Compare every sf10 query that Verify has finished dumping but that has
# no PASS/FAIL line yet in the rolling compare log. Run repeatedly while
# Verify batches execute; DuckDB is memory-capped so the pair fits in RAM.
# Usage: tools/sf10_compare_wave.sh <verifyLog...>
set -u
OUT=target/verify_sf10_r10
LOG=target/compare_sf10_r10.log
touch "$LOG"
# seed the oracle file ONLY if the running Verify hasn't written one yet —
# unconditionally clobbering could silently compare against stale SQL
if [ ! -f "$OUT/oracle_sql.json" ]; then
  cp target/r10_check/oracle_sql.json "$OUT/oracle_sql.json" 2>/dev/null
elif [ -f target/r10_check/oracle_sql.json ] && \
     ! cmp -s target/r10_check/oracle_sql.json "$OUT/oracle_sql.json"; then
  echo "NOTE: $OUT/oracle_sql.json differs from target/r10_check copy; using $OUT's" >&2
fi
# oracles too heavy to run beside the Spark JVM — compared in a solo
# pass after the Verify batches finish (SKIP is a regex alternation)
SKIP="${SKIP:-bigram_perplexity|calibration_bins}"
done_q=$(grep -hE "\[verify\] done" "$@" | sed 's/.*done  //' | awk '{print $1}' | grep -vE "^(${SKIP})$" | sort -u)
compared=$(grep -hoE "^(PASS|FAIL) [A-Za-z0-9_]+" "$LOG" | awk '{print $2}' | tr -d ':' | sort -u)
pending=$(comm -23 <(echo "$done_q") <(echo "$compared") | paste -sd, -)
if [ -z "$pending" ]; then echo "nothing pending"; exit 0; fi
echo "comparing: $pending"
DUCKDB_MEM=${DUCKDB_MEM:-30GiB} python3 tools/compare_oracle.py target/sf10 "$OUT" "$pending" \
  | grep --line-buffered -vE "spark output missing" | tee -a "$LOG"
