#!/bin/bash
# Poll: compare newly-dumped sf10 queries every 5 min until the marker
# file target/sf10_done exists and everything dumped has been compared.
set -u
while true; do
  DUCKDB_MEM=${DUCKDB_MEM:-25GiB} bash tools/sf10_compare_wave.sh target/sf10_b*.log \
    >> target/wave_loop.log 2>&1
  if [ -f target/sf10_done ]; then
    out=$(bash tools/sf10_compare_wave.sh target/sf10_b*.log 2>&1)
    echo "$out" >> target/wave_loop.log
    echo "$out" | grep -q "nothing pending" && break
  fi
  sleep 300
done
echo "wave loop finished" >> target/wave_loop.log
