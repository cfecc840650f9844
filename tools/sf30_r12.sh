#!/bin/bash
# Round-12 sf30 loop-closers (VERDICT r11 tasks 1, 2, 7):
#  - re-measure spearman_corr (after the shared-cache/unpersist fix) and
#    geo_knn at sf30; Verify prints per-query walls into the measure log
#  - give the 8 DuckDB-disk-full rows oracle verdicts with the recipe
#    that closed triangle_count at sf10: solo compares, 90GiB memory
#    limit, spill dir swept between rows (r11's failures were oracle
#    /tmp spill exhaustion, not Spark)
# Reuses the r11 Verify dumps for the 8 rows — their queries are
# unchanged this round; only the oracle side ever failed.
set -u
cd "$(dirname "$0")/.."
SF=target/sf30
OUT=target/verify_sf30_r12
OLD=target/verify_sf30_r11
LOG=target/compare_sf30_r12.log

# 1+7: fresh walls for the two watched rows
SPARK_DRIVER_MEM=80g SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_CONF="spark.sql.files.maxPartitionBytes=33554432" \
sbt -batch "runMain graft.Verify $SF $OUT spearman_corr,geo_knn" \
  > target/sf30_r12_measure.log 2>&1

# 2: solo oracle verdicts, one at a time, spill swept between rows
: > "$LOG"
for q in dedup_clusters minhash_lsh lsh_incremental ngram_jaccard \
         ngram_containment pagerank_sim triangle_count kcore_peel; do
  rm -rf /tmp/duckdb_spill
  DUCKDB_MEM=90GiB timeout 7200 \
    python3 tools/compare_oracle.py "$SF" "$OLD" "$q" >> "$LOG" 2>&1 \
    || echo "$q ERR rc=$?" >> "$LOG"
done
# verdict the two re-measured rows against their fresh dumps
for q in spearman_corr geo_knn; do
  rm -rf /tmp/duckdb_spill
  DUCKDB_MEM=90GiB timeout 7200 \
    python3 tools/compare_oracle.py "$SF" "$OUT" "$q" >> "$LOG" 2>&1 \
    || echo "$q ERR rc=$?" >> "$LOG"
done
rm -rf /tmp/duckdb_spill
echo "== walls =="
grep -E "\[verify\] done" target/sf30_r12_measure.log
echo "== verdicts =="
cat "$LOG"
