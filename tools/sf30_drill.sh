#!/bin/bash
# Round-11 stretch drill (VERDICT r10 item 7): one more order of magnitude
# on the heaviest families — dedup / ANN / geo / graph / as-of / stats —
# at sf30 (~180M lineitem, 1.5M docs, 3M events... see tools/gen_sf.py).
# Generates target/sf30 if absent, runs graft.Verify on the drill set in
# two batches, then DuckDB-compares each dumped query with a memory cap.
# Usage: tools/sf30_drill.sh
set -u
SF=target/sf30
OUT=target/verify_sf30_r11
LOG=target/compare_sf30_r11.log

[ -d "$SF" ] || python3 tools/gen_sf.py "$SF" 300

BATCH1="dedup_exact dedup_clusters dedup_keep_best minhash_lsh lsh_band_sweep \
lsh_incremental lsh_maintain dup_spans dup_span_ratio dup_span_removal \
dup_span_rewrite winnow_fingerprint ngram_jaccard ngram_containment simhash \
cross_source_dup_matrix bloom_dedup"
BATCH2="ann_lsh_bucketed ivf_bcast_ann ivf_kmeans_ann ivfpq_ann pq_ann \
ann_recall semdedup kmeans_embed cosine_topk geo_knn geo_grid_hotspots \
geo_radius_join geo_nearest_dc kcore_peel bfs_hops pagerank_sim \
triangle_count ra_link_prediction asof_join_events asof_join_nearest \
spearman_corr equi_depth_histogram"
# the DV family's sf10 heavies (history matrix, PIT spine, bridge window,
# MA hashdiff) — not in the original drill set; their sf10/sf0.1 ratios
# looked superlinear but mixed Verify walls with Bench min-of-3, so this
# batch gives them a like-for-like sf10→sf30 reading
BATCH3="eff_sat_additional_cols pit_customer pit_incremental \
bridge_order_customer stage_exclude_hashdiff stage_multi_active \
mart_fact_orders percentile_conformance"

for b in 1 2 3; do
  v="BATCH$b"
  SPARK_DRIVER_MEM=80g SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_CONF="spark.sql.files.maxPartitionBytes=33554432" \
  sbt -batch "runMain graft.Verify $SF $OUT $(echo ${!v} | tr ' ' ',')" \
    > target/sf30_b$b.log 2>&1
done

: > "$LOG"
for q in $BATCH1 $BATCH2 $BATCH3; do
  if [ -d "$OUT/$q" ]; then
    DUCKDB_MEM=${DUCKDB_MEM:-60GiB} timeout 3600 \
      python3 tools/compare_oracle.py "$SF" "$OUT" "$q" >> "$LOG" 2>&1 \
      || echo "$q ERR rc=$?" >> "$LOG"
  else
    echo "$q MISSING (Verify did not dump)" >> "$LOG"
  fi
done
grep -cE "PASS" "$LOG" | xargs echo "passes:"
grep -E "FAIL|ERR|MISSING" "$LOG" || echo "no failures"
