#!/bin/bash
# Wait for the running batch0 Verify to exit, then run batches 1..3
# sequentially and drop the target/sf10_done marker for the wave loop.
set -u
while pgrep -f "graft.Verify target/sf10" > /dev/null; do sleep 60; done
for i in 1 2 3; do
  SPARK_DRIVER_MEM=80g SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_CONF="spark.sql.files.maxPartitionBytes=33554432" \
  sbt -batch "runMain graft.Verify target/sf10 target/verify_sf10_r10 $(cat target/sf10_batch$i.txt)" \
    > target/sf10_b$i.log 2>&1
done
touch target/sf10_done
