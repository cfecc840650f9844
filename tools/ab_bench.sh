#!/bin/bash
# Interleaved A/B bench: alternate r11-HEAD and r12-HEAD jars in ONE
# session to decide whether the r12 bench drift (~1.16x uniform) follows
# the JAR (code regression) or the SESSION (sandbox contention).
# Runs serially; writes /tmp/ab_<ver>_<pass>.json
set -e
for v in r11 r12; do
  (cd /root/repo/.ab/$v && sbt -batch compile > /tmp/ab_compile_$v.log 2>&1)
done
for i in 1 2; do
  for v in r11 r12; do
    (cd /root/repo/.ab/$v && \
     SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPEAT=1 \
     sbt -batch "runMain graft.Bench" 2>&1 | grep -o '{"queries".*}' \
       > /tmp/ab_${v}_${i}.json)
    echo "pass $i $v: $(cut -c1-80 /tmp/ab_${v}_${i}.json)"
  done
done
echo AB_DONE
