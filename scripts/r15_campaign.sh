#!/bin/bash
# Round-15 scale campaign: full battery at sf0.1 and sf1, heavy-tail at
# sf10 (quadratic-by-contract tier excluded per its documented cost
# model — see ScaleCheck's Exempt entries). Artifacts carry per-query
# shuffle bytes (new r15) for the ScaleCheck bytes gate.
set -x
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
SKIP="q46_levenshtein_pairs,q47_dedup_clusters,q133_dedup_keep_best"

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=BENCH_SF01_r15.json \
  java -cp "$CP" graft.Bench > /tmp/bench_sf01.log 2>&1
echo "SF01 EXIT=$?"

SPARK_GRAFT_SF_DIR=/tmp/graft_testdata/sf1 SPARK_GRAFT_BENCH_OUT=BENCH_SF1_r15.json \
  java -cp "$CP" graft.Bench > /tmp/bench_sf1.log 2>&1
echo "SF1 EXIT=$?"

SPARK_GRAFT_SF_DIR=/tmp/graft_testdata/sf10 SPARK_GRAFT_BENCH_OUT=BENCH_SF10_r15.json \
  SPARK_GRAFT_SKIP="$SKIP" \
  java -cp "$CP" graft.Bench > /tmp/bench_sf10.log 2>&1
echo "SF10 EXIT=$?"
echo CAMPAIGN_DONE
