#!/bin/bash
# Round-5 scaling-bench campaign: every stage re-measured on r5 code
# (point files are only comparable same-code; r4 points predate the
# parquet-bloom/probe-cap/wave changes). Stages run sequentially —
# two sbt processes conflict over target/, and campaigns need the box
# quiet. Usage: nohup bash tools/campaign_r5.sh > /tmp/campaign_r5.log 2>&1 &
set -u
cd /root/repo
log() { echo "== $(date -u +%H:%M:%S) $*"; }

log "sliced-crawl e2e (VERDICT r04 #5)"
SPARK_DRIVER_MEM=48g sbt -batch "runMain graft.tools.SlicedCrawl 32" 2>&1 | grep -E "SLICED_CRAWL|error\]" | grep -vE "INFO|WARN"

for s in fetchlat dedup dedupscan fetch images; do
  log "stage $s"
  SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.ScalingBench $s" 2>&1 | grep -E "SCALING_TRIAL|error\]" | grep -vE "INFO|WARN"
done

log "controls"
SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.ScalingBench control" 2>&1 | grep -E "SCALING_TRIAL"

log "dedupxl"
SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.ScalingBench dedupxl" 2>&1 | grep -E "SCALING_TRIAL|error\]" | grep -vE "INFO|WARN"

log "dedupxxl (rebuilds bench_xxl at sorted-v3: parquet bloom on url_hash)"
SPARK_DRIVER_MEM=48g sbt -batch "runMain graft.ScalingBench dedupxxl" 2>&1 | grep -E "SCALING_TRIAL|error\]" | grep -vE "INFO|WARN"

log "dedupeng (rebuilds bench_eng* at engine-v2)"
SPARK_DRIVER_MEM=48g sbt -batch "runMain graft.ScalingBench dedupeng" 2>&1 | grep -E "SCALING_TRIAL|error\]" | grep -vE "INFO|WARN"

log "campaign done"
