#!/bin/bash
# Round-5b scaling campaign: rebuild on-disk tables at current writer
# layout, run all stages under the new de-noised protocol, regenerate
# BENCH.md. Sequential — stages share the box; parallel runs would
# corrupt each other's numbers. The 10^9-key stages (dedupxxl,
# dedupeng) and the raw-IO control need a large driver heap for the
# one-time table/index builds; the rest run at 24g.
set -x
cd /root/repo
mem() {
  case "$1" in
    dedupxxl|dedupeng|controlio) echo 48g ;;
    *) echo 24g ;;
  esac
}
for stage in fetch fetchlat dedup dedupscan images control dedupxl dedupxxl controlio dedupeng; do
  SPARK_DRIVER_MEM=$(mem $stage) sbt -batch "runMain graft.ScalingBench $stage" > /tmp/campaign_$stage.log 2>&1
  echo "=== $stage exit=$? $(date +%H:%M:%S)"
  grep -h "SCALING_POINT" /tmp/campaign_$stage.log | tail -8
done
sbt -batch "runMain graft.ScalingBench report" > /tmp/campaign_report.log 2>&1
echo "=== report exit=$?"
