#!/bin/bash
# Real-config e2e refresh on r5 code: interleaved best-of-3 per level
# (8/32 alternating rep-wise like the scaling stages).
set -u
cd /root/repo
for rep in 1 2 3; do
  for cores in 8 32; do
    echo "== rep $rep cores $cores"
    SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.CrawlDemo 64 300 $cores 1000 4" 2>&1 \
      | grep -E "E2E|TOTAL|urls/s|DRIVER-GAP" | tail -5
  done
done
