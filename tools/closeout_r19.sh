#!/bin/bash
# Round-19 close-out on the final tree, sequential to avoid contention:
# full selftest -> plans receipt -> full bench (writes BENCH_LAST.json
# with its own steal_pct). Statuses land in /tmp/closeout_status.
set -u
cd /root/repo
echo "phase=selftest" > /tmp/closeout_status
{ echo "SELFTEST r19 — tree $(git rev-parse HEAD) — $(date -u +%FT%TZ)"
  sbt -batch test 2>&1 | grep -vE "^\[info\] (Compiling|Done|Welcome|loading|compiling|done|Executing|set current)" ; } \
  > SELFTEST_r19.txt 2>&1
echo "phase=explain" >> /tmp/closeout_status
sbt -batch "runMain graft.Explain" > audits/plans.txt 2>/tmp/explain_err.log
echo "phase=bench" >> /tmp/closeout_status
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.Bench" > /tmp/bench_r19.log 2>&1
echo "phase=done" >> /tmp/closeout_status
