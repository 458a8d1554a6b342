#!/bin/bash
# Full Verify + selfcheck gate (the per-commit rehearsal of the driver's
# correctness gate). Detach-friendly: logs to /tmp/verify_r19.log and
# /tmp/selfcheck_r19.log, writes GATE_DONE/GATE_FAIL to /tmp/verify_gate_status.
set -u
cd /root/repo
names="${1:-}"
rm -rf /tmp/verify_out /tmp/verify_gate_status
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out $names" \
  > /tmp/verify_r19.log 2>&1
python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/verify_out \
  > /tmp/selfcheck_r19.log 2>&1
if grep -q "oracle queries match" /tmp/selfcheck_r19.log && \
   ! grep -q "^FAIL" /tmp/selfcheck_r19.log; then
  echo GATE_DONE > /tmp/verify_gate_status
else
  echo GATE_FAIL > /tmp/verify_gate_status
fi
tail -3 /tmp/selfcheck_r19.log
