#!/bin/bash
# Full Verify + selfcheck gate, java-direct off a SNAPSHOTTED classpath so
# the source tree stays editable while the gate runs (the r19 pitfall: a
# detached sbt gate compiles whatever half-edited tree it finds). Usage:
#   tools/verify_gate_snap.sh [names]   # names = space-sep query subset
# Snapshot refresh: rm -rf /tmp/gate_r20/classes first (done here always —
# the gate must test the CURRENT compiled tree, run sbt compile before).
set -u
OUT=/tmp/gate_r20
rm -rf $OUT/classes /tmp/verify_out
mkdir -p $OUT
cp -r /root/repo/target/scala-2.13/classes "$OUT/classes"
CP="$OUT/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
rm -f /tmp/verify_gate_status
java -cp "$CP" $OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  graft.Verify /root/testdata/sf0.01 /tmp/verify_out ${1:-} \
  > /tmp/verify_r20.log 2>&1
python3 /root/repo/tools/selfcheck.py /root/testdata/sf0.01 /tmp/verify_out \
  > /tmp/selfcheck_r20.log 2>&1
if grep -q "oracle queries match" /tmp/selfcheck_r20.log && \
   ! grep -q "^FAIL" /tmp/selfcheck_r20.log; then
  echo GATE_DONE > /tmp/verify_gate_status
else
  echo GATE_FAIL > /tmp/verify_gate_status
fi
tail -3 /tmp/selfcheck_r20.log
