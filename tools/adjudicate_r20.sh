#!/bin/bash
# Round-20 opening adjudication: the four r19 weak rows (doc_semantic_dedup
# 44.7x driver flag, stream_provenance 2.5x, stream_lm_score 2.2x,
# stream_perplexity_buckets 2.0x) + the control heavy, isolated BenchOne
# best-of-5 with /proc/stat steal sampled around every run (memory: host
# steal storms). Runs java-direct off a SNAPSHOTTED classpath
# (/tmp/adj_r20/classes) so concurrent source edits can't break or skew
# mid-batch runs; JVM flags mirror build.sbt's forked `run` exactly.
set -u
OUT=/tmp/adj_r20
mkdir -p $OUT
if [ ! -d "$OUT/classes" ]; then
  if [ -d /root/repo/target/scala-2.13/classes ]; then
    cp -r /root/repo/target/scala-2.13/classes "$OUT/classes"
    git -C /root/repo rev-parse HEAD > "$OUT/classes.provenance" 2>/dev/null
    date -u +%FT%TZ >> "$OUT/classes.provenance"
  else
    echo "no compiled classes found — run sbt compile first" >&2
    exit 1
  fi
fi
# the snapshot deliberately persists across watcher passes (mid-batch
# stability: a concurrent recompile must not skew a running batch) — but
# a batch must never SILENTLY adjudicate a stale tree (review catch,
# r20): say whose classes these are on every invocation, so a pass that
# fired after new commits names its snapshot in the log.
echo "classes snapshot: $(cat "$OUT/classes.provenance" 2>/dev/null | tr '\n' ' ' || echo 'pre-provenance snapshot')" \
  | tee -a $OUT/summary.txt >&2
CP="$OUT/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
steal_user() { awk '/^cpu /{print $9, $2}' /proc/stat; }
QUERIES="${ADJ_QUERIES:-dedup_clusters doc_semantic_dedup stream_provenance stream_lm_score stream_perplexity_buckets}"
for q in $QUERIES; do
  read s0 u0 <<<"$(steal_user)"
  SPARK_GRAFT_CPUS=32 java -cp "$CP" $OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    graft.BenchOne $q "${ADJ_ITERS:-5}" > $OUT/$q.log 2>&1
  read s1 u1 <<<"$(steal_user)"
  ds=$((s1-s0)); du=$((u1-u0))
  pct=$(awk -v s=$ds -v u=$du 'BEGIN{if(u>0) printf "%.1f", 100*s/u; else print "NA"}')
  line=$(grep -o '{"query".*}' $OUT/$q.log | tail -1)
  echo "$q steal_pct=$pct $line" | tee -a $OUT/summary.txt
done
echo DONE | tee -a $OUT/summary.txt
