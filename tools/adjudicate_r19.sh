#!/bin/bash
# Round-19 opening adjudication: the nine r18 weak rows + line_dedup (the
# D25d table flag) + the control heavy, isolated BenchOne best-of-5 with
# /proc/stat steal sampled around every run (memory: host steal storms).
# Runs java-direct off a SNAPSHOTTED classpath (/tmp/adj_r19/classes) so
# concurrent source edits can't break or skew mid-batch runs; JVM flags
# mirror build.sbt's forked `run` exactly (add-opens + Xmx8g + props).
set -u
OUT=/tmp/adj_r19
mkdir -p $OUT
# self-provision the classpath snapshot when absent (fresh /tmp): the
# snapshot exists so a concurrent `sbt compile` can't break or skew a
# mid-batch run; refresh deliberately = rm -rf $OUT/classes first
if [ ! -d "$OUT/classes" ]; then
  if [ -d /root/repo/target/scala-2.13/classes ]; then
    cp -r /root/repo/target/scala-2.13/classes "$OUT/classes"
  else
    echo "no compiled classes found — run sbt compile first" >&2
    exit 1
  fi
fi
CP="$OUT/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
steal_user() { awk '/^cpu /{print $9, $2}' /proc/stat; }
# default batch = control heavy + the nine r18 weak rows + line_dedup (the
# D25d table flag) + first pins for the r19 newcomers + shape re-pins for
# the 9-stage curation family (the url_rules stage changed their shape)
QUERIES="${ADJ_QUERIES:-dedup_clusters compact_partitions stream_domain_cap sketch_profile semantic_dedup report_bundle corpus_pipeline_linecut span_dedup doc_embed line_dedup image_phash_dedup url_filter encoding_repair stream_provenance curation_funnel curation_provenance curation_funnel_banded}"
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
