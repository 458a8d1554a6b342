#!/bin/bash
# Second-pass r20 watcher: the first batch fired in a certified-quiet
# window but a storm pulse landed mid-batch (control read 13.85 @ 126%
# steal right after a 9.67 probe). Re-adjudicate only the rows the pulse
# contaminated: doc_semantic_dedup (the 44.7x flag) + the control, plus
# stream_perplexity_buckets (7.28 quiet = 1.16x pin — needs a second
# floor reading for the two-reading rule). Writes summary2.txt.
set -u
OUT=/tmp/adj_r20
mkdir -p $OUT
for attempt in $(seq 1 40); do
  rm -f $OUT/summary.txt
  ADJ_QUERIES="dedup_clusters" ADJ_ITERS=2 /root/repo/tools/adjudicate_r20.sh >/dev/null 2>&1
  line=$(tail -2 $OUT/summary.txt | head -1)
  pct=$(sed -n 's/.* steal_pct=\([0-9.]*\).*/\1/p' <<<"$line")
  best=$(sed -n 's/.*"best":\([0-9.]*\).*/\1/p' <<<"$line")
  echo "$(date +%H:%M:%S) probe2#$attempt steal=$pct control_best=$best" >> $OUT/watch.txt
  quiet=$(awk -v b="${best:-999}" 'BEGIN{print (b<10.8) ? 1 : 0}')
  if [ "$quiet" = "1" ]; then
    echo "$(date +%H:%M:%S) QUIET WINDOW — firing batch 2" >> $OUT/watch.txt
    rm -f $OUT/summary.txt
    ADJ_QUERIES="doc_semantic_dedup stream_perplexity_buckets dedup_clusters" \
      /root/repo/tools/adjudicate_r20.sh
    cp $OUT/summary.txt $OUT/summary2.txt
    echo "$(date +%H:%M:%S) batch 2 complete" >> $OUT/watch.txt
    exit 0
  fi
  sleep 480
done
echo "$(date +%H:%M:%S) gave up after 40 probes (pass 2)" >> $OUT/watch.txt
exit 1
