#!/bin/bash
# Storm watcher (r20): probe the window with the control heavy
# (dedup_clusters, BenchOne best-of-2); when the control best is within
# ~8% of its 9.99 pin the host demonstrably reproduces pin-day timings —
# fire the full r20 adjudication batch and exit. Otherwise sleep 8 min
# and re-probe. Logs every probe to /tmp/adj_r20/watch.txt.
set -u
OUT=/tmp/adj_r20
mkdir -p $OUT
for attempt in $(seq 1 40); do
  rm -f $OUT/summary.txt
  ADJ_QUERIES="dedup_clusters" ADJ_ITERS=2 /root/repo/tools/adjudicate_r20.sh >/dev/null 2>&1
  line=$(tail -2 $OUT/summary.txt | head -1)
  pct=$(sed -n 's/.* steal_pct=\([0-9.]*\).*/\1/p' <<<"$line")
  best=$(sed -n 's/.*"best":\([0-9.]*\).*/\1/p' <<<"$line")
  echo "$(date +%H:%M:%S) probe#$attempt steal=$pct control_best=$best" >> $OUT/watch.txt
  # gate on the CONTROL TIME, not idle steal ratios (steal/user explodes
  # on a healthy idle host because user is tiny)
  quiet=$(awk -v b="${best:-999}" 'BEGIN{print (b<10.8) ? 1 : 0}')
  if [ "$quiet" = "1" ]; then
    echo "$(date +%H:%M:%S) QUIET WINDOW — firing full batch" >> $OUT/watch.txt
    rm -f $OUT/summary.txt
    /root/repo/tools/adjudicate_r20.sh
    echo "$(date +%H:%M:%S) batch complete" >> $OUT/watch.txt
    exit 0
  fi
  sleep 480
done
echo "$(date +%H:%M:%S) gave up after 40 probes" >> $OUT/watch.txt
exit 1
