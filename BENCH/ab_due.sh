#!/bin/bash
# A/B: due-set materialization mode at 16 cores on the scaling input.
# Interleaved order (off, checkpoint, checkpoint, off) so VM credit drift
# hits both variants symmetrically. One leg = the exact scaling-leg
# command from bench.py run_leg.
set -u
REPO=/root/repo
OUT=$REPO/BENCH/ab_due_results.jsonl
: > "$OUT"
leg() {
  local mode=$1 tag=$2
  local tmp
  tmp=$(mktemp -d -p /dev/shm abdue_XXXX)
  SPARK_GRAFT_DUE_MATERIALIZE=$mode taskset -c 0-15 spark-submit \
    --master 'local[16]' \
    --conf spark.sql.shuffle.partitions=96 \
    --conf spark.default.parallelism=16 \
    --conf spark.driver.memory=48g \
    --conf spark.local.dir=$tmp/local \
    --conf spark.ui.enabled=false \
    --py-files $REPO/dist/simplecrawler_spark.zip \
    $REPO/jobs/crawl_job.py \
    --pages synth:3200000:64000 --waves 3 --seed-frac 0.1 \
    --tokens-per-host 256 --host-buckets 128 \
    --store $tmp/store 2>/dev/null \
    | grep '^{' | tail -1 \
    | python -c "import sys,json; r=json.load(sys.stdin); print(json.dumps({'mode':'$mode','tag':'$tag','wave_secs':r['wave_secs'],'wall_sec':r['wall_sec'],'urls_per_sec':r['urls_per_sec']}))" >> "$OUT"
  rm -rf "$tmp"
}
leg off r1
leg checkpoint r1
leg checkpoint r2
leg off r2
cat "$OUT"
