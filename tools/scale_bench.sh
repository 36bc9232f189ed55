#!/usr/bin/env bash
# Scale-curve bench runner: the 19-query BENCH_SCALE set at a sequence of
# ScaleUp replicas, every point in ONE back-to-back session on ONE binary
# (the round-12 lesson: cross-session scale comparisons manufacture
# outliers). Builds missing replicas, runs one JVM per scale point
# (cold-cache; per-query median-of-3 at <128x, SINGLE-SHOT at >=128x —
# see reps_of below; SCALE_BENCH_REPS overrides), writes
# /tmp/scalebench_<label>.json per point.
#
#   tools/scale_bench.sh            # 1x 8x 8xs 32xs 64xs 128xs
#   tools/scale_bench.sh 1x 32xs    # subset
#
# Labels: 1x = /root/testdata/sf0.1; Nx = verbatim replica; Nxs = salted
# keys (--salt-keys: the control that separates replica artifacts from
# plan defects). Isolate a suspect afterwards with
#   SPARK_GRAFT_BENCH_ONLY=<q> SPARK_GRAFT_BENCH_REPS=5 (own JVM).
set -u
cd "$(dirname "$0")/.."

QUERIES="corpus_hard_negatives,sim_tfidf_pairs,mm_ahash_neardup,stream_purchase_view_join,er_fuzzy_clusters,graph_pagerank_nations,affinity_brand_pairs,join_bloom_pruned,q21_last_shipper,graph_bfs_hops,dedup_minhash_lsh,dedup_simhash,dedup_prefix_filter,sim_bruteforce_topk,sim_lsh_topk,sim_ivf_topk,stream_session_30m,stream_dedup_corpus,stream_scd2_closed"

JO="-XX:+IgnoreUnrecognizedVMOptions"
for m in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  JO="$JO --add-opens=java.base/$m=ALL-UNNAMED"
done
for m in jdk.internal.ref sun.nio.ch sun.nio.cs sun.security.action \
         sun.util.calendar; do
  JO="$JO --add-opens=java.base/$m=ALL-UNNAMED"
done
CP="target/scala-2.13/classes:/opt/spark/jars/*"

dir_of() {
  case "$1" in
    1x) echo /root/testdata/sf0.1 ;;
    *xs) echo "/tmp/sf0.${1%xs}s" ;;
    *x) echo "/tmp/sf0.${1%x}" ;;
  esac
}

build() { # label
  local lbl="$1" dir; dir="$(dir_of "$1")"
  [ "$lbl" = 1x ] && return 0
  [ -f "$dir/lineitem.parquet" ] && return 0
  local copies="${lbl%x*}" salt=""
  [ "${lbl%s}" != "$lbl" ] && salt="--salt-keys"
  echo "=== building $lbl at $dir ==="
  java $JO -Xmx48g -cp "$CP" graft.ScaleUp /root/testdata/sf0.1 "$dir" \
    "$copies" $salt >"/tmp/scaleup_$lbl.log" 2>&1 \
    || { echo "ScaleUp $lbl failed — see /tmp/scaleup_$lbl.log"; exit 1; }
}

POINTS=("$@"); [ $# -eq 0 ] && POINTS=(1x 8x 8xs 32xs 64xs 128xs)

# build everything FIRST so the timed phase is back-to-back and quiet
for p in "${POINTS[@]}"; do build "$p"; done

reps_of() { # label -> rep count
  # >=128 replicas: SINGLE-SHOT by default. Same-JVM multi-rep medians at
  # replica scale inflate from dead-shuffle accumulation (r19:
  # dedup_prefix_filter median-of-5 76.9 s vs 54.5 s single-shot at 256x,
  # turning a linear 1.98x octave into a phantom 3.3x; the between-rep GC
  # cut but did not zero it). Single-shot + StageProbe taskSec is the
  # honest pair for octave adjudication; SCALE_BENCH_REPS overrides both
  # tiers when a median is wanted anyway.
  local copies="${1%%x*}"
  if [ "$1" = 1x ]; then copies=1; fi
  if [ "$copies" -ge 128 ]; then echo "${SCALE_BENCH_REPS:-1}"
  else echo "${SCALE_BENCH_REPS:-3}"; fi
}

for p in "${POINTS[@]}"; do
  echo "=== bench $p ($(dir_of "$p"), reps=$(reps_of "$p")) ==="
  SPARK_GRAFT_SF_DIR="$(dir_of "$p")" SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
    SPARK_GRAFT_BENCH_REPS="$(reps_of "$p")" \
    SPARK_GRAFT_BENCH_OUT="/tmp/scalebench_$p.json" \
    java $JO -Xmx48g -cp "$CP" graft.Bench >"/tmp/scalebench_$p.log" 2>&1 \
    || { echo "bench $p failed — see /tmp/scalebench_$p.log"; exit 1; }
  python3 -c "import json;d=json.load(open('/tmp/scalebench_$p.json'));print('$p total', round(d['value'],1), 'failed', d['failed'])"
done
echo "SCALE BENCH DONE"
