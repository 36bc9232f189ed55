#!/usr/bin/env bash
# Own-JVM median-of-5 isolate re-times at chosen scale points for
# suite-octave suspects: the suite bench mixes cross-query JVM/GC/
# page-cache state, so a suite octave > 2.0 is only adjudicated by an
# isolated re-time (the r12 stream_dedup_corpus precedent: suite 6.39 ->
# isolated 1.53).
#
#   tools/isolate_octaves.sh [--points 32xs,64xs] [--prefix iso_r16] q1 q2 ...
#
# Defaults: points 64xs,128xs; prefix iso_r16. Writes
# /tmp/<prefix>_<q>_<label>.json, consumed by
# tools/assemble_scale_json.py (which globs /tmp/iso_r*_*.json).
# Replica dirs follow scale_bench.sh naming: 32xs -> /tmp/sf0.32s.
set -u
cd "$(dirname "$0")/.."

POINTS="64xs,128xs"
PREFIX="iso_r16"
while [ $# -gt 0 ]; do
  case "$1" in
    --points) POINTS="$2"; shift 2 ;;
    --prefix) PREFIX="$2"; shift 2 ;;
    *) break ;;
  esac
done

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

for q in "$@"; do
  for lbl in ${POINTS//,/ }; do
    dir="$(dir_of "$lbl")"
    [ -f "$dir/lineitem.parquet" ] || { echo "missing replica $dir — build it with tools/scale_bench.sh first"; exit 1; }
    echo "=== isolate $q @ $lbl ==="
    SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_ONLY="$q" \
      SPARK_GRAFT_BENCH_REPS=5 \
      SPARK_GRAFT_BENCH_OUT="/tmp/${PREFIX}_${q}_${lbl}.json" \
      java $JO -Xmx48g -cp "$CP" graft.Bench \
      >"/tmp/${PREFIX}_${q}_${lbl}.log" 2>&1 \
      || { echo "isolate $q@$lbl failed"; exit 1; }
    python3 -c "import json;d=json.load(open('/tmp/${PREFIX}_${q}_${lbl}.json'));print('  ', '$q', '$lbl', round(d['queries']['$q'],3))"
  done
done
echo "ISOLATES DONE"
