#!/usr/bin/env bash
# Own-JVM median-of-5 isolate re-times at 64xs/128xs for suite-octave
# suspects: the suite bench mixes cross-query JVM/GC/page-cache state, so
# a suite octave > 2.0 is only adjudicated by an isolated re-time (the
# r12 stream_dedup_corpus precedent: suite 6.39 -> isolated 1.53).
#
#   tools/isolate_octaves.sh q1 q2 ...
#
# Writes /tmp/iso_r15_<q>_{64xs,128xs}.json, consumed by
# tools/assemble_scale_json.py.
set -u
cd "$(dirname "$0")/.."

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

for q in "$@"; do
  for pt in 64xs:/tmp/sf0.64s 128xs:/tmp/sf0.128s; do
    lbl="${pt%%:*}" dir="${pt#*:}"
    echo "=== isolate $q @ $lbl ==="
    SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_ONLY="$q" \
      SPARK_GRAFT_BENCH_REPS=5 \
      SPARK_GRAFT_BENCH_OUT="/tmp/iso_r15_${q}_${lbl}.json" \
      java $JO -Xmx48g -cp "$CP" graft.Bench \
      >"/tmp/iso_r15_${q}_${lbl}.log" 2>&1 \
      || { echo "isolate $q@$lbl failed"; exit 1; }
    python3 -c "import json;d=json.load(open('/tmp/iso_r15_${q}_${lbl}.json'));print('  ', '$q', '$lbl', round(d['queries']['$q'],3))"
  done
done
echo "ISOLATES DONE"
