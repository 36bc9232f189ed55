#!/usr/bin/env bash
# Execution-posture invariance sweeps: re-run the full 208-query surface
# under a non-default execution posture and hash-compare against the
# DuckDB oracle. Results must be invariant to HOW Spark executes —
# partition counts, AQE re-planning, SQL dialect mode, codegen vs
# interpreted expression paths, scan split granularity.
#
#   tools/invariance.sh aqe          # shuffle.partitions=200 + AQE on
#   tools/invariance.sh ansi-off     # spark.sql.ansi.enabled=false
#   tools/invariance.sh no-codegen   # wholeStage off + NO_CODEGEN factory
#   tools/invariance.sh small-splits # files.maxPartitionBytes=4m
#   tools/invariance.sh all          # every mode in sequence
#
# Round-12 recorded results (SCALING.md): every mode 208/208.
set -u
cd "$(dirname "$0")/.."
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"
MODE="${1:-all}"

run_mode() {
  local mode="$1" out="/tmp/graft_inv_$1"
  local env=() props=()
  case "$mode" in
    aqe)          env=(SPARK_GRAFT_SHUFFLE_PARTITIONS=200 SPARK_GRAFT_AQE=1) ;;
    ansi-off)     props=(-Dspark.sql.ansi.enabled=false) ;;
    no-codegen)   props=(-Dspark.sql.codegen.wholeStage=false
                        -Dspark.sql.codegen.factoryMode=NO_CODEGEN) ;;
    small-splits) props=(-Dspark.sql.files.maxPartitionBytes=4194304) ;;
    *) echo "unknown mode: $mode"; exit 2 ;;
  esac
  echo "=== invariance sweep: $mode (sf=$SF) ==="
  rm -rf "$out"
  # plain java against the compiled classes (scala-library ships in
  # /opt/spark/jars): lets each mode pass -D SQL confs to the JVM directly
  local JO="-XX:+IgnoreUnrecognizedVMOptions"
  for m in java.lang java.lang.invoke java.lang.reflect java.io java.net \
           java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
    JO="$JO --add-opens=java.base/$m=ALL-UNNAMED"
  done
  for m in jdk.internal.ref sun.nio.ch sun.nio.cs sun.security.action \
           sun.util.calendar; do
    JO="$JO --add-opens=java.base/$m=ALL-UNNAMED"
  done
  env "${env[@]}" java $JO "${props[@]}" \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Verify "$SF" "$out" 2>/dev/null >/dev/null
  python3 tools/check_oracle.py "$SF" "$out" | tail -1
}

rc=0
if [ "$MODE" = all ]; then
  for m in aqe ansi-off no-codegen small-splits; do
    run_mode "$m" | tee /dev/stderr | grep -q " 0 fail" || rc=1
  done
else
  run_mode "$MODE" | tee /dev/stderr | grep -q " 0 fail" || rc=1
fi
[ $rc -eq 0 ] && echo "INVARIANCE PASS" || echo "INVARIANCE FAIL"
exit $rc
