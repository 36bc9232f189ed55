#!/usr/bin/env bash
# Full-surface 128x oracle sweep — the r17 resume, end to end, self-recording.
#
# Differs from scale_sweep.sh in exactly the ways the 128x scale demands
# (documented in SCALING.md r17 round-end note):
#   - The two interval-overlap queries are EXCLUDED from the engine run and
#     the comparator (--skip), not fingerprinted: their md5 fingerprint
#     costs ~8 md5/row over 6.5e10 join rows at 128x — hours of pure
#     hashing on BOTH engines. They stay hash-verified at 64x
#     (SWEEP_64X.json) and get explicit SKIPPED rows carrying the measured
#     bound, so the artifact cannot silently claim coverage.
#   - The --expect surface comes from a FULL, unfiltered sf0.001 Verify
#     dump (oracleSql is a static map, identical at every sf) — a filtered
#     128x dump would make --expect vacuous.
#   - Fresh-connection comparator (7d9cb8c) is first PROVEN on one row that
#     OOM'd in SWEEP_128X_PARTIAL.log before the full multi-hour compare.
#
#   tools/sweep128.sh          # everything; resumable (replica/dump cached)
set -uo pipefail
cd "$(dirname "$0")/.."

# DuckDB 1.0's ordered list/string aggregations mmap one region per group
# batch: at 128x (34.6M-row list-agg) the process hits the kernel's
# default vm.max_map_count=65530 and dies with bad_alloc at ~6GB RSS —
# nondeterministically, by fragmentation. Raise it (root; best-effort).
sysctl -w vm.max_map_count=1048576 >/dev/null 2>&1 || true

COPIES=128
SRC="${SPARK_GRAFT_BASE_SF:-/root/testdata/sf0.1}"
DATA="/tmp/sf0.${COPIES}"
OUT="/tmp/graft_sweep${COPIES}"
TINY_OUT="/tmp/graft_tiny_full"
LOG="/tmp/graft_sweep${COPIES}.log"
OLOG="/tmp/graft_sweep${COPIES}_oracle.log"
INTERVALS="join_interval_overlap,join_overlap_auto"
# staged set grown at 128x (r18): text_rake_phrases was already staged at
# 64x (SWEEP_64X mode=staged-oracle) and was missing here; graph_kcore's
# monolithic eval re-inlines the replica-scale edges join across the
# unrolled peeling CTEs and OOMs at 60GB, while staging evaluates it once
STAGED="${SWEEP_STAGED-corpus_retention_funnel,text_tfidf,text_token_rarity,ts_ewma_price,text_rake_phrases,graph_kcore}"
SKIP6="$STAGED,$INTERVALS"

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

if [ ! -f "$DATA/lineitem.parquet" ]; then
  echo "=== building ${COPIES}x verbatim replica at $DATA ==="
  java $JO -Xmx48g -cp "$CP" graft.ScaleUp "$SRC" "$DATA" "$COPIES" \
    >"$LOG.scaleup" 2>&1 || { echo "ScaleUp failed — see $LOG.scaleup"; exit 1; }
fi

# Full-surface oracle dump at sf0.001: supplies (a) the complete query-name
# list for the engine run's `only` filter, (b) the 210-entry oracle_sql.json
# for --skip bookkeeping and --expect. Raw interval SQL is fine here — the
# comparator never evaluates a skipped query.
if [ ! -f "$TINY_OUT/oracle_sql.json" ]; then
  echo "=== full-surface dump at sf0.001 (names + oracle SQL) ==="
  rm -rf "$TINY_OUT"
  java $JO -Xmx16g -cp "$CP" graft.Verify /root/testdata/sf0.001 "$TINY_OUT" \
    >"$LOG.tiny" 2>&1 || { echo "tiny Verify failed — see $LOG.tiny"; exit 1; }
  grep "\[verify\].*failed" "$LOG.tiny" && { echo "tiny per-query failures"; exit 1; }
fi
ONLY="$(python3 - "$TINY_OUT" "$INTERVALS" <<'EOF'
import os, sys
out, intervals = sys.argv[1], set(sys.argv[2].split(","))
names = sorted(d for d in os.listdir(out)
               if os.path.isdir(os.path.join(out, d)) and d not in intervals)
print(",".join(names))
EOF
)"
NQ="$(echo "$ONLY" | tr ',' '\n' | wc -l)"
echo "engine surface at ${COPIES}x: $NQ queries (intervals excluded)"

if [ ! -d "$OUT" ] || [ -n "${SWEEP_FORCE_VERIFY:-}" ]; then
  echo "=== Verify $NQ-query surface at ${COPIES}x ==="
  rm -rf "$OUT"
  java $JO -Xmx48g -cp "$CP" graft.Verify "$DATA" "$OUT" "$ONLY" >"$LOG" 2>&1 \
    || { echo "Verify crashed — see $LOG"; exit 1; }
  grep "\[verify\].*failed" "$LOG" && { echo "per-query failures above"; exit 1; }
fi
# full 210-entry oracle surface replaces the filtered one (static SQL map)
cp "$TINY_OUT/oracle_sql.json" "$OUT/oracle_sql.json"

echo "=== proving fresh-connection fix (7d9cb8c) on a PARTIAL-log OOM row ==="
python3 tools/check_oracle_one.py "$DATA" "$OUT" dedup_minhash_lsh 60GB 16 \
  || { echo "fresh-connection proof FAILED — aborting before full compare"; exit 1; }

echo "=== DuckDB oracle compare on the ${COPIES}x parquet ==="
orc=0
# --fork: one comparator PROCESS per query — per-query connections proved
# insufficient at 128x (process-wide duckdb allocation accumulates across
# closed connections: mid-sweep kilobyte-block OOMs ending in a segfault,
# while the same query at the same cap passes in a fresh process)
DUCKDB_MEMORY_LIMIT="${DUCKDB_MEMORY_LIMIT:-60GB}" \
python3 tools/check_oracle.py "$DATA" "$OUT" --fork --skip "$SKIP6" \
  | tee "$OLOG" | tail -1 || orc=$?

for q in ${STAGED//,/ }; do
  echo "=== staged oracle: $q ==="
  python3 tools/staged_oracle.py "$DATA" "$OUT" "$q" \
    "${DUCKDB_MEMORY_LIMIT:-48GB}" 16 2>"/tmp/graft_staged_${q}.log" \
    | tee -a "$OLOG" || orc=$?
done

# enriched SKIP rows for the md5-bound interval fingerprints: later lines
# override the generic "excluded by --skip" entries in sweep_to_json.py
for q in ${INTERVALS//,/ }; do
  echo "SKIP $q: fingerprint oracle md5-bound at 128x (~8 md5/row x 6.5e10 join rows = hours on both engines); hash-verified at 64x, 1.6e10 rows, SWEEP_64X.json" \
    | tee -a "$OLOG"
done

echo "=== assembling committed artifact ==="
SHA="$(git rev-parse --short HEAD)"
python3 tools/sweep_to_json.py "$OLOG" "SWEEP_128X.json" "$DATA" "$COPIES" "$SHA" \
  "self-recorded by tools/sweep128.sh; intervals SKIPPED (md5-bound, 64x-verified); staged: $STAGED" \
  --expect "$OUT/oracle_sql.json" || { echo "sweep INCOMPLETE"; exit 1; }
if [ "$orc" -ne 0 ]; then
  echo "sweep FAILED: comparator reported failures (see $OLOG)"
  exit 1
fi
echo "sweep OK: SWEEP_128X.json"
