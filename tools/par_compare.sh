#!/usr/bin/env bash
# Parallel fresh-process oracle compare for replica-scale sweeps.
#
# The serial fork-per-query comparator is correctness-sound (fresh process
# per query, 7d9cb8c/fd37364) but much of each compare is single-threaded
# (pandas parquet load + Python row normalization + the sequential scan
# half of DuckDB plans): at 128x one heavy corpus row alone can hold the
# line for 20+ minutes while 30 cores idle. This driver runs K independent
# check_oracle_one.py children concurrently over an explicit query list —
# process isolation already guarantees no shared DuckDB allocation, so
# concurrency changes wall-clock, not semantics. Per-child memory caps
# must be budgeted by the caller (K x cap < RAM; children spill to
# /tmp/duck_spill beyond the cap). Spill DISK is a shared budget the
# caps do NOT bound: concurrent heavy children can transiently exhaust
# /tmp and fail siblings with ENOSPC (sim_recall_census at 128x did) —
# treat a mid-bulk ENOSPC as retry-on-quiet-disk, not as an oracle bound.
#
#   tools/par_compare.sh <sfDir> <outDir> <queryListFile> <K> <memCap> <threads> <lineDir>
#
# One "<status> <query> ..." line per query lands in <lineDir>/<query>.line
# (check_oracle_one.py's parseable stdout contract); merge with
# `cat <lineDir>/*.line`. Exit 0 iff every child exited 0.
set -uo pipefail
cd "$(dirname "$0")/.."

SF="${1:?sfDir}"; OUT="${2:?outDir}"; LIST="${3:?queryListFile}"
K="${4:-3}"; MEM="${5:-40GB}"; THREADS="${6:-10}"; LINES="${7:?lineDir}"
mkdir -p "$LINES"

export SF OUT MEM THREADS LINES
# query name reaches the child as a positional arg ($1), never spliced
# into the script text — a name with shell metacharacters stays data
xargs -a "$LIST" -P "$K" -I{} bash -c '
  q="$1"
  start=$SECONDS
  out="$(python3 tools/check_oracle_one.py "$SF" "$OUT" "$q" "$MEM" "$THREADS" \
         2>"$LINES/$q.err")"; rc=$?
  # a child that died without its parseable line (segfault, OOM-kill)
  # still yields a FAIL line — same contract as check_oracle.py --fork
  [ -n "$out" ] || out="FAIL $q: comparator child exited $rc with no output"
  printf "%s\n" "$out" >"$LINES/$q.line"
  echo "[$((SECONDS-start))s] $out"
  exit "$rc"
' _ {}
